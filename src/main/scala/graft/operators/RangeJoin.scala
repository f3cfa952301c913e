package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded (bucketed) range join: pairs each left row with the right rows
  * of the same key whose timestamp falls in [leftTs, leftTs + window].
  *
  * A bare `join(keys).filter(time band)` shuffles on the key alone, so a
  * hot key's entire history lands on one task and the band filter runs
  * over that key's full cross product — the classic skew cliff at corpus
  * scale. Here the shuffle key is (key, time bucket) with bucket width =
  * the window: every right row rides exactly one bucket, every left row
  * probes its own bucket and the next (any in-window partner is in one of
  * the two — b.ts ≤ a.ts + w ⇒ floor(b/w) ≤ floor(a/w)+1), so a pair
  * can match at most once (no post-join dedup) and per-task work is
  * bounded by the key's density within ONE window, not its total history.
  */
object RangeJoin {

  def timeBand(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTsCol: String, rightTsCol: String,
               windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, "window must be positive")
    val lSec = col(leftTsCol).cast("double")
    val rSec = col(rightTsCol).cast("double")
    val lBucket = floor(lSec / windowSeconds).cast("long")
    val lb = left.withColumn("__band",
      explode(array(lBucket, lBucket + 1L)))
    val rb = right.withColumn("__band",
      floor(rSec / windowSeconds).cast("long"))
    lb.join(rb, keys :+ "__band")
      .filter(rSec >= lSec && rSec <= lSec + windowSeconds)
      .drop("__band")
  }
}
