package graft.streaming.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.FreqItems
import graft.streaming.OperatorFactory

/** Windowed Misra-Gries heavy hitters as a topology factory — the
  * streaming "top items this hour" answer at unbounded item
  * cardinality, completing the windowed-sketch family
  * ([[ApproxDistinctOp]] distincts, [[CountMinOp]] frequencies,
  * [[DriftOp]] distribution drift, [[CardOp]] volumes).
  *
  * One watermarked windowed aggregate whose state per window is the
  * O(m) MG sketch ([[FreqItems.sketch]] — a mergeable Aggregator, so
  * partial aggregation and the state-store merge both apply the
  * PODS'12 rule); rows finalize in append mode when the watermark
  * passes. The emission is the top-`top_j` table
  * `(window_start, rank, item, est_count)` — read top-j for
  * j ≪ m, where MG rankings are stable (the [[FreqItems]] guarantee:
  * any item with frequency > n/(m+1) is present; estimates undershoot
  * by at most n/(m+1)).
  *
  * Config: `window` (default "1 hour"), `timestamp_col` ("ts"),
  * `item_col` ("item" — a LONG; hash strings upstream, the engine-wide
  * shuffle-key rule), `m` (64), `top_j` (10). Batch sources take the
  * same path (one batch groupBy) — one factory, both modes. */
object HeavyHittersOp extends OperatorFactory {
  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val win = config.getOrElse("window", "1 hour").toString
    val tsCol = config.getOrElse("timestamp_col", "ts").toString
    val itemCol = config.getOrElse("item_col", "item").toString
    val m = config.getOrElse("m", 64).toString.toInt
    val topJ = config.getOrElse("top_j", 10).toString.toInt
    require(topJ >= 1 && topJ <= m, s"need 1 <= top_j <= m: $topJ/$m")
    val out = sources.head
      .groupBy(window(col(tsCol), win).as("__win"))
      .agg(FreqItems.sketch(m)(col(itemCol).cast("long")).as("__hh"))
      .select(col("__win.start").as("window_start"),
        posexplode(col("__hh")))
      .filter(col("pos") < topJ)
      .select(col("window_start"), (col("pos") + 1).as("rank"),
        col("col._1").as("item"), col("col._2").as("est_count"))
    Seq(out)
  }
}
