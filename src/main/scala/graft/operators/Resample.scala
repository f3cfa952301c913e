package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization — resample an event stream onto a fixed
  * time grid per key, materializing GAP rows (the buckets with no
  * events), and forward-fill the last observation across them. The
  * classic prep step before any window-model/feature pipeline consumes
  * irregular event data: models want one row per (key, tick), not one
  * per event.
  *
  * Scale shape: one (key, bucket)-keyed aggregate over the events;
  * the grid is generated per key with `sequence()` (span/interval rows
  * per key, map-side — never a global calendar join); the gap join and
  * the forward-fill window are both keyed by the same key columns, so
  * everything after the first aggregate shuffles |grid| rows, not
  * |events|. Forward fill is one `last(ignoreNulls)` running window
  * per key (the [[AsOfJoin]] carry idiom).
  *
  * Determinism: bucket = `window(ts, interval).start`; sums are
  * decimal-exact ([[MathOps.exactSum]] rule) so every value replays
  * bit-for-bit in SQL (q_resample).
  */
object Resample {

  /** Per (keys, bucket) tick row over a complete per-key grid:
    * `n` events, exact `sum_value` (NULL on gap rows), and
    * `filled_value` = last non-NULL sum at or before this tick
    * (NULL until the key's first observation). `intervalSeconds`
    * must match the `interval` string (Spark's sequence step). */
  def grid(events: DataFrame, tsCol: String, valueCol: String,
           keys: Seq[String], interval: String,
           intervalSeconds: Long): DataFrame = {
    require(keys.nonEmpty, "resample needs at least one key column")
    val kc = keys.map(col)
    val bucketed = events
      .groupBy(kc :+ window(col(tsCol), interval)("start").as("bucket"): _*)
      .agg(count(lit(1)).as("n"),
        MathOps.exactSum(col(valueCol)).as("sum_value"))
    val span = bucketed.groupBy(kc: _*)
      .agg(min("bucket").as("__b0"), max("bucket").as("__b1"))
    val ticks = span.select(kc :+ explode(sequence(col("__b0"),
      col("__b1"), expr(s"INTERVAL $intervalSeconds SECONDS")))
      .as("bucket"): _*)
    val joined = ticks.join(bucketed, keys :+ "bucket", "left")
      .select(kc ++ Seq(col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"), col("sum_value")): _*)
    val w = Window.partitionBy(kc: _*).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined.withColumn("filled_value",
      last(col("sum_value"), ignoreNulls = true).over(w))
  }
}
