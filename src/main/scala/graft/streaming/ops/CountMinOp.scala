package graft.streaming.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.FreqItems
import graft.streaming.OperatorFactory

/** Windowed Count-Min frequency sketch as a topology factory — the
  * streaming "how often did X occur this hour" answer at unbounded item
  * cardinality (trending tokens, hot keys, abuse counters).
  *
  * Emits the per-window CELL table `(window_start, r, bucket, cnt)`:
  * like [[ApproxDistinctOp]], the sketch itself is the streaming
  * product — state per window is bounded at `depth * width` cells
  * regardless of item cardinality, `sum` is distributive (map-side
  * combined, mergeable across streams/days), and the table finalizes
  * in append mode when the watermark passes. Point estimates come from
  * the batch finisher [[estimate]] (min over the depth rows), with the
  * standard CM guarantee: est >= true, est <= true + eps*N w.h.p.
  *
  * Config: `window` (default "1 hour"), `timestamp_col` ("ts"),
  * `item_col` ("item"), `depth` (4), `width` (1024, power of two). */
object CountMinOp extends OperatorFactory {
  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val win = config.getOrElse("window", "1 hour").toString
    val tsCol = config.getOrElse("timestamp_col", "ts").toString
    val itemCol = config.getOrElse("item_col", "item").toString
    val depth = config.getOrElse("depth", 4).toString.toInt
    val width = config.getOrElse("width", 1024).toString.toInt
    val cells = FreqItems.countMinTable(
      sources.head.withColumn("__win", window(col(tsCol), win)),
      col(itemCol), depth, width,
      groupCols = Seq(col("__win")))
    Seq(cells.select(col("__win.start").as("window_start"),
      col("r"), col("bucket"), col("cnt")))
  }

  /** Batch finisher: estimates for `items`. Over the full multi-window
    * cell table this is the estimate for the UNION of the windows
    * (counts are additive — countMinLookup collapses the cells first,
    * keeping est >= true); filter `window_start` to estimate within
    * ONE window. */
  def estimate(cells: DataFrame, items: DataFrame,
               item: org.apache.spark.sql.Column,
               depth: Int, width: Int): DataFrame =
    FreqItems.countMinLookup(
      cells.select("r", "bucket", "cnt"), items, item, depth, width)
}
