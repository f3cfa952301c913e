package graft.streaming.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Hll
import graft.streaming.OperatorFactory

/** Windowed approximate distinct count ("unique users per hour" at any
  * cardinality) as a topology factory, built on the relational
  * HyperLogLog ([[graft.functions.Hll]]).
  *
  * The operator emits the per-window REGISTER table
  * `(window_start, bucket, register)` — the sketch itself, not just a
  * number — because registers are the streaming-native product: the
  * state per window is a bounded `<= 2^p`-row max-aggregate (mergeable,
  * idempotent), it finalizes in append mode once the watermark passes,
  * and downstream consumers can merge register tables across windows /
  * streams / days (max again) before calling [[estimate]]. Collapsing
  * to a single number inside the stream would need a second chained
  * stateful aggregation and would destroy mergeability.
  *
  * Config: `window` (default "1 hour"), `timestamp_col` ("ts"),
  * `item_col` ("user_id"), `precision` (p, default 12).
  *
  * Batch sources take the same path (a batch groupBy) — one factory,
  * both modes, like the rest of the ops.* battery. */
object ApproxDistinctOp extends OperatorFactory {
  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val win = config.getOrElse("window", "1 hour").toString
    val tsCol = config.getOrElse("timestamp_col", "ts").toString
    val itemCol = config.getOrElse("item_col", "user_id").toString
    val p = config.getOrElse("precision", 12).toString.toInt
    val regs = Hll.registers(sources.head, col(itemCol), p,
      groupCols = Seq(window(col(tsCol), win).as("win")))
    Seq(regs.select(col("win.start").as("window_start"),
      col("bucket"), col("register")))
  }

  /** Batch finisher: collapse a register table (as emitted above) to
    * one `(window_start, est_millis, ...)` row per window. */
  def estimate(regs: DataFrame, p: Int): DataFrame =
    Hll.estimate(regs, p, groupCols = Seq(col("window_start")))
}
