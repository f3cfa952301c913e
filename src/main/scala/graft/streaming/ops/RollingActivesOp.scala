package graft.streaming.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Hll
import graft.streaming.OperatorFactory

/** Streaming rolling distinct actives (DAU/WAU/MAU) as a topology
  * factory — the streaming twin of
  * [[graft.operators.Retention.rollingActives]] (round-6 verdict task
  * 5). The stream emits the per-DAY register table
  * `(day DATE, bucket, register)` — the [[ApproxDistinctOp]] pattern
  * at daily granularity: state per day is a bounded `<= 2^p`-row
  * register-max aggregate regardless of user cardinality (map-side
  * combined, mergeable, idempotent under replay), finalized in append
  * mode once the watermark passes the day. The trailing-window union
  * is deliberately NOT computed in-stream: it would chain a second
  * stateful aggregation and destroy register mergeability — it is the
  * [[finish]] batch step over finalized days
  * ([[graft.operators.Retention.rollingFromRegisters]]), so stream
  * and batch agree bit-for-bit on the same events (StreamingSpec
  * parity pin vs the oracled q_rolling_actives arithmetic).
  *
  * Config: `timestamp_col` ("ts"), `user_col` ("user_id"),
  * `precision` (p, default 6 — [[graft.operators.Retention
  * .rollingActives]]'s default). Batch sources take the same path
  * (one batch groupBy), the one-factory-both-modes contract. */
object RollingActivesOp extends OperatorFactory {
  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val tsCol = config.getOrElse("timestamp_col", "ts").toString
    val userCol = config.getOrElse("user_col", "user_id").toString
    val p = config.getOrElse("precision", 6).toString.toInt
    // a 1-day event-time window (not a bare cast-to-date groupBy):
    // streaming aggregation state needs the windowed form to finalize
    // under the watermark; window_start of a 1-day window IS the day
    val regs = Hll.registers(sources.head, col(userCol), p,
      groupCols = Seq(window(col(tsCol), "1 day").as("win")))
    Seq(regs.select(col("win.start").cast("date").as("day"),
      col("bucket"), col("register")))
  }

  /** Batch finisher over finalized daily cells: the trailing
    * `windowDays` register-max union + estimate for every PRESENT day
    * — exactly [[graft.operators.Retention.rollingFromRegisters]].
    * Output per day: est_millis, nonempty_buckets, register_sum. */
  def finish(cells: DataFrame, windowDays: Int, p: Int): DataFrame =
    graft.operators.Retention.rollingFromRegisters(cells, windowDays, p)
}
