package graft.streaming.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.OperatorFactory

/** Event-time SESSION window aggregate as a topology factory — the third
  * window kind beside [[WindowedSum]] (tumbling/sliding event time) and
  * [[Roll]] (count windows): activity bursts separated by ≥ `gap` of
  * silence collapse into one session per key (`session_window`, the
  * dynamic-gap analogue of rxsci `time_split`; batch twin:
  * `DataOps.timeSplit`, oracled as q_session).
  *
  * Config keys: `session_gap` (default `5 minutes`), `timestamp_col`
  * (default `ts`), `value_col` (default `value`), optional `key_col`.
  * The source topic declares event time + lateness (`timestamp_col` +
  * `watermark` in its TopicSpec) exactly like WindowedSum, so in stream
  * mode sessions finalize and emit in append mode once the watermark
  * passes their close. */
object SessionOp extends OperatorFactory {
  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val gap = config.getOrElse("session_gap", "5 minutes").toString
    val tsCol = config.getOrElse("timestamp_col", "ts").toString
    val valueCol = config.getOrElse("value_col", "value").toString
    val keyCol = config.get("key_col").map(_.toString)
    val keyed = keyCol.map(k => Seq(col(k))).getOrElse(Seq.empty)
    val out = sources.head
      .groupBy(session_window(col(tsCol), gap).as("win") +: keyed: _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
      .select(keyed ++ Seq(col("win.start").as("session_start"),
        col("win.end").as("session_end"), col("n"),
        col("sum_value")): _*)
    Seq(out)
  }
}
