package graft.streaming.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.OperatorFactory

/** Event-time tumbling window aggregate as a topology factory: counts and
  * sums `value_col` per `window` of event time. The source topic declares
  * the event-time column and lateness (`timestamp_col` + `watermark` in
  * its TopicSpec — the reference Topic's timestamp_mapper,
  * makinage/operator.py:26-73), so in stream mode the input arrives
  * already watermarked and the aggregate emits finalized windows in
  * append mode.
  */
object WindowedSum extends OperatorFactory {
  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val win = config.getOrElse("window", "1 hour").toString
    val tsCol = config.getOrElse("timestamp_col", "ts").toString
    val valueCol = config.getOrElse("value_col", "value").toString
    val out = sources.head
      .groupBy(window(col(tsCol), win).as("win"))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
      .select(col("win.start").as("window_start"), col("n"),
        col("sum_value"))
    Seq(out)
  }
}
