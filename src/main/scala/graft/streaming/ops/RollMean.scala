package graft.streaming.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Pipe._
import graft.operators.{DataOps, MathOps}
import graft.streaming.OperatorFactory

/** The README flagship pipeline as a topology factory: count-based rolling
  * mean (reference README.rst:75-90) wired from YAML config:
  *
  * {{{
  * operators:
  *   roll_mean:
  *     factory: graft.streaming.ops.RollMean
  *     sources: [events]
  *     sinks: [means]
  * config: { window: 3, stride: 3, order_col: event_id, value_col: value }
  * }}}
  */
object RollMean extends OperatorFactory {
  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val window = config.getOrElse("window", 3).toString.toInt
    val stride = config.getOrElse("stride", window).toString.toInt
    val orderCol = config.getOrElse("order_col", "event_id").toString
    val valueCol = config.getOrElse("value_col", "value").toString
    val out = sources.head >>
      DataOps.roll(window, stride, Seq(col(orderCol))) >>
      MathOps.mean(col(valueCol))
    Seq(out)
  }
}
