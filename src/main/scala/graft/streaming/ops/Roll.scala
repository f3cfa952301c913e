package graft.streaming.ops

import org.apache.spark.sql.DataFrame

import graft.streaming.{OperatorFactory, StreamOps}

/** Count-window roll+mean as a topology factory (reference rxsci
  * `rs.data.roll` + `rs.math.mean(reduce=True)` wired from YAML,
  * reference README.rst:79-96): declare the key/sequence/value columns
  * and window geometry in the `config:` block and point the operator at
  * any topic — no typed hand-mapping.
  *
  * Config keys (flat, namespaced): `roll_key`, `roll_seq`, `roll_value`,
  * `roll_window`, `roll_stride` (stride defaults to the window —
  * tumbling); `roll_order` — `seq` (default: rows consume in sequence
  * order per key) or `event_time` (rows consume by `(roll_ts, roll_seq)`
  * WITHIN each micro-batch — for transports that deliver within-batch
  * out of order; cross-batch reordering is out of scope, see
  * [[StreamOps.rollStreamEventTime]]), with `roll_ts` naming the
  * event-time column (timestamp or numeric). Works on a stream source
  * (stateful flatMapGroupsWithState engine). Do NOT combine with
  * `config_topic`: the dynamic path re-wires the factory per
  * micro-batch over bounded batch frames, which would reset the
  * count-window state every batch — window geometry changes need a
  * restart (state is keyed to it anyway). */
object Roll extends OperatorFactory {
  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    def str(k: String, default: String) =
      config.getOrElse(k, default).toString
    val window = str("roll_window", "2").toInt
    val stride = str("roll_stride", window.toString).toInt
    val order = str("roll_order", "seq")
    val tsCol = order match {
      case "seq" => ""
      case "event_time" =>
        val c = str("roll_ts", "")
        require(c.nonEmpty,
          "roll_order: event_time needs roll_ts (the event-time column)")
        c
      case other => throw new IllegalArgumentException(
        s"roll_order must be 'seq' or 'event_time', got '$other'")
    }
    Seq(StreamOps.rollStreamRows(sources.head,
      keyCol = str("roll_key", "key"),
      seqCol = str("roll_seq", "seq"),
      valueCol = str("roll_value", "value"),
      window = window, stride = stride, orderByTsCol = tsCol))
  }
}
