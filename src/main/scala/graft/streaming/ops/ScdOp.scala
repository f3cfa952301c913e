package graft.streaming.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

import graft.streaming.OperatorFactory

/** Streaming SCD2 interval builder — the online face of
  * [[graft.operators.Scd.scd2]]: keyed by `key_col`, the state is the
  * key's OPEN run (state value, start, event count); a state change
  * emits the closed interval `[effective_from, effective_to)` and opens
  * a new run. The open run emits as the `is_current` row when the key
  * goes idle past `lateness` (event-time timeout) — so the reference
  * table a downstream as-of join consumes is append-only: closed
  * history arrives as it closes, current rows arrive on idle keys.
  *
  * Ordering contract (the [[TransitionOp]] convention): rows sort by
  * (ts, tie) WITHIN each micro-batch group and chain across batches
  * through the state; with per-key event-time monotone across batches
  * (the watermark bound) the closed intervals equal the batch twin
  * exactly — pinned by StreamingSpec. NULL is a legal state value
  * (null-safe run comparison, same as the batch twin's `<=>`).
  *
  * Config: `key_col` (user_id), `state_col` (event_type),
  * `timestamp_col` (ts), `tie_col` (event_id), `lateness` (10 minutes).
  * Output: (key, state, effective_from, effective_to, is_current,
  * n_events) in append mode.
  */
object ScdOp extends OperatorFactory {

  case class Ev(k: Long, ts: java.sql.Timestamp, tie: Long,
                st: Option[String])
  case class Run(st: Option[String], fromUs: Long, n: Long)
  case class Interval(key: Long, state: Option[String],
                      effective_from: java.sql.Timestamp,
                      effective_to: Option[java.sql.Timestamp],
                      is_current: Boolean, n_events: Long)

  // state carries epoch MICROS, not Timestamp.getTime millis — the
  // shared precision-exact pair (see TimeCodec scaladoc for the
  // q_scd_dag incident this encodes)
  private def usOf(ts: java.sql.Timestamp): Long = TimeCodec.usOf(ts)
  private def tsOf(us: Long): java.sql.Timestamp = TimeCodec.tsOf(us)

  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val df = sources.head
    val keyCol = config.getOrElse("key_col", "user_id").toString
    val stCol = config.getOrElse("state_col", "event_type").toString
    val tsCol = config.getOrElse("timestamp_col", "ts").toString
    val tieCol = config.getOrElse("tie_col", "event_id").toString
    val latenessMs = NearDupOp.parseMs(
      config.getOrElse("lateness", "10 minutes").toString)
    val streaming = df.isStreaming
    val spark = df.sparkSession
    import spark.implicits._

    // ts passes through UNCAST (watermark tag survival — the
    // TransitionOp rule)
    val typed = df.select(graft.operators.Ops.refuseNull(col(keyCol),
      lit(s"ScdOp: NULL $keyCol")).cast("long").as("k"),
      col(tsCol).as("ts"), col(tieCol).cast("long").as("tie"),
      col(stCol).cast("string").as("st")).as[Ev]

    val func = (key: Long, rows: Iterator[Ev], state: GroupState[Run]) => {
      if (state.hasTimedOut) {
        // idle key: flush the open run as the current row
        val r = state.get
        state.remove()
        Iterator.single(Interval(key, r.st, tsOf(r.fromUs), None,
          is_current = true, r.n))
      } else {
        val sorted = rows.toArray.sortBy(e => (usOf(e.ts), e.tie))
        if (sorted.isEmpty) Iterator.empty
        else {
          val out = Array.newBuilder[Interval]
          var run = state.getOption
          sorted.foreach { e =>
            run match {
              case Some(r) if r.st == e.st =>
                run = Some(r.copy(n = r.n + 1))
              case Some(r) =>
                out += Interval(key, r.st, tsOf(r.fromUs),
                  Some(e.ts), is_current = false, r.n)
                run = Some(Run(e.st, usOf(e.ts), 1L))
              case None =>
                run = Some(Run(e.st, usOf(e.ts), 1L))
            }
          }
          state.update(run.get)
          if (streaming) {
            state.setTimeoutTimestamp(
              math.max(sorted.last.ts.getTime,
                state.getCurrentWatermarkMs()) + latenessMs)
          } else {
            // batch mode: no timeout will fire — the open run IS final
            out += Interval(key, run.get.st, tsOf(run.get.fromUs), None,
              is_current = true, run.get.n)
            state.remove()
          }
          out.result().iterator
        }
      }
    }
    Seq(typed.groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout)(func)
      .toDF())
  }
}
