package graft.streaming.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

import graft.streaming.OperatorFactory

/** Streaming per-user transition-edge extraction — the online face of
  * [[graft.llm.Graph.transitionEdges]]: keyed by user, the state is the
  * user's last (event time, type), and every arriving event emits one
  * `(src = previous type, dst = type, ts)` edge row. Downstream
  * windowed counts / [[graft.llm.Graph.transitionCounts]] /
  * [[graft.llm.Graph.pageRank]] consume the edge stream; state is one
  * (long, string) per ACTIVE user, evicted by event-time timeout after
  * `lateness` beyond the user's newest event.
  *
  * Ordering contract: rows are sorted by (ts, type) WITHIN each
  * micro-batch group (the buffer is the user's rows in one trigger —
  * bounded by trigger size, the [[NearDupOp]] in-batch convention), and
  * chained across batches through the state. When event time is
  * monotone per user across batches (the watermark bound), the emitted
  * edges equal the batch twin exactly — pinned by StreamingSpec. An
  * event that jumps BACKWARD across a batch boundary emits the
  * transition as-delivered (the online approximation); the batch twin
  * is the exact replay.
  *
  * Config: `user_col` (user_id), `type_col` (event_type),
  * `timestamp_col` (ts), `lateness` (10 minutes — state eviction
  * horizon). Output: (src string, dst string, ts) in append mode.
  */
object TransitionOp extends OperatorFactory {

  case class Ev(u: Long, ts: java.sql.Timestamp, tp: String)
  case class Last(lastTs: Long, lastType: String)
  case class Edge(src: String, dst: String, ts: java.sql.Timestamp)

  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val df = sources.head
    val userCol = config.getOrElse("user_col", "user_id").toString
    val typeCol = config.getOrElse("type_col", "event_type").toString
    val tsCol = config.getOrElse("timestamp_col", "ts").toString
    val lateness = config.getOrElse("lateness", "10 minutes").toString
    val latenessMs = NearDupOp.parseMs(lateness)
    val streaming = df.isStreaming
    val spark = df.sparkSession
    import spark.implicits._

    // the timestamp column must pass through UNCAST: a cast would mint
    // a fresh attribute without the watermark tag and fail the
    // event-time-timeout analysis check
    val typed = df.select(graft.operators.Ops.refuseNull(col(userCol),
      lit(s"TransitionOp: NULL $userCol")).cast("long").as("u"),
      col(tsCol).as("ts"),
      col(typeCol).cast("string").as("tp")).as[Ev]

    val func = (_: Long, rows: Iterator[Ev], state: GroupState[Last]) => {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val sorted = rows.toArray.sortBy(e => (e.ts.getTime, e.tp))
        if (sorted.isEmpty) Iterator.empty
        else {
          val out = Array.newBuilder[Edge]
          var last = state.getOption
          sorted.foreach { e =>
            last.foreach(s => out += Edge(s.lastType, e.tp, e.ts))
            last = Some(Last(e.ts.getTime, e.tp))
          }
          state.update(last.get)
          if (streaming) {
            state.setTimeoutTimestamp(
              math.max(sorted.last.ts.getTime,
                state.getCurrentWatermarkMs()) + latenessMs)
          }
          out.result().iterator
        }
      }
    }
    Seq(typed.groupByKey(_.u)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout)(func)
      .toDF())
  }
}
