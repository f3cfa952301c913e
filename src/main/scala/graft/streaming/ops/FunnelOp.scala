package graft.streaming.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

import graft.streaming.OperatorFactory

/** Streaming ordered funnel — the online face of
  * [[graft.operators.Funnel.funnel]]: a per-user state machine
  * (furthest step, its event time, the step-1 match time) advances on
  * each arriving event, and every ADVANCE emits one append-mode row
  * `(user_id, depth, ts)` — a user's depth rows are monotone and each
  * is emitted exactly once, so downstream windowed counts build the
  * live conversion curve (users at depth ≥ k = count of depth-k rows)
  * and `depth = |steps|` rows are the conversion events themselves.
  *
  * Matching is the batch twin's greedy-earliest contract: only a
  * `steps.head` event starts the funnel, step k+1 must be STRICTLY
  * after the matched step-k event, and `within_seconds` (optional)
  * bounds every later step to the step-1 match. Rows are sorted by
  * (ts, type) within each micro-batch group and chained across batches
  * through state, so with per-user monotone event time across batches
  * the advance rows equal the batch twin exactly (StreamingSpec); a
  * cross-batch backward jump is matched as-delivered — the documented
  * online approximation, [[TransitionOp]]'s contract.
  *
  * State: one (int, long, long) per ACTIVE user, evicted by event-time
  * timeout `lateness` past the user's newest event — the funnel
  * horizon: a user silent that long restarts from scratch (and only at
  * step 1). A completed user's state is kept (further events ignored)
  * until the horizon passes, so re-deliveries can't double-convert.
  *
  * Config: `steps` (REQUIRED — YAML list or comma string),
  * `user_col` (user_id), `type_col` (event_type), `timestamp_col`
  * (ts), `lateness` (1 hour), `within_seconds` (optional conversion
  * window).
  */
object FunnelOp extends OperatorFactory {

  case class Ev(u: Long, ts: java.sql.Timestamp, tp: String)
  case class FState(depth: Int, prevTs: Long, t1: Long)
  case class Advance(user_id: Long, depth: Int, ts: java.sql.Timestamp)

  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val df = sources.head
    val steps: IndexedSeq[String] = (config.getOrElse("steps", null) match {
      case null => throw new IllegalArgumentException(
        "FunnelOp: config key 'steps' is required")
      case l: java.util.List[_] =>
        scala.jdk.CollectionConverters.ListHasAsScala(l).asScala
          .map(_.toString).toIndexedSeq
      case l: Seq[_] => l.map(_.toString).toIndexedSeq
      case s => s.toString.split(",").map(_.trim).filter(_.nonEmpty)
        .toIndexedSeq
    })
    require(steps.nonEmpty, "FunnelOp: steps must be non-empty")
    require(steps.distinct.size == steps.size,
      "FunnelOp: repeated step types are ambiguous")
    val k = steps.size
    val userCol = config.getOrElse("user_col", "user_id").toString
    val typeCol = config.getOrElse("type_col", "event_type").toString
    val tsCol = config.getOrElse("timestamp_col", "ts").toString
    val latenessMs =
      NearDupOp.parseMs(config.getOrElse("lateness", "1 hour").toString)
    val withinMs = config.get("within_seconds")
      .map(_.toString.toLong * 1000L)
    val streaming = df.isStreaming
    val spark = df.sparkSession
    import spark.implicits._

    // ts passes through UNCAST — the TransitionOp watermark-tag rule
    val typed = df.select(graft.operators.Ops.refuseNull(col(userCol),
      lit(s"FunnelOp: NULL $userCol")).cast("long").as("u"),
      col(tsCol).as("ts"),
      col(typeCol).cast("string").as("tp")).as[Ev]

    val func = (u: Long, rows: Iterator[Ev],
                state: GroupState[FState]) => {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val sorted = rows.toArray.sortBy(e => (e.ts.getTime, e.tp))
        if (sorted.isEmpty) Iterator.empty
        else {
          val out = Array.newBuilder[Advance]
          var st = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime
            st match {
              case None if e.tp == steps.head =>
                st = Some(FState(1, t, t))
                out += Advance(u, 1, e.ts)
              case Some(s) if s.depth < k && e.tp == steps(s.depth) &&
                  t > s.prevTs &&
                  withinMs.forall(w => t <= s.t1 + w) =>
                st = Some(FState(s.depth + 1, t, s.t1))
                out += Advance(u, s.depth + 1, e.ts)
              case _ => ()
            }
          }
          st.foreach(state.update)
          // timeout needs existing state: a user whose rows never
          // started the funnel holds no state to evict
          if (streaming && state.exists) {
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
