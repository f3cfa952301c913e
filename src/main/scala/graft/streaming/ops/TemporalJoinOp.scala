package graft.streaming.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

import graft.streaming.OperatorFactory

/** Streaming TEMPORAL (as-of) join — the online face of
  * [[graft.operators.AsOfJoin]]: each left event is enriched with the
  * newest right-side reference value whose event time is ≤ the event's
  * own (per key) — "the exchange rate at the moment of the trade", "the
  * model version live when the doc arrived". [[JoinOp]] pairs events
  * within a symmetric band; this op carries a slowly-changing reference
  * FORWARD, which is what `with_latest_from` (reference
  * makinage/serve/serve.py:141) approximates with processing-time
  * latest — here the lookup is exact in EVENT time, independent of
  * arrival order across micro-batches.
  *
  * Exactness contract: a left event at ts is emitted only once the
  * watermark has passed ts — any right update that could still change
  * its answer (rts ≤ ts) would by then be later than the watermark, so
  * under the watermark bound the output EQUALS the batch
  * [[graft.operators.AsOfJoin.asOf]] row-for-row (TemporalJoinSpec
  * parity pin). Ties on right ts resolve to the largest tiebreak, the
  * batch op's rule.
  *
  * State per key is bounded: pending lefts live only inside the
  * watermark horizon, and the right history keeps the in-horizon
  * updates plus ONE carry (the newest update older than every pending
  * need — the as-of answer for future lefts). An idle key is evicted
  * `lateness` after its newest event (pending lefts flush first); a
  * left arriving after its key's eviction re-starts with no carry —
  * the bounded-state tradeoff, same as [[TransitionOp]]'s horizon.
  *
  * Delivery: at-least-once sources that redeliver a left event emit its
  * enriched row once per delivery (append mode has no retraction);
  * dedupe ids upstream (`ops.DedupOp`) where exactly-once output
  * matters — the [[NearDupOp]] convention.
  *
  * Config: `key_col` ("k"), `timestamp_col` ("ts" — shared by both
  * sources), `id_col` ("id", left), `value_col` ("v", right; carried as
  * string for type-generality), `tie_col` (optional right tiebreak,
  * defaults to the value), `lateness` ("10 minutes"). Sources:
  * (left events, right updates). Output: (id, k, ts, r_ts, r_value) in
  * append mode; unmatched lefts keep NULL rights (left-outer, the batch
  * op's semantics). */
object TemporalJoinOp extends OperatorFactory {

  case class In(k: String, t: Long, ts: java.sql.Timestamp, side: Int,
                id: Long, v: String, tie: Long)
  case class RightRec(t: Long, tie: Long, v: String)
  case class LeftRec(t: Long, id: Long)
  case class TJState(lefts: Seq[LeftRec], rights: Seq[RightRec])
  case class Out(id: Long, k: String, ts: java.sql.Timestamp,
                 r_ts: Option[java.sql.Timestamp], r_value: Option[String])

  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    require(sources.size == 2,
      s"TemporalJoinOp needs exactly 2 sources, got ${sources.size}")
    val keyCol = config.getOrElse("key_col", "k").toString
    val tsCol = config.getOrElse("timestamp_col", "ts").toString
    val idCol = config.getOrElse("id_col", "id").toString
    val valueCol = config.getOrElse("value_col", "v").toString
    val tieCol = config.getOrElse("tie_col", valueCol).toString
    val lateness = config.getOrElse("lateness", "10 minutes").toString
    val latenessMs = NearDupOp.parseMs(lateness)
    val spark = sources.head.sparkSession
    val streaming = sources.exists(_.isStreaming)
    import spark.implicits._

    // ts passes through UNCAST so the watermark tag survives to the
    // event-time-timeout analysis (the TransitionOp rule); `t` is the
    // MICROS twin the state machine sorts on (millis would truncate
    // parquet TIMESTAMP precision and shift every reconstructed r_ts)
    // NULL key/ts/id would NPE the non-nullable encoder fields deep in
    // the state machine — refuse them at the plan edge with context
    def refuse(c: org.apache.spark.sql.Column, what: String) =
      when(c.isNull, raise_error(lit(s"TemporalJoinOp: NULL $what")))
        .otherwise(c)
    val l = sources.head.select(
      refuse(col(keyCol).cast("string"), keyCol).as("k"),
      refuse(unix_micros(col(tsCol)), tsCol).as("t"),
      col(tsCol).as("ts"), lit(1).as("side"),
      refuse(col(idCol).cast("long"), idCol).as("id"),
      lit(null).cast("string").as("v"), lit(0L).as("tie"))
    // a non-numeric tie column casts to NULL — fold to 0 rather than
    // NPE the non-nullable encoder field (ties then resolve by order of
    // state merge; declare a numeric tie_col for full determinism)
    val r = sources(1).select(
      refuse(col(keyCol).cast("string"), keyCol).as("k"),
      refuse(unix_micros(col(tsCol)), tsCol).as("t"),
      col(tsCol).as("ts"), lit(0).as("side"),
      lit(0L).as("id"), col(valueCol).cast("string").as("v"),
      coalesce(col(tieCol).cast("long"), lit(0L)).as("tie"))
    val unioned = l.unionByName(r).as[In]

    // micros → Timestamp without precision loss — the shared pair
    // (TimeCodec scaladoc records the truncation incident)
    def tsOf(us: Long): java.sql.Timestamp = TimeCodec.tsOf(us)

    val func = (key: String, rows: Iterator[In],
                state: GroupState[TJState]) => {
      // watermark is millis; state times are micros
      val wmUs = if (streaming) state.getCurrentWatermarkMs() * 1000L
        else Long.MaxValue
      val prior = state.getOption.getOrElse(TJState(Nil, Nil))
      val fresh = rows.toArray
      var lefts = (prior.lefts ++ fresh.filter(_.side == 1)
        .map(i => LeftRec(i.t, i.id))).sortBy(lr => (lr.t, lr.id))
      var rights = (prior.rights ++ fresh.filter(_.side == 0)
        .map(i => RightRec(i.t, i.tie, i.v))).sortBy(rr => (rr.t, rr.tie))
      // finalize every left the watermark has passed (or all, in batch /
      // on timeout — the timeout fired past every buffered event + bound)
      val cut = if (state.hasTimedOut) Long.MaxValue else wmUs
      val (done, pending) = lefts.partition(_.t < cut)
      val out = done.map { lr =>
        val m = rights.takeWhile(_.t <= lr.t).lastOption
        Out(lr.id, key, tsOf(lr.t), m.map(x => tsOf(x.t)), m.map(_.v))
      }
      lefts = pending
      // evict rights: keep the in-need ones + one carry below the need
      val need = (lefts.map(_.t) :+ wmUs).min
      val (old, live) = rights.partition(_.t <= need)
      rights = old.takeRight(1) ++ live
      if (state.hasTimedOut && lefts.isEmpty) state.remove()
      else {
        state.update(TJState(lefts, rights))
        if (streaming) {
          val newestMs = ((fresh.map(_.t) :+ wmUs).max) / 1000L
          state.setTimeoutTimestamp(
            math.max(newestMs, state.getCurrentWatermarkMs()) + latenessMs)
        }
      }
      out.iterator
    }

    Seq(unioned.groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout)(func)
      .toDF())
  }
}
