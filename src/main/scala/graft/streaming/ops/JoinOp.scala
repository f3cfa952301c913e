package graft.streaming.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.OperatorFactory

/** Stream-stream interval join as a topology factory — the event
  * CORRELATION operator (purchase ↔ the views that preceded it, request ↔
  * response, doc ↔ its annotations): rows from two streams with the same
  * key whose event times fall within `time_bound` of each other join into
  * one row. The reference's dataflow vocabulary reaches pairing through
  * `combine_latest`/`with_latest_from` (makinage/sample/processor.py:9,
  * makinage/serve/serve.py:131 — latest-snapshot semantics, covered by
  * `Ops.withLatest`); a TIME-ALIGNED pairing of two event streams is the
  * capability Structured Streaming adds natively, so it belongs in the
  * YAML surface.
  *
  * Spark executes this as a watermark-bounded stateful join: each side
  * buffers only rows younger than watermark + bound (state is evicted as
  * the watermark advances), which is exactly the 100 TB-safe shape — no
  * unbounded buffering, state proportional to the in-flight window. Both
  * source topics must declare `timestamp_col` + `watermark` in their
  * TopicSpec (the topology wires watermarks at the source); the
  * time-range condition on the two event-time columns is what lets Spark
  * prove state cleanup. `left_outer` additionally emits unmatched left
  * rows (NULL right columns) once the watermark passes their bound.
  *
  * Right-side columns are prefixed (`right_prefix`, default `r_`) so the
  * joined row has unambiguous names — the watermark metadata rides the
  * rename. In BATCH mode the same plan is an ordinary interval join
  * (oracled as q_interval_join); batch corpora with hot keys should
  * prefer [[graft.operators.RangeJoin.timeBand]], whose (key, bucket)
  * shuffle bounds per-task work under key skew.
  *
  * Config: `key_col` (required), `timestamp_col` ("ts"), `time_bound`
  * ("10 minutes"), `join_type` ("inner" | "left_outer"),
  * `right_prefix` ("r_"). */
object JoinOp extends OperatorFactory {
  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    require(sources.size == 2,
      s"JoinOp needs exactly 2 sources, got ${sources.size}")
    val keyCol = config.getOrElse("key_col",
      throw new IllegalArgumentException("JoinOp: key_col is required"))
      .toString
    val tsCol = config.getOrElse("timestamp_col", "ts").toString
    val bound = config.getOrElse("time_bound", "10 minutes").toString
    val prefix = config.getOrElse("right_prefix", "r_").toString
    val joinType = config.getOrElse("join_type", "inner").toString
    require(Seq("inner", "left_outer").contains(joinType),
      s"JoinOp: join_type must be inner or left_outer: $joinType")
    val left = sources.head
    val clash = left.columns.toSet
      .intersect(sources(1).columns.map(prefix + _).toSet)
    require(clash.isEmpty,
      s"JoinOp: left columns collide with prefixed right columns " +
        s"($clash) — set a different right_prefix")
    val right = sources(1).columns.foldLeft(sources(1)) {
      (d, c) => d.withColumnRenamed(c, prefix + c)
    }
    val iv = expr(s"interval $bound")
    val cond = col(keyCol) === col(prefix + keyCol) &&
      col(prefix + tsCol) >= col(tsCol) - iv &&
      col(prefix + tsCol) <= col(tsCol) + iv
    Seq(left.join(right, cond, joinType).drop(prefix + keyCol))
  }
}
