package graft.streaming.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

import graft.llm.Url
import graft.streaming.OperatorFactory

/** Streaming per-domain admission cap — the ingest-time face of
  * [[graft.llm.Url.domainCap]]: keyed by registered domain, the state is
  * one admitted-count per domain, and a document is admitted iff its
  * domain has admitted fewer than `k` so far. The crawl-frontier
  * throttle: batch `domainCap` re-ranks yesterday's corpus by quality;
  * this gate stops a boilerplate domain from flooding TODAY'S stream in
  * the first place.
  *
  * Admission is arrival-order (first k win), deterministic given batch
  * composition: rows sort by (event time, id) within each micro-batch
  * group (the [[TransitionOp]] convention) and the count chains across
  * batches through the state. State is one long per domain ever seen —
  * 16 bytes per domain, unbounded only in |domains| (the web has ~10⁸;
  * a counter table this size is the cheapest state in the pipeline), so
  * no eviction horizon is taken by default; set `lateness` to evict
  * idle domains (re-opening their budget) when the stream is windowed
  * anyway.
  *
  * Config: `k` (per-domain cap, default 1000), `url_col` ("url"),
  * `id_col` ("doc_id"), `timestamp_col` ("ts"), `lateness` ("" = keep
  * state forever). Output: (domain, doc_id, ts, admit_rank) in append
  * mode — join back on doc_id for payload columns (the admitted frame
  * is the small side).
  *
  * Batch-only `quality_col`: rank each domain's k winners by this
  * column (desc, ties to low id) instead of arrival — the
  * [[Url.domainCap]] re-rank; output (domain, doc_id, score, rank).
  */
object DomainCapOp extends OperatorFactory {

  case class In(dom: String, id: Long, ts: java.sql.Timestamp)
  case class Admit(domain: String, doc_id: Long,
                   ts: java.sql.Timestamp, admit_rank: Long)

  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val df = sources.head
    val k = config.getOrElse("k", 1000).toString.toInt
    require(k >= 1, s"DomainCapOp: k must be >= 1: $k")
    val urlCol = config.getOrElse("url_col", "url").toString
    val idCol = config.getOrElse("id_col", "doc_id").toString
    val tsCol = config.getOrElse("timestamp_col", "ts").toString
    val lateness = config.getOrElse("lateness", "").toString
    val streaming = df.isStreaming
    // `quality_col`: BATCH sources rank each domain's k winners by this
    // column (desc, ties to low id) via [[Url.domainCap]] — the
    // RefinedWeb re-rank over a bounded corpus (quality needs the whole
    // day's candidates; a stream can only admit by arrival, so setting
    // it on a stream source is a config error, rejected at wiring).
    val qualityCol = config.getOrElse("quality_col", "").toString
    if (qualityCol.nonEmpty) {
      require(!streaming, "DomainCapOp: quality_col ranks within the " +
        "full corpus — batch sources only (streams admit by arrival)")
      return Seq(Url.domainCap(df, urlCol, col(idCol).cast("long"),
        col(qualityCol), k))
    }
    val spark = df.sparkSession
    import spark.implicits._

    val typed = df.select(
      Url.registeredDomain(Url.stripWww(Url.host(col(urlCol))))
        .as("dom"),
      graft.operators.Ops.refuseNull(col(idCol),
        lit(s"DomainCapOp: NULL $idCol")).cast("long").as("id"),
      col(tsCol).as("ts")).as[In]

    val func = (dom: String, rows: Iterator[In],
                state: GroupState[Long]) => {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val sorted = rows.toArray.sortBy(e => (e.ts.getTime, e.id))
        if (sorted.isEmpty) Iterator.empty
        else {
          var c = state.getOption.getOrElse(0L)
          val out = Array.newBuilder[Admit]
          sorted.foreach { e =>
            if (c < k) { c += 1; out += Admit(dom, e.id, e.ts, c) }
          }
          state.update(c)
          if (streaming && lateness.nonEmpty) {
            state.setTimeoutTimestamp(
              math.max(sorted.last.ts.getTime,
                state.getCurrentWatermarkMs()) +
                NearDupOp.parseMs(lateness))
          }
          out.result().iterator
        }
      }
    }
    val timeout =
      if (lateness.nonEmpty) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    Seq(typed.groupByKey(_.dom)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(func)
      .toDF())
  }
}
