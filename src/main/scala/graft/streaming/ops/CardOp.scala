package graft.streaming.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.streaming.OperatorFactory

/** Streaming dataset card — the ingest-time face of
  * [[graft.llm.TextStats.corpusCard]]: per finalized event-time window
  * and per `dims` cell, the volumes an operator watches to catch a bad
  * crawl day AS IT ARRIVES — document count, token and char volumes,
  * Gopher-gate pass count, and a distinct-content estimate. One
  * watermarked windowed aggregate: bounded state, append-mode
  * finalization, no per-doc output.
  *
  * Divergence from the batch card, by design: the distinct-content
  * count is Spark's HLL++ `approx_count_distinct` over the content
  * fingerprint (a windowed EXACT distinct would chain a second
  * stateful op per cell; the batch card stays the exact audit), so the
  * column is named `approx_distinct` — treat `dup_frac` derived from
  * it as an estimate. No ROLLUP either: subtotals of a finalized
  * window are a trivial batch re-aggregation of this op's own sink.
  *
  * Config: `dims` ("lang,source" — comma-separated source columns),
  * `text_col` ("text"), `timestamp_col` ("ts"), `window` ("1 hour"),
  * `lateness` ("10 minutes"). Output: (window_start, <dims>..., n_docs,
  * n_tokens, n_chars, n_gopher_pass, approx_distinct). Batch sources
  * produce the same shape (windows all finalize). */
object CardOp extends OperatorFactory {
  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val dims = config.getOrElse("dims", "lang,source").toString
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val textCol = config.getOrElse("text_col", "text").toString
    val tsCol = config.getOrElse("timestamp_col", "ts").toString
    val win = config.getOrElse("window", "1 hour").toString
    val lateness = config.getOrElse("lateness", "10 minutes").toString
    require(dims.nonEmpty, "dims must name at least one column")

    val df = sources.head
    val staged0 = df.select(Seq(col(tsCol).as("__ts")) ++
      dims.map(col) ++ Seq(
        Text.nTokensOf(Text.tokens(col(textCol))).cast("long")
          .as("__ntok"),
        // fused gate kernel (n_tokens-or-−1) replaces the HOF
        // gopherKeepOf pass — same decision, one byte scan
        graft.functions.GopherAdmit(col(textCol)).as("__ga"),
        Text.fingerprint(col(textCol)).as("__fp"),
        length(col(textCol)).cast("long").as("__nc")): _*)
    val staged = if (df.isStreaming)
      staged0.withWatermark("__ts", lateness) else staged0
    val out = staged
      .groupBy(window(col("__ts"), win).as("__win") +: dims.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__ntok")).as("n_tokens"),
        sum(col("__nc")).as("n_chars"),
        sum(when(col("__ga") >= 0L, 1L)
          .otherwise(0L)).as("n_gopher_pass"),
        approx_count_distinct(col("__fp")).as("approx_distinct"))
      .select(Seq(col("__win.start").as("window_start")) ++
        dims.map(col) ++ Seq(col("n_docs"), col("n_tokens"),
          col("n_chars"), col("n_gopher_pass"),
          col("approx_distinct")): _*)
    Seq(out)
  }
}
