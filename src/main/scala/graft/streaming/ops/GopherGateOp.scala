package graft.streaming.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.llm.TextStats
import graft.streaming.OperatorFactory

/** Gopher quality gate as a topology factory — the rule-based document
  * filter (Rae et al., "Scaling Language Models: ... Gopher", 2021,
  * §A1.1) every crawl-ingest topology runs before spending anything
  * downstream: token-count bounds, mean-token-length band, alpha-token
  * fraction floor, symbol-line ceiling. The YAML face of
  * [[TextStats.gopherKeepOf]], which is the exact predicate the oracled
  * q_c4_clean / q_pipeline_crawl queries pin.
  *
  * Stateless (a pure filter over built-in HOF expressions — no UDF, no
  * state), so it runs unchanged on batch and stream sources, composes
  * with `config_topic` dynamic reconfig, and stays inside whole-stage
  * codegen at any scale.
  *
  * Config: `text_col` (default "text"); `n_tokens_col` ("" = off) —
  * name of an appended token-count column (the gate tokenizes anyway;
  * emitting the count is free and downstream budget/packing stages
  * need it). Rows otherwise pass through unchanged (the gate drops,
  * never rewrites — rewriting is C4Clean's job). */
object GopherGateOp extends OperatorFactory {
  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val textCol = config.getOrElse("text_col", "text").toString
    val nTokCol = config.getOrElse("n_tokens_col", "").toString
    val df = sources.head
    if (nTokCol.isEmpty)
      Seq(df.filter(TextStats.gopherKeepOf(Text.tokens(col(textCol)))))
    else {
      // tokenize ONCE through a materialized projection (the
      // lambda-body discipline: an inline Text.tokens in both the
      // filter and the count would run the array build twice per row)
      Seq(df.withColumn("__gg_ts", Text.tokens(col(textCol)))
        .filter(TextStats.gopherKeepOf(col("__gg_ts")))
        .withColumn(nTokCol, Text.nTokensOf(col("__gg_ts")))
        .drop("__gg_ts"))
    }
  }
}
