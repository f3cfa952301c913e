package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Corpus-level text statistics beyond the per-row [[Text]] metrics —
  * the repetition-family quality signals of large-scale pre-training
  * filters (the "fraction of the doc that is its most common token /
  * duplicated content" family popularized by the Gopher/MassiveText
  * filtering rules; reference precedent for quality gating:
  * config.sample.processor.yml operator chains).
  *
  * Relational formulation on purpose: explode → two-level aggregate is
  * shuffle-linear with map-side combine (the (id, token) partial counts
  * collapse before the exchange), distributed across any corpus size,
  * and exactly reproducible by any SQL engine (oracled as
  * q_repetition). */
object TextStats {

  /** Per-document token-repetition signals:
    * n_tokens (with multiplicity), n_distinct, top_freq (count of the
    * modal token), rep_ratio = top_freq / n_tokens, distinct_ratio =
    * n_distinct / n_tokens. High rep_ratio / low distinct_ratio flags
    * boilerplate and keyword-stuffed documents. Docs with no tokens
    * yield no row (no tokens to measure — filter upstream if empty docs
    * must be flagged). */
  def repetition(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.select(col(idCol), explode(Text.tokens(col(textCol))).as("__tok"))
      .groupBy(idCol, "__tok").agg(count(lit(1)).as("__cnt"))
      .groupBy(idCol).agg(
        sum("__cnt").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max("__cnt").as("top_freq"))
      .withColumn("rep_ratio",
        col("top_freq").cast("double") / col("n_tokens"))
      .withColumn("distinct_ratio",
        col("n_distinct").cast("double") / col("n_tokens"))
}
