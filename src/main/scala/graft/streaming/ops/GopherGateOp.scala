package graft.streaming.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GopherAdmit
import graft.streaming.OperatorFactory

/** Gopher quality gate as a topology factory — the rule-based document
  * filter (Rae et al., "Scaling Language Models: ... Gopher", 2021,
  * §A1.1) every crawl-ingest topology runs before spending anything
  * downstream: token-count bounds, mean-token-length band, alpha-token
  * fraction floor, symbol-token ceiling, stopword floor. Same decision
  * as `TextStats.gopherKeepOf(Text.tokens(text))`, which the oracled
  * q_c4_clean / q_pipeline_crawl queries pin — equivalence itself is
  * pinned corpus-wide by GopherGateSpec.
  *
  * Executes as ONE native codegen scalar per row,
  * [[graft.functions.GopherAdmit]] (n_tokens if admitted, −1 if
  * dropped). The earlier HOF formulation ("tokenize once through a
  * materialized projection") was undone by the optimizer:
  * `PushPredicateThroughNonJoin` inlines projected aliases into pushed
  * predicates cost-blind, so the optimized plan re-instantiated the
  * interpreted `tokens(text)` array build TWELVE times per row (round-8
  * verdict finding #1; the plan shape is pinned in PlanAuditSpec). The
  * fused scalar caps it at one kernel evaluation per dropped row, two
  * per admitted row, zero array materializations.
  *
  * Stateless (a pure filter — no UDF, no state), so it runs unchanged
  * on batch and stream sources, composes with `config_topic` dynamic
  * reconfig, and stays inside whole-stage codegen at any scale.
  *
  * Config: `text_col` (default "text"); `n_tokens_col` ("" = off) —
  * name of an appended token-count column (the kernel computes it
  * anyway; downstream budget/packing stages need it). Rows otherwise
  * pass through unchanged (the gate drops, never rewrites — rewriting
  * is C4Clean's job). */
object GopherGateOp extends OperatorFactory {
  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val textCol = config.getOrElse("text_col", "text").toString
    val nTokCol = config.getOrElse("n_tokens_col", "").toString
    val df = sources.head
    if (nTokCol.isEmpty)
      Seq(df.filter(GopherAdmit(col(textCol)) >= 0L))
    else
      Seq(df.withColumn(nTokCol, GopherAdmit(col(textCol)))
        .filter(col(nTokCol) >= 0L))
  }
}
