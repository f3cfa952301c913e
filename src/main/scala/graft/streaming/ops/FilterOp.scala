package graft.streaming.ops

import org.apache.spark.sql.DataFrame

import graft.streaming.OperatorFactory

/** Generic row filter as a topology factory: declare any SQL boolean
  * expression in the `config:` block and gate a topic with it — the
  * YAML face of `rx.operators.filter` (reference `rx.pipe(ops.filter)`
  * chains in config.sample.processor.yml) and the everyday cleaning
  * gate of an ingest topology (quality thresholds, language gates,
  * length cuts).
  *
  * Config key: `filter_expr` — a Spark SQL boolean expression over the
  * source's columns (e.g. `"value > 0 AND lang = 'en'"`). The
  * expression compiles into the streaming plan (predicate pushdown and
  * codegen apply as usual); stateless, so it composes with
  * `config_topic` dynamic reconfig — a new expression takes effect at
  * the next micro-batch without restart. */
object FilterOp extends OperatorFactory {
  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val expr = config.getOrElse("filter_expr",
      sys.error("FilterOp needs config key filter_expr")).toString
    Seq(sources.head.filter(expr))
  }
}
