package graft.streaming.ops

import org.apache.spark.sql.DataFrame

import graft.streaming.OperatorFactory

/** Arbitrary-SQL topology operator — the escape hatch: a YAML-declared
  * `spark.sql` transform over the operator's source topics. The
  * reference reaches custom logic through `import_function` loading a
  * Python factory (makinage/operator.py:197); the Spark-native
  * equivalent of "bring your own transform" for relational logic is a
  * SQL string — declarative, Catalyst-optimized end to end (pushdown,
  * pruning, codegen — same as any built-in operator), and usable by
  * operators who never touch Scala. The engine's native codegen
  * expressions registered by GraftExtensions (xxhash-based signatures,
  * BPE encode, …) are available inside the SQL when the session is
  * built with the extensions.
  *
  * Sources register as temp views named by `views` (default `src0`,
  * `src1`, …). Works unchanged in batch and stream mode — a streaming
  * source registered as a view yields a streaming SQL result, with the
  * usual Structured Streaming operator constraints. View registration
  * is session-scoped: names are re-registered on every wire (dynamic
  * config re-wires replace them), so topologies should pick distinct
  * view names per SqlOp when composing several.
  *
  * Config: `sql` (required), `views` (optional YAML list of view names,
  * positionally matching `sources`). */
object SqlOp extends OperatorFactory {
  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    require(sources.nonEmpty, "SqlOp: at least one source")
    val sql = config.getOrElse("sql",
      throw new IllegalArgumentException("SqlOp: sql is required"))
      .toString
    val views: Seq[String] = config.get("views") match {
      case Some(l: java.util.List[_]) =>
        l.toArray.map(_.toString).toSeq
      case Some(s: Seq[_]) => s.map(_.toString)
      case Some(other) => throw new IllegalArgumentException(
        s"SqlOp: views must be a list, got $other")
      case None => sources.indices.map(i => s"src$i")
    }
    require(views.size == sources.size,
      s"SqlOp: ${views.size} views for ${sources.size} sources")
    sources.zip(views).foreach { case (df, name) =>
      // temp views are session-global: overwriting someone else's name
      // silently rebinds their queries planned AFTER this point — warn
      // so colliding topologies are debuggable
      if (df.sparkSession.catalog.tableExists(name))
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"SqlOp: temp view '$name' already exists and is being " +
            "replaced — pick distinct view names per SqlOp when composing")
      df.createOrReplaceTempView(name)
    }
    Seq(sources.head.sparkSession.sql(sql))
  }
}
