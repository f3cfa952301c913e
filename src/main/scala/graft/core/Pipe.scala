package graft.core

import org.apache.spark.sql.DataFrame

/** Composable operator surface, mirroring the reference's `rx.pipe`
  * composition style (makinage/sample/processor.py:6-14: a pipeline is a
  * chain of operators applied to an observable).
  *
  * An [[Op]] is a pure `DataFrame => DataFrame` transform. Because every op
  * only composes Catalyst plans (no actions), a chained pipe stays a single
  * declarative plan: Catalyst fuses, pushes filters down, and prunes columns
  * across op boundaries — the Spark-native analogue of the reference's
  * fused push-based pipelines (SURVEY.md §4.1).
  */
object Pipe {
  type Op = DataFrame => DataFrame

  /** rx.pipe(...) equivalent: left-to-right composition. */
  def pipe(ops: Op*): Op = ops.foldLeft(identity[DataFrame] _)(_ andThen _)

  implicit class DataFrameOps(private val df: DataFrame) extends AnyVal {
    /** `df >> op` applies an operator; chains read like rx pipelines. */
    def >>(op: Op): DataFrame = op(df)
  }
}
