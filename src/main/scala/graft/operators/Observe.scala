package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Query-level metrics WITHOUT an extra pass — Spark's `observe()` API
  * (the engine-native answer to the reference's per-operator trace/
  * feedback counters, reference makinage/driver/app_sink.py:62-65):
  * named aggregate expressions piggyback on the query's own execution,
  * so "rows in / rows kept / bytes out" costs zero additional jobs and
  * zero extra scans — where a naive `df.count()` beside the real action
  * would re-run the whole plan.
  *
  * Batch form here; on streams the same `observe` surfaces per-batch
  * through `StreamingQueryListener` (QueryProgressEvent.observedMetrics)
  * — the counters a pipeline dashboard tails.
  */
object Observe {

  /** Attach named metric expressions to `df`. The returned Observation
    * yields the metric row after the FIRST action on the returned frame
    * (`obs.get` blocks until then). Metrics must be aggregate
    * expressions (count/sum/min/max/...). */
  def observed(df: DataFrame, name: String, metrics: (String, Column)*)
      : (DataFrame, Observation) = {
    require(metrics.nonEmpty, "observed: no metrics")
    val obs = Observation(name)
    val cols = metrics.map { case (n, c) => c.as(n) }
    (df.observe(obs, cols.head, cols.tail: _*), obs)
  }
}
