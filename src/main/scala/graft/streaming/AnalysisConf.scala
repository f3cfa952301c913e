package graft.streaming

import org.apache.spark.sql.SparkSession

/** Session-conf overrides needed only while a streaming query is ANALYZED.
  *
  * Some factories must relax an analysis-time-only Spark check (e.g.
  * [[ops.NearDupOp]] and `spark.sql.streaming.statefulOperator.
  * checkCorrectness.enabled` — the check lives in
  * `UnsupportedOperationChecker.checkStreamingQueryGlobalWatermarkLimit`,
  * invoked solely by the `ResolveWriteToStream` analyzer rule, i.e. inside
  * `DataStreamWriter.start()`; it never re-runs per micro-batch). Setting
  * such a flag directly on the session would leak past the query it was
  * meant for: every later query in the same session would silently lose
  * the check. Factories record the override here instead; the topology
  * runner restores the user's values right after its queries start.
  * Programmatic users who call a factory and `start()` themselves should
  * call [[restoreAll]] once their queries have started.
  */
object AnalysisConf {

  private val saved =
    scala.collection.mutable.Map.empty[(SparkSession, String), Option[String]]

  /** Set `key` for the upcoming query analysis, remembering the user's
    * prior value (first write per (session, key) wins — repeated factory
    * applications must not capture their own override as "prior"). */
  def setForAnalysis(spark: SparkSession, key: String, value: String)
      : Unit = synchronized {
    if (!saved.contains((spark, key)))
      saved((spark, key)) = spark.conf.getOption(key)
    spark.conf.set(key, value)
  }

  /** Restore every recorded override on `spark` to its prior value. Call
    * after the streaming queries have STARTED (analysis is complete once
    * `start()` returns). */
  def restoreAll(spark: SparkSession): Unit = synchronized {
    saved.keys.filter(_._1 eq spark).toSeq.foreach { k =>
      saved.remove(k) match {
        case Some(Some(v)) => spark.conf.set(k._2, v)
        case Some(None)    => spark.conf.unset(k._2)
        case None          =>
      }
    }
  }
}
