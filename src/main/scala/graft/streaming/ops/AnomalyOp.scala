package graft.streaming.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.OperatorFactory

/** Streaming z-score anomaly gate — the frozen-model gate family
  * ([[Bm25Op]]/[[NbGateOp]] pattern) applied to metric monitoring: a
  * REFERENCE corpus's per-key exact moments (mean, sample stddev —
  * [[graft.operators.MathOps.describe]]'s decimal-exact arithmetic)
  * are frozen at wire time into map literals riding the plan, and each
  * arriving row gets `z = (value − mean_key) / sd_key` — stateless,
  * no state store, whole-stage-codegen'd, config_topic-recomposable.
  * A stream can't see its own totality (the [[NbGateOp]] argument), so
  * the reference frame is explicit where the batch twin (q_anomaly)
  * self-references.
  *
  * Rows whose key is absent from the reference, or whose reference
  * sd is 0, get a NULL z — never anomalous, kept by `clean`, dropped
  * by `anomalies` (an unseen key can't be scored; gate it upstream if
  * that matters). Bounded-collect discipline: the wire-time collect is
  * one row per reference key, refused beyond `max_keys`.
  *
  * Config: `ref_path` (REQUIRED — parquet of the reference corpus),
  * `key_col` (event_type), `value_col` (value), `min_z` (3.0),
  * `emit` = `anomalies` (default — the monitoring face: only rows
  * with |z| > min_z) | `clean` (the cleaning face: rows that are NOT
  * anomalous) | `annotate` (all rows, z attached), `max_keys` (65536).
  */
object AnomalyOp extends OperatorFactory {

  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val df = sources.head
    val refPath = config.getOrElse("ref_path",
      throw new IllegalArgumentException(
        "AnomalyOp: config key 'ref_path' is required")).toString
    val keyCol = config.getOrElse("key_col", "event_type").toString
    val valueCol = config.getOrElse("value_col", "value").toString
    val minZ = config.getOrElse("min_z", 3.0).toString.toDouble
    val emit = config.getOrElse("emit", "anomalies").toString
    val maxKeys = config.getOrElse("max_keys", 65536).toString.toInt
    require(Set("anomalies", "clean", "annotate")(emit),
      s"emit must be anomalies/clean/annotate: '$emit'")
    require(maxKeys > 0, "max_keys must be positive")

    val spark = df.sparkSession
    val ref = spark.read.parquet(refPath)
    import graft.core.Pipe._
    val stats = (ref >> graft.operators.MathOps.describe(
      col(valueCol), Seq(col(keyCol))))
      .select(col(keyCol).cast("string"), col("mean"),
        col("stddev_samp"))
      .limit(maxKeys + 1)
      .collect()
    require(stats.length <= maxKeys,
      s"AnomalyOp: reference has > $maxKeys keys — raise max_keys or " +
        "pre-aggregate the reference")
    val means = stats.map(r => r.getString(0) -> r.getDouble(1)).toMap
    val sds = stats.map(r => r.getString(0) -> r.getDouble(2)).toMap
    val meanLit = typedLit(means)
    val sdLit = typedLit(sds)

    val k = col(keyCol).cast("string")
    val z = when(element_at(sdLit, k) > 0.0,
      (col(valueCol) - element_at(meanLit, k)) / element_at(sdLit, k))
    val annotated = df.withColumn("z", z)
    Seq(emit match {
      case "anomalies" => annotated.filter(abs(col("z")) > minZ)
      case "clean" =>
        annotated.filter(col("z").isNull || abs(col("z")) <= minZ)
      case "annotate" => annotated
    })
  }
}
