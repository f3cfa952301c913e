package graft.streaming.ops

import org.apache.spark.sql.DataFrame

import graft.llm.Pca
import graft.streaming.OperatorFactory

/** Streaming PCA projector — the online face of [[Pca.project]] with a
  * model FROZEN at wire time (the [[SimSearchOp]]/[[AnomalyOp]]
  * convention): [[Pca.fit]] runs once over a bounded reference corpus
  * when the topology wires, and the fitted components ride the plan as
  * literal arrays, so the per-row transform is fully STATELESS — a
  * codegen dot product per component, no state store, no shuffle, no
  * driver round trip at trigger time. Refit = reconfigure (the
  * `config_topic` pattern re-wires with a fresh reference).
  *
  * Config: `ref_path` (parquet reference corpus the model fits on),
  * `vec_col` ("embedding"), `id_col` ("vec_id"), `k` (2), `iters` (8),
  * `whiten` (false). Output: (id, p0..p{k-1}).
  */
object PcaOp extends OperatorFactory {
  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val df = sources.head
    val refPath = config.getOrElse("ref_path",
      sys.error("PcaOp needs config key ref_path")).toString
    val vecCol = config.getOrElse("vec_col", "embedding").toString
    val idCol = config.getOrElse("id_col", "vec_id").toString
    val k = config.getOrElse("k", 2).toString.toInt
    val iters = config.getOrElse("iters", 8).toString.toInt
    val whiten = config.getOrElse("whiten", false).toString.toBoolean
    val model = Pca.fit(df.sparkSession.read.parquet(refPath),
      vecCol, k, iters)
    Seq(Pca.project(df, idCol, vecCol, model, whiten))
  }
}
