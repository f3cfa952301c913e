package graft.streaming.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.{KMeans, TextStats}
import graft.streaming.OperatorFactory

/** Streaming raw-text cluster router — online topic routing with NO
  * learned encoder and NO state: centroids are frozen at wire time
  * (deterministic [[KMeans.seed]] over the hash-embedded reference
  * corpus, the [[PcaOp]] convention) and each arriving document maps to
  * its nearest cell through a per-row pipeline of pure codegen
  * expressions — tokenize → hash-embed ([[TextStats.hashEmbedRow]], no
  * shuffle) → argmin cell ([[KMeans.assign]]'s NearestCells against
  * plan-riding centroids). Route-to-topic, per-topic quotas, and
  * cluster-level drift monitors compose downstream on the (id, cell)
  * stream.
  *
  * Config: `ref_path` (parquet reference corpus), `text_col` ("text"),
  * `id_col` ("doc_id"), `dim` (16), `k` (6). Output: (id, cell).
  */
object DocClusterOp extends OperatorFactory {
  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val df = sources.head
    val refPath = config.getOrElse("ref_path",
      sys.error("DocClusterOp needs config key ref_path")).toString
    val textCol = config.getOrElse("text_col", "text").toString
    val idCol = config.getOrElse("id_col", "doc_id").toString
    val dim = config.getOrElse("dim", 16).toString.toInt
    val k = config.getOrElse("k", 6).toString.toInt
    val ref = df.sparkSession.read.parquet(refPath)
    val model = KMeans.seed(
      TextStats.hashEmbedDense(ref, idCol, textCol, dim),
      "id", "embedding", k)
    val embedded = df.select(col(idCol).as("id"),
      TextStats.hashEmbedRow(col(textCol), dim).as("embedding"))
    Seq(KMeans.assign(embedded, "id", "embedding", model)
      .select("id", "cell"))
  }
}
