package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** IVF-style ANN: a coarse quantizer (k-means centroids) partitions the
  * corpus into cells; a query probes its `nProbe` nearest cells and ranks
  * exactly within them — the classic inverted-file index, complementing
  * the random-hyperplane LSH path ([[SimSearch.lshTopK]]).
  *
  * Training: mini k-means on a DETERMINISTIC bounded sample
  * (`vec_id % step == 0`, capped at `sampleCap` rows collected to the
  * driver). IVF training is offline/bounded by design — at 100 TB you
  * train the quantizer once on a ~10⁵-vector sample (a few MB) and
  * broadcast the k×dim centroid table (KBs–MBs) to executors; the corpus
  * pass is map-only assignment + one shuffle on cell id.
  */
object Ivf {

  /** The centroid-model type is shared with [[KMeans]] — one place owns
    * the model shape and the nearest-cell expression, so the two ANN
    * paths cannot drift. */
  type Model = KMeans.Model
  val Model: KMeans.Model.type = KMeans.Model

  /** Deterministic mini k-means (fixed init: first k sample points;
    * fixed iteration count — reproducible across runs/executors). */
  def train(df: DataFrame, idCol: String, vecCol: String, k: Int,
            iters: Int = 5, sampleStep: Int = 1, sampleCap: Int = 10000)
      : Model = {
    val sample = df
      .filter(pmod(col(idCol), lit(sampleStep)) === 0)
      // ordered take (TakeOrderedAndProject), not a bare limit: LIMIT over
      // a multi-partition input picks whichever partitions answer first,
      // so centroids would differ across runs/cluster layouts
      .orderBy(col(idCol))
      .limit(sampleCap)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.length >= k, s"need >= $k sample vectors")
    var cents = sample.take(k).map(_.clone())
    (1 to iters).foreach { _ =>
      val dim = cents(0).length
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < dim) {
            val diff = v(i) - cents(c)(i); d += diff * diff; i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(_ / counts(c))
      }
    }
    Model(cents)
  }

  /** Column expr: index (0-based) of the nearest centroid by L2. The
    * centroid table rides the plan as a reference object (broadcast with
    * the task binaries — no join needed for assignment); the distance
    * scan is the native codegen [[graft.functions.NearestCells]] kernel
    * (the HOF formulation ran k interpreted l2Dist folds per row). */
  private def cellOf(vec: Column, model: Model): Column =
    KMeans.cellOf(vec, model)

  /** ANN top-k: assign corpus rows to cells (map-only), probe each query's
    * `nProbe` nearest cells, rank exactly inside. Output:
    * (query_id, nbr_id, cosine, rank). */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
           vecCol: String, k: Int, model: Model, nProbe: Int = 2)
      : DataFrame = {
    // NO repartition before the probe join: `q` is broadcast, so the
    // join is map-side and needs no co-partitioning — hashing the whole
    // corpus (vectors riding) on the k-valued cell column was a wasted
    // corpus-wide exchange that also concentrated every hot cell's
    // candidates on a single task (k cells << partitions). Candidate
    // generation is map-only on the scan layout; the one shuffle of
    // this plan is rankTopK's bounded partial top-k on query_id.
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"),
        Vectors.norm(col(vecCol)).as("cn"),
        cellOf(col(vecCol), model).as("cell"))
    // each query → its nProbe nearest cells (same native kernel, ordered
    // ascending by (distance, index) like the sorted-struct form it
    // replaced)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        Vectors.norm(col(vecCol)).as("qn"))
      .withColumn("cell", explode(graft.functions.NearestCells(
        col("qv"), model.centroids.map(_.toSeq).toSeq, nProbe)))
      .select(col("query_id"), col("qv"), col("qn"), col("cell"))
    val cand = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        Vectors.cosineWithNorms(col("qv"), col("cv"),
          col("qn"), col("cn")).as("cosine"))
      .groupBy("query_id", "nbr_id").agg(max("cosine").as("cosine"))
    // bounded top-k aggregation (map-side partials carry ≤k rows per
    // query) — see SimSearch.rankTopK on why not a row_number window
    SimSearch.rankTopK(cand, k)
  }
}
