package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2.6). Two paths:
  *
  *  - [[bruteForceTopK]]: exact baseline. Correct for any corpus; cost is
  *    |queries| × |corpus| cosine evaluations. With the query set broadcast
  *    this is a map-only pass over the corpus (no shuffle of the corpus!)
  *    followed by a top-k aggregation keyed by query — the right EXACT plan
  *    even at 100 TB when |queries| is small.
  *  - [[lshTopK]]: scale path. Random-hyperplane buckets restrict each query
  *    to candidates sharing a signature in ≥1 table; recall is tuned by
  *    (nBits, number of seeds). Corpus signatures are computed map-side;
  *    the only corpus shuffle is the bucket join.
  */
object SimSearch {

  /** Exact top-k by cosine for each query row. `queries` must be small
    * (broadcast); output: (query id, neighbor id, cosine, rank).
    * Ties broken by neighbor id for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"),
      Vectors.norm(col(vecCol)).as("cn"))
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      Vectors.norm(col(vecCol)).as("qn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        Vectors.cosineWithNorms(col("qv"), col("cv"),
          col("qn"), col("cn")).as("cosine"))
    // top-k per query: rank over a per-query window. The shuffle is keyed
    // by query_id (small), and Spark's TakeOrdered-style partial top-k via
    // window + filter keeps only k rows per query past the exchange.
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** ANN top-k: multi-table random-hyperplane LSH. Each (seed) table maps
    * every vector to a bucket; query candidates = union of its buckets
    * across tables; exact cosine + rank within candidates. Recall < 1 by
    * design — verify with [[bruteForceTopK]] on a sample. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nBits: Int = 10, seeds: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    // all seed tables from ONE projection + explode: a single pass computes
    // every signature (a per-seed union would re-scan and re-sign the
    // corpus |seeds| times). Map-side only — the explode feeds a broadcast
    // join, so the ×|seeds| rows never shuffle.
    def sigTables(df: DataFrame, id: String, v: String, n: String)
        : DataFrame =
      df.select(col(id), col(v), col(n), explode(array(seeds.map(s =>
        xxhash64(lit(s), Vectors.rhpSignature(col(v), nBits, s))): _*))
        .as("bkey"))
    val c = sigTables(
      corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"),
        Vectors.norm(col(vecCol)).as("cn")), "nbr_id", "cv", "cn")
    val q = sigTables(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        Vectors.norm(col(vecCol)).as("qn")), "query_id", "qv", "qn")
    val cand = c.join(broadcast(q), Seq("bkey"))
      .filter(col("query_id") =!= col("nbr_id"))
      .select(col("query_id"), col("nbr_id"),
        Vectors.cosineWithNorms(col("qv"), col("cv"),
          col("qn"), col("cn")).as("cosine"))
      .groupBy("query_id", "nbr_id").agg(max("cosine").as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("nbr_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
