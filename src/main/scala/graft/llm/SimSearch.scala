package graft.llm

import org.apache.spark.sql.DataFrame
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

  /** Ranking finale shared by every search path: bounded top-k
    * aggregation of `(query_id, nbr_id, cosine)` rows. Partial
    * aggregation means each map task sends at most k rows per query into
    * the exchange — O(partitions × queries × k), never O(scored rows) —
    * where the previous `row_number() over (partition by query_id)`
    * formulation shuffled every scored candidate to |queries| hot
    * reducers. Ids must be integral (ranked as longs, the engine-wide
    * shuffle-key rule); order: cosine desc, ties to smaller nbr_id.
    * Thin facade over the general keyed take-n operator. */
  private[llm] def rankTopK(scored: DataFrame, k: Int): DataFrame =
    graft.operators.Ops.takeOrderedByKey(k, col("nbr_id"), col("cosine"),
      Seq(col("query_id")), as = ("nbr_id", "cosine"))(scored)

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
    rankTopK(scored, k)
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
    rankTopK(cand, k)
  }

  /** Per-query recall@k of an approximate neighbor list against the
    * exact ground truth — the evaluation harness that decides an index's
    * nProbe/nBits/code-size budget before a corpus-wide rollout. Both
    * inputs are bounded top-k frames `(query_id, nbr_id, …)` from
    * [[bruteForceTopK]] / [[lshTopK]] / [[Ivf.topK]] / [[Pq]], so every
    * join here is ≤ |queries|·k rows regardless of corpus scale. The
    * recall division is the only float op (two exact BIGINTs in), so the
    * result replays bit-for-bit in any engine. */
  /** Reciprocal-rank companion to [[recallAtK]]: per query, the rank at
    * which the approximate list first hits a true neighbor (`NULL` +
    * rr=0.0 when it never does) — the MRR building block, exact and
    * bounded like the recall join. */
  def reciprocalRank(exact: DataFrame, approx: DataFrame): DataFrame = {
    val firsts = approx.select(col("query_id"), col("nbr_id"), col("rank"))
      .join(exact.select(col("query_id"), col("nbr_id")),
        Seq("query_id", "nbr_id"))
      .groupBy("query_id").agg(min(col("rank")).as("first_hit_rank"))
    exact.select("query_id").distinct()
      .join(firsts, Seq("query_id"), "left")
      .select(col("query_id"), col("first_hit_rank"),
        coalesce(lit(1.0) / col("first_hit_rank").cast("double"),
          lit(0.0)).as("rr"))
  }

  def recallAtK(exact: DataFrame, approx: DataFrame): DataFrame = {
    val truth = exact.select(col("query_id"), col("nbr_id"))
    val hits = truth
      .join(approx.select(col("query_id"), col("nbr_id")),
        Seq("query_id", "nbr_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    truth.groupBy("query_id").agg(count(lit(1)).as("k_eff"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("k_eff"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") /
          col("k_eff").cast("double")).as("recall"))
  }
}
