package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) for embedding columns — the OTHER
  * compression leg of production ANN (FAISS `ScalarQuantizer` QT_8bit):
  * each dimension is affinely mapped to an 8-bit code against the
  * corpus's own per-dimension [min, max] range, shrinking a D-dim float
  * vector to D bytes (4× vs float32) with no codebook training at all.
  * Complements [[Pq]]: PQ buys a larger ratio (D·4/m) but pays a k-means
  * codebook and m argmin scans per row; SQ8 is one global min/max
  * aggregate and a map-only affine transform — the cheap first rung of
  * the compression ladder, and the variant that stays accurate when
  * dimensions carry independent scales (PQ subspaces mix them).
  *
  * Scale shape: [[stats]] is ONE map-side-combined aggregate
  * (posexplode → groupBy(dim) min/max partially aggregates per task, so
  * the shuffle carries tasks×D rows and the result is D rows → driver,
  * broadcast back as a plan literal). [[encode]] is map-only (the 2·D
  * range doubles ride the plan). [[adcTopK]] scans codes map-only with
  * the query set broadcast and finishes in the bounded top-k aggregate
  * ([[graft.operators.Ops.takeOrderedByKey]] — ≤ k rows per query per
  * task cross the exchange, never O(corpus)).
  *
  * Determinism: min/max are exact; the affine forward map
  * `floor(((x − mn) · 255) / (mx − mn))` (clamped to [0, 255],
  * degenerate mn = mx dims code to 0) and the decode
  * `mn + code · ((mx − mn) / 255)` are fixed IEEE double op sequences,
  * and the ADC distance folds dimensions in ascending order — so codes,
  * distances and ranks are bit-reproducible on any engine
  * (q_sq_codes / q_sq_search hash-match a SQL replay in DuckDB).
  */
object Sq {

  /** Per-dimension corpus ranges; `levels` is the code-point count
    * (256 = SQ8). */
  case class Stats(mins: Array[Double], maxs: Array[Double],
                   levels: Int = 256) {
    require(mins.length == maxs.length, "mins/maxs length mismatch")
    require(levels >= 2, s"levels must be >= 2: $levels")
    def dim: Int = mins.length
  }

  /** Exact per-dimension [min, max] over the corpus — one aggregate,
    * D rows to the driver. NULL vectors don't constrain the range (a
    * NULL array explodes to nothing); [[encode]] maps them to a NULL
    * code vector, which [[adcTopK]]'s bounded top-k then drops (its
    * null-score rule) — so NULL embeddings silently vanish from
    * search results rather than erroring. */
  def stats(df: DataFrame, vecCol: String, levels: Int = 256): Stats = {
    val rows = df
      .select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("__pos", "__x")))
      .groupBy("__pos")
      .agg(min("__x").as("mn"), max("__x").as("mx"),
        count(lit(1)).as("n"))
      .orderBy("__pos")
      .collect()
    require(rows.nonEmpty, "stats: corpus has no non-null vectors")
    // ragged detection must use per-dimension COUNTS: posexplode
    // positions are always a dense [0, max_len) set (a position-range
    // check is a tautology), but a corpus mixing 3- and 5-dim vectors
    // shows fewer rows at positions 3-4 — and its upper dims' ranges
    // would come from the long vectors only, making SqEncode's short-
    // vector pad decode to phantom minimum coordinates in adcTopK
    require(rows.map(_.getLong(3)).distinct.length == 1,
      s"stats: ragged vectors — per-dimension counts " +
        s"${rows.map(_.getLong(3)).mkString(",")} differ; all vectors " +
        "must share one dimension")
    Stats(rows.map(_.getDouble(1)), rows.map(_.getDouble(2)), levels)
  }

  /** The D-entry SQ code vector of `vec` as a Column —
    * `least(L−1, greatest(0, floor(((x − mn) · (L−1)) / (mx − mn))))`
    * per dimension, 0 where the corpus range is degenerate (mn = mx).
    * The clamp only matters for out-of-corpus vectors (encoding a new
    * crawl against yesterday's ranges); in-corpus values land in
    * [0, L−1] by construction. */
  def codeColumn(vec: Column, st: Stats): Column =
    // native one-pass encoder (graft.functions.SqEncode) — the HOF
    // transform() dispatched an interpreted lambda per dimension per
    // corpus row; bit-parity (incl. NaN→0, short-vector→0 edges)
    // pinned in PqSqSpec. One intentional divergence: a whole-NULL
    // vector now yields a NULL code (dropped by adcTopK's null-score
    // rule) where the HOF built an all-zero phantom code.
    graft.functions.SqEncode(vec.cast("array<double>"),
      st.mins, st.maxs, st.levels)

  /** (id, code: array<int> of D entries in [0, levels)) — the stored
    * representation; 1 byte per dimension once packed to binary. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             st: Stats): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      codeColumn(col(vecCol), st).as("code"))

  /** ADC top-k: for each row of `queries` (small — collected and
    * broadcast), the k nearest corpus rows by squared L2 between the
    * exact query vector and the DECODED corpus codes, ties to the
    * smaller neighbor id. Output: (query_id, nbr_id, adc_dist, rank).
    *
    * The [[Pq.adcTopK]] table trick applies unchanged: every possible
    * per-dimension contribution `(q_i − (mn_i + c · step_i))²` is
    * precomputed driver-side into a D×levels table per query (64·256
    * doubles — tiny), so the scan folds D table lookups per candidate
    * instead of re-deriving the decode arithmetic 2^8 ways per row.
    * Same IEEE ops per entry (sub, mul-add decode, sub, square) in the
    * same ascending-dimension fold — bit-identical to the inline form
    * and to the SQL oracle. The corpus side reads codes alone —
    * encode once, reuse across query batches. */
  def adcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, st: Stats, k: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val qrows = queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(qrows.nonEmpty, "queries must be non-empty")
    val top = (st.levels - 1).toDouble
    val qdf = qrows.toSeq.map { case (qid, qv) =>
      require(qv.length == st.dim,
        s"query $qid dim ${qv.length} != stats dim ${st.dim}")
      val dtab = (0 until st.dim).map { i =>
        val mn = st.mins(i)
        val step = (st.maxs(i) - st.mins(i)) / top
        (0 until st.levels).map { c =>
          val diff = qv(i) - (mn + c * step)
          diff * diff
        }
      }
      (qid, dtab)
    }.toDF("query_id", "dtab")
    val scored = encode(corpus, idCol, vecCol, st)
      .crossJoin(broadcast(qdf))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id"),
        // native left-to-right lookup fold — same IEEE add chain as
        // the HOF aggregate() it replaces (graft.functions.AdcSum)
        graft.functions.AdcSum(col("dtab"), col("code")).as("adc"))
    graft.operators.Ops.takeOrderedByKey(k, col("id"), -col("adc"),
      Seq(col("query_id")), as = ("nbr_id", "__neg"))(scored)
      .select(col("query_id"), col("nbr_id"),
        (-col("__neg")).as("adc_dist"), col("rank"))
  }
}
