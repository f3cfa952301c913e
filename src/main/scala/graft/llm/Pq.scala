package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.NearestCells

/** Product quantization for embedding columns (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011) — the
  * compression leg of billion-scale ANN, complementing [[Ivf]] (which
  * prunes WHERE to look, PQ shrinks WHAT is stored): split each D-dim
  * vector into `m` contiguous subvectors, quantize each against its own
  * `ksub`-centroid codebook, and store only the m code bytes — a
  * D·4 / m byte compression (64-dim float → 8 bytes at m=8). Search
  * runs on codes alone via ADC (asymmetric distance computation): per
  * query, an m×ksub table of exact subspace distances is built ONCE,
  * and each candidate's approximate distance is m table lookups — no
  * float vector is ever read at scan time.
  *
  * Scale shape: [[encode]] is map-only (m native [[NearestCells]]
  * passes per row, codebook rides the task binaries); the codes table
  * is what a 100 TB corpus materializes (32× smaller than the floats).
  * [[adcTopK]] broadcasts the queries' distance tables and scans codes
  * map-only into the bounded top-k aggregate
  * ([[graft.operators.Ops.takeOrderedByKey]] — each task forwards ≤ k
  * rows per query, never O(corpus)). Compose with [[Ivf]] cell routing
  * for the IVF-PQ layout when even the code scan needs pruning.
  *
  * Determinism: subspace assignment inherits [[KMeans]]'s contract
  * (strict-< argmin ties to the lowest code, sequential per-dim
  * distance folds); ADC accumulates the m lookups in a fixed
  * left-to-right fold and the per-query tables are built with the same
  * ascending-dimension loop — so codes, distances, and ranks are
  * bit-reproducible on any engine (q_pq_codes / q_pq_search
  * hash-match a SQL replay).
  */
object Pq {

  /** Per-subspace codebooks: `books(s)` quantizes dimensions
    * [s·subDim, (s+1)·subDim). */
  case class Codebook(subDim: Int, books: Array[KMeans.Model]) {
    def m: Int = books.length
    def ksub: Int = books.head.k
    require(books.nonEmpty, "codebook needs at least one subspace")
    require(books.forall(_.k == books.head.k),
      "all subspaces must share ksub")
  }

  /** Train per-subspace codebooks on the corpus itself: slice, then
    * [[KMeans.seed]] (`iters = 0`, exactly deterministic — the oracled
    * path) or [[KMeans.fit]] (fixed-point Lloyd refits, bit-exact per
    * its scaladoc). m·(iters+1) full scans at train time; production
    * trains on a bounded sample like [[Ivf.train]] when the corpus is
    * large — the codebook is m·ksub·subDim doubles either way. */
  def train(df: DataFrame, idCol: String, vecCol: String, m: Int,
            ksub: Int, iters: Int = 0): Codebook = {
    require(m >= 1, s"m must be >= 1: $m")
    if (iters == 0) {
      // Seeded path fused to ONE driver job: every subspace seed is a
      // slice of the SAME ksub rows (the ksub smallest ids — KMeans.seed's
      // contract), so the per-subspace `orderBy.limit(ksub).collect()`
      // ran m+1 serial full-input jobs (m ordered takes + the dim probe)
      // to fetch identical rows m times. One ordered take of the full
      // vectors, sliced driver-side, is bit-identical: float→double
      // widening is exact, so widen-then-slice equals slice-then-widen.
      val rows = df.orderBy(col(idCol)).limit(ksub).select(col(vecCol))
        .collect()
        .map(_.getSeq[Any](0).map {
          case f: java.lang.Float  => f.toDouble
          case d: java.lang.Double => d.doubleValue
          case other => sys.error(s"train: non-float vector element $other")
        }.toArray)
      require(rows.length >= ksub, s"corpus has fewer than $ksub rows")
      val dim = rows.head.length
      require(rows.forall(_.length == dim),
        s"train: mixed vector dimensions in the $ksub seed rows")
      require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
      val subDim = dim / m
      val books = (0 until m).map { s =>
        KMeans.Model(rows.map(r =>
          java.util.Arrays.copyOfRange(r, s * subDim, (s + 1) * subDim)))
      }.toArray
      Codebook(subDim, books)
    } else {
      val dim = df.select(size(col(vecCol))).head.getInt(0)
      require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
      val subDim = dim / m
      val books = (0 until m).map { s =>
        val sliced = df.select(col(idCol),
          slice(col(vecCol), s * subDim + 1, subDim).as("__sub"))
        KMeans.fit(sliced, idCol, "__sub", ksub, iters)
      }.toArray
      Codebook(subDim, books)
    }
  }

  /** The m-entry code vector of `vec` as a Column — each subspace code
    * is the [[NearestCells]] argmin over that subspace's codebook
    * (codebook rides the plan; map-only). */
  def codeColumn(vec: Column, cb: Codebook): Column =
    array((0 until cb.m).map { s =>
      element_at(NearestCells(
        slice(vec, s * cb.subDim + 1, cb.subDim),
        cb.books(s).centroids.map(_.toSeq).toSeq, 1), 1)
    }: _*)

  /** (id, code: array<int> of m entries) — the stored representation. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             cb: Codebook): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      codeColumn(col(vecCol), cb).as("code"))

  /** Exact squared-L2 between a query subvector and one centroid —
    * ascending-dimension accumulation, the same IEEE op sequence as
    * [[NearestCells]]'s kernel and the SQL oracle's sequential fold. */
  private def subDist(q: Array[Double], cent: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    while (i < cent.length) {
      val diff = q(i) - cent(i)
      d += diff * diff
      i += 1
    }
    d
  }

  /** The ADC approximate distance: Σ_s dtab(s)(code_s), folded
    * left-to-right over the subspaces (fixed IEEE op order — the SQL
    * oracle replays the identical fold). */
  private def adcColumn(dtab: Column, code: Column, m: Int): Column =
    // native left-to-right lookup fold (graft.functions.AdcSum) — same
    // IEEE add chain as the HOF aggregate() formulation it replaces,
    // which dispatched m interpreted lambdas per (query, candidate)
    graft.functions.AdcSum(dtab, code)

  /** (query_id, dtab) frame of per-query subspace distance tables,
    * built driver-side (m × ksub doubles per query — the whole point
    * of ADC is this is tiny) from a small collected query set. */
  private def queryTables(queries: DataFrame, idCol: String,
                          vecCol: String, cb: Codebook): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val qrows = queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(qrows.nonEmpty, "queries must be non-empty")
    qrows.toSeq.map { case (qid, qv) =>
      val dtab = (0 until cb.m).map { s =>
        val sub = java.util.Arrays.copyOfRange(qv, s * cb.subDim,
          (s + 1) * cb.subDim)
        cb.books(s).centroids.toSeq.map(c => subDist(sub, c))
      }
      (qid, dtab)
    }.toDF("query_id", "dtab")
  }

  /** Ranking finale shared by the ADC paths: bounded top-k wants
    * score-DESCENDING, distances rank ascending — feed the negation
    * (exact: IEEE sign flip) and flip back. */
  private def rankByDistance(scored: DataFrame, k: Int): DataFrame =
    graft.operators.Ops.takeOrderedByKey(k, col("id"), -col("adc"),
      Seq(col("query_id")), as = ("nbr_id", "__neg"))(scored)
      .select(col("query_id"), col("nbr_id"),
        (-col("__neg")).as("adc_dist"), col("rank"))

  /** ADC top-k: for each row of `queries` (must be small — collected
    * and broadcast), the k nearest corpus rows by approximate distance,
    * ties to the smaller neighbor id. Output:
    * (query_id, nbr_id, adc_dist, rank). Queries are searched against
    * the CODES of the corpus — encode once, reuse across queries. */
  def adcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, cb: Codebook, k: Int): DataFrame = {
    val qdf = queryTables(queries, idCol, vecCol, cb)
    val scored = encode(corpus, idCol, vecCol, cb)
      .crossJoin(broadcast(qdf))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id"),
        adcColumn(col("dtab"), col("code"), cb.m).as("adc"))
    rankByDistance(scored, k)
  }

  /** IVF-PQ: the production billion-scale ANN layout — a coarse
    * quantizer routes each corpus row to one cell ([[KMeans.cellOf]],
    * map-only) and each query to its `nProbe` nearest cells; ADC then
    * scores ONLY the codes inside probed cells. The corpus-side work
    * per query drops from a full code scan to the probed fraction
    * (~nProbe/k of the corpus), and the candidate join is keyed on
    * `cell` with the tiny probe frame broadcast — the scan never
    * shuffles. Same output contract as [[adcTopK]]; fewer than k rows
    * per query when the probed cells hold fewer candidates (the IVF
    * recall trade, tuned by nProbe). */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, coarse: KMeans.Model, cb: Codebook,
                 k: Int, nProbe: Int = 2): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1: $nProbe")
    val qdf = queryTables(queries, idCol, vecCol, cb)
    val qprobe = queries
      .select(col(idCol).cast("long").as("query_id"),
        explode(NearestCells(col(vecCol),
          coarse.centroids.map(_.toSeq).toSeq, nProbe)).as("cell"))
      .join(qdf, "query_id")
    val c = corpus.select(col(idCol).cast("long").as("id"),
      KMeans.cellOf(col(vecCol), coarse).as("cell"),
      codeColumn(col(vecCol), cb).as("code"))
    val scored = c.join(broadcast(qprobe), "cell")
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id"),
        adcColumn(col("dtab"), col("code"), cb.m).as("adc"))
    rankByDistance(scored, k)
  }

  /** Residual of a vector against the coarse centroid of `cell` —
    * elementwise double subtraction (IEEE-exact, oracle-portable); the
    * centroid matrix rides the plan as a literal, indexed per row. */
  def residualColumn(vec: Column, coarse: KMeans.Model, cell: Column)
      : Column =
    zip_with(vec.cast("array<double>"),
      element_at(typedLit(coarse.centroids.map(_.toSeq).toSeq),
        cell + 1),
      (a, b) => a - b)

  /** Train the codebooks on coarse-quantization RESIDUALS — IVF-PQ
    * proper (Jégou TPAMI'11 §III.C): residuals concentrate around the
    * origin regardless of which cell a vector lives in, so one shared
    * codebook quantizes them far more accurately than raw positions
    * (the plain [[train]] codebook spends its centroids re-encoding
    * the coarse structure the IVF cells already captured). Same
    * deterministic seed contract as [[train]]: the k smallest ids'
    * residual vectors. */
  def trainResidual(df: DataFrame, idCol: String, vecCol: String,
                    coarse: KMeans.Model, m: Int, ksub: Int): Codebook = {
    val res = df.select(col(idCol),
      residualColumn(col(vecCol), coarse,
        KMeans.cellOf(col(vecCol), coarse)).as("__rv"))
    train(res, idCol, "__rv", m, ksub)
  }

  /** IVF-PQ with residual encoding — the production billion-scale
    * layout in full: corpus rows store PQ codes of their RESIDUAL
    * (vector − own coarse centroid); a query probing cell c builds its
    * ADC tables from the QUERY residual against that same centroid, so
    * distance tables are per (query, probed cell) — nProbe·m·ksub
    * doubles per query, still driver-tiny. Join/scan shape identical
    * to [[ivfAdcTopK]] (cell-keyed candidate join, probe frame
    * broadcast, bounded top-k); accuracy strictly better because the
    * codebook only has to span the residual ball, not the whole
    * embedding space. Probe order replicates [[NearestCells]] exactly
    * (distance asc, cell index asc). */
  def ivfResidualAdcTopK(corpus: DataFrame, queries: DataFrame,
                         idCol: String, vecCol: String,
                         coarse: KMeans.Model, cb: Codebook, k: Int,
                         nProbe: Int = 2): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1: $nProbe")
    val spark = queries.sparkSession
    import spark.implicits._
    val qrows = queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(qrows.nonEmpty, "queries must be non-empty")
    val qdf = qrows.toSeq.flatMap { case (qid, qv) =>
      val probed = coarse.centroids.zipWithIndex
        .map { case (cent, i) => (subDist(qv, cent), i) }
        .sortBy(identity)
        .take(math.min(nProbe, coarse.k))
        .map(_._2)
      probed.map { cell =>
        val cent = coarse.centroids(cell)
        val rv = Array.tabulate(qv.length)(i => qv(i) - cent(i))
        val dtab = (0 until cb.m).map { s =>
          val sub = java.util.Arrays.copyOfRange(rv, s * cb.subDim,
            (s + 1) * cb.subDim)
          cb.books(s).centroids.toSeq.map(c => subDist(sub, c))
        }
        (qid, cell, dtab)
      }
    }.toDF("query_id", "cell", "dtab")
    val c = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("__v"))
      .withColumn("cell", KMeans.cellOf(col("__v"), coarse))
      // fused residual+encode kernel: the composed
      // codeColumn(residualColumn(...)) form inlined the INTERPRETED
      // zip_with residual into every subspace slice — m copies per row
      .select(col("id"), col("cell"),
        graft.functions.PqResidualCodes(col("__v"), col("cell"),
          coarse.centroids.map(_.toSeq).toSeq,
          cb.books.map(_.centroids.map(_.toSeq).toSeq).toSeq,
          cb.subDim).as("code"))
    val scored = c.join(broadcast(qdf), "cell")
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id"),
        adcColumn(col("dtab"), col("code"), cb.m).as("adc"))
    rankByDistance(scored, k)
  }
}
