package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Vectors

/** Distributed PCA over an embedding column — the dimensionality-
  * reduction leg of embedding pipelines (whitening before k-means /
  * SemDeDup, PQ sub-space rotation sanity checks, 2-D corpus maps).
  *
  * Engine shape: ONE corpus pass computes the exact second-moment sums
  * (Gram matrix + mean) in fixed-point integer space — each row emits
  * its d² quantized products through a map-side-combined `groupBy(pos)`
  * aggregate, so the shuffle carries d²·partitions cells, never corpus
  * rows (the [[KMeans.fit]] per-(cell,dim) pattern widened to pairs).
  * Only the d×d matrix reaches the driver; power iteration + deflation
  * run there over exact doubles with a PINNED fold order, and the
  * projection is map-only ([[Vectors.dot]] against broadcast-literal
  * components). d is bounded (require d ≤ 128): past that the d² row
  * blowup wants a block-matrix method, not this operator.
  *
  * Determinism / oracle-portability (the engine-wide exactness policy):
  * quantization `q_i = floor(x_i · 2^15)` makes every cross-moment an
  * exact integer (decimal(38,0) sums — order-independent under any
  * parallelism); centering uses the algebraic identity
  * `n·Σqqᵀ − (Σq)(Σq)ᵀ` (exact integers), and ONE double conversion +
  * division lands each covariance cell. Power iteration then performs
  * an exactly-specified IEEE op sequence (left-to-right folds,
  * correctly-rounded sqrt), so fitted components replay bit-for-bit in
  * DuckDB as unrolled-iteration CTEs (q_pca_fit / q_pca_project).
  *
  * PCA here is defined over the QUANTIZED vectors (documented contract,
  * like [[Dsir]]'s hashed models): the 2^-15 quantization perturbs
  * loadings ~1e-5 — far below sampling noise — and buys exact
  * cross-engine replay of a classically irreproducible fit.
  */
object Pca {

  /** `components(c)(i)`: loading i of component c (unit-norm rows);
    * `eigenvalues(c)`: the power-iteration estimate after `iters`
    * rounds (the final iteration's pre-normalization ‖Cv‖). */
  case class Model(components: Array[Array[Double]],
                   eigenvalues: Array[Double]) {
    def k: Int = components.length
    def dim: Int = components.head.length
  }

  private val ScaleBits = 15
  private val Scale = 1L << ScaleBits

  private def quantized(vecCol: Column): Column =
    transform(vecCol,
      x => floor(x.cast("double") * lit(Scale.toDouble)).cast("long"))

  /** Fit the top-`k` principal components with `iters` power-iteration
    * rounds each (deflation between components). One corpus pass for the
    * moments; everything after is driver-side over the d×d matrix. */
  def fit(df: DataFrame, vecCol: String, k: Int = 2, iters: Int = 8)
      : Model = fitPath(df, vecCol, k, iters, forceDecimal = false)

  /** [[fit]] with the declarative decimal Gram path forced — test seam
    * pinning that the per-partition long-kernel path and the
    * decimal(38,0) explode path produce BIT-IDENTICAL models (both are
    * exact integer sums; only the execution shape differs). */
  private[graft] def fitPath(df: DataFrame, vecCol: String, k: Int,
                             iters: Int, forceDecimal: Boolean)
      : Model = {
    val q = df.select(quantized(col(vecCol)).as("q"))
    // ONE guard pass for dims + magnitude bound + row count (was three
    // separate corpus scans — a third of the fit's wall time at sf0.1)
    val guard = q.agg(min(size(col("q"))).as("mn"),
      max(size(col("q"))).as("mx"),
      max(aggregate(col("q"), lit(0L),
        (a, x) => greatest(a, abs(x)))).as("mq"),
      // count NON-NULL vectors only: both Gram paths skip whole-null
      // vectors (explode semantics / the kernel's null check), so a
      // count(lit(1)) that included them would divide the moments by
      // an inflated n — the same silent deflation the null-ELEMENT
      // check below refuses
      count(col("q")).as("n"),
      // null ELEMENTS refuse loudly in both Gram paths: the kernel's
      // encoder would NPE on them, and the declarative sum would
      // silently skip them (deflating the moments) — neither is an
      // acceptable answer for a malformed vector
      sum(size(filter(col("q"), x => x.isNull))).as("nn")).head()
    // min/max over an empty (or all-null-vector) input aggregate to
    // NULL — fail with the intended message, not an NPE at getInt
    require(!guard.isNullAt(0) && !guard.isNullAt(1),
      "PCA needs at least 2 rows with non-null vectors, got 0")
    val d = guard.getInt(0)
    require(d == guard.getInt(1), s"ragged embedding dims: $d vs ${guard.getInt(1)}")
    require(d >= 1 && d <= 128, s"covariance explode is d^2 per row; d=$d")
    require(k >= 1 && k <= d && iters >= 1, s"bad k=$k iters=$iters")
    // |q| < 2^31 keeps every pairwise product inside a long; the sums
    // themselves accumulate in decimal(38,0) (exact at any n)
    val maxq = guard.getLong(2)
    require(maxq < (1L << 31),
      s"|x| must stay under 2^16 (quantized $maxq >= 2^31)")
    val n = guard.getLong(3)
    require(n >= 2, s"PCA needs at least 2 rows, got $n")
    require(guard.isNullAt(4) || guard.getLong(4) == 0L,
      s"PCA input has ${guard.getLong(4)} null vector ELEMENTS — " +
        "impute or drop malformed vectors upstream")
    // adaptive sum type: plain long aggregation when n·maxq² provably
    // fits (the common case — ~3× faster hash agg than decimal);
    // decimal(38,0) exact sums past that bound. Values are identical —
    // both are exact integer arithmetic.
    val longSafe = !forceDecimal &&
      BigInt(n) * BigInt(maxq) * BigInt(maxq) * 2 < BigInt(Long.MaxValue)
    def exactSum(c: Column): Column =
      if (longSafe) sum(c) else sum(c.cast(DecimalType(38, 0)))
    def asBigInt(r: org.apache.spark.sql.Row, idx: Int): BigInt =
      if (longSafe) BigInt(r.getLong(idx))
      else BigInt(r.getDecimal(idx).toBigInteger)
    // upper triangle only (the matrix is symmetric — half the work):
    // pos(i, j≥i) = i·d − i(i−1)/2 + (j−i); the d mean sums ride the
    // same accumulator at positions T..T+d−1 (T = d(d+1)/2).
    //
    // Hot path (longSafe): per-PARTITION long accumulators merged in
    // BigInt on the driver — each partition ships ONE (T+d)-long array
    // (16 KB at d=128), the scalable Gram shape at any corpus size.
    // Also ~40× less wall time than the declarative explode at sf0.1
    // (0.86s → 0.02s): Spark's array higher-order functions are
    // CodegenFallback, so the nested transform was interpreted per
    // element. Partition sums cannot overflow: they are sub-sums of
    // the globally-checked n·maxq² bound. The !longSafe fallback keeps
    // the exact decimal(38,0) explode — identical integer sums, just
    // slower, for corpora past the long bound.
    val nTri = d * (d + 1) / 2
    val dd = d // stable copy for the task closure
    val cells: Map[Int, BigInt] =
      if (longSafe) {
        import q.sparkSession.implicits._
        val partials = q.select(col("q")).as[Array[Long]]
          .mapPartitions { rows =>
            val acc = new Array[Long](dd * (dd + 1) / 2 + dd)
            rows.foreach { v =>
              if (v != null) { // explode semantics: null vectors skip
                var i = 0; var pos = 0
                while (i < dd) {
                  val qi = v(i)
                  var j = i
                  while (j < dd) { acc(pos) += qi * v(j); pos += 1; j += 1 }
                  acc(dd * (dd + 1) / 2 + i) += qi
                  i += 1
                }
              }
            }
            Iterator.single(acc)
          }.collect()
        val merged = Array.fill[BigInt](nTri + d)(BigInt(0))
        partials.foreach { p =>
          var i = 0
          while (i < merged.length) { merged(i) += BigInt(p(i)); i += 1 }
        }
        merged.zipWithIndex.map { case (v, i) => i -> v }.toMap
      } else q
        .select(posexplode(concat(
          flatten(transform(col("q"), (qi, i) =>
            transform(slice(col("q"), i + lit(1), size(col("q")) - i),
              qj => qi * qj))),
          col("q"))))
        .groupBy("pos")
        .agg(exactSum(col("col")).as("s"))
        .collect().map(r => r.getInt(0) -> asBigInt(r, 1)).toMap
    def gram(i: Int, j: Int): BigInt = {
      val (a, b) = if (i <= j) (i, j) else (j, i)
      cells(a * d - a * (a - 1) / 2 + (b - a))
    }
    def means(i: Int): BigInt = cells(nTri + i)

    // covariance cell: exact integer numerator, one conversion + one
    // division (the oracle replays this exact expression)
    val den = n.toDouble * n.toDouble * (1L << (2 * ScaleBits)).toDouble
    var m = Array.tabulate(d, d) { (j, i) =>
      val num = BigInt(n) * gram(j, i) - means(j) * means(i)
      num.toDouble / den
    }

    val comps = Array.ofDim[Array[Double]](k)
    val eigs = Array.ofDim[Double](k)
    for (c <- 0 until k) {
      var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
      var lam = 0.0
      var t = 0
      while (t < iters) {
        val w = Array.tabulate(d) { j =>
          var a = 0.0; var i = 0
          while (i < d) { a += m(j)(i) * v(i); i += 1 }
          a
        }
        var ns = 0.0
        var j = 0
        while (j < d) { ns += w(j) * w(j); j += 1 }
        lam = math.sqrt(ns)
        require(lam > 0.0, s"power iteration collapsed at component $c")
        v = w.map(_ / lam)
        t += 1
      }
      comps(c) = v
      eigs(c) = lam
      // deflate: m ← m − λ·v·vᵀ (pinned op order: ((λ*v_j)*v_i))
      val mm = m
      m = Array.tabulate(d, d)((j, i) => mm(j)(i) - lam * v(j) * v(i))
    }
    Model(comps, eigs)
  }

  /** Model as a small DataFrame (component, i, loading, eigenvalue) —
    * k·d rows, the persistable/oracle-comparable face of [[fit]]. */
  def modelFrame(spark: org.apache.spark.sql.SparkSession, model: Model)
      : DataFrame = {
    import spark.implicits._
    (for {
      c <- model.components.indices
      i <- 0 until model.dim
    } yield (c, i, model.components(c)(i), model.eigenvalues(c)))
      .toDF("component", "i", "loading", "eigenvalue")
  }

  /** Map-only projection of every vector onto the fitted components
    * (columns `p0..p{k-1}`) — [[Vectors.dot]] against literal component
    * arrays, so the transform rides whole-stage codegen with no shuffle
    * and no driver round trip at scan time. With `whiten` each
    * projection divides by √eigenvalue (unit variance along retained
    * components — the PCA-whitening preconditioner k-means/SemDeDup
    * want); the divisor is a driver-computed double literal, one IEEE
    * division per row. */
  def project(df: DataFrame, idCol: String, vecCol: String, model: Model,
              whiten: Boolean = false): DataFrame = {
    val projections = model.components.zipWithIndex.map { case (comp, c) =>
      val p = Vectors.dot(col(vecCol), lit(comp))
      val out =
        if (whiten) p / lit(math.sqrt(model.eigenvalues(c))) else p
      out.as(s"p$c")
    }
    df.select(col(idCol) +: projections.toIndexedSeq: _*)
  }
}
