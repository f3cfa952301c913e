package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, as pure Column
  * expressions (higher-order functions, codegen'd — no UDF boxing).
  *
  * Determinism: every reduction is a LEFT-TO-RIGHT sequential fold
  * (`aggregate`), so results are bit-identical across engines and across
  * re-runs at any parallelism — the floats are widened to double once and
  * the IEEE op sequence is fixed. (A tree reduction would be faster per row
  * by a constant factor but order-dependent; for 64–4096-dim embeddings the
  * fold is already memory-bound.)
  */
object Vectors {

  /** Σ a_i * b_i, sequential double fold — a native codegen'd Expression
    * ([[DotProduct]]); bit-identical to the HOF formulation
    * `aggregate(zip_with(...), 0.0, _+_)` but runs as a primitive loop
    * inside whole-stage codegen instead of interpreted lambda dispatch. */
  def dot(a: Column, b: Column): Column = DotProduct(a, b)

  def normSq(a: Column): Column = DotProduct(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; 0 for zero-norm inputs (no NaN poisoning). */
  def cosine(a: Column, b: Column): Column =
    cosineWithNorms(a, b, norm(a), norm(b))

  /** Cosine with pre-computed norms. Same value as [[cosine]] — use when
    * vectors are compared against many partners, so each side's norm is
    * computed once per VECTOR (map-side projection) instead of once per
    * PAIR. At 2k×2k pairs that's a 3× op-count cut; at corpus scale it's
    * the difference between O(pairs·dim) and O(rows·dim) norm work. */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column)
      : Column = {
    val nn = na * nb
    when(nn === 0.0, lit(0.0)).otherwise(dot(a, b) / nn)
  }

  def l2Dist(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0), (acc, v) => acc + v))

  /** Random-hyperplane LSH signature: `nBits` sign bits packed into a long.
    * Hyperplane h_j is a deterministic pseudo-random ±1 vector derived from
    * xxhash64(seed, j, i) — no stored model, reproducible on any executor,
    * and identical across runs (required for bucketing to be a join key).
    * sign(h_j · v) per bit; dot with a ±1 vector = sum of ± components.
    *
    * Native codegen [[RhpSignature]] expression — bit-identical to the HOF
    * formulation [[rhpSignatureHof]] it replaced (same hash chain, same
    * left-to-right fold) but a primitive loop over a precomputed ±1 plane
    * table instead of nBits×dim interpreted lambdas + hash calls per row. */
  def rhpSignature(vec: Column, nBits: Int, seed: Int): Column =
    RhpSignature(vec, nBits, seed)

  /** Johnson–Lindenstrauss ±1 random projection to `outDim` dims — the
    * pre-ANN compression step; shares [[RhpSignature]]'s deterministic
    * plane table, so `rhpSignature(v, k, s)` is exactly the sign-bit
    * vector of `rhpProject(v, k, s)`. See [[RhpProject]]. */
  def rhpProject(vec: Column, outDim: Int, seed: Int): Column =
    RhpProject(vec, outDim, seed)

  /** The original HOF formulation of [[rhpSignature]] — kept as the
    * executable specification the native expression is tested against. */
  private[graft] def rhpSignatureHof(vec: Column, nBits: Int,
                                     seed: Int): Column = {
    require(nBits >= 1 && nBits <= 63, "nBits in [1,63]")
    val bits = (0 until nBits).map { j =>
      // h_j[i] = +1 if xxhash64(seed, j, i) even else -1
      val s = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) => {
          val sign = when(
            pmod(xxhash64(lit(seed), lit(j), i), lit(2)) === 0,
            lit(1.0)).otherwise(lit(-1.0))
          x.cast("double") * sign
        }),
        lit(0.0), (acc, v) => acc + v)
      when(s >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }
}
