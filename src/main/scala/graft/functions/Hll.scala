package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch, expressed RELATIONALLY — registers
  * are a `groupBy(bucket).max(rho)` table, not an opaque binary blob
  * (Flajolet et al., AofA'07). The relational form is what makes the
  * sketch fully oracle-checkable: DuckDB replays the identical
  * xxhash64 → bucket/rho → max → harmonic-mean pipeline via the
  * [[graft.OracleXxh]] macro library, so the driver's gate hash-matches
  * the ESTIMATE bit-for-bit (Spark's own `approx_count_distinct` HLL++
  * is a sealed implementation that no external engine can replay —
  * that is why q_approx_distinct stayed rows-only).
  *
  * Scale shape: the register table is at most `2^p` rows after the
  * map-side-combined `max` aggregation — each task emits ≤ 2^p rows
  * into the shuffle regardless of input size, and the final reduce is
  * O(2^p). `max` is idempotent-distributive, so the same construction
  * works as a streaming windowed aggregate (register merge = max).
  *
  * Determinism contract for the oracle: every float step is a FIXED
  * sequence of IEEE ops on integer-exact inputs. The harmonic sum
  * `Σ 2^(-reg)` is computed in fixed point (`Σ 2^(K-reg)` as
  * DECIMAL(38,0), K = 64-p+1 = max rho), so no float accumulation
  * order exists to diverge; the only float ops are one literal
  * multiply, one divide (and, on the small-range branch, one ln) —
  * identical expression trees on both engines. The estimate ships as
  * `floor(est * 1000)` (a deterministic double→int step) rather than a
  * raw double, so value-hash comparison is exact.
  *
  * Branch caveat (measured): `ln` is NOT bit-identical across engines —
  * JVM `Math.log` and DuckDB/libm `ln` disagree in the last ulp for
  * ~7% of the inputs `m/V`, V in [1, 4096]. Oracled queries must
  * therefore sit in the RAW-branch regime (true cardinality well above
  * `2.5 * 2^p`, as q_hll_distinct does: n≈2000 vs threshold 1280);
  * the linear-counting branch stays ScalaTest-pinned (HllSpec) for
  * in-engine use, where it is deterministic.
  *
  * Reference behavior mapped: the reference exposes only exact
  * `rs.math.count` (rxsci/math/count.py); this is the 100 TB-scale
  * companion the survey's sketch battery calls for (SURVEY.md §2.6).
  */
object Hll {

  /** alpha_m bias constant (AofA'07 Table 1; m >= 128 uses the formula). */
  def alpha(p: Int): Double = {
    val m = 1 << p
    m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
  }

  /** Per-item (bucket, rho) projection: bucket = top `p` bits of the
    * unsigned xxhash64, rho = 1 + leading-zero count of the remaining
    * 64-p bits (rho = 64-p+1 when they are all zero).
    *
    * `length(bin(rem))` is the bit length of the remainder — an exact
    * integer path; no float log2 that could round wrong at powers of
    * two. */
  def bucketAndRho(item: Column, p: Int): (Column, Column) = {
    require(p >= 4 && p <= 16, s"p must be in [4,16]: $p")
    val h = xxhash64(item)
    val w = 64 - p
    val bucket = shiftrightunsigned(h, w).cast("int")
    val rem = h.bitwiseAND(lit((1L << w) - 1L))
    val rho = when(rem === 0L, lit(w + 1))
      .otherwise(lit(w + 1) - length(bin(rem)))
    (bucket, rho.cast("int"))
  }

  /** Register table: one row per NON-EMPTY bucket (and per group, if
    * `groupCols` given) — `(groupCols..., bucket int, register int)`.
    * Empty buckets are implicit (register 0); [[estimate]] accounts for
    * them arithmetically, so the table never materializes 2^p rows per
    * group for sparse groups. */
  def registers(df: DataFrame, item: Column, p: Int,
                groupCols: Seq[Column] = Nil): DataFrame = {
    val (bucket, rho) = bucketAndRho(item, p)
    // NULL items must not count: Spark's xxhash64 SKIPS null children
    // and returns the seed, so a NULL row would set one fixed
    // (bucket, rho) register — a phantom distinct element that
    // count(DISTINCT)/approx_count_distinct (both null-ignoring, the
    // aggregates this sketch stands in for) would never see
    df.filter(item.isNotNull)
      .groupBy(groupCols :+ bucket.as("bucket"): _*)
      .agg(max(rho).as("register"))
  }

  /** Estimate from a register table (per group if `groupCols` given):
    * raw HLL `alpha * m^2 / Σ 2^(-reg)` with the AofA'07 small-range
    * linear-counting correction `m * ln(m / V)` when est <= 2.5m and
    * V (empty buckets) > 0.
    *
    * Output: `est_millis` = floor(est * 1000) plus integer
    * diagnostics (`nonempty_buckets`, `register_sum`). */
  def estimate(regs: DataFrame, p: Int,
               groupCols: Seq[Column] = Nil): DataFrame = {
    val m = 1 << p
    val (agged, est, vZero) = rawAgg(regs, p, groupCols)
    val corrected = when(est <= lit(2.5 * m) && vZero > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / vZero.cast("double")))
      .otherwise(est)
    agged.select(
      groupCols ++: Seq(
        floor(corrected * lit(1000.0)).cast("bigint").as("est_millis"),
        col("nonempty_buckets"),
        col("register_sum")): _*)
  }

  /** Oracle-audit variant of [[estimate]] with ZERO libm exposure: emits
    * the RAW harmonic estimate (`raw_est_millis` — one double literal,
    * one integer→double cast, one divide, one multiply, one floor: all
    * correctly-rounded IEEE ops, bit-identical on any engine) plus the
    * branch selector `small_range` (exact comparison on those same
    * doubles), instead of the corrected estimate. In the small-range
    * regime the linear-counting correction `m·ln(m/V)` is a pure
    * function of `nonempty_buckets` (V = m − nonempty), so hash-matching
    * `nonempty_buckets` + `small_range` pins the corrected estimate
    * exactly as strongly as emitting it — without betting the gate on
    * JVM `Math.log` and libm `ln` agreeing in the last ulp (they
    * measurably do not; see the class scaladoc). Use THIS shape for
    * DuckDB-oracled queries whose cardinalities can dip below `2.5·m`;
    * [[estimate]] remains the in-engine user-facing finisher. */
  def estimateAudit(regs: DataFrame, p: Int,
                    groupCols: Seq[Column] = Nil): DataFrame = {
    val m = 1 << p
    val (agged, est, vZero) = rawAgg(regs, p, groupCols)
    agged.select(
      groupCols ++: Seq(
        floor(est * lit(1000.0)).cast("bigint").as("raw_est_millis"),
        (est <= lit(2.5 * m) && vZero > 0).as("small_range"),
        col("nonempty_buckets"),
        col("register_sum")): _*)
  }

  /** Shared register-table aggregation + raw-estimate math for
    * [[estimate]] and [[estimateAudit]]: the determinism-critical body
    * lives ONCE so the two finishers cannot drift (round-9 advice).
    * Returns the aggregated frame plus the raw-estimate and
    * empty-bucket-count columns the finishers project differently. */
  private def rawAgg(regs: DataFrame, p: Int, groupCols: Seq[Column])
      : (DataFrame, Column, Column) = {
    val m = 1 << p
    val k = 64 - p + 1 // max possible rho; fixed-point scale
    // Σ 2^(K-reg) over non-empty buckets, exactly, in DECIMAL(38,0).
    // (expr(): the DataFrame-API shiftleft only takes a literal shift;
    // the underlying ShiftLeft expression takes a column. K-reg <= 60
    // so the shifted value fits a long.)
    val sNonEmpty = sum(
      expr(s"shiftleft(CAST(1 AS BIGINT), $k - register)")
        .cast("decimal(38,0)"))
    // coalesce: a global (no-group) aggregate over an EMPTY register
    // table still yields one row, where sum() is NULL — pinning the
    // sums to 0 lands that row in the V=m linear-counting branch,
    // whose m*ln(m/m)=0 is the right empty-set estimate
    val agged = regs
      .groupBy(groupCols: _*)
      .agg(count(lit(1)).as("nonempty_buckets"),
        coalesce(sum(col("register")).cast("bigint"), lit(0L))
          .as("register_sum"),
        coalesce(sNonEmpty, lit(java.math.BigDecimal.ZERO)
          .cast("decimal(38,0)")).as("__s_ne"))
    // add the empty buckets' 2^(K-0) contributions, still exact
    val twoK = java.math.BigDecimal.valueOf(2).pow(k)
    val s = (col("__s_ne") +
      (lit(m).cast("decimal(38,0)") - col("nonempty_buckets"))
        * lit(twoK)).cast("double")
    val vZero = lit(m) - col("nonempty_buckets")
    // alpha * m^2 * 2^K as one Scala-side double literal so the oracle
    // SQL can embed the identical constant (see oracle builder)
    val est = lit(rawNumerator(p)) / s
    (agged, est, vZero)
  }

  /** `alpha * m^2 * 2^K` — the numerator of the raw estimate over the
    * fixed-point harmonic sum. Exposed so oracle SQL embeds the exact
    * same double literal (`rawNumerator(p).toString` round-trips). */
  def rawNumerator(p: Int): Double = {
    val m = (1 << p).toDouble
    alpha(p) * m * m * math.pow(2.0, 64 - p + 1)
  }

  /** One-call distinct-count estimate. */
  def distinctCount(df: DataFrame, item: Column, p: Int): DataFrame =
    estimate(registers(df, item, p), p)

  /** Merge register tables (cross-day / cross-stream / cross-corpus
    * union-of-sets semantics): register merge is `max`, so the union
    * re-aggregates to one table estimating the DISTINCT union. Both
    * inputs must share the `(groupCols..., bucket, register)` shape
    * emitted by [[registers]] — AND the same `p`: a register built at
    * a higher precision can exceed this p's max rho 64-p+1, which
    * would silently wrap [[estimate]]'s shift amount (Spark shiftleft
    * masks to 6 bits) into a plausible-looking garbage estimate. The
    * per-row guard turns a precision mismatch into an ERROR instead. */
  def mergeRegisters(a: DataFrame, b: DataFrame, p: Int,
                     groupCols: Seq[Column] = Nil): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16]: $p")
    val maxRho = 64 - p + 1
    val guarded = when(
      col("register") < 0 || col("register") > maxRho ||
        col("bucket") < 0 || col("bucket") >= (1 << p),
      raise_error(concat(
        lit(s"mergeRegisters: (bucket, register) out of range for p=$p " +
          s"(bucket < ${1 << p}, rho <= $maxRho) — inputs built at a " +
          "different precision? bucket="),
        col("bucket").cast("string"), lit(" register="),
        col("register").cast("string"))).cast("int"))
      .otherwise(col("register"))
    a.unionByName(b)
      .withColumn("register", guarded)
      .groupBy(groupCols :+ col("bucket"): _*)
      .agg(max(col("register")).as("register"))
  }
}
