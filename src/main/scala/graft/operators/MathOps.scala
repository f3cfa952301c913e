package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Pipe.Op

/** rxsci `rs.math.*` family (SURVEY.md §2.4): streaming descriptive stats
  * re-expressed as Spark aggregates (partial+final aggregation — i.e.
  * map-side combine — comes free, so these scale shuffle-linearly).
  *
  * Exactness policy: inputs in the test corpus are 2-decimal doubles.
  * Double summation is order-dependent, and Spark's partial-aggregate order
  * differs from any single-threaded oracle, so [[exactSum]] aggregates in
  * exact DECIMAL space (order-independent) and converts to double once at
  * the end — bit-identical results at any parallelism, which is also what a
  * 1000-executor run needs for reproducibility.
  */
object MathOps {

  /** Order-independent exact sum of a fixed-scale quantity: cast each value
    * to DECIMAL (exact at `scale` decimals), sum exactly, convert once. */
  def exactSum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Exact mean: exact decimal sum / count, divided in double (one IEEE op —
    * deterministic and engine-independent). */
  def exactMean(c: Column, scale: Int = 2): Column =
    exactSum(c, scale) / count(c)

  /** Sample variance from exact moments: (Σx² − (Σx)²/n) / (n−1), all
    * accumulations exact in decimal, combined with a fixed double-op
    * sequence. Matches any engine computing the same formula. */
  def exactVarSamp(c: Column, scale: Int = 2): Column = {
    val d = c.cast(s"decimal(18,$scale)")
    val sumSq = sum((d * d).cast(s"decimal(38,${2 * scale})")).cast("double")
    val s = sum(d).cast("double")
    val n = count(c).cast("double")
    (sumSq - s * s / n) / (n - lit(1.0))
  }

  def exactStddevSamp(c: Column, scale: Int = 2): Column =
    sqrt(exactVarSamp(c, scale))

  /** Exact Pearson correlation from decimal moments: every accumulation
    * (Σx, Σy, Σxy, Σx², Σy²) is exact in decimal space
    * (order-independent under partial aggregation), combined with ONE
    * fixed sequence of double ops — so any engine computing the same
    * formula text matches bit-for-bit (the [[exactVarSamp]] rule,
    * extended to two variables). Scales are per-column (a 2-decimal
    * measure against an integral key uses (2, 0)). */
  def exactCorr(x: Column, y: Column, xScale: Int = 2, yScale: Int = 2)
      : Column = {
    val dx = x.cast(s"decimal(18,$xScale)")
    val dy = y.cast(s"decimal(18,$yScale)")
    val n = count(x).cast("double")
    val sx = sum(dx).cast("double")
    val sy = sum(dy).cast("double")
    val sxy = sum((dx * dy).cast(s"decimal(38,${xScale + yScale})"))
      .cast("double")
    val sxx = sum((dx * dx).cast(s"decimal(38,${2 * xScale})"))
      .cast("double")
    val syy = sum((dy * dy).cast(s"decimal(38,${2 * yScale})"))
      .cast("double")
    (n * sxy - sx * sy) /
      sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
  }

  /** Trailing time-range aggregate per key: sum/count over the last
    * `seconds` of event time, emitted per event (RANGE frame on an
    * epoch-seconds order key — ties are frame peers in every engine, so
    * results are layout-independent). WindowExec partitions by key:
    * parallel across keys, sequential only within one key's timeline —
    * the correct shape for per-entity rolling features at cluster scale
    * (an unkeyed global rolling window would be one partition; don't).
    * Decimal-exact sum ([[exactSum]] rule) converted to double once. */
  def trailingTimeAgg(valueCol: Column, epochSec: Column, seconds: Long,
                      keys: Seq[Column]): Op = { df =>
    require(keys.nonEmpty,
      "trailingTimeAgg needs partition keys (a global rolling window " +
        "is a single-partition sort at scale)")
    val w = Window.partitionBy(keys: _*).orderBy(epochSec)
      .rangeBetween(-seconds, 0)
    df.withColumn("trailing_sum",
        sum(valueCol.cast("decimal(18,2)")).over(w).cast("double"))
      .withColumn("trailing_n", count(valueCol).over(w))
  }

  /** `rs.math.mean(reduce=True)` over [[DataOps.roll]] windows: aggregate per
    * window_id (+ partition keys), emitting once per window close. */
  def mean(valueCol: Column, keys: Seq[Column] = Nil): Op = { df =>
    df.groupBy(keys :+ col(DataOps.WindowCol): _*)
      .agg(exactMean(valueCol).as("mean"))
  }

  /** Full descriptive-stat block per key: min/max/sum/mean/var/stddev/count.
    * One shuffle, partials combined map-side. */
  def describe(valueCol: Column, keys: Seq[Column]): Op = { df =>
    df.groupBy(keys: _*).agg(
      count(valueCol).as("n"),
      min(valueCol).as("min"),
      max(valueCol).as("max"),
      exactSum(valueCol).as("sum"),
      exactMean(valueCol).as("mean"),
      exactVarSamp(valueCol).as("var_samp"),
      exactStddevSamp(valueCol).as("stddev_samp"))
  }

  /** rxsci `cumsum`: running sum per key under an explicit order (window
    * aggregate — sequential within key, parallel across keys). */
  def cumsum(valueCol: Column, order: Seq[Column],
             partition: Seq[Column] = Nil, as: String = "cumsum"): Op =
    Ops.scan(sum(valueCol), as, order, partition)

  /** rxsci `ewma(alpha)`: exponentially weighted moving average.
    * EWMA is an inherently sequential per-key fold (e_i = αx_i + (1−α)e_{i−1})
    * — order matters, so groupBy aggregation order (nondeterministic under
    * partial aggregation) cannot express it. Engine: repartition by key +
    * sortWithinPartitions + a streaming mapPartitions fold — O(1) state per
    * key (one accumulator), every step emitted, any key-series length. The
    * earlier collect_list formulation held each key's ENTIRE series in one
    * aggregation buffer — a hot key at 100 TB scale OOMs the executor;
    * this one never materializes more than the current row.
    *
    * [[ewmaScan]] emits one row per event (the reference's scan semantics,
    * reference rxsci ewma); [[ewmaByKey]] emits only each key's final
    * value. Per-key sequential is intrinsic to the operator; across keys
    * this parallelizes linearly. */
  def ewmaScan(valueCol: Column, order: Seq[Column], alpha: Double,
               keys: Seq[Column], as: String = "ewma"): Op =
    ewmaFold(valueCol, order, alpha, keys, as, perEvent = true)

  /** True iff the column is a bare attribute reference (safe to re-select
    * and re-resolve by name downstream). */
  private def isAttr(c: Column): Boolean =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(c) match {
      case _: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        true
      case _: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
        true
      case _ => false
    }

  /** Final EWMA per key — see [[ewmaScan]] for the engine. When every
    * argument is a plain column, output is pruned to (keys, order
    * columns, value, ewma): the sequential fold re-encodes every carried
    * column per row, so the final-per-key form ships only what it
    * answers with (the per-event [[ewmaScan]] keeps the full row — its
    * contract is "the input row plus ewma"). Expression-valued arguments
    * skip the pruning (re-selecting an expression would strip the
    * attributes it references). */
  def ewmaByKey(valueCol: Column, ts: Column, alpha: Double,
                keys: Seq[Column]): Op = { df =>
    val args = keys :+ ts :+ valueCol
    val slim =
      if (args.forall(isAttr)) df.select(args.distinctBy(_.toString): _*)
      else df
    // ties in ts fold in value order, preserving the semantics of the
    // sorted-struct formulation this replaced
    ewmaFold(valueCol, Seq(ts, valueCol), alpha, keys, "ewma",
      perEvent = false)(slim)
  }

  /** NULL policy: rows whose value is NULL are dropped before the fold —
    * an EWMA over missing observations is undefined, and a silent
    * carry-forward would corrupt every later step of the key's series.
    * (Matches the reference's drop-on-error serving semantics,
    * reference makinage/serve/serve.py:107-118.) */
  private def ewmaFold(valueCol: Column, order: Seq[Column], alpha: Double,
                       keys: Seq[Column], as: String,
                       perEvent: Boolean): Op = { df =>
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.DoubleType
    // β computed once in double space; for the common 1-digit alphas this
    // is bit-identical to the decimal literal an oracle engine parses
    val beta = 1.0 - alpha
    val prep = df
      .withColumn("__v", valueCol.cast("double"))
      .filter(col("__v").isNotNull)
      .withColumn("__k", struct(keys: _*))
    val sorted = prep
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k") +: order: _*)
    val schema = sorted.schema
    val kIdx = schema.fieldIndex("__k")
    val vIdx = schema.fieldIndex("__v")
    val outSchema = schema.add(as, DoubleType)
    val width = schema.length
    // append without the r.toSeq :+ detour (a WrappedArray + two list
    // copies per row): one pre-sized array copy per emitted row
    def append(r: Row, e: Double): Row = {
      val arr = new Array[Any](width + 1)
      var i = 0
      while (i < width) { arr(i) = r.get(i); i += 1 }
      arr(width) = e
      new org.apache.spark.sql.catalyst.expressions.GenericRow(arr)
    }
    val folded = sorted.mapPartitions { it =>
      if (perEvent) {
        var have = false
        var curKey: Any = null
        var e = 0.0
        it.map { r =>
          val k = r.get(kIdx)
          val x = r.getDouble(vIdx)
          if (!have || k != curKey) { have = true; curKey = k; e = x }
          else e = alpha * x + beta * e
          append(r, e)
        }
      } else new Iterator[Row] {
        private var nextOut: Row = null
        private var have = false
        private var curKey: Any = null
        private var lastRow: Row = null
        private var e = 0.0
        private def emit(): Row = append(lastRow, e)
        def hasNext: Boolean = {
          if (nextOut != null) return true
          while (it.hasNext) {
            val r = it.next()
            val k = r.get(kIdx)
            val x = r.getDouble(vIdx)
            if (!have) { have = true; curKey = k; e = x; lastRow = r }
            else if (k == curKey) { e = alpha * x + beta * e; lastRow = r }
            else { // key closed: emit its final, start the next
              nextOut = emit(); curKey = k; e = x; lastRow = r
              return true
            }
          }
          if (have) { nextOut = emit(); have = false; return true }
          false
        }
        def next(): Row = {
          if (!hasNext) throw new NoSuchElementException
          val r = nextOut; nextOut = null; r
        }
      }
    }(Encoders.row(outSchema))
    folded.drop("__v", "__k")
  }

  /** Two-phase salted aggregation — the skew-mitigation idiom for hot keys
    * at cluster scale. Phase 1 groups by (key, salt) so a skewed key's rows
    * spread across `buckets` reducers; phase 2 combines the per-salt
    * partials. Result is IDENTICAL to a direct groupBy (sums are
    * decimal-exact and order-independent) — only the shuffle shape changes.
    * With AQE's skew handling off or insufficient, this is the manual
    * escape hatch. The salt is positional (monotonically_increasing_id
    * mod buckets), NOT a row-content hash: the classic skew source is a
    * hot key of byte-identical duplicate events, and a content hash
    * sends every duplicate to the SAME salt bucket — no spread exactly
    * when it's needed. The salt never reaches the result (phase 2
    * re-aggregates it away), so positional assignment costs nothing in
    * determinism of the OUTPUT. */
  def saltedSumCount(valueCol: Column, keys: Seq[Column],
                     buckets: Int = 16): Op = { df =>
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val partial = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__pn"),
        sum(valueCol.cast("decimal(18,2)")).as("__psum"))
    partial.groupBy(keys: _*)
      .agg(sum(col("__pn")).as("n"),
        sum(col("__psum")).cast("double").as("sum"))
  }

  /** Approximate distinct count (HLL++ sketch) — mergeable, fixed-size
    * state: the 100 TB answer to COUNT(DISTINCT) (exact distinct needs a
    * full shuffle of the key space; the sketch is a map-side-combinable
    * few KB). rsd = relative standard deviation. */
  def approxDistinct(c: Column, keys: Seq[Column],
                     rsd: Double = 0.01): Op = { df =>
    df.groupBy(keys: _*)
      .agg(approx_count_distinct(c, rsd).as("approx_nd"))
  }

  /** `rs.math.dist.*` (distogram sketches): approximate quantiles and
    * distinct counts via Spark's mergeable sketches — the scale-correct
    * choice at 100 TB (fixed-size state, shuffle-linear). */
  def quantiles(valueCol: Column, probs: Seq[Double], keys: Seq[Column],
                accuracy: Int = 10000): Op = { df =>
    df.groupBy(keys: _*).agg(
      percentile_approx(valueCol,
        array(probs.map(lit): _*), lit(accuracy)).as("quantiles"))
  }

  /** Exact median per key (for oracle-checkable tests; approximate form
    * above is the scale path). */
  def median(valueCol: Column, keys: Seq[Column]): Op = { df =>
    df.groupBy(keys: _*)
      .agg(percentile(valueCol, lit(0.5)).as("median"))
  }

  /** Fixed-width histogram: bucket index per row then count — exact,
    * shuffle-linear, streaming-safe (unlike sorted-based histograms). */
  def histogram(valueCol: Column, lo: Double, hi: Double, nBuckets: Int,
                keys: Seq[Column] = Nil): Op = { df =>
    val bucket = least(greatest(
      floor((valueCol - lo) / ((hi - lo) / nBuckets)), lit(0)),
      lit(nBuckets - 1)).cast("long")
    df.withColumn("bucket", bucket)
      .groupBy(keys :+ col("bucket"): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** EXACT per-key quantile, type-1 (inverted CDF): the value at
    * 1-based ascending rank max(1, ceil(p·n)) within each key — the
    * p95-latency-per-endpoint / p99-doc-length-per-source number, with
    * no interpolation (the answer is a value that EXISTS in the data,
    * and the arithmetic — one IEEE multiply + ceil — replays in any
    * engine, unlike interpolated quantiles whose blend arithmetic
    * differs; oracled as q_quantile_by_key). [[median]] stays the
    * interpolating convenience where cross-engine exactness is not
    * needed.
    *
    * Rank arithmetic contract: the rank is `ceil` of the RAW IEEE
    * product p·n — when the mathematical product is an integer whose
    * double rounding lands a hair high (p=0.95, n=20 → 19.000000000000004
    * → rank 20, not the textbook 19), the IEEE answer is the contract,
    * because that exact product is what ANY engine computes from the
    * same doubles (the oracle replays it bit-for-bit; a tolerance would
    * instead fork on where the tolerance sits). Callers at those
    * boundaries get the element one rank above the textbook inverted
    * CDF — by design, deterministically, on every engine.
    *
    * One key-partitioned WindowExec (rank + count share the partition);
    * per-task work is bounded by the largest single key, the usual
    * keyed-window contract. Output: keys…, n, q. */
  def quantileByKey(valueCol: Column, p: Double,
                    keys: Seq[Column]): Op = { df =>
    require(p > 0 && p <= 1, s"quantileByKey: p must be in (0, 1]: $p")
    require(keys.nonEmpty,
      "quantileByKey: keys must be non-empty (a keyless exact quantile " +
        "is a global sort — use median/approx quantiles)")
    // NULL values are refused: Spark sorts NULLs FIRST ascending while
    // SQL engines default NULLS LAST — a silent cross-engine rank fork
    // (and a NULL "quantile" answers nothing anyway)
    val v = when(valueCol.isNull,
      raise_error(lit("quantileByKey: NULL value"))).otherwise(valueCol)
    val w = Window.partitionBy(keys: _*).orderBy(v.asc)
    val wAll = Window.partitionBy(keys: _*)
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .filter(col("__rn") ===
        greatest(lit(1L), ceil(lit(p) * col("n"))))
      .select(keys ++ Seq(col("n"), valueCol.as("q")): _*)
  }
}
