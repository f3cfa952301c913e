package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the engine's contract surface for
  * "is this table fit to train on" (the Deequ/Great-Expectations
  * category, and the corpus-scale generalization of the reference's
  * per-item `assert_` operator, rx/operators `assert_`): a check SPEC
  * compiles to ONE aggregate pass over the table, producing one row
  * per check with its violation count — no per-check scans, no
  * driver-side row loops.
  *
  * Checks:
  *  - [[NotNull]]: NULL values in a column;
  *  - [[InRange]]: non-NULL values outside [lo, hi] (NULLs are
  *    [[NotNull]]'s business — a row should fail ONE check, not two);
  *  - [[Matches]]: non-NULL values not fully matching a regex;
  *  - [[Unique]]: duplicate rows over a key column set (violations =
  *    rows − distinct keys: the number of EXTRA rows carrying an
  *    already-seen key);
  *  - [[MinRows]]: table smaller than a floor (violations = deficit).
  *
  * Scale shape: every check except [[Unique]] is a map-side-combined
  * conditional sum riding one aggregate; [[Unique]] adds the standard
  * two-phase exact distinct over the key columns (shuffle keys are the
  * keys themselves — swap an HLL register table past exact-distinct
  * scale, the [[graft.llm.TextStats.corpusCard]] seam). The per-check
  * result pivot is `posexplode` of a literal-sized array — no second
  * pass, no driver loop. Exact integer outputs ⇒ SQL-replayable
  * (q_quality_checks hash-matches a DuckDB replay).
  *
  * Streaming face: the distributive subset (everything but [[Unique]])
  * runs per event-time window via
  * [[graft.streaming.ops.CheckOp]] — the continuous "tonight's crawl
  * violates the schema contract" monitor. */
object Quality {

  sealed trait Check {
    /** Stable identifier in the report (check, detail). */
    def name: String
    def detail: String
  }
  /** NULLs in `column`. */
  case class NotNull(column: String) extends Check {
    def name = "not_null"; def detail = column
  }
  /** Non-NULL values of `column` outside [lo, hi]. */
  case class InRange(column: String, lo: Double, hi: Double)
      extends Check {
    require(lo <= hi, s"InRange: lo > hi: $lo > $hi")
    def name = "in_range"; def detail = s"$column in [$lo, $hi]"
  }
  /** Non-NULL values of `column` not matching `regex` — `rlike`
    * semantics (unanchored substring search, identical in DuckDB's
    * `regexp_matches`): anchor with ^…$ for a full-value match. */
  case class Matches(column: String, regex: String) extends Check {
    def name = "matches"; def detail = s"$column ~ $regex"
  }
  /** Duplicate rows over the key `columns`. */
  case class Unique(columns: Seq[String]) extends Check {
    require(columns.nonEmpty, "Unique needs at least one column")
    def name = "unique"; def detail = columns.mkString(",")
  }
  /** Fewer than `atLeast` rows. */
  case class MinRows(atLeast: Long) extends Check {
    require(atLeast >= 0, s"MinRows: negative floor: $atLeast")
    def name = "min_rows"; def detail = s">= $atLeast"
  }

  /** The violation-count aggregate expression of one check (the
    * distributive subset — [[Unique]] is handled separately). */
  private[graft] def violations(c: Check): Column = c match {
    case NotNull(col0) =>
      coalesce(sum(when(col(col0).isNull, 1L)), lit(0L))
    case InRange(col0, lo, hi) =>
      coalesce(sum(when(col(col0).isNotNull &&
        (col(col0) < lo || col(col0) > hi), 1L)), lit(0L))
    case Matches(col0, re) =>
      coalesce(sum(when(col(col0).isNotNull &&
        !col(col0).rlike(re), 1L)), lit(0L))
    case MinRows(atLeast) =>
      greatest(lit(atLeast) - count(lit(1)), lit(0L))
    case _: Unique => throw new IllegalArgumentException(
      "Unique rides the distinct aggregate, not a conditional sum")
  }

  /** Run every check in (at most) two aggregate passes — one for the
    * conditional sums, one per [[Unique]] key set — and emit one row
    * per check: (check, detail, n_rows, violations, pass). Row order:
    * the spec's order (stable, oracle-friendly). */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "Quality.report: no checks given")
    val (uniques, simple) = checks.partition(_.isInstanceOf[Unique])
    val simpleCols = simple.zipWithIndex.map { case (c, i) =>
      violations(c).as(s"__v$i")
    }
    val uniqueCols = uniques.zipWithIndex.map { case (c, i) =>
      val ks = c.asInstanceOf[Unique].columns
      (count(lit(1)) -
        count_distinct(struct(ks.map(col): _*))).as(s"__u$i")
    }
    val agg = df.agg(
      (simpleCols ++ uniqueCols).head,
      (simpleCols ++ uniqueCols).tail :+ count(lit(1)).as("__n"): _*)
    // pivot the single wide row to (check, detail, violations) rows in
    // SPEC order via a literal array — no driver round-trip
    var si = -1
    var ui = -1
    val rows = checks.map { c =>
      val v = c match {
        case _: Unique => ui += 1; col(s"__u$ui")
        case _ => si += 1; col(s"__v$si")
      }
      struct(lit(c.name).as("check"), lit(c.detail).as("detail"),
        v.as("violations"))
    }
    agg.select(posexplode(array(rows: _*)), col("__n").as("n_rows"))
      .select((col("pos") + 1).cast("long").as("check_id"),
        col("col.check").as("check"), col("col.detail").as("detail"),
        col("n_rows"),
        col("col.violations").as("violations"),
        (col("col.violations") === 0L).as("pass"))
  }
}
