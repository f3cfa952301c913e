package graft.streaming.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Quality
import graft.streaming.OperatorFactory

/** Windowed data-quality monitor as a topology factory — the streaming
  * face of [[graft.operators.Quality]]: per event-time window, one row
  * per configured check with its violation count, append-finalized
  * when the watermark passes (the continuous "tonight's crawl violates
  * the schema contract" alert; [[DriftOp]] watches the distribution,
  * this watches the contract).
  *
  * Only the DISTRIBUTIVE checks run in-stream (not_null / in_range /
  * matches / min_rows — all map-side-combined conditional sums in ONE
  * windowed aggregate; min_rows is per-window). `unique` needs an
  * exact distinct and is refused here — run it as a batch
  * [[Quality.report]] audit — but `unique_approx` monitors the same
  * contract at sketch precision: violations ≈ rows −
  * approx_count_distinct(keys) (HLL++, rsd configurable), the bounded
  * state streaming aggregation supports. An approximate count can
  * under- OR over-shoot, so `pass` uses a `tolerance` slack
  * (violations ≤ tolerance ⇒ pass, default 0 — treat small positive
  * values as estimation noise at your chosen rsd).
  *
  * Config: `window` (default "1 hour"), `timestamp_col` ("ts"), and
  * `checks` — a list of maps, each `{type: not_null|in_range|matches|
  * min_rows|unique_approx, column?, lo?, hi?, regex?, at_least?,
  * columns? (comma-joined), rsd? (0.05), tolerance? (0)}` (the YAML
  * form).
  * Output: (window_start, check_id, check, detail, n_rows, violations,
  * pass). Batch sources take the same path — one factory, both
  * modes (StreamingSpec pins stream == batch == Quality.report per
  * window). */
object CheckOp extends OperatorFactory {

  private[ops] def parseCheck(m: Map[String, Any])
      : Either[UniqueApprox, Quality.Check] = {
    def str(k: String): String = m.getOrElse(k, sys.error(
      s"CheckOp: check ${m} needs '$k'")).toString
    m.getOrElse("type", sys.error(s"CheckOp: check $m needs 'type'"))
      .toString match {
      case "not_null" => Right(Quality.NotNull(str("column")))
      case "in_range" => Right(Quality.InRange(str("column"),
        str("lo").toDouble, str("hi").toDouble))
      case "matches" => Right(Quality.Matches(str("column"),
        str("regex")))
      case "min_rows" => Right(Quality.MinRows(str("at_least").toLong))
      case "unique_approx" => Left(UniqueApprox(
        str("columns").split(",").map(_.trim).filter(_.nonEmpty).toSeq,
        m.getOrElse("rsd", 0.05).toString.toDouble,
        m.getOrElse("tolerance", 0L).toString.toLong))
      case "unique" => sys.error(
        "CheckOp: 'unique' needs an exact distinct aggregate — run it " +
          "as a batch Quality.report audit, or use 'unique_approx'")
      case other => sys.error(s"CheckOp: unknown check type '$other'")
    }
  }

  /** The sketch-precision dup check (streaming-only — batch audits use
    * the exact [[Quality.Unique]]). */
  private[ops] case class UniqueApprox(columns: Seq[String],
                                       rsd: Double, tolerance: Long)

  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val win = config.getOrElse("window", "1 hour").toString
    val tsCol = config.getOrElse("timestamp_col", "ts").toString
    val checks = (config.getOrElse("checks", sys.error(
      "CheckOp: 'checks' is required")) match {
      case l: java.util.List[_] =>
        scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.toSeq
          .map {
            case jm: java.util.Map[_, _] =>
              scala.jdk.CollectionConverters.MapHasAsScala(jm).asScala
                .map { case (k, v) => k.toString -> v.asInstanceOf[Any] }
                .toMap
            case sm: Map[_, _] =>
              sm.map { case (k, v) => k.toString -> v.asInstanceOf[Any] }
          }
      case l: Seq[_] => l.map {
        case sm: Map[_, _] =>
          sm.map { case (k, v) => k.toString -> v.asInstanceOf[Any] }
        case other => sys.error(s"CheckOp: bad check entry $other")
      }
      case other => sys.error(s"CheckOp: bad 'checks' value $other")
    }).map(parseCheck)
    require(checks.nonEmpty, "CheckOp: empty check list")
    // per check: (name, detail, violations aggregate, pass tolerance)
    val compiled = checks.map {
      case Right(c) => (c.name, c.detail, Quality.violations(c), 0L)
      case Left(u) => ("unique_approx", u.columns.mkString(","),
        greatest(count(lit(1)) - approx_count_distinct(
          struct(u.columns.map(col): _*), u.rsd), lit(0L)),
        u.tolerance)
    }
    val vCols = compiled.zipWithIndex.map { case ((_, _, v, _), i) =>
      v.as(s"__v$i")
    }
    val agg = sources.head
      .groupBy(window(col(tsCol), win).as("__win"))
      .agg(vCols.head, vCols.tail :+ count(lit(1)).as("__n"): _*)
    val rows = compiled.zipWithIndex.map { case ((name, det, _, tol), i) =>
      struct(lit(name).as("check"), lit(det).as("detail"),
        col(s"__v$i").as("violations"),
        (col(s"__v$i") <= tol).as("pass"))
    }
    Seq(agg
      .select(col("__win.start").as("window_start"),
        posexplode(array(rows: _*)), col("__n").as("n_rows"))
      .select(col("window_start"),
        (col("pos") + 1).cast("long").as("check_id"),
        col("col.check").as("check"), col("col.detail").as("detail"),
        col("n_rows"), col("col.violations").as("violations"),
        col("col.pass").as("pass")))
  }
}
