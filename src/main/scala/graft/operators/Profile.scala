package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass column profiler — the data-quality audit face of the
  * engine (what a nightly ingest job prints before anyone trains on
  * the drop): per column the row count, NULL count, exact distinct
  * count, and numeric range (NULL for non-numeric columns via
  * try_cast, so one output schema covers heterogeneous tables).
  *
  * Scale shape: ONE aggregate over the table — Spark plans the
  * multi-column distinct set via Expand (rows × |cols| intermediate,
  * map-side partial aggregation per column), which is the standard
  * one-pass trade; the result is a single row that pivots to
  * |cols| output rows driver-free. Exact distincts are the honest
  * audit numbers; swap in [[graft.functions.Hll]] registers per
  * column when the table outgrows them.
  *
  * Output: (col_name, n, nulls, n_distinct, min_num, max_num),
  * one row per profiled column — all exact integers/doubles, so the
  * profile replays bit-for-bit in SQL (q_profile).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.zipWithIndex.flatMap {
      case (c, i) => Seq(
        count(col(c)).as(s"__c$i"),
        count_distinct(col(c)).as(s"__d$i"),
        min(expr(s"try_cast(`$c` AS double)")).as(s"__mn$i"),
        max(expr(s"try_cast(`$c` AS double)")).as(s"__mx$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"), col("__n").as("n"),
        (col("__n") - col(s"__c$i")).as("nulls"),
        col(s"__d$i").as("n_distinct"),
        col(s"__mn$i").as("min_num"), col(s"__mx$i").as("max_num"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select("r.*")
      .orderBy("col_name")
  }

  /** Ingest-audit drift: per-column deltas between two snapshots'
    * [[profile]]s — null-rate and distinct-count drift catch schema rot
    * (a column going silently null, an enum exploding) before the
    * corpus does. Full-outer on col_name so an added/dropped column
    * surfaces as a NULL-sided row. Cost: the two single-pass profiles;
    * the join is |cols| rows. */
  def delta(a: DataFrame, b: DataFrame, cols: Seq[String]): DataFrame = {
    // profile each snapshot over the columns IT HAS: profiling both
    // over the shared list made the advertised added/dropped-column
    // detection unreachable (an AnalysisException on the missing
    // column, not a NULL-sided row — and schema rot is exactly what
    // this operator exists to catch)
    val ca = cols.filter(a.columns.contains)
    val cb = cols.filter(b.columns.contains)
    require(ca.nonEmpty || cb.nonEmpty,
      s"Profile.delta: none of [${cols.mkString(", ")}] exists in " +
        "either snapshot")
    def one(df: DataFrame, cs: Seq[String], sfx: String): DataFrame =
      if (cs.nonEmpty)
        profile(df, cs).select(col("col_name"),
          col("n").as(s"n_$sfx"), col("nulls").as(s"nulls_$sfx"),
          col("n_distinct").as(s"distinct_$sfx"))
      else {
        // every listed column is on the other side: an empty profile
        // so the full-outer join still emits its NULL-sided rows
        import org.apache.spark.sql.types._
        df.sparkSession.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          StructType(Seq(StructField("col_name", StringType),
            StructField(s"n_$sfx", LongType),
            StructField(s"nulls_$sfx", LongType),
            StructField(s"distinct_$sfx", LongType))))
      }
    val pa = one(a, ca, "a")
    val pb = one(b, cb, "b")
    pa.join(pb, Seq("col_name"), "full_outer")
      .withColumn("null_rate_delta",
        col("nulls_b").cast("double") / col("n_b").cast("double") -
          col("nulls_a").cast("double") / col("n_a").cast("double"))
      .withColumn("distinct_delta",
        col("distinct_b") - col("distinct_a"))
      .orderBy("col_name")
  }

  /** Shuffle-skew diagnosis for a prospective groupBy/join key: the
    * top-N heaviest key values with exact counts, corpus share, and the
    * key-space totals — "will this key Zipf-cliff my exchange, and do I
    * need [[graft.operators.Ops.saltedJoin]]?" answered BEFORE the
    * 100 TB job runs. One keyed aggregate (map-side combined) + a 1-row
    * broadcast of the totals + a bounded global top-N
    * (TakeOrderedAndProject — ≤ N rows per task cross the exchange).
    * Keys render as strings so one schema covers any key type; NULL
    * keys profile as the literal bucket "␀" (a skew cause in their own
    * right — NULL-heavy joins are the classic accidental hot key). */
  def keySkew(df: DataFrame, keyCol: Column, topN: Int = 25)
      : DataFrame = {
    require(topN >= 1, s"topN must be >= 1: $topN")
    val counts = df
      .select(coalesce(keyCol.cast("string"), lit("␀")).as("key"))
      .groupBy("key").agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).cast("long").as("total_rows"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .select(col("key"), col("cnt"),
        (col("cnt").cast("double") / col("total_rows").cast("double"))
          .as("share"),
        col("total_rows"), col("n_keys"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(topN)
  }
}
