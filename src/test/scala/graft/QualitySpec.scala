package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Quality
import graft.operators.Quality._

/** Pins the declarative data-quality checks: exact violation counts on
  * a hand-dirtied table, one-row-per-check spec ordering, NULL
  * attribution (a NULL fails not_null, never in_range/matches), and
  * the windowed streaming face (CheckOp) batch parity. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, true),
    StructField("grp", LongType, true),
    StructField("v", DoubleType, true),
    StructField("tag", StringType, true)))

  // 8 rows: one NULL id, one dup (id,grp) pair, two v out of [0,10],
  // one NULL v, one bad tag, one NULL tag
  private def dirty = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row(1L, 1L, 1.0, "ok"),
      Row(null, 1L, 2.0, "ok"),
      Row(2L, 1L, -5.0, "ok"),
      Row(2L, 1L, 11.0, "ok"),
      Row(3L, 2L, null, "ok"),
      Row(4L, 2L, 3.0, "bad!"),
      Row(5L, 2L, 4.0, null),
      Row(6L, 2L, 5.0, "ok"))), schema)

  test("report: exact violation counts per check, spec order, NULLs " +
    "attributed to not_null only") {
    val got = Quality.report(dirty, Seq(
      NotNull("id"), NotNull("v"), Unique(Seq("id", "grp")),
      InRange("v", 0.0, 10.0), Matches("tag", "^ok$"),
      MinRows(5L), MinRows(100L)))
      .orderBy("check_id")
      .select("check", "detail", "n_rows", "violations", "pass")
      .as[(String, String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("not_null", "id", 8L, 1L, false),
      ("not_null", "v", 8L, 1L, false),
      ("unique", "id,grp", 8L, 1L, false),
      ("in_range", "v in [0.0, 10.0]", 8L, 2L, false),
      // NULL tag does NOT violate matches; "bad!" does
      ("matches", "tag ~ ^ok$", 8L, 1L, false),
      ("min_rows", ">= 5", 8L, 0L, true),
      ("min_rows", ">= 100", 8L, 92L, false)), got)
    // a clean table passes everything
    val clean = Quality.report(
      dirty.filter(col("id").isNotNull && col("v").between(0, 10) &&
        col("tag") === "ok").dropDuplicates("id", "grp"),
      Seq(NotNull("id"), Unique(Seq("id", "grp")),
        InRange("v", 0.0, 10.0), Matches("tag", "^ok$")))
    assert(clean.filter(!col("pass")).count() == 0)
    intercept[IllegalArgumentException] {
      Quality.report(dirty, Nil)
    }
  }

  test("CheckOp: windowed streaming violations equal the batch report " +
    "per window; 'unique' is refused in-stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2026-07-01 $h%02d:15:00")
    val rows: Seq[(java.sql.Timestamp, Option[Long], Option[Double])] =
      Seq((ts(0), Some(1L), Some(1.0)), (ts(0), None, Some(2.0)),
        (ts(0), Some(2L), Some(-3.0)),
        (ts(1), Some(3L), None), (ts(1), Some(4L), Some(99.0)))
    val in = MemoryStream[(java.sql.Timestamp, Option[Long], Option[Double])]
    val src = in.toDF().toDF("ts", "id", "v")
      .withWatermark("ts", "0 seconds")
    val checks = Seq(
      Map[String, Any]("type" -> "not_null", "column" -> "id"),
      Map[String, Any]("type" -> "in_range", "column" -> "v",
        "lo" -> 0.0, "hi" -> 10.0),
      Map[String, Any]("type" -> "min_rows", "at_least" -> 3),
      // sketch-precision dup monitor: ids are distinct in both hours,
      // and at these cardinalities HLL++ is exact, so violations = 0
      Map[String, Any]("type" -> "unique_approx", "columns" -> "id",
        "tolerance" -> 0))
    val out = graft.streaming.ops.CheckOp(
      Map("window" -> "1 hour", "checks" -> checks), Seq(src)).head
    val q = out.writeStream.format("memory").queryName("check_stream")
      .outputMode("append").start()
    try {
      in.addData(rows); q.processAllAvailable()
      in.addData((ts(9), Some(99L), Some(1.0))) // close both hours
      q.processAllAvailable()
      val got = spark.table("check_stream")
        .filter(col("window_start") < ts(9))
        .select("window_start", "check_id", "check", "n_rows",
          "violations", "pass")
        .as[(java.sql.Timestamp, Long, String, Long, Long, Boolean)]
        .collect().toSet
      def w(h: Int) = java.sql.Timestamp.valueOf(f"2026-07-01 $h%02d:00:00")
      assert(got == Set(
        (w(0), 1L, "not_null", 3L, 1L, false),
        (w(0), 2L, "in_range", 3L, 1L, false),
        (w(0), 3L, "min_rows", 3L, 0L, true),
        (w(0), 4L, "unique_approx", 3L, 0L, true),
        (w(1), 1L, "not_null", 2L, 0L, true),
        (w(1), 2L, "in_range", 2L, 1L, false),
        (w(1), 3L, "min_rows", 2L, 1L, false),
        (w(1), 4L, "unique_approx", 2L, 0L, true)), got)
      // batch through the same factory: identical rows
      val batch = graft.streaming.ops.CheckOp(
        Map("window" -> "1 hour", "checks" -> checks),
        Seq(rows.toDF("ts", "id", "v"))).head
        .filter(col("window_start") < ts(9))
        .select("window_start", "check_id", "check", "n_rows",
          "violations", "pass")
        .as[(java.sql.Timestamp, Long, String, Long, Long, Boolean)]
        .collect().toSet
      assert(batch == got)
    } finally q.stop()
    val e = intercept[RuntimeException] {
      graft.streaming.ops.CheckOp(
        Map("checks" -> Seq(Map[String, Any]("type" -> "unique",
          "column" -> "id"))),
        Seq(dirty))
    }
    assert(e.getMessage.contains("unique"), e.getMessage)
  }
}
