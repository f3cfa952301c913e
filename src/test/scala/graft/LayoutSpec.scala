package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("rankBucket affine map: endpoints, midpoint floor, clamp, " +
    "degenerate range") {
    val df = Seq(0.0, 5.0, 10.0, -3.0, 42.0).toDF("x")
    val got = df.select(Layout.rankBucket(col("x"), 0.0, 10.0, 3))
      .as[Long].collect().toSeq
    // top = 7: 0->0, 5->floor(3.5)=3, 10->7, out-of-range clamps
    assert(got == Seq(0L, 3L, 7L, 0L, 7L))
    val deg = df.select(Layout.rankBucket(col("x"), 4.0, 4.0, 3))
      .as[Long].collect().toSeq
    assert(deg.forall(_ == 0L))
  }

  test("interleave: hand-pinned Morton bits") {
    // b0 = 0b11, b1 = 0b01, bits=2 -> z bits: pos0=b0[0]=1, pos1=b1[0]=1,
    // pos2=b0[1]=1, pos3=b1[1]=0 -> z = 0b0111 = 7
    val df = Seq((3L, 1L)).toDF("b0", "b1")
    val z = df.select(Layout.interleave(Seq(col("b0"), col("b1")), 2))
      .as[Long].head()
    assert(z == 7L)
    // single column, identity up to bit width
    val one = Seq(5L).toDF("b")
    assert(one.select(Layout.interleave(Seq(col("b")), 3))
      .as[Long].head() == 5L)
  }

  test("z-layout clusters BOTH dimensions; single-column sort leaves " +
    "the other dimension unpruned") {
    val grid = spark.range(1024)
      .select((col("id") % 32).cast("int").as("x"),
        (col("id") / 32).cast("int").as("y"))
    def spans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val parts = df.select("x", "y").as[(Int, Int)]
        .mapPartitions { it =>
          val rows = it.toSeq
          if (rows.isEmpty) Iterator.empty
          else Iterator((rows.map(_._1).max - rows.map(_._1).min,
            rows.map(_._2).max - rows.map(_._2).min))
        }.collect()
      (parts.map(_._1).sum.toDouble / parts.length,
        parts.map(_._2).sum.toDouble / parts.length)
    }
    val zkey = Layout.zorderKey(grid, Seq("x", "y"), bits = 5)
    val zLaid = Layout.layoutBy(zkey, 16)(grid)
    val (zx, zy) = spans(zLaid)
    // 16 partitions of a 32x32 grid in z-order ~ 8x8-ish blocks: both
    // dims tightly bounded (block-crossing partitions stay < half range)
    assert(zx <= 16.0 && zy <= 16.0, s"z spans ($zx, $zy)")
    // sorting by x alone: x clusters, y spans the whole range
    val xLaid = grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x"))
    val (sx, sy) = spans(xLaid)
    assert(sx <= 4.0, s"x-sorted x span $sx")
    assert(sy >= 28.0, s"x-sorted leaves y unclustered, got $sy")
  }

  test("co-bucketed tables join with ZERO shuffle exchange " +
    "(the layout is paid once at write, every keyed join after is " +
    "shuffle-free; the residual Sort is local per bucket)") {
    val n = 4
    val a = (1L to 500L).map(i => (i % 50, i)).toDF("k", "va")
    val b = (1L to 300L).map(i => (i % 50, i * 10)).toDF("k", "vb")
    Layout.bucketedWrite(a, "lay_buck_a", Seq("k"), n, sortCols = Seq("k"))
    Layout.bucketedWrite(b, "lay_buck_b", Seq("k"), n, sortCols = Seq("k"))
    // the shuffle-join regime is where bucketing pays — disable the
    // broadcast fallback these test-sized tables would otherwise take
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("lay_buck_a").join(spark.table("lay_buck_b"), "k")
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"), p)
      assert(p.contains("SortMergeJoin"), p)
      assert(p.contains("Bucketed: true"), p)
      // (Spark ≥3.0 re-sorts LOCALLY before the merge regardless of
      // write-time sortBy — bucketed scans stopped reporting output
      // ordering, spark.sql.legacy.bucketedTableScan.outputOrdering —
      // so the pin is on the exchange, the cluster-scale cost)
      // and the result is the plain join, row for row
      val want = a.join(b, "k").count()
      assert(j.count() == want && want > 0)
      // a DIFFERENT bucket count must shuffle one side — the pin is on
      // CO-bucketing, not on bucketing per se
      Layout.bucketedWrite(b, "lay_buck_c", Seq("k"), n * 2)
      val p2 = spark.table("lay_buck_a")
        .join(spark.table("lay_buck_c"), "k")
        .queryExecution.executedPlan.toString
      assert(p2.contains("Exchange hashpartitioning"), p2)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      Seq("lay_buck_a", "lay_buck_b", "lay_buck_c").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("compact collapses a sprayed directory to size-targeted files " +
    "with identical content") {
    val docs = graft.core.Tables.table(
      spark, "/root/testdata/sf0.001", "documents")
    val dir = java.nio.file.Files.createTempDirectory("lay_frag_")
    val in = dir.resolve("in").toString
    val out = dir.resolve("out").toString
    docs.repartition(50).write.parquet(in) // the micro-batch spray
    def parts(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parts(in) == 50)
    val bytes = new java.io.File(in).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    // target a third of the input → ~3 files planned
    val planned = Layout.compact(spark, in, out,
      targetFileBytes = math.max(1L << 20, bytes / 3))
    assert(parts(out) == planned && planned <= 4)
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    // z-ordered variant: same rows, clustering folded into the rewrite
    val outZ = dir.resolve("outz").toString
    Layout.compact(spark, in, outZ,
      targetFileBytes = math.max(1L << 20, bytes / 3),
      zorderCols = Seq("doc_id", "n_chars"))
    assert(spark.read.parquet(outZ).count() == docs.count())
    // sub-MiB targets refuse (they recreate the small-files problem)
    assertThrows[IllegalArgumentException] {
      Layout.compact(spark, in, out, targetFileBytes = 1000L)
    }
  }

  test("compacted z-ordered output prunes by file min/max stats on " +
    "BOTH dimensions; the sprayed input prunes on neither") {
    import org.apache.spark.sql.functions.{input_file_name, min => fmin,
      max => fmax}
    // deterministic uniform dims + an incompressible payload so the
    // 1 MiB-target compaction actually yields MULTIPLE files (the
    // span assertion is vacuous over one file)
    val df = spark.range(300000L).select(
      col("id"),
      pmod(col("id") * 2654435761L, lit(256L)).as("a"),
      pmod(col("id") * 40503L, lit(256L)).as("b"),
      sha2(col("id").cast("string"), 256).as("payload"))
    val dir = java.nio.file.Files.createTempDirectory("lay_span_")
    val in = dir.resolve("in").toString
    val out = dir.resolve("out").toString
    df.repartition(40).write.parquet(in) // the micro-batch spray
    val planned = Layout.compact(spark, in, out,
      targetFileBytes = 1L << 20, zorderCols = Seq("a", "b"))
    assert(planned >= 4, s"need a multi-file output, got $planned")
    // per-file spans = exactly what a stats-pruning reader consults
    def spans(path: String) = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(fmin("a").as("a_mn"), fmax("a").as("a_mx"),
        fmin("b").as("b_mn"), fmax("b").as("b_mx"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    def touched(ss: Seq[(String, Long, Long, Long, Long)],
                dim: String, lo: Long, hi: Long): Int = ss.count {
      case (_, amn, amx, bmn, bmx) =>
        if (dim == "a") amx >= lo && amn <= hi else bmx >= lo && bmn <= hi
    }
    val z = spans(out)
    // a 1/16-range predicate on EITHER interleaved dim skips files
    assert(touched(z, "a", 0, 15) < z.size,
      s"a-predicate touched all ${z.size} z-files")
    assert(touched(z, "b", 0, 15) < z.size,
      s"b-predicate touched all ${z.size} z-files")
    // the spray has no layout: every file spans the full range of both
    val sprayed = spans(in)
    assert(touched(sprayed, "a", 0, 15) == sprayed.size)
    assert(touched(sprayed, "b", 0, 15) == sprayed.size)
  }

  test("zorderKey is deterministic across partitioning") {
    val ev = graft.core.Tables.table(
      spark, "/root/testdata/sf0.001", "events")
    val a = ev.select(col("event_id"),
      Layout.zorderKey(ev, Seq("value", "user_id"), 8).as("z"))
      .orderBy("event_id").as[(Long, Long)].collect().toSeq
    val ev2 = ev.repartition(13)
    val b = ev2.select(col("event_id"),
      Layout.zorderKey(ev2, Seq("value", "user_id"), 8).as("z"))
      .orderBy("event_id").as[(Long, Long)].collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("ranges names the offending column on an all-NULL input " +
    "instead of a bare NPE mid-compaction") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[Double]), (2L, Option.empty[Double]))
      .toDF("id", "score")
    val ex = intercept[IllegalArgumentException](
      Layout.ranges(df, Seq("score")))
    assert(ex.getMessage.contains("score"), ex.getMessage)
  }
}
