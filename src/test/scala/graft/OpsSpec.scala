package graft

import org.apache.spark.sql.functions._

import graft.core.Pipe._
import graft.operators.{DataOps, MathOps, Ops}

class OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ev = Seq(
    (0L, "a", 1.0), (1L, "b", 2.0), (2L, "a", 3.0),
    (3L, "b", 4.0), (4L, "a", 5.0))
    .toDF("id", "k", "v")

  test("map projects and renames (multiply sample op)") {
    val got = ev >> Ops.map("id" -> col("id"), "m" -> col("v") * 3)
    assert(got.columns.toSeq == Seq("id", "m"))
    assert(got.orderBy("id").select("m").as[Double].collect()
      .toSeq == Seq(3.0, 6.0, 9.0, 12.0, 15.0))
  }

  test("filter keeps matching rows") {
    assert((ev >> Ops.filter(col("k") === "a")).count() == 3)
  }

  test("scan emits a running fold per key") {
    val got = ev >> Ops.scan(sum(col("v")), "running",
      Seq(col("id")), Seq(col("k")))
    val a = got.filter(col("k") === "a").orderBy("id")
      .select("running").as[Double].collect().toSeq
    assert(a == Seq(1.0, 4.0, 9.0))
  }

  test("distinct dedups") {
    assert((ev.select("k") >> Ops.distinct()).count() == 2)
  }

  test("take returns deterministic head") {
    val got = ev >> Ops.take(2, col("v").desc)
    assert(got.select("id").as[Long].collect().toSet == Set(4L, 3L))
  }

  test("lastBy returns final row per key") {
    val got = ev >> Ops.lastBy(Seq(col("k")), Seq(col("id")))
    assert(got.orderBy("k").select("id").as[Long].collect()
      .toSeq == Seq(4L, 3L))
  }

  test("sampleEvery keeps every nth row") {
    val got = ev >> Ops.sampleEvery(2, Seq(col("id")))
    assert(got.select("id").as[Long].collect().toSet == Set(0L, 2L, 4L))
  }

  test("skip drops the first n rows in order") {
    val got = ev >> Ops.skip(3, Seq(col("id")))
    assert(got.select("id").as[Long].collect().toSet == Set(3L, 4L))
  }

  test("toDeque collects ordered window values into arrays, standalone") {
    import graft.operators.DataOps
    val got = ev >>
      DataOps.batch(2, Seq(col("id"))) >>
      DataOps.toDeque(col("v"), col("id"))
    val arrays = got.orderBy(DataOps.WindowCol).select("values")
      .as[Seq[Double]].collect().toSeq
    assert(arrays == Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))
  }

  test("hashSample/mixSample are deterministic under repartitioning and " +
    "respect per-stratum rates") {
    val df = Seq.tabulate(2000)(i => (i.toLong, s"s${i % 2}"))
      .toDF("id", "src")
    val a = (df >> Ops.hashSample(col("id"), 0.25))
      .select("id").as[Long].collect().toSet
    val b = (df.repartition(7) >> Ops.hashSample(col("id"), 0.25))
      .select("id").as[Long].collect().toSet
    assert(a == b) // layout-independent
    assert(math.abs(a.size - 500) < 100) // ≈rate·n
    val mixed = (df >> Ops.mixSample(col("id"), col("src"),
      Map("s0" -> 0.0), defaultRate = 1.0))
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(!mixed.contains("s0") && mixed("s1") == 1000L)
  }

  test("trace observes named metrics without an extra pass " +
    "(trace_observable analogue)") {
    val traced = ev >> Ops.trace("ev_in",
      "n" -> count(lit(1)), "max_v" -> max(col("v")))
    traced.collect()
    val m = traced.queryExecution.observedMetrics("ev_in")
    assert(m.getAs[Long]("n") == 5L)
    assert(m.getAs[Double]("max_v") == 5.0)
  }

  test("sortedMerge emits a globally ordered interleave of disordered " +
    "sources (rxx sorted_merge)") {
    val a = Seq((5L, "a"), (1L, "a"), (9L, "a")).toDF("t", "src")
      .repartition(3)
    val b = Seq((2L, "b"), (8L, "b"), (4L, "b")).toDF("t", "src")
      .repartition(2)
    val got = a >> Ops.sortedMerge(Seq(b), Seq(col("t")), numPartitions = 3)
    // collect() walks partitions in range order: the row sequence itself
    // must be globally sorted, not just sorted-after-the-fact
    val ts = got.collect().map(_.getLong(0)).toSeq
    assert(ts == Seq(1L, 2L, 4L, 5L, 8L, 9L))
    assert(got.rdd.getNumPartitions == 3)
  }

  test("merge = union all; startWith prepends rows") {
    val head = Seq((-1L, "start", 0.0)).toDF("id", "k", "v")
    val got = ev >> Ops.merge(ev) >> Ops.startWith(head)
    assert(got.count() == 11)
    assert(got.filter(col("k") === "start").count() == 1)
  }

  test("withLatestFrom attaches the single latest side row to every event") {
    val side = Seq((10L, "old"), (20L, "new")).toDF("version", "tag")
    val got = ev >> Ops.withLatestFrom(side, col("version"))
    assert(got.count() == ev.count())
    assert(got.select("tag").distinct().as[String].collect()
      .toSeq == Seq("new"))
  }

  test("assert_ passes clean data through and fails on violation") {
    val ok = ev >> Ops.assert_(col("v") > 0, "v positive")
    assert(ok.count() == 5)
    val bad = ev >> Ops.assert_(col("v") > 2, "v > 2")
    intercept[Exception] { bad.count() }
  }

  test("ewma matches a hand-computed sequential fold") {
    // values 1,2,3 with alpha 0.5: e0=1, e1=1.5, e2=2.25
    val df = Seq((0L, 1.0), (1L, 2.0), (2L, 3.0)).toDF("t", "v")
      .withColumn("k", lit("x"))
    val got = df >> MathOps.ewmaByKey(col("v"), col("t"), 0.5,
      Seq(col("k")))
    val e = got.select("ewma").as[Double].collect().head
    assert(math.abs(e - 2.25) < 1e-12)
  }

  test("exact sums are order-independent (repartition invariance)") {
    val df = spark.range(10000)
      .withColumn("v", (col("id") % 100).cast("double") / 7.0 * 7.0)
    val s1 = df.coalesce(1).agg(MathOps.exactSum(col("v")))
      .as[Double].collect().head
    val s32 = df.repartition(32).agg(MathOps.exactSum(col("v")))
      .as[Double].collect().head
    assert(s1 == s32) // bitwise equal, not approx
  }

  test("takeOrderedByKey keeps the n best per key with dense ranks") {
    val df = Seq(
      ("a", 1L, 5.0), ("a", 2L, 9.0), ("a", 3L, 9.0), ("a", 4L, 1.0),
      ("b", 7L, 2.0))
      .toDF("k", "id", "v").repartition(3)
    val got = (df >> Ops.takeOrderedByKey(2, col("id"), col("v"),
        Seq(col("k"))))
      .select("k", "id", "score", "rank")
      .as[(String, Long, Double, Int)].collect().toSet
    // score desc, ties to smaller id
    assert(got == Set(("a", 2L, 9.0, 1), ("a", 3L, 9.0, 2),
      ("b", 7L, 2.0, 1)))
  }

  test("takeOrderedByKey drops null ids/scores instead of failing the " +
    "job (documented NULL policy)") {
    val df = Seq(
      ("a", Some(1L), Some(5.0)), ("a", Some(2L), None),
      ("a", None, Some(9.0)), ("b", Some(3L), Some(1.0)))
      .toDF("k", "id", "v")
    val got = (df >> Ops.takeOrderedByKey(5, col("id"), col("v"),
        Seq(col("k"))))
      .select("k", "id").as[(String, Long)].collect().toSet
    assert(got == Set(("a", 1L), ("b", 3L)))
  }

  test("NULL ids are refused by the deterministic sampling/sharding " +
    "family (a null would silently vanish from samples or pile into " +
    "one shard)") {
    val df = Seq(Some(1L), None, Some(3L)).toDF("id")
      .withColumn("src", lit("a"))
    def raises(op: graft.core.Pipe.Op, what: String): Unit = {
      // raise_error surfaces as SparkRuntimeException (driver-local
      // eval) or SparkException (task failure) depending on the plan
      val ex = intercept[Exception] { (df >> op).collect() }
      val msg = ex.getMessage +
        Option(ex.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("NULL id"), s"$what: $msg")
    }
    raises(Ops.hashSample(col("id"), 0.5), "hashSample")
    raises(Ops.mixSample(col("id"), col("src"), Map("a" -> 0.5)),
      "mixSample")
    raises(Ops.shuffleShards(col("id"), 4), "shuffleShards")
  }

  test("temperatureMix up-weights low-resource strata and honors the " +
    "expected output fraction") {
    // 900 docs of 'big', 100 of 'small': α=1/2 shifts share toward the
    // small stratum (kept fraction of small > kept fraction of big)
    val df = ((1L to 900L).map(i => (i, "big")) ++
      (1001L to 1100L).map(i => (i, "small"))).toDF("id", "src")
    val kept = df >> Ops.temperatureMix(col("id"), col("src"), 0.5)
    val by = kept.groupBy("src").count().as[(String, Long)]
      .collect().toMap
    val fracBig = by.getOrElse("big", 0L).toDouble / 900
    val fracSmall = by.getOrElse("small", 0L).toDouble / 100
    assert(fracSmall > fracBig, s"small $fracSmall <= big $fracBig")
    // Lehmer buckets approximate the rate; total lands near half
    val total = by.values.sum.toDouble / 1000
    assert(total > 0.35 && total < 0.65, s"total fraction $total")
    // deterministic across runs
    val again = (df >> Ops.temperatureMix(col("id"), col("src"), 0.5))
      .select("id").as[Long].collect().toSet
    assert(again == kept.select("id").as[Long].collect().toSet)
    // NULL strata drop (allowlist convention)
    val withNull = df.union(Seq((2000L,
      null.asInstanceOf[String])).toDF("id", "src"))
    val noNull = withNull >> Ops.temperatureMix(col("id"), col("src"), 0.5)
    assert(noNull.filter(col("id") === 2000L).count() == 0)
  }

  test("histogram buckets clamp to range") {
    val df = Seq(-5.0, 0.0, 5.0, 95.0, 200.0).toDF("v")
    val got = df >> MathOps.histogram(col("v"), 0, 100, 10)
    val buckets = got.select("bucket").as[Long].collect().toSet
    assert(buckets.subsetOf(Set(0L, 9L)))
  }

  test("unkeyed window forms are GUARDED: above the size threshold they " +
    "warn by default and fail under spark.graft.unkeyed.fail=true; " +
    "keyed forms never trigger") {
    val df = (1L to 100L).map(i => (i % 4, i)).toDF("k", "v")
    val conf = spark.conf
    conf.set("spark.graft.unkeyed.warnBytes", "0") // any input is "big"
    try {
      // default (warn-only): still runs
      assert((df >> DataOps.roll(3, 3, Seq(col("v")))).count() > 0)
      conf.set("spark.graft.unkeyed.fail", "true")
      for ((name, op) <- Seq[(String, graft.core.Pipe.Op)](
        ("roll", DataOps.roll(3, 3, Seq(col("v")))),
        ("split", DataOps.split(col("v") % 10 === 0, Seq(col("v")))),
        ("timeSplit", DataOps.timeSplit(col("v"), 5L)),
        ("scan", Ops.scan(sum(col("v")), "cum", Seq(col("v")))),
        ("skip", Ops.skip(2, Seq(col("v")))),
        ("sampleEvery", Ops.sampleEvery(5, Seq(col("v")))))) {
        val ex = intercept[IllegalArgumentException] { df >> op }
        assert(ex.getMessage.contains("SINGLE-partition"), s"$name: $ex")
      }
      // keyed forms: no guard even in fail mode
      assert((df >> DataOps.roll(3, 3, Seq(col("v")), Seq(col("k"))))
        .count() > 0)
      assert((df >> Ops.scan(sum(col("v")), "cum", Seq(col("v")),
        Seq(col("k")))).count() > 0)
      // dense fast path: no guard (that's the steer)
      assert((df >> DataOps.rollDense(3, 3, col("v") - 1)).count() > 0)
    } finally {
      conf.unset("spark.graft.unkeyed.warnBytes")
      conf.unset("spark.graft.unkeyed.fail")
    }
  }

  test("prioritySample: priority = w/u with the documented hash-derived " +
    "uniform, dense ranks, reproducible, reshuffled by seed") {
    val df = (1L to 200L).map(i => (i, (i % 7 + 1).toDouble))
      .toDF("id", "w")
    val got = df >> Ops.prioritySample(col("id"), col("w"), k = 20,
      seed = 7)
    val rows = got.orderBy("sample_rank").collect()
    assert(rows.map(_.getAs[Int]("sample_rank")).toSeq == (1 to 20))
    // replay the documented arithmetic row by row
    val expected = df
      .withColumn("__u", (xxhash64(lit(7), col("id"))
        .bitwiseAND(lit((1L << 53) - 1)) + lit(1L)).cast("double"))
      .withColumn("p", col("w") / col("__u"))
      .orderBy(col("p").desc, col("id")).limit(20)
      .select("id").as[Long].collect().toSeq
    assert(rows.map(_.getAs[Long]("id")).toSeq == expected)
    // priorities sorted desc, rerun identical, different seed differs
    val ps = rows.map(_.getAs[Double]("priority")).toSeq
    assert(ps == ps.sorted.reverse)
    val again = (df >> Ops.prioritySample(col("id"), col("w"), 20, 7))
      .orderBy("sample_rank").select("id").as[Long].collect().toSeq
    assert(again == rows.map(_.getAs[Long]("id")).toSeq)
    val other = (df >> Ops.prioritySample(col("id"), col("w"), 20, 8))
      .orderBy("sample_rank").select("id").as[Long].collect().toSeq
    assert(other != again)
  }

  test("prioritySample: k >= n keeps every row; heavier rows are " +
    "sampled more often across seeds (weight-proportionality smoke)") {
    val df = (1L to 10L).map(i => (i, 1.0)).toDF("id", "w")
    assert((df >> Ops.prioritySample(col("id"), col("w"), 50, 0))
      .count() == 10)
    // two-row corpus, weight ratio 99:1 — the heavy row should win the
    // 1-slot sample for nearly every seed
    val two = Seq((1L, 99.0), (2L, 1.0)).toDF("id", "w")
    val wins = (0 until 50).count { s =>
      (two >> Ops.prioritySample(col("id"), col("w"), 1, s))
        .select("id").as[Long].head() == 1L
    }
    assert(wins >= 45, s"heavy row won only $wins/50")
  }

  test("quantileByKey: type-1 quantile picks the exact in-data value at " +
    "rank ceil(p·n); p=1 is the max; keyless refused") {
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 30.0), ("a", 40.0),
      ("b", 5.0), ("b", 7.0)).toDF("k", "v")
    def q(p: Double) = (df >> MathOps.quantileByKey(col("v"), p,
      Seq(col("k")))).orderBy("k")
      .select("k", "n", "q").as[(String, Long, Double)].collect().toSeq
    // p=0.5 over 4 values → rank ceil(2)=2 → 20; over 2 → rank 1 → 5
    assert(q(0.5) == Seq(("a", 4L, 20.0), ("b", 2L, 5.0)))
    // p=0.75 → rank 3 → 30; rank ceil(1.5)=2 → 7
    assert(q(0.75) == Seq(("a", 4L, 30.0), ("b", 2L, 7.0)))
    assert(q(1.0) == Seq(("a", 4L, 40.0), ("b", 2L, 7.0)))
    intercept[IllegalArgumentException] {
      df >> MathOps.quantileByKey(col("v"), 0.5, Nil)
    }
  }

  test("rollingActives: window-union estimate equals distinctCount of " +
    "the trailing window's users, day for day") {
    val day0 = java.sql.Date.valueOf("2026-01-01")
    def d(i: Int) = new java.sql.Date(
      day0.getTime + i.toLong * 86400000L)
    def tsOf(i: Int) = new java.sql.Timestamp(
      day0.getTime + i.toLong * 86400000L + 3600000L)
    // users churn across 10 days; day 5 is EMPTY (no synthetic row)
    val rows = (0 until 10).filter(_ != 5).flatMap { i =>
      (0 until 20).map(u => ((i * 7 + u).toLong % 60, tsOf(i)))
    }
    val ev = rows.toDF("user_id", "ts")
    val got = graft.operators.Retention.rollingActives(ev, "user_id",
      "ts", windowDays = 3, p = 6)
      .select("day", "est_millis").as[(java.sql.Date, Long)]
      .collect().toMap
    assert(!got.contains(d(5)), "empty day must not appear")
    assert(got.keySet.size == 9)
    for ((day, est) <- got) {
      val lo = new java.sql.Date(day.getTime - 2L * 86400000L)
      val want = graft.functions.Hll.distinctCount(
        ev.filter(col("ts").cast("date").between(lo, day)),
        col("user_id"), p = 6)
        .select("est_millis").as[Long].head()
      assert(est == want, s"$day: $est != $want")
    }
  }

  test("prioritySampleByKey: each stratum's sample equals the global " +
    "sampler run on that stratum alone; NULL stratum refused") {
    val df = (1L to 120L).map(i =>
      (i, (i % 5 + 1).toDouble, s"s${i % 3}")).toDF("id", "w", "src")
    val got = (df >> Ops.prioritySampleByKey(col("id"), col("w"),
      col("src"), kPerStratum = 4, seed = 9))
      .orderBy("stratum", "rank")
      .select("stratum", "id").as[(String, Long)].collect().toSeq
    val want = Seq("s0", "s1", "s2").flatMap { s =>
      (df.filter(col("src") === s) >>
        Ops.prioritySample(col("id"), col("w"), 4, 9))
        .orderBy("sample_rank").select("id").as[Long].collect()
        .map(s -> _)
    }
    assert(got == want && got.size == 12)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception] {
      (Seq((1L, 1.0, null.asInstanceOf[String])).toDF("id", "w", "src") >>
        Ops.prioritySampleByKey(col("id"), col("w"), col("src"), 2, 0))
        .collect()
    }
    assert(msgs(e).exists(_.contains("NULL stratum")), e)
    // NULL id refused too — NOT silently dropped by takeOrderedByKey's
    // internal NULL-drop pre-filter (the r6 ADVICE finding: the filter
    // short-circuited the raise before it could fire)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType, true),
      StructField("w", DoubleType, true),
      StructField("src", StringType, true)))
    val nullId = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1L, 1.0, "a"), Row(null, 1.0, "a"))), schema)
    val e2 = intercept[Exception] {
      (nullId >> Ops.prioritySampleByKey(col("id"), col("w"),
        col("src"), 2, 0)).collect()
    }
    assert(msgs(e2).exists(_.contains("NULL id")), e2)
  }

  test("negativeSample: deterministic hash draws, anchor/positive " +
    "exclusion, at most k per anchor, NULL anchor refused") {
    val corpus = (1L to 200L).toDF("id")
    val anchors = (1L to 20L).toDF("a")
    val pos = (1L to 20L).map(a => (a, a + 100L)).toDF("anchor", "pos")
    def run() = (anchors >> Ops.negativeSample(col("a"), corpus, pos,
      k = 5, seed = 3))
      .orderBy("anchor", "draw")
      .as[(Long, Long, Long)].collect().toSeq
    val got = run()
    assert(got == run()) // rerun-identical
    assert(got.nonEmpty && got.size <= 100)
    // no anchor or positive ever appears as its own negative
    got.foreach { case (a, _, n) =>
      assert(n != a && n != a + 100L, s"($a, $n)")
      assert(n >= 1L && n <= 200L)
    }
    // per-anchor draw count bounded by k
    got.groupBy(_._1).values.foreach(g => assert(g.size <= 5))
    // a different seed produces a different sample
    val other = (anchors >> Ops.negativeSample(col("a"), corpus, pos,
      k = 5, seed = 4)).as[(Long, Long, Long)].collect().toSeq
    assert(other.toSet != got.toSet)
    // NULL anchor refused
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception] {
      (Seq(Option.empty[Long]).toDF("a") >>
        Ops.negativeSample(col("a"), corpus, pos, 2, 0)).collect()
    }
    assert(msgs(e).exists(_.contains("NULL anchor")), e)
  }

  test("saltedJoin equals the plain join row-for-row and spreads a hot " +
    "key across all salts") {
    val left = (1L to 1000L).map(i =>
      (if (i <= 900) "hot" else s"k${i % 7}", i)).toDF("k", "lv")
    val right = Seq(("hot", 1L), ("k1", 2L), ("k3", 3L), ("cold", 4L))
      .toDF("k", "rv")
    val salted = Ops.saltedJoin(left, right, Seq("k"), col("lv"), 8)
    val plain = left.join(right, "k")
    assert(salted.count() == plain.count())
    assert(salted.select("k", "lv", "rv").exceptAll(
      plain.select("k", "lv", "rv")).isEmpty)
    assert(plain.select("k", "lv", "rv").exceptAll(
      salted.select("k", "lv", "rv")).isEmpty)
    // the hot key's 900 rows hash across ALL 8 salt values — the join
    // key is (k, salt), so no single task owns the key
    val hotSalts = left.filter(col("k") === "hot")
      .select(pmod(xxhash64(col("lv")), lit(8L)).as("s"))
      .distinct().count()
    assert(hotSalts == 8L)
    // NULL salt source refused
    val e = intercept[Exception] {
      Ops.saltedJoin(
        Seq((Some("a"), Option.empty[Long])).toDF("k", "lv"),
        right, Seq("k"), col("lv"), 4).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("saltedJoin")), e)
  }

  test("prioritySample: NULL id, NULL weight, and non-positive weight " +
    "are refused loudly") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType, true),
      StructField("w", DoubleType, true)))
    def mk(rows: Seq[Row]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    for (bad <- Seq(Row(null, 1.0), Row(3L, null), Row(3L, 0.0),
      Row(3L, -2.0))) {
      val e = intercept[Exception] {
        (mk(Seq(Row(1L, 1.0), bad)) >>
          Ops.prioritySample(col("id"), col("w"), 5, 0)).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(m => m.contains("prioritySample")), e)
    }
  }

  test("withPersisted: caches for the body's reads, ALWAYS unpersists " +
    "on exit (normal return and exception), result stays correct") {
    import org.apache.spark.storage.StorageLevel
    val df = spark.range(100).toDF("id")
    val got = Ops.withPersisted(df) { p =>
      assert(p.storageLevel != StorageLevel.NONE, "not cached in body")
      // two reads of the cached frame, detached result per the contract
      p.count() + p.filter(col("id") < 10).count()
    }
    assert(got == 110L)
    assert(df.storageLevel == StorageLevel.NONE, "cache leaked")
    val df2 = spark.range(10).toDF("id")
    intercept[RuntimeException] {
      Ops.withPersisted(df2) { _ => throw new RuntimeException("boom") }
    }
    assert(df2.storageLevel == StorageLevel.NONE, "cache leaked on throw")
  }

  test("prioritySample/prioritySampleByKey refuse NaN weights — NaN " +
    "passes both the null and <= 0 predicates yet sorts ABOVE every " +
    "real priority, so corrupt rows would fill the sample silently") {
    val df = Seq((1L, 2.0), (2L, Double.NaN), (3L, 1.0)).toDF("id", "w")
    def all(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ all(t.getCause)
    val e1 = intercept[Exception](
      (df >> Ops.prioritySample(col("id"), col("w"), 2)).collect())
    assert(all(e1).exists(_.contains("not NaN")), e1.getMessage)
    val e2 = intercept[Exception](
      (df.withColumn("s", lit("x")) >> Ops.prioritySampleByKey(
        col("id"), col("w"), col("s"), 2)).collect())
    assert(all(e2).exists(_.contains("not NaN")), e2.getMessage)
  }

  test("teeMap with zero branches refuses with a contract error " +
    "instead of empty.reduce") {
    val ex = intercept[IllegalArgumentException](Ops.teeMap())
    assert(ex.getMessage.contains("at least one branch"), ex.getMessage)
  }

  test("sampleToBudget: an UNLISTED stratum (budget 0) yields NOTHING " +
    "— zero-size docs in its earliest bucket previously leaked " +
    "through cum <= 0") {
    val docs = Seq(
      (1L, "listed", 5L), (2L, "listed", 5L),
      (3L, "ghost", 0L), (4L, "ghost", 0L), (5L, "ghost", 3L))
      .toDF("id", "s", "sz")
    val kept = (docs >> Ops.sampleToBudget(col("id"), col("s"),
      col("sz"), Map("listed" -> 100L), seed = 3))
      .select("id", "s").as[(Long, String)].collect().toSeq
    assert(kept.forall(_._2 == "listed"), kept.toString)
    assert(kept.map(_._1).toSet == Set(1L, 2L))
  }
}
