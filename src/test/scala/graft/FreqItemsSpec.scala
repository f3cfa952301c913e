package graft

import org.apache.spark.sql.functions._

import graft.functions.FreqItems

/** Pins the Misra-Gries guarantees: heavy hitters above the n/(m+1)
  * threshold always survive, estimates never exceed true counts and
  * undershoot by at most n/(m+1), behavior holds across partition
  * layouts (merge path). */
class FreqItemsSpec extends SparkSpec {
  import spark.implicits._

  // skewed stream: item 1 appears 300/1000 times, item 2 100/1000,
  // the rest spread thin across 60 cold items
  private val stream: Seq[Long] =
    Seq.fill(300)(1L) ++ Seq.fill(100)(2L) ++
      (0 until 600).map(i => 100L + (i % 60))

  private def sketchOf(items: Seq[Long], m: Int, parts: Int)
      : Map[Long, Long] =
    items.toDF("item").repartition(parts)
      .agg(FreqItems.sketch(m)(col("item")).as("s"))
      .select(explode(col("s")).as("x"))
      .select(col("x._1"), col("x._2")).as[(Long, Long)]
      .collect().toMap

  test("heavy hitters above n/(m+1) survive with bounded count error, " +
    "across partition layouts") {
    val n = stream.size // 1000
    for (parts <- Seq(1, 4, 16)) {
      val got = sketchOf(stream, m = 15, parts) // threshold 1000/16=62.5
      assert(got.contains(1L), s"parts=$parts")
      assert(got.contains(2L), s"parts=$parts")
      assert(got(1L) <= 300 && got(1L) >= 300 - n / 16, s"parts=$parts")
      assert(got(2L) <= 100 && got(2L) >= 100 - n / 16, s"parts=$parts")
      assert(got.size <= 15)
    }
  }

  test("property: EXACT regime — with <= m distinct keys the sketch " +
    "equals exact counts at any parallelism (the q_heavyhitters_dag " +
    "oracle contract: no decrement ever fires, merges keep all keys)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 5; parts <- Seq(1, 3, 16)) {
      val keys = (0 until 5 + rnd.nextInt(8)).map(_ => rnd.nextLong())
      val items = (0 until 400).map(_ => keys(rnd.nextInt(keys.size)))
      val exact = items.groupBy(identity).map { case (k, v) =>
        (k, v.size.toLong) }
      val got = sketchOf(items, m = 16, parts)
      assert(got === exact, s"trial=$trial parts=$parts")
    }
  }

  test("estimates never exceed true counts (all-distinct input)") {
    val got = sketchOf((1L to 100L).toSeq, m = 8, parts = 4)
    assert(got.size <= 8)
    got.foreach { case (_, c) => assert(c <= 1L) }
  }

  // --- Count-Min -----------------------------------------------------------

  test("count-min: est >= true for every item, table is layout-free, " +
    "and overcount respects the eps*N bound shape") {
    val items = Seq.fill(200)("hot") ++
      (0 until 800).map(i => s"w${i % 97}")
    val df = items.toDF("token")
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap

    val tables = Seq(1, 4, 16).map { parts =>
      FreqItems.countMinTable(df.repartition(parts), col("token"),
          depth = 4, width = 256)
        .as[(Int, Int, Long)].collect().toSet
    }
    assert(tables(0) == tables(1) && tables(1) == tables(2))
    // total mass per row r equals N
    val n = items.size.toLong
    tables.head.groupBy(_._1).foreach { case (_, cells) =>
      assert(cells.iterator.map(_._3).sum == n) // iterator: no Set dedup
    }

    val sketch = FreqItems.countMinTable(df, col("token"), 4, 256)
    val queries = truth.keys.toSeq.toDF("token")
    val est = FreqItems.countMinLookup(sketch, queries, col("token"), 4, 256)
      .as[(String, Long)].collect().toMap
    truth.foreach { case (tok, c) =>
      assert(est(tok) >= c, s"$tok under-counted")
      // CM bound: overcount > e*N/width has prob e^-depth PER item —
      // with ~100 items a couple of ~1x-bound excursions are expected,
      // so pin 3x the e*N/width radius (deterministic data, fixed seed:
      // this is a regression pin, not a probabilistic flake)
      assert(est(tok) <= c + (3 * math.E * n / 256).toLong,
        s"$tok over-counted: ${est(tok)}")
    }
  }

  test("count-min: absent items may collide but never go negative, and a " +
    "wide-enough sketch returns 0 for them") {
    val df = (1L to 50L).map(i => s"t$i").toDF("token")
    val sketch = FreqItems.countMinTable(df, col("token"), 4, 4096)
    val est = FreqItems.countMinLookup(sketch,
        Seq("never-seen-a", "never-seen-b").toDF("token"),
        col("token"), 4, 4096)
      .as[(String, Long)].collect().toMap
    est.values.foreach(v => assert(v >= 0))
    // 50 items in 4096 buckets x 4 rows: P(all 4 probe cells occupied)
    // is ~ (50/4096)^4 — effectively zero; pin the common case
    assert(est.values.exists(_ == 0))
  }

  test("mergeCells ERRORS on a parameter-mismatched cell table instead " +
    "of silently merging into a broken sketch") {
    val df = (1L to 50L).map(i => s"t$i").toDF("token")
    val a = FreqItems.countMinTable(df, col("token"), 4, 1024)
    val big = FreqItems.countMinTable(df, col("token"), 4, 4096)
      .filter(col("bucket") >= 1024) // rows a 1024-wide sketch can't have
    assert(big.count() > 0)
    val ex = intercept[Exception] {
      FreqItems.mergeCells(a, big, 4, 1024).collect()
    }
    def all(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ all(t.getCause)
    assert(all(ex).exists(_.contains("mergeCells")), ex.getMessage)
    // matching parameters still merge (self-merge doubles every count)
    val m = FreqItems.mergeCells(a, a, 4, 1024)
    val est = FreqItems.countMinLookup(m, Seq("t1").toDF("token"),
      col("token"), 4, 1024).as[(String, Long)].collect().toMap
    assert(est("t1") >= 2L)
  }

  test("orderedFold: the sequential MG state equals a reference Scala " +
    "fold step-for-step (insertion order, decrement-all, drop zeros) " +
    "and keeps the MG heavy-hitter guarantee") {
    // reference fold: classic MG over an ordered stream
    def ref(items: Seq[Long], m: Int): Seq[(Long, Long)] =
      items.foldLeft(Vector.empty[(Long, Long)]) { (acc, x) =>
        if (acc.exists(_._1 == x))
          acc.map { case (k, c) => if (k == x) (k, c + 1) else (k, c) }
        else if (acc.size < m) acc :+ (x, 1L)
        else acc.map { case (k, c) => (k, c - 1) }.filter(_._2 > 0)
      }
    // skewed stream exercising all three branches incl. decrements
    val stream: Seq[Long] =
      (1 to 50).flatMap(i => Seq(1L, 2L, i.toLong + 10)) ++
        (1 to 30).map(_ => 3L)
    val got = Seq(Tuple1(stream))
      .toDF("items")
      .select(FreqItems.orderedFold(col("items"), 4).as("st"))
      .select(explode(col("st")).as("s"))
      .select(col("s.k"), col("s.c")).as[(Long, Long)].collect().toSeq
    assert(got == ref(stream, 4), s"got=$got ref=${ref(stream, 4)}")
    // item 1 and 2 (150/180 > n/(m+1)) must be present
    assert(got.map(_._1).contains(1L) && got.map(_._1).contains(2L))
    // estimates never exceed true counts
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong)
    got.foreach { case (k, c) => assert(c <= truth(k), s"$k: $c") }
  }

  test("count-min lookup rejects invalid (depth, width) up front — the " +
    "parameters must match the sketch build or buckets are garbage") {
    val df = (1L to 5L).map(i => s"t$i").toDF("token")
    val sketch = FreqItems.countMinTable(df, col("token"), 4, 1024)
    intercept[IllegalArgumentException] {
      FreqItems.countMinLookup(sketch, df, col("token"), 4, 1000)
    }
    intercept[IllegalArgumentException] {
      FreqItems.countMinLookup(sketch, df, col("token"), 0, 1024)
    }
  }

  test("countMinLookup over a stacked (multi-window) cell table " +
    "estimates the UNION of its parts — est >= true for the total, " +
    "never the minimum single-window count") {
    val w1 = FreqItems.countMinTable(
      Seq.fill(3)("x").toDF("token"), col("token"), 4, 256)
    val w2 = FreqItems.countMinTable(
      Seq.fill(5)("x").toDF("token"), col("token"), 4, 256)
    // the unfiltered per-window shape CountMinOp emits (two rows per
    // cell); before the internal collapse min() returned 3 here
    val est = FreqItems.countMinLookup(w1.unionByName(w2),
      Seq("x").toDF("token"), col("token"), 4, 256)
      .select("est_cnt").as[Long].head()
    assert(est == 8L, s"union estimate $est != 8")
  }

  test("mergeCells refuses a grouped/windowed cell table instead of " +
    "silently summing sketches across groups") {
    val cells = FreqItems.countMinTable(
      Seq("x").toDF("token"), col("token"), 4, 256)
      .withColumn("window_start", lit(0L))
    val ex = intercept[IllegalArgumentException](
      FreqItems.mergeCells(cells, cells, 4, 256))
    assert(ex.getMessage.contains("exactly (r, bucket, cnt)"),
      ex.getMessage)
  }
}
