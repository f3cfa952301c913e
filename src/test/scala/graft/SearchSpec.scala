package graft

import org.apache.spark.sql.functions._

import graft.llm.Search

/** Pins [[Search.bm25]] to a hand-computed example and [[Search.rrfFuse]]
  * to the published RRF definition (including single-list docs). */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val k1 = 1.2
  private val b = 0.75

  test("bm25 matches the hand-computed score on a two-doc corpus") {
    // corpus: d1 = "x y x", d2 = "y z". N=2, C=5.
    // query {x}: df=1, tf(d1)=2, dl(d1)=3
    val docs = Seq((1L, "x y x"), (2L, "y z")).toDF("doc_id", "text")
    val got = Search.bm25(docs, "doc_id", "text", Seq("x")).collect()
    assert(got.length == 1)
    val idf = (2L * 2 - 2 * 1 + 1).toDouble / (2 * 1 + 1).toDouble
    val tfp = (2.0 * (k1 + 1.0)) /
      (2.0 + (k1 * (1.0 - b)) + ((k1 * b) * ((3.0 * 2.0) / 5.0)))
    val exp = math.floor(idf * tfp * 1e9).toLong.toDouble / 1e9
    val r = got.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L &&
      r.getDouble(2) == exp)
  }

  test("bm25 sums per-term contributions and counts matched terms") {
    val docs = Seq((1L, "x y"), (2L, "x z"), (3L, "w w")).toDF("doc_id", "text")
    val got = Search.bm25(docs, "doc_id", "text", Seq("x", "y", "w"))
      .orderBy("doc_id").collect()
    // d1 matches x,y; d2 matches x; d3 matches w
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (2L, 1L), (3L, 1L)))
    // rarer terms score higher at equal tf/dl: y (df=1) > x (df=2)
    val xOnly = Search.bm25(docs, "doc_id", "text", Seq("x"))
      .filter(col("doc_id") === 1).collect().head.getDouble(2)
    val yOnly = Search.bm25(docs, "doc_id", "text", Seq("y"))
      .filter(col("doc_id") === 1).collect().head.getDouble(2)
    assert(yOnly > xOnly)
  }

  test("rrfFuse: both-list docs sum two reciprocals, single-list docs " +
    "one; top-k by fused score") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val bb = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val got = Search.rrfFuse(a, bb, "id", "rank", topK = 10)
      .orderBy(col("rrf").desc, col("id")).collect()
    val exp = Map(
      10L -> 1.0 / 61, 20L -> (1.0 / 62 + 1.0 / 61),
      30L -> 1.0 / 63, 40L -> 1.0 / 62)
    assert(got.length == 4)
    got.foreach(r => assert(r.getDouble(3) == exp(r.getLong(0))))
    // 20 leads (two contributions)
    assert(got.head.getLong(0) == 20L)
  }

  test("rankTop emits dense ranks over exactly topK rows, ties to " +
    "smaller id") {
    val df = Seq.tabulate(20)(i => (i.toLong, (i % 5).toDouble))
      .toDF("id", "score")
    val got = Search.rankTop(df, "id", "score", topK = 7)
      .orderBy("rank").collect()
    assert(got.length == 7 && got.map(_.getInt(2)).toSeq == (1 to 7))
    // best score 4.0 held by ids 4, 9, 14, 19 — id asc breaks ties
    assert(got.take(4).map(_.getLong(0)).toSeq == Seq(4L, 9L, 14L, 19L))
  }

  test("bm25Queries slices to exactly the single-query scores (df is " +
    "corpus-global per term, unaffected by other queries' terms) and " +
    "collapses duplicate terms within a query") {
    val docs = Seq((1L, "x y x z"), (2L, "y z"), (3L, "x w"), (4L, "w w"))
      .toDF("doc_id", "text")
    val qs = Seq((0L, Seq("x", "y")), (1L, Seq("w", "w", "z")))
      .toDF("query_id", "terms")
    val multi = Search.bm25Queries(docs, "doc_id", "text", qs)
    val q0 = multi.filter(col("query_id") === 0)
      .select("doc_id", "n_terms", "score")
    val single0 = Search.bm25(docs, "doc_id", "text", Seq("x", "y"))
    assert(q0.except(single0).isEmpty && single0.except(q0).isEmpty)
    val q1 = multi.filter(col("query_id") === 1)
      .select("doc_id", "n_terms", "score")
    val single1 = Search.bm25(docs, "doc_id", "text", Seq("w", "z"))
    assert(q1.except(single1).isEmpty && single1.except(q1).isEmpty)
  }

  test("Bm25Op (frozen-stats scorer) matches batch bm25 bit-for-bit " +
    "on the reference corpus; non-matching rows kept at 0 or dropped " +
    "by config") {
    val docs = Seq((1L, "x y x z"), (2L, "y z"), (3L, "x w"), (4L, "q q"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("bm25ref").toString
    docs.write.mode("overwrite").parquet(tmp)
    val out = graft.streaming.ops.Bm25Op(
      Map("terms" -> Seq("x", "y"), "ref_path" -> tmp), Seq(docs)).head
    val batch = Search.bm25(docs, "doc_id", "text", Seq("x", "y"))
    val matched = out.filter(col("n_terms") > 0)
      .select("doc_id", "n_terms", "score")
    assert(matched.except(batch).isEmpty && batch.except(matched).isEmpty)
    val z = out.filter(col("doc_id") === 4)
      .select("n_terms", "score").as[(Long, Double)].collect().head
    assert(z == ((0L, 0.0)))
    val dropped = graft.streaming.ops.Bm25Op(
      Map("terms" -> "x, y", "ref_path" -> tmp,
        "drop_nonmatching" -> "true"), Seq(docs)).head
    assert(dropped.filter(col("doc_id") === 4).isEmpty)
    assert(dropped.count() == 3)
  }

  test("bm25 refuses empty and duplicate query term lists") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Search.bm25(docs, "doc_id", "text", Nil)
    }
    intercept[IllegalArgumentException] {
      Search.bm25(docs, "doc_id", "text", Seq("x", "x"))
    }
  }

  test("query terms are normalized like the tokens (lowercased): " +
    "mixed-case terms match instead of silently scoring zero, and " +
    "case-duplicates are refused") {
    val docs = Seq((1L, "x y"), (2L, "z")).toDF("doc_id", "text")
    val lower = Search.bm25(docs, "doc_id", "text", Seq("x"))
    val mixed = Search.bm25(docs, "doc_id", "text", Seq(" X "))
    assert(mixed.except(lower).isEmpty && lower.except(mixed).isEmpty)
    assert(mixed.count() == 1)
    intercept[IllegalArgumentException] {
      Search.bm25(docs, "doc_id", "text", Seq("x", "X"))
    }
    val qs = Seq((0L, Seq("X", "y"))).toDF("query_id", "terms")
    val multi = Search.bm25Queries(docs, "doc_id", "text", qs)
      .select("doc_id", "n_terms", "score")
    val single = Search.bm25(docs, "doc_id", "text", Seq("x", "y"))
    assert(multi.except(single).isEmpty && single.except(multi).isEmpty)
  }

  test("Bm25Op: NULL text keeps the n_terms=0/score=0.0 contract and " +
    "survives drop_nonmatching as an explicit non-match") {
    val docs = Seq((1L, Some("x y")), (2L, None))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("bm25null").toString
    Seq((1L, "x y")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(tmp)
    val out = graft.streaming.ops.Bm25Op(
      Map("terms" -> Seq("x"), "ref_path" -> tmp), Seq(docs)).head
    val z = out.filter(col("doc_id") === 2)
      .select("n_terms", "score").as[(Long, Double)].collect().head
    assert(z == ((0L, 0.0)))
    val dropped = graft.streaming.ops.Bm25Op(
      Map("terms" -> Seq("x"), "ref_path" -> tmp,
        "drop_nonmatching" -> "true"), Seq(docs)).head
    assert(dropped.count() == 1) // the null-text row drops EXPLICITLY
  }
}
