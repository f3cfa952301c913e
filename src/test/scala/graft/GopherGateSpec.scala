package graft

import org.apache.spark.sql.functions._

import graft.functions.{GopherAdmit, Text}
import graft.llm.TextStats

/** Pins the fused single-pass [[graft.functions.GopherAdmit]] kernel to
  * the declarative formulation it replaced: same admitted set, same
  * token counts, corpus-wide and on adversarial edge strings. The HOF
  * formulation remains the semantic spec (it is what the q_c4_clean /
  * q_pipeline_crawl oracles replay in DuckDB); the kernel is the
  * execution shape. */
class GopherGateSpec extends SparkSpec {
  import spark.implicits._

  private def hofGate(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    df.withColumn("__ts", Text.tokens(col("text")))
      .filter(TextStats.gopherKeepOf(col("__ts")))
      .select(col("doc_id"),
        Text.nTokensOf(col("__ts")).cast("long").as("n_tokens"))

  test("kernel == HOF formulation corpus-wide: identical admitted set " +
    "and identical token counts on the documents table") {
    val docs = graft.core.Tables.table(
      spark, "/root/testdata/sf0.001", "documents")
    val expected = hofGate(docs)
      .as[(Long, Long)].collect().toMap
    val got = graft.streaming.ops.GopherGateOp(
      Map("n_tokens_col" -> "n_tokens"), Seq(docs)).head
      .select(col("doc_id"), col("n_tokens"))
      .as[(Long, Long)].collect().toMap
    assert(got.nonEmpty, "gate admitted nothing — vacuous pin")
    assert(got == expected,
      s"kernel/HOF divergence: only-kernel=${got.keySet -- expected.keySet} " +
        s"only-hof=${expected.keySet -- got.keySet}")
  }

  test("kernel == HOF on edge strings: multibyte, dot runs, hashes, " +
    "mixed whitespace, case, null, empty") {
    val base = Array.fill(60)("the and of to have with that be word")
      .mkString(" ") // comfortably admitted skeleton
    val rows: Seq[(Long, String)] = Seq(
      1L -> base,
      2L -> (base + " a...b ...... . .. x.y"), // dot-run shapes
      3L -> (base + " #tag plain#mid"),
      4L -> (base.toUpperCase), // lowering path
      5L -> base.replace(" ", "\t\n "), // \s variety
      6L -> (base + " café über straße"), // multibyte
      8L -> ("short text only"), // n_tokens < 50 → dropped
      9L -> (base + " " + Array.fill(40)("#").mkString(" ")), // symbol-heavy
      10L -> null
    )
    val df = rows.toDF("doc_id", "text")
    val expected = hofGate(df).as[(Long, Long)].collect().toMap
    val got = graft.streaming.ops.GopherGateOp(
      Map("n_tokens_col" -> "n_tokens"), Seq(df)).head
      .select(col("doc_id"), col("n_tokens"))
      .as[(Long, Long)].collect().toMap
    assert(got == expected, s"got=$got expected=$expected")
    // and the kernel's raw admit values agree with a driver-side check
    val admits = df.select(col("doc_id"),
      GopherAdmit(col("text")).as("a"))
      .as[(Long, java.lang.Long)].collect().toMap
    assert(admits(8L) == -1L)
    assert(admits(10L) == null) // null text → null admit → dropped
    expected.foreach { case (id, n) => assert(admits(id) == n, s"id=$id") }
  }

  test("INTENTIONAL divergence: an empty/whitespace-only document DROPS " +
    "cleanly (admit = -1) where the HOF formulation throws ANSI " +
    "DIVIDE_BY_ZERO (0/0 in the mean) — a gate must never crash the " +
    "topology on a degenerate row") {
    val df = Seq((1L, ""), (2L, " \t\n ")).toDF("doc_id", "text")
    val out = graft.streaming.ops.GopherGateOp(
      Map("n_tokens_col" -> "n_tokens"), Seq(df)).head
    assert(out.count() == 0L)
    val e = intercept[Exception](hofGate(df).count())
    assert(e.getMessage.contains("DIVIDE_BY_ZERO"), e.getMessage)
  }

  test("filter-only path (no n_tokens_col) admits the same rows") {
    val docs = graft.core.Tables.table(
      spark, "/root/testdata/sf0.001", "documents")
    val a = graft.streaming.ops.GopherGateOp(Map.empty, Seq(docs)).head
      .select("doc_id").as[Long].collect().toSet
    val b = hofGate(docs).select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }
}
