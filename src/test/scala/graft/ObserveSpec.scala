package graft

import org.apache.spark.sql.functions._

import graft.operators.{MathOps, Observe}

class ObserveSpec extends SparkSpec {
  import spark.implicits._

  test("observe piggybacks exact metrics on the query's own execution") {
    val ev = graft.core.Tables.table(
      spark, "/root/testdata/sf0.001", "events")
    val (observed, obs) = Observe.observed(
      ev.filter(col("value") > 100), "gate",
      "n_kept" -> count(lit(1)),
      "sum_value" -> MathOps.exactSum(col("value")),
      "max_user" -> max(col("user_id")))
    // ONE action drives both the query and the metrics
    val kept = observed.count()
    val m = obs.get
    assert(m("n_kept") == kept)
    val (wantSum, wantMax) = ev.filter(col("value") > 100)
      .agg(MathOps.exactSum(col("value")), max(col("user_id")))
      .as[(Double, Long)].head()
    assert(m("sum_value") == wantSum && m("max_user") == wantMax)
  }

  test("blocklistHits: ordered hits, case-insensitive, guards hold") {
    val df = Seq(
      (1L, "Buy CHEAP pills and more pills"),
      (2L, "a perfectly clean document"),
      (3L, "cheap spam offer inside")).toDF("id", "text")
    val got = df.select(col("id"),
        graft.functions.Text.blocklistHits(col("text"),
          Seq("cheap", "spam offer")).as("hits"))
      .orderBy("id").as[(Long, Seq[String])].collect().toSeq
    assert(got == Seq((1L, Seq("cheap")),
      (2L, Seq.empty), (3L, Seq("cheap", "spam offer"))))
    assertThrows[IllegalArgumentException] {
      df.select(graft.functions.Text.blocklistHits(col("text"),
        Seq("Upper")))
    }
  }

  test("hashEmbedRow (stateless per-row) is bit-equal to the groupBy " +
    "dense twin, vector for vector") {
    val docs = graft.core.Tables.table(
      spark, "/root/testdata/sf0.001", "documents")
    val rowForm = docs.select(col("doc_id").as("id"),
        graft.llm.TextStats.hashEmbedRow(col("text"), 16).as("e"))
      .as[(Long, Seq[Double])].collect().toMap
    val twin = graft.llm.TextStats.hashEmbedDense(
        docs, "doc_id", "text", 16)
      .as[(Long, Seq[Double])].collect().toMap
    // every doc the twin emits matches exactly; row form also covers
    // token-less docs (zero vector) the twin omits by contract
    assert(twin.nonEmpty && twin.forall { case (id, v) =>
      rowForm(id) == v
    })
  }

  test("AQE coalesces small shuffles at runtime (the re-plan the 100 TB " +
    "story leans on)") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      val df = spark.range(1000L).groupBy(pmod(col("id"), lit(7)))
        .agg(count(lit(1)))
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead coalesced"), plan)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
