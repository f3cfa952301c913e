package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.TextStats
import graft.operators.Ops

/** Pins [[TextStats.bigramLikelihood]] (hand-computed Laplace bigram
  * conditionals on a tiny corpus) and [[Ops.globalRankBuckets]] (the
  * two-level exact rank vs the naive single-window definition). */
class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("bigram score matches the hand-computed Laplace conditionals") {
    // corpus bigram-first counts (docs 1+2): a->3, b->1
    // bigrams: a^b -> 3, b^a -> 1; V = 2 (both firsts retained)
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = TextStats.bigramLikelihood(docs, "doc_id", "text",
        topV = 10, topB = 10)
      .orderBy("doc_id")
      .collect()
    // doc 1: terms (a,b)=(3+1)/(3+2), (b,a)=(1+1)/(1+2), (a,b)=4/5
    val t1 = Seq(4.0 / 5, 2.0 / 3, 4.0 / 5)
      .map(x => math.floor(x * 1e15).toLong).sum
    val exp1 = t1.toDouble / 3 / 1e15
    val r1 = got(0)
    assert(r1.getLong(1) == 3 && r1.getLong(2) == 0 &&
      r1.getDouble(3) == exp1)
    // doc 2: one term (a,b) = 4/5
    val exp2 = math.floor(4.0 / 5 * 1e15).toLong.toDouble / 1 / 1e15
    assert(got(1).getDouble(3) == exp2)
    // doc 3: single token — no transitions, no row
    assert(got.length == 2)
  }

  test("kneserNeyBigram matches the hand-computed discounted " +
    "conditionals, backs unseen histories off to the continuation " +
    "unigram, and refuses an invalid discount") {
    // corpus bigrams: a^b x3, b^a x1, z^q x1; topB=2 retains
    //   (a,b,3) then the (cb desc, w1, w2) tie-break picks (b,a,1) —
    //   so z^q is PRUNED and z is an unseen history. Model:
    //   c1(a)=3 f1(a)=1, c1(b)=1 f1(b)=1, p2(b)=1, p2(a)=1,
    //   Nbb=2, Vc=2 -> Nbb+Vc=4
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "z q"))
      .toDF("doc_id", "text")
    val got = TextStats.kneserNeyBigram(docs, "doc_id", "text",
        topB = 2)
      .orderBy("doc_id").collect()
    // term(a,b) = [max(4*3-3,0)*4 + 3*1*(1+1)] / [4*3*4] = 42/48
    // term(b,a) = [max(4*1-3,0)*4 + 3*1*(1+1)] / [4*1*4] = 10/16
    def fx(x: Double) = math.floor(x * 1e15).toLong
    val exp1 = (Seq(42.0 / 48, 10.0 / 16, 42.0 / 48).map(fx).sum)
      .toDouble / 3 / 1e15
    assert(got(0).getLong(1) == 3 && got(0).getLong(2) == 0 &&
      got(0).getDouble(3) == exp1, got(0))
    val exp2 = fx(42.0 / 48).toDouble / 1 / 1e15
    assert(got(1).getDouble(3) == exp2, got(1))
    // doc 3: z never a retained history -> n_unseen=1, backoff
    // Pcont(q) = (0+1)/4
    val exp3 = fx(1.0 / 4).toDouble / 1 / 1e15
    assert(got(2).getLong(2) == 1 && got(2).getDouble(3) == exp3, got(2))
    // every term is a probability-like value in (0, 2) and never zero
    assert(got.forall(r => r.getDouble(3) > 0 && r.getDouble(3) < 2))
    intercept[IllegalArgumentException] {
      TextStats.kneserNeyBigram(docs, "doc_id", "text",
        discountNum = 4, discountDen = 4)
    }
  }

  test("neg_avg_logp is the fixed-point cross-entropy of the same " +
    "conditionals (perplexity = exp of it) and is repartition-stable") {
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextStats.bigramLikelihood(docs, "doc_id", "text",
        topV = 10, topB = 10).orderBy("doc_id").collect()
    // model: firsts a->3, b->1; bigrams a^b->3, b^a->1; V=2
    val exp1 = Seq(4.0 / 5, 2.0 / 3, 4.0 / 5)
      .map(x => math.floor(math.log(x) * -1e15).toLong).sum
      .toDouble / 3 / 1e15
    assert(got(0).getDouble(4) == exp1)
    assert(exp1 > 0) // probabilities < 1 => positive cross-entropy
    // exact integer sums: identical across physical layouts
    val re = TextStats.bigramLikelihood(
      docs.repartition(7), "doc_id", "text", topV = 10, topB = 10)
      .orderBy("doc_id").collect()
    assert(re(0).getDouble(4) == exp1)
  }

  test("out-of-vocab bigrams take pure smoothing mass and count as oov") {
    // topB=1 keeps only a^b (count 2); b^a falls out of vocab:
    // term = (0+1)/(c1(b)+V) = 1/(1+2)
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val got = TextStats.bigramLikelihood(docs, "doc_id", "text",
        topV = 10, topB = 1).collect().head
    val s = Seq(3.0 / 4, 1.0 / 3, 3.0 / 4)
      .map(x => math.floor(x * 1e15).toLong).sum
    assert(got.getLong(2) == 1 && got.getDouble(3) == s.toDouble / 3 / 1e15)
  }

  test("globalRankBuckets equals the naive single-window rank/ntile " +
    "for clustered, uniform, and all-equal score shapes") {
    for ((name, scores) <- Seq(
      "uniform" -> Seq.tabulate(97)(i => (i.toLong, (i * 37 % 101) / 101.0)),
      "clustered" -> Seq.tabulate(97)(i =>
        (i.toLong, 0.5 + (i % 7) * 1e-9)),
      "all-equal" -> Seq.tabulate(31)(i => (i.toLong, 0.25)))) {
      val df = scores.toDF("id", "score").repartition(4)
      val got = Ops.globalRankBuckets(col("id"), col("score"), k = 3)(df)
        .select("id", "rank", "bucket")
      val n = scores.size
      val naive = df.withColumn("rank",
          row_number().over(Window.orderBy(col("score").desc, col("id"))))
        .withColumn("bucket",
          expr(s"CAST(((rank - 1) * 3L) DIV ${n}L AS INT)"))
        .select("id", "rank", "bucket")
      assert(got.except(naive).isEmpty && naive.except(got).isEmpty,
        name)
    }
  }

  test("bucket sizes follow the NTILE distribution (earlier buckets " +
    "take the extras)") {
    val df = Seq.tabulate(11)(i => (i.toLong, i / 11.0)).toDF("id", "score")
    val sizes = Ops.globalRankBuckets(col("id"), col("score"), k = 3)(df)
      .groupBy("bucket").count().orderBy("bucket")
      .as[(Int, Long)].collect().toSeq
    assert(sizes == Seq((0, 4L), (1, 4L), (2, 3L)))
  }

  test("LmGateOp (frozen-model gate) scores bit-identically to batch " +
    "bigramLikelihood over the reference corpus; short docs keep the " +
    "0/0 contract; min_score gates") {
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "solo"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("lmref").toString
    docs.write.mode("overwrite").parquet(tmp)
    val out = graft.streaming.ops.LmGateOp(
      Map("ref_path" -> tmp, "top_v" -> 10, "top_b" -> 10),
      Seq(docs)).head
    val batch = TextStats.bigramLikelihood(docs, "doc_id", "text",
      topV = 10, topB = 10)
      .select(col("doc_id"), col("n_bigrams"), col("n_oov"),
        col("score").as("lm_score"))
    val matched = out.filter(col("n_bigrams") > 0)
      .select("doc_id", "n_bigrams", "n_oov", "lm_score")
    assert(matched.except(batch).isEmpty && batch.except(matched).isEmpty)
    // doc 3 ("solo"): no transitions — kept at 0/0, not dropped
    val z = out.filter(col("doc_id") === 3)
      .select("n_bigrams", "n_oov", "lm_score")
      .as[(Long, Long, Double)].collect().head
    assert(z == ((0L, 0L, 0.0)))
    // gate: min_score above doc 3's 0.0 but below the real scores
    val gated = graft.streaming.ops.LmGateOp(
      Map("ref_path" -> tmp, "top_v" -> 10, "top_b" -> 10,
        "min_score" -> "0.1"), Seq(docs)).head
    assert(gated.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L))
  }

  test("LmGateOp scores an unbounded stream statelessly (model rides " +
    "the plan — no state store)") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("lmref_s").toString
    Seq((1L, "a b a b"), (2L, "a b c"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(tmp)
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val src = in.toDF().toDF("doc_id", "text")
    val out = graft.streaming.ops.LmGateOp(
      Map("ref_path" -> tmp, "top_v" -> 10, "top_b" -> 10),
      Seq(src)).head
    val q = out.writeStream.format("memory").queryName("lm_stream")
      .outputMode("append").start()
    try {
      in.addData((10L, "a b"), (11L, "zz"))
      q.processAllAvailable()
      val got = spark.table("lm_stream")
        .select("doc_id", "n_bigrams", "lm_score")
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      assert(got.map(_._1) == Seq(10L, 11L))
      assert(got(0)._2 == 1L && got(0)._3 > 0.0)
      assert(got(1) == ((11L, 0L, 0.0)))
    } finally q.stop()
  }

  test("NULL score is refused, not silently mis-ranked") {
    val df = Seq((1L, Some(0.5)), (2L, None))
      .toDF("id", "score")
    val ex = intercept[Exception] {
      Ops.globalRankBuckets(col("id"), col("score"))(df).collect()
    }
    assert(ex.getMessage.contains("NULL score") ||
      Option(ex.getCause).exists(_.getMessage.contains("NULL score")))
  }
}
