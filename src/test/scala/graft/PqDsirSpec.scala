package graft

import org.apache.spark.sql.functions._

import graft.llm.{Dsir, Pq}

/** Product quantization + DSIR importance resampling — the semantics the
  * SQL oracles can't see: recall against exact search, reconstruction
  * sanity, paper-score agreement, and the input guards. */
class PqDsirSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.core.Tables.table(
    spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val docs = graft.core.Tables.table(
    spark, "/root/testdata/sf0.001", "documents")

  test("pq train slices subspaces; encode emits one code per subspace") {
    val cb = Pq.train(emb, "vec_id", "embedding", m = 8, ksub = 16)
    assert(cb.m == 8 && cb.ksub == 16 && cb.subDim == 8)
    // subspace s codebook = dims [8s, 8s+8) of the 16 smallest ids
    val seedVecs = emb.orderBy("vec_id").limit(16)
      .select(col("embedding").cast("array<double>"))
      .as[Seq[Double]].collect()
    (0 until 8).foreach { s =>
      assert(cb.books(s).centroids.map(_.toSeq).toSeq ==
        seedVecs.map(_.slice(s * 8, s * 8 + 8)).toSeq)
    }
    val codes = Pq.encode(emb, "vec_id", "embedding", cb)
    assert(codes.select(size(col("code"))).distinct().as[Int]
      .collect().toSeq == Seq(8))
    val range = codes.select(explode(col("code")).as("c"))
      .agg(min("c"), max("c")).as[(Int, Int)].head()
    assert(range._1 >= 0 && range._2 < 16)
  }

  test("adc top-k recall against exact L2 search is substantial") {
    val cb = Pq.train(emb, "vec_id", "embedding", m = 8, ksub = 16)
    val queries = emb.filter(col("vec_id") < 10)
    val approx = Pq.adcTopK(emb, queries, "vec_id", "embedding", cb, 5)
    // k rows per query, ranks 1..k, distances non-decreasing in rank
    val grouped = approx.groupBy("query_id").agg(
      count(lit(1)).as("n"),
      collect_list(struct(col("rank"), col("adc_dist"))).as("rs"))
      .as[(Long, Long, Seq[(Int, Double)])].collect()
    assert(grouped.forall(_._2 == 5))
    grouped.foreach { case (_, _, rs) =>
      val byRank = rs.sortBy(_._1).map(_._2)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
    }
    // the operator's ranking must EQUAL an independent in-JVM ADC
    // replay (encode + table lookups + two-level fold) — the
    // distributed path end to end, not just one pair
    val all = emb.select(col("vec_id"),
      col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().map { case (i, v) =>
        (i, v.toArray)
      }
    def codeOf(v: Array[Double]): IndexedSeq[Int] =
      (0 until 8).map { s =>
        (0 until 16).minBy { c =>
          val cent = cb.books(s).centroids(c)
          var d = 0.0
          (0 until 8).foreach { i =>
            val diff = v(s * 8 + i) - cent(i); d += diff * diff
          }
          (d, c)
        }
      }
    def adcOf(qv: Array[Double], code: IndexedSeq[Int]): Double =
      (0 until 8).map { s =>
        val cent = cb.books(s).centroids(code(s))
        var d = 0.0
        (0 until 8).foreach { i =>
          val diff = qv(s * 8 + i) - cent(i); d += diff * diff
        }
        d
      }.foldLeft(0.0)(_ + _)
    val codesJvm = all.map { case (i, v) => i -> codeOf(v) }.toMap
    val want = (for ((qid, qv) <- all if qid < 10) yield {
      val ranked = all.filter(_._1 != qid)
        .map { case (nid, _) => (nid, adcOf(qv, codesJvm(nid))) }
        .sortBy { case (nid, d) => (d, nid) }.take(5)
      ranked.zipWithIndex.map { case ((nid, d), r) =>
        (qid, nid, d, r + 1) }
    }).flatten.toSet
    val got = approx.select("query_id", "nbr_id", "adc_dist", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got == want)
    // recall vs exact L2 on these near-random synthetic embeddings is
    // intrinsically modest (distances concentrate in high dim; chance
    // baseline ≈ 5/49 ≈ 0.10) — pin "clearly better than chance", the
    // bit-exact behavior is the oracle's job (q_pq_search)
    def l2sq(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = (for {
      (qid, qv) <- all if qid < 10
      (nid, _) <- all.filter(_._1 != qid).sortBy { case (nid, nv) =>
        (l2sq(qv, nv), nid) }.take(5)
    } yield (qid, nid)).toSet
    val pairs = got.map { case (q, n, _, _) => (q, n) }
    val recall = (exact intersect pairs).size.toDouble / exact.size
    assert(recall >= 0.15, s"recall $recall")
  }

  test("adc distance equals table-free reconstruction of the same codes") {
    val cb = Pq.train(emb, "vec_id", "embedding", m = 8, ksub = 16)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .as[Seq[Double]].head().toArray
    val codeOf = Pq.encode(emb, "vec_id", "embedding", cb)
      .filter(col("id") === 7).select("code").as[Seq[Int]].head()
    val got = Pq.adcTopK(emb, emb.filter(col("vec_id") === 0),
      "vec_id", "embedding", cb, k = 500)
      .filter(col("nbr_id") === 7).select("adc_dist").as[Double].head()
    // independent accumulation: distance from q to doc 7's RECONSTRUCTED
    // vector (concatenated codebook centroids) — two-level fold like
    // ADC's (per-subspace table entry, then across subspaces); a single
    // flat accumulator would differ in the last ulp
    val want = (0 until 8).map { s =>
      val cent = cb.books(s).centroids(codeOf(s))
      var d = 0.0
      (0 until 8).foreach { i =>
        val diff = q(s * 8 + i) - cent(i)
        d += diff * diff
      }
      d
    }.foldLeft(0.0)(_ + _)
    assert(got == want)
  }

  test("ivf-pq with every cell probed degenerates to plain adc; " +
    "partial probing returns a subset with identical distances") {
    val cb = Pq.train(emb, "vec_id", "embedding", m = 8, ksub = 16)
    val coarse = graft.llm.KMeans.seed(emb, "vec_id", "embedding", k = 4)
    val queries = emb.filter(col("vec_id") < 5)
    val full = Pq.adcTopK(emb, queries, "vec_id", "embedding", cb, 5)
      .select("query_id", "nbr_id", "adc_dist", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    // nProbe = k: every cell probed, candidates identical -> same output
    val all = Pq.ivfAdcTopK(emb, queries, "vec_id", "embedding",
      coarse, cb, k = 5, nProbe = 4)
      .select("query_id", "nbr_id", "adc_dist", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(all == full)
    // partial probe: each hit carries the same ADC distance the full
    // scan computed for that pair (routing prunes, never re-scores)
    val some = Pq.ivfAdcTopK(emb, queries, "vec_id", "embedding",
      coarse, cb, k = 5, nProbe = 1)
      .select("query_id", "nbr_id", "adc_dist")
      .as[(Long, Long, Double)].collect()
    val fullDist = Pq.adcTopK(emb, queries, "vec_id", "embedding", cb,
      emb.count().toInt)
      .select("query_id", "nbr_id", "adc_dist")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, d) => (q, n) -> d }.toMap
    assert(some.nonEmpty)
    some.foreach { case (q, n, d) =>
      assert(fullDist((q, n)) == d, s"pair ($q,$n)")
    }
  }

  test("residual ivf-pq with ONE coarse cell equals plain adc over a " +
    "codebook trained on the same globally-shifted vectors (the " +
    "residual machinery reduces to a constant translation)") {
    val coarse1 = graft.llm.KMeans.seed(emb, "vec_id", "embedding", k = 1)
    val cbR = Pq.trainResidual(emb, "vec_id", "embedding", coarse1,
      m = 8, ksub = 16)
    val queries = emb.filter(col("vec_id") < 5)
    val got = Pq.ivfResidualAdcTopK(emb, queries, "vec_id", "embedding",
      coarse1, cbR, k = 5, nProbe = 1)
      .select("query_id", "nbr_id", "adc_dist", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    // shift every vector by the single centroid and run the plain path
    val shifted = emb.select(col("vec_id"),
      Pq.residualColumn(col("embedding"), coarse1, lit(0)).as("rv"))
    val cbS = Pq.train(shifted, "vec_id", "rv", m = 8, ksub = 16)
    val exp = Pq.adcTopK(shifted, shifted.filter(col("vec_id") < 5),
      "vec_id", "rv", cbS, 5)
      .select("query_id", "nbr_id", "adc_dist", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got == exp)
  }

  test("residual encoding beats raw-position encoding at equal code " +
    "budget: mean ADC error vs true L2 is strictly smaller") {
    val coarse = graft.llm.KMeans.seed(emb, "vec_id", "embedding", k = 8)
    val cbRaw = Pq.train(emb, "vec_id", "embedding", m = 8, ksub = 16)
    val cbRes = Pq.trainResidual(emb, "vec_id", "embedding", coarse,
      m = 8, ksub = 16)
    val queries = emb.filter(col("vec_id") < 10)
    def l2 = udf { (a: Seq[Float], b: Seq[Float]) =>
      a.zip(b).map { case (x, y) =>
        (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble)
      }.sum
    }
    val truth = emb.crossJoin(broadcast(queries
        .select(col("vec_id").as("query_id"),
          col("embedding").as("qv"))))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("nbr_id"),
        l2(col("qv"), col("embedding")).as("true_d"))
    def meanErr(approx: org.apache.spark.sql.DataFrame): Double =
      approx.join(truth, Seq("query_id", "nbr_id"))
        .select(avg(abs(col("adc_dist") - col("true_d"))))
        .as[Double].collect().head
    val n = emb.count().toInt
    val rawErr = meanErr(Pq.ivfAdcTopK(emb, queries, "vec_id",
      "embedding", coarse, cbRaw, k = n, nProbe = 8))
    val resErr = meanErr(Pq.ivfResidualAdcTopK(emb, queries, "vec_id",
      "embedding", coarse, cbRes, k = n, nProbe = 8))
    assert(resErr < rawErr, f"residual $resErr%.4f vs raw $rawErr%.4f")
  }

  test("pq rejects dimensions that do not divide into m") {
    val e = intercept[IllegalArgumentException] {
      Pq.train(emb, "vec_id", "embedding", m = 7, ksub = 4)
    }
    assert(e.getMessage.contains("divide"))
  }

  test("dsir scores rank target-like docs above the rest on average") {
    val scored = Dsir.importanceScores(docs, "doc_id", "text",
      col("lang") === "en", buckets = 1024)
      .join(docs.select("doc_id", "lang"), "doc_id")
    // mean exact score of en docs strictly above the non-en mean: the
    // en slice IS the target distribution here
    val Seq(enMean, otherMean) = Seq(true, false).map { en =>
      scored.filter(if (en) col("lang") === "en" else col("lang") =!= "en")
        .agg(avg(col("score").cast("double"))).as[Double].head()
    }
    assert(enMean > otherMean, s"en $enMean vs other $otherMean")
    // log_weight (the paper's statistic) agrees with the exact score's
    // ranking direction on the extremes
    val byScore = scored.orderBy(col("score").desc)
      .select("log_weight").as[Double].collect()
    assert(byScore.head > byScore.last)
  }

  test("dsir selectTop returns n docs and is deterministic") {
    val a = Dsir.selectTop(docs, "doc_id", "text",
      col("lang") === "en", n = 20, buckets = 1024)
      .select("doc_id").as[Long].collect().toSeq
    val b = Dsir.selectTop(docs, "doc_id", "text",
      col("lang") === "en", n = 20, buckets = 1024)
      .select("doc_id").as[Long].collect().toSeq
    assert(a == b && a.length == 20)
  }

  test("dsir feature bag keeps duplicate occurrences") {
    val one = Seq((1L, "a b a b a")).toDF("id", "text")
    val n = Dsir.importanceScores(one, "id", "text", lit(true),
      buckets = 64).select("n_feats").as[Long].head()
    // 5 unigrams + 4 bigrams, duplicates kept
    assert(n == 9L)
  }

  test("PqResidualCodes kernel == the composed " +
    "codeColumn(residualColumn(...)) spec corpus-wide") {
    val emb = graft.core.Tables.table(
      spark, "/root/testdata/sf0.001", "embeddings")
    val coarse = graft.llm.KMeans.fit(emb, "vec_id", "embedding",
      k = 4, iters = 2)
    val cb = Pq.trainResidual(emb, "vec_id", "embedding", coarse,
      m = 8, ksub = 16)
    val staged = emb
      .select(col("vec_id"), col("embedding").as("__v"))
      .withColumn("cell", graft.llm.KMeans.cellOf(col("__v"), coarse))
    val bad = staged.select(
      graft.functions.PqResidualCodes(col("__v"), col("cell"),
        coarse.centroids.map(_.toSeq).toSeq,
        cb.books.map(_.centroids.map(_.toSeq).toSeq).toSeq,
        cb.subDim).as("k"),
      Pq.codeColumn(
        Pq.residualColumn(col("__v"), coarse, col("cell")), cb)
        .as("h"))
      .filter(not(col("k") <=> col("h"))).count()
    assert(bad == 0L, s"$bad vectors encode differently")
  }

  test("scoreStaged refuses a buckets mismatch in BOTH directions — " +
    "bucket ids alone only betray a SMALLER staging value, so the " +
    "staged frame carries its own bucket count") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta beta"))
      .toDF("id", "text")
    val staged = graft.llm.Dsir.stageCounts(docs, "id", "text",
      col("id") === 1L, buckets = 64)
    def fails(buckets: Int): Unit = {
      val ex = intercept[Exception](
        graft.llm.Dsir.scoreStaged(staged, "id", buckets).collect())
      def all(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ all(t.getCause)
      assert(all(ex).exists(_.contains("different buckets value")),
        s"buckets=$buckets: ${ex.getMessage}")
    }
    fails(32)   // staged ids can exceed the scoring range
    fails(128)  // LARGER scoring value: ids all fit — only __nb betrays
    // the matched pairing still scores
    assert(graft.llm.Dsir.scoreStaged(staged, "id", 64).count() == 2L)
  }
}
