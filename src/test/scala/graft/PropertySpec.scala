package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.core.Pipe._
import graft.functions.Codecs
import graft.llm.Dedup
import graft.operators.{DataOps, MathOps}

/** ScalaCheck-generator-driven properties for the algebraic invariants
  * (SURVEY.md §5): codec round-trips, window-count arithmetic, dedup
  * idempotence, parallelism-invariant exact numerics. (Raw ScalaCheck
  * generators sampled in a loop — the scalatest bridge artifact isn't in
  * the offline cache.) */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 10): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  test("property: string codec round-trips arbitrary strings") {
    samples(Gen.listOfN(5, Gen.asciiPrintableStr).suchThat(_.nonEmpty))
      .foreach { xs =>
        val df = xs.toDF("s")
        val back = df.select(
          Codecs.roundTrip(Codecs.StringCodec(), col("s")).as("s"))
          .as[String].collect().toList
        assert(back.sorted == xs.sorted)
      }
  }

  test("property: roll emits exactly max(0, floor((n-w)/s)+1) complete " +
    "windows") {
    val gen = for {
      n <- Gen.chooseNum(0, 40)
      w <- Gen.chooseNum(1, 6)
      s <- Gen.chooseNum(1, 6)
    } yield (n, w, s)
    samples(gen, 15).foreach { case (n, w, s) =>
      val df = (0 until n).map(i => (i.toLong, i.toDouble))
        .toDF("i", "value")
      val windows = (df >> DataOps.roll(w, s, Seq(col("i"))))
        .select(DataOps.WindowCol).distinct().count()
      val expected = if (n < w) 0L else ((n - w) / s + 1).toLong
      assert(windows == expected, s"n=$n w=$w s=$s")
    }
  }

  test("property: exact dedup is idempotent and keeps one row per key") {
    samples(Gen.listOfN(30, Gen.chooseNum(0, 5)).suchThat(_.nonEmpty))
      .foreach { keys =>
        val df = keys.zipWithIndex
          .map { case (k, i) => (i.toLong, s"k$k") }.toDF("id", "k")
        val once = Dedup.exact(df, "id", Seq("k"))
        val twice = Dedup.exact(once, "id", Seq("k"))
        assert(once.count() == keys.distinct.size)
        assert(twice.collect().toSet == once.collect().toSet)
      }
  }

  test("property: exactSum is invariant under repartitioning") {
    val gen = for {
      cents <- Gen.listOfN(50, Gen.chooseNum(-10000, 10000))
      parts <- Gen.chooseNum(1, 16)
    } yield (cents, parts)
    samples(gen).foreach { case (cents, parts) =>
      val df = cents.map(_ / 100.0).toDF("v")
      val s1 = df.coalesce(1)
        .agg(MathOps.exactSum(col("v"))).as[Double].collect().head
      val sN = df.repartition(parts)
        .agg(MathOps.exactSum(col("v"))).as[Double].collect().head
      assert(s1 == sN) // bitwise
    }
  }

  test("property: native shingle/rhp kernels == their HOF executable " +
    "specs on arbitrary inputs") {
    import graft.functions.Vectors
    val textGen = Gen.listOfN(12,
      Gen.oneOf(Gen.identifier, Gen.const("dup"), Gen.const("")))
      .map(_.mkString(" "))
    samples(Gen.listOfN(8, textGen), 5).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
        .select(col("id"), graft.functions.Text.tokens(col("text")).as("ts"))
      val bad = df.select(
        Dedup.shingleHashes(col("ts"), 2).as("n"),
        Dedup.shingleHashesHof(col("ts"), 2).as("h"))
        .filter(not(col("n") <=> col("h"))).count()
      assert(bad == 0)
    }
    val vecGen = Gen.listOfN(4,
      Gen.listOfN(9, Gen.chooseNum(-1000, 1000).map(_ / 100.0f)))
    samples(vecGen, 5).foreach { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
        .toDF("id", "v")
      val bad = df.select(
        Vectors.rhpSignature(col("v"), 17, 5).as("n"),
        Vectors.rhpSignatureHof(col("v"), 17, 5).as("h"))
        .filter(not(col("n") <=> col("h"))).count()
      assert(bad == 0)
    }
  }

  test("property: ewmaScan equals the closed-form sequential fold for " +
    "arbitrary series") {
    val gen = Gen.listOfN(25, Gen.chooseNum(-500, 500).map(_ / 10.0))
      .suchThat(_.nonEmpty)
    samples(gen, 8).foreach { xs =>
      val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
        .toDF("k", "t", "v").repartition(3)
      val got = (df >> MathOps.ewmaScan(col("v"), Seq(col("t")), 0.3,
          Seq(col("k"))))
        .orderBy("t").select("ewma").as[Double].collect().toSeq
      val want = xs.tail.scanLeft(xs.head)((e, x) => 0.3 * x + 0.7 * e)
      assert(got == want)
    }
  }

  test("property: minhash est_jaccard is 1.0 for identical docs") {
    samples(Gen.listOfN(6, Gen.identifier), 5).foreach { words =>
      val text = words.mkString(" ")
      val df = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
      val pairs = Dedup.minhashPairs(df, "doc_id", "text",
        shingleSize = 2, numHashes = 32, bands = 8, threshold = 0.9)
      val est = pairs.select("est_jaccard").as[Double].collect()
      assert(est.length == 1 && est.head == 1.0)
    }
  }

  test("property: BPE kernel matches an independent reference " +
    "implementation on random words; encodes concatenate per word; " +
    "reassembled tokens reproduce the word") {
    val t = graft.functions.Bpe.default
    // independent slow reference: recompute the rank table from the
    // merges list and run the textbook loop over immutable lists
    val ranks = t.merges.zipWithIndex.map { case ((l, r), i) =>
      (l, r) -> i
    }.toMap
    def reference(word: String): List[String] = {
      var seq = word.map(_.toString).toList
      var done = seq.length < 2
      while (!done) {
        val cands = seq.zip(seq.tail).zipWithIndex
          .flatMap { case (p, i) => ranks.get(p).map(r => (r, i)) }
        if (cands.isEmpty) done = true
        else {
          val (_, i) = cands.min
          seq = seq.take(i) ::: (seq(i) + seq(i + 1)) :: seq.drop(i + 2)
        }
      }
      seq
    }
    def arr(ws: Seq[String]) =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        ws.map(org.apache.spark.unsafe.types.UTF8String.fromString)
          .toArray[Any])
    val wordGen = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    samples(Gen.listOfN(4, wordGen), 25).foreach { words =>
      val got = t.encode(arr(words)).toIntArray().toSeq
      val want = words.flatMap(w =>
        reference(w).map(tok => t.vocab.indexOf(tok)))
      assert(got == want, s"words=$words got=$got want=$want")
      // per-word concatenation property
      assert(got == words.flatMap(w =>
        t.encode(arr(Seq(w))).toIntArray().toSeq))
      // lossless: concatenating the id's tokens rebuilds each word
      words.foreach { w =>
        val toks = t.encode(arr(Seq(w))).toIntArray().toSeq
        assert(toks.forall(_ >= 0) && // a-z base chars are all in vocab
          toks.map(t.vocab(_)).mkString == w)
      }
    }
  }
}
