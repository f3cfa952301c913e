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

  test("property: registeredDomainPslFull equals an INDEPENDENT " +
    "sequential PSL matcher over generated hosts (all rule classes)") {
    val rules = graft.llm.Url.pslFullRules
    // the oracle-side reference: a direct transcription of the
    // publicsuffix.org algorithm over hash sets — shares NOTHING with
    // the join-ladder implementation under test
    val plain = rules.plain.toSet
    val wild = rules.wildcardBases.toSet
    val exc = rules.exceptions.toSet
    def refDomain(host: String): String = {
      val ls = host.split("\\.", -1)
      val n = ls.length
      val isIp = host.matches("^[0-9]+(\\.[0-9]+){3}$") ||
        host.contains(":")
      if (isIp || n <= 1) return host
      def last(k: Int) = ls.takeRight(k).mkString(".")
      val sExc = (1 to n).filter(k => exc(last(k))).sorted.lastOption
        .map(_ - 1)
      val s = sExc.getOrElse {
        val sp = (1 to n).filter(k => plain(last(k))).sorted
          .lastOption.getOrElse(0)
        val sw = (1 until n).filter(k => wild(last(k))).sorted
          .lastOption.map(_ + 1).getOrElse(0)
        math.max(sp, sw)
      }
      if (s == 0) { if (n <= 2) host else last(2) }
      else if (s == n) host
      else last(s + 1)
    }
    // generated hosts biased toward every interesting shape: real
    // multi-label suffixes, wildcard bases, exception names, unknown
    // TLDs, IPs, single labels, deep subdomains
    val tail = Gen.oneOf("com", "co.uk", "k12.va.us", "ck", "s.ck",
      "www.ck", "city.kobe.jp", "kobe.jp", "notatld", "github.io",
      "xn--55qx5d.cn", "公司.cn")
    val label = Gen.oneOf("a", "b0", "x-y", "sub")
    val hostGen = for {
      depth <- Gen.chooseNum(0, 3)
      labs <- Gen.listOfN(depth, label)
      t <- tail
      ip <- Gen.chooseNum(0, 9)
      pick <- Gen.chooseNum(0, 11)
    } yield pick match {
      case 0 => s"10.2.3.$ip"
      case 1 => "localhost"
      case _ => (labs :+ t).mkString(".")
    }
    val hosts = samples(hostGen, 120).distinct
    val df = hosts.zipWithIndex.map(_.swap).toDF("id", "host")
    val got = graft.llm.Url
      .registeredDomainPslFull(df, "host", rules)
      .orderBy("id").select("host", "domain")
      .as[(String, String)].collect().toSeq
    got.foreach { case (h, d) =>
      assert(d == refDomain(h), s"host=$h got=$d want=${refDomain(h)}")
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

  test("property: media decoders never fail uncleanly — random garbage " +
    "and truncations of valid payloads either decode or throw " +
    "IllegalArgumentException (no NPE/OOB/OOM/hang)") {
    import graft.llm.{Ppm, Wav, Y4m}
    val decoders: Seq[(String, Array[Byte] => Any)] = Seq(
      ("ppm", Ppm.decode), ("wav", Wav.decode), ("y4m", Y4m.decode))
    def mustBeClean(name: String, bytes: Array[Byte]): Unit =
      decoders.foreach { case (d, f) =>
        try f(bytes) catch {
          case _: IllegalArgumentException => // the documented contract
          case e: Throwable =>
            fail(s"$d decoder on $name: unclean ${e.getClass.getName}: " +
              s"${e.getMessage}")
        }
      }
    // pure garbage of assorted sizes
    samples(Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte))), 30)
      .foreach(bs => mustBeClean("garbage", bs.toArray))
    // valid payloads truncated at every prefix length (header/raster
    // boundaries included), plus magic-preserving corruptions
    val valids = Seq(
      Ppm.encodeP6(Ppm.synthetic(3L, 4, 3)),
      Ppm.encodeP3(Ppm.synthetic(3L, 4, 3)),
      Wav.encode(Wav.synthetic(3L, 16)),
      Y4m.encode(Y4m.synthetic(3L, 2, 2, 2)))
    valids.foreach { v =>
      (0 until v.length).foreach(n => mustBeClean("prefix", v.take(n)))
      samples(Gen.chooseNum(0, v.length - 1), 20).foreach { i =>
        val mut = v.clone(); mut(i) = (mut(i) ^ 0x5a).toByte
        mustBeClean("bitflip", mut)
      }
    }
    // crafted overflow headers (the review findings) stay clean
    mustBeClean("wav-overflow", "RIFF\u0000\u0000\u0000\u0000WAVE"
      .getBytes("ISO-8859-1") ++ "data".getBytes ++
      Array[Byte](-12, -1, -1, 127))
    mustBeClean("ppm-overflow", "P3\n4294967297 1\n255\n1 2 3\n".getBytes)
    mustBeClean("y4m-overflow",
      "YUV4MPEG2 W65536 H65536 C444\nFRAME\n".getBytes)
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

  test("property: TRAINED BPE tables always satisfy the load-time merge " +
    "invariant and encode every training word losslessly") {
    def arr(ws: Seq[String]) =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        ws.map(org.apache.spark.unsafe.types.UTF8String.fromString)
          .toArray[Any])
    val wordGen = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    samples(Gen.listOfN(12, wordGen), 15).foreach { words =>
      val wc = words.groupBy(identity).toSeq
        .map { case (w, g) => (w, g.size.toLong) }
      val merges = graft.functions.Bpe.learnMerges(wc, 6)
      // Table's constructor CHECKS the invariant (every multi-char
      // constituent produced by an earlier merge) — construction alone
      // is the assertion; the vocab covers the corpus alphabet +
      // merge products
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      (('a' to 'd').map(_.toString) ++
        merges.map { case (a, b) => a + b }).foreach(seen += _)
      val t = graft.functions.Bpe.Table(merges, seen.toIndexedSeq)
      words.foreach { w =>
        val toks = t.encode(arr(Seq(w))).toIntArray().toSeq
        assert(toks.forall(_ >= 0) &&
          toks.map(t.vocab(_)).mkString == w,
          s"words=$words merges=$merges w=$w toks=$toks")
      }
    }
  }
}
