package graft

import org.apache.spark.sql.functions._

import graft.core.Pipe._
import graft.llm.{Chunk, Dedup, Delta, TextStats}
import graft.operators.Ops

/** Round-6 corpus-assembly additions: RAG chunking, snapshot deltas,
  * edit-distance near-dup verification, leakage-safe grouped splits,
  * vocabulary statistics. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- Chunk.chunkDocs ----------------------------------------------------

  test("chunkDocs: overlapping windows cover every token, last may be short") {
    val df = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("id", "text")
    val got = Chunk.chunkDocs(df, "id", "text", chunkTokens = 4,
      strideTokens = 3).orderBy("chunk_id")
      .select("chunk_id", "chunk_start", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect()
    assert(got.toSeq == Seq(
      (0L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 3L, 4L, "t3 t4 t5 t6"),
      (2L, 6L, 4L, "t6 t7 t8 t9")))
  }

  test("chunkDocs: short doc yields one whole chunk; empty doc yields none") {
    val df = Seq((1L, "a b"), (2L, ""), (3L, "   ")).toDF("id", "text")
    val got = Chunk.chunkDocs(df, "id", "text", 4, 3)
      .select("id", "chunk_text").as[(Long, String)].collect()
    assert(got.toSeq == Seq((1L, "a b")))
  }

  test("chunkDocs: stride == chunk is tumbling (no overlap, full cover)") {
    val df = Seq((1L, (0 until 10).map(i => s"t$i").mkString(" ")))
      .toDF("id", "text")
    val got = Chunk.chunkDocs(df, "id", "text", 4, 4)
      .orderBy("chunk_id")
      .select("chunk_start", "n_chunk_tokens").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((0L, 4L), (4L, 4L), (8L, 2L)))
    assert(got.map(_._2).sum == 10) // partition: every token exactly once
  }

  test("chunkDocs: trailing chunk is never empty (n multiple of stride)") {
    // n=6, chunk=4, stride=2: starts 0,2 — a start at 4 would duplicate
    // coverage only if the formula over-counted; last must hold 2 tokens
    val df = Seq((1L, "a b c d e f")).toDF("id", "text")
    val got = Chunk.chunkDocs(df, "id", "text", 4, 2)
      .orderBy("chunk_id")
      .select("chunk_start", "n_chunk_tokens").as[(Long, Long)].collect()
    assert(got.forall(_._2 > 0))
    assert(got.last._1 + got.last._2 == 6) // covers through the last token
  }

  // ---- Delta.corpusDelta --------------------------------------------------

  test("corpusDelta classifies added/removed/changed; unchanged omitted") {
    val oldDf = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val newDf = Seq((1L, "alpha"), (2L, "beta prime"), (4L, "delta"))
      .toDF("doc_id", "text")
    val got = Delta.corpusDelta(oldDf, newDf, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "status").as[(Long, String)].collect()
    assert(got.toSeq == Seq((2L, "changed"), (3L, "removed"),
      (4L, "added")))
  }

  test("corpusDelta carries per-side char lengths, NULL on the absent side") {
    val oldDf = Seq((1L, "aa")).toDF("doc_id", "text")
    val newDf = Seq((2L, "bbb")).toDF("doc_id", "text")
    val got = Delta.corpusDelta(oldDf, newDf, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "status", "old_n_chars", "new_n_chars")
      .collect()
    assert(got(0).getLong(0) == 1L && got(0).getString(1) == "removed" &&
      got(0).getLong(2) == 2L && got(0).isNullAt(3))
    assert(got(1).getLong(0) == 2L && got(1).getString(1) == "added" &&
      got(1).isNullAt(2) && got(1).getLong(3) == 3L)
  }

  test("corpusDelta of identical snapshots is empty") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    assert(Delta.corpusDelta(df, df, "doc_id", "text").count() == 0)
  }

  // ---- Dedup.editNearDupPairs ---------------------------------------------

  test("editNearDupPairs: confirms true near-dups, kills rearrangements " +
    "that fool set-based Jaccard") {
    val base = "the quick brown fox jumps over the lazy dog today"
    val typo = "the quick brown fox jumps over the lazy dog togay"
    // halves swapped: shares most 3-gram shingles with base (candidate),
    // but the order scramble makes the edit distance huge
    val swapped = "over the lazy dog today the quick brown fox jumps"
    val unrelated = "completely different content with no overlap at all"
    val df = Seq((1L, base), (2L, typo), (3L, swapped), (4L, unrelated))
      .toDF("doc_id", "text")
    val cands = Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 3L)),
      "precondition: the rearranged doc must be a Jaccard candidate")
    val got = Dedup.editNearDupPairs(df, "doc_id", "text",
      candidateThreshold = 0.3, editSimThreshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)), "one-typo pair must verify")
    assert(!got.contains((1L, 3L)), "rearranged pair must be rejected")
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("editNearDupPairs: identical docs score edit_sim 1.0") {
    val text = "one two three four five six seven eight"
    val df = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val got = Dedup.editNearDupPairs(df, "doc_id", "text")
      .select("edit_sim").as[Double].collect()
    assert(got.toSeq == Seq(1.0))
  }

  test("editNearDupPairs: maxChars truncation bounds the comparison") {
    // identical first 20 chars, divergent tails: with maxChars=20 the
    // pair verifies at 1.0; with the full text it must not
    val a = "shared prefix tokens" + " tail one two three four five"
    val b = "shared prefix tokens" + " completely different ending here"
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val full = Dedup.editNearDupPairs(df, "doc_id", "text",
      candidateThreshold = 0.05, editSimThreshold = 0.95)
    val cut = Dedup.editNearDupPairs(df, "doc_id", "text",
      candidateThreshold = 0.05, editSimThreshold = 0.95, maxChars = 20)
    assert(full.count() == 0)
    assert(cut.count() == 1)
  }

  // ---- Ops.groupSplit -----------------------------------------------------

  test("groupSplit: every row of a group lands in the same split") {
    val df = (0 until 300).map(i => (i.toLong, s"grp${i % 30}"))
      .toDF("id", "g")
    val got = (df >> Ops.groupSplit(col("g"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 1))
    val perGroup = got.groupBy("g")
      .agg(countDistinct(col("split")).as("n")).as[(String, Long)]
      .collect()
    assert(perGroup.nonEmpty && perGroup.forall(_._2 == 1L))
    assert(got.count() == 300) // fractions sum to 1 ⇒ nothing dropped
  }

  test("groupSplit: deterministic in seed; different seed reshuffles") {
    val df = (0 until 200).map(i => (i.toLong, s"g$i")).toDF("id", "g")
    def assign(seed: Int): Map[String, String] =
      (df >> Ops.groupSplit(col("g"), Seq("a" -> 0.5, "b" -> 0.5), seed))
        .select("g", "split").as[(String, String)].collect().toMap
    val s1 = assign(3)
    assert(assign(3) == s1)
    assert(assign(4) != s1)
    // roughly balanced across many groups
    val na = s1.values.count(_ == "a")
    assert(na > 50 && na < 150, s"split badly unbalanced: $na of 200")
  }

  test("groupSplit: fractions summing below 1 drop the remainder; " +
    "NULL group is refused") {
    val df = (0 until 400).map(i => (i.toLong, s"g$i")).toDF("id", "g")
    val kept = (df >> Ops.groupSplit(col("g"), Seq("train" -> 0.5),
      seed = 2)).count()
    assert(kept > 100 && kept < 300, s"~half expected, got $kept")
    val withNull = df.union(Seq((9999L, null.asInstanceOf[String]))
      .toDF("id", "g"))
    val e = intercept[Exception] {
      (withNull >> Ops.groupSplit(col("g"), Seq("a" -> 1.0))).count()
    }
    assert(e.getMessage.contains("NULL group"))
  }

  test("groupSplit: growing the corpus never moves an existing group") {
    val small = (0 until 50).map(i => (i.toLong, s"g${i % 10}"))
      .toDF("id", "g")
    val large = (0 until 500).map(i => (i.toLong, s"g${i % 40}"))
      .toDF("id", "g")
    def m(df: org.apache.spark.sql.DataFrame): Map[String, String] =
      (df >> Ops.groupSplit(col("g"),
        Seq("train" -> 0.7, "test" -> 0.3), seed = 5))
        .select("g", "split").as[(String, String)].collect().toMap
    val before = m(small)
    val after = m(large)
    before.foreach { case (g, s) => assert(after(g) == s) }
  }

  // ---- TextStats.vocabStats -----------------------------------------------

  test("vocabStats: exact freq, rank ties by token asc, cumulative coverage") {
    val df = Seq("b a a", "c b a b").toDF("text")
    // freqs: a=3, b=3, c=1; total=7; rank: a(3), b(3), c(1)
    val got = TextStats.vocabStats(df, "text", topV = 10)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, "a", 3L, 3.0 / 7.0),
      (2L, "b", 3L, 6.0 / 7.0),
      (3L, "c", 1L, 1.0)))
  }

  test("vocabStats: topV truncates; coverage stays below 1 when truncated") {
    val df = Seq("a a a b b c d e").toDF("text")
    val got = TextStats.vocabStats(df, "text", topV = 2)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(got.map(_._2) == Seq("a", "b"))
    assert(got.last._4 == 5.0 / 8.0)
  }

  test("collocations: hand-computed lift, support floor, frequent-pair " +
    "normalization (the 'of the' suppression)") {
    // "x y" repeats as a tight pair; "of the" repeats but both words
    // are everywhere, so lift normalizes it down
    val df = Seq(
      "x y of the a", "x y of the b", "of a the x",
      "the c of d", "x y of the e").toDF("text")
    // pairs at support 3: c(x y)=3, c(y of)=3, c(of the)=3;
    // c(x)=4, c(y)=3, c(of)=5, c(the)=5; N=23 tokens →
    // lift: x y = 69/12; y of = 69/15; of the = 69/25
    val got = TextStats.collocations(df, "text", minCount = 3L, k = 10)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) ==
      Seq(("x", "y"), ("y", "of"), ("of", "the")))
    val xy = got.head
    assert((xy._3, xy._4, xy._5) == (3L, 4L, 3L))
    assert(xy._6 == 3.0 * 23.0 / (4.0 * 3.0))
    val ofThe = got(2)
    assert(ofThe._6 == 3.0 * 23.0 / 25.0)
    assert(xy._6 > ofThe._6)
    // below the support floor: nothing at minCount = 4
    assert(TextStats.collocations(df, "text", minCount = 4L, k = 10)
      .count() == 0)
  }
}
