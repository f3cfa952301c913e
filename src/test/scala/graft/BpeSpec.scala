package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{Bpe, Text}

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def arr(ws: String*) =
    new GenericArrayData(ws.map(UTF8String.fromString).toArray[Any])

  private def ids(t: Bpe.Table, a: org.apache.spark.sql.catalyst.util.ArrayData) =
    a.toIntArray().toSeq

  test("merge loop: lowest rank wins, leftmost on rank ties, self-pair " +
    "runs merge left-to-right non-overlapping") {
    // ranks: (a,b)=0 then (ab,c)=1 then (a,a)=2
    val t = Bpe.Table(IndexedSeq(("a", "b"), ("ab", "c"), ("a", "a")),
      IndexedSeq("a", "b", "c", "ab", "abc", "aa"))
    // 'abcab' -> ab c ab (rank0 leftmost, rank0 again) -> abc ab (rank1)
    assert(ids(t, t.encode(arr("abcab"))) ==
      Seq(4, 3))
    // 'aaaa' -> aa aa (left-to-right non-overlap), 'aaa' -> aa a
    assert(ids(t, t.encode(arr("aaaa"))) == Seq(5, 5))
    assert(ids(t, t.encode(arr("aaa"))) == Seq(5, 0))
    // unknown token -> -1 ('d' not in vocab)
    assert(ids(t, t.encode(arr("ad"))) == Seq(0, -1))
    // multi-word concatenation in word order
    assert(ids(t, t.encode(arr("ab", "ca"))) == Seq(3, 2, 0))
  }

  test("learned-table invariant rejected when a constituent has no " +
    "earlier producing merge") {
    val ex = intercept[IllegalArgumentException] {
      Bpe.Table(IndexedSeq(("ab", "c")), IndexedSeq("abc")).encode(arr("x"))
    }
    assert(ex.getMessage.contains("not produced by an earlier merge"))
  }

  test("default fixture loads and reproduces the Sennrich-learned " +
    "segmentations (fixture pinned against tools/make_bpe_fixture.py)") {
    val t = Bpe.default
    def seg(word: String): Seq[String] =
      ids(t, t.encode(arr(word))).map {
        case -1 => "?"
        case i  => t.vocab(i)
      }
    // saturated words merge to a single token; capped-at-60 words stay
    // partially merged (regenerating the fixture changes these pins —
    // that is intentional: the fixture IS the contract)
    assert(seg("customer") == Seq("customer"))
    assert(seg("table") == Seq("table"))
    assert(seg("window") == Seq("w", "in", "d", "ow"))
    assert(seg("value") == Seq("v", "alu", "e"))
    assert(seg("query") == Seq("q", "u", "er", "y"))
    assert(seg("zebra!") == Seq("z", "e", "b", "r", "a", "!"))
  }

  test("learnMerges reproduces a hand-worked Sennrich run (counts, " +
    "lexicographic ties, non-overlapping application) and train() " +
    "yields a loadable Table that encodes with the learned merges") {
    // word counts: "abab" x3, "ab" x2, "ba" x1
    // iter 1: pairs (a,b)=3+3+2=8, (b,a)=3+1=4 -> merge (a,b)
    //   words: [ab,ab]x3, [ab]x2, [b,a]x1
    // iter 2: pairs (ab,ab)=3, (b,a)=1 -> merge (ab,ab)
    // iter 3: only (b,a)=1 -> merge (b,a)
    // iter 4: no pairs -> stop early
    val wc = Seq(("abab", 3L), ("ab", 2L), ("ba", 1L))
    assert(Bpe.learnMerges(wc, 10) ==
      IndexedSeq(("a", "b"), ("ab", "ab"), ("b", "a")))
    // lexicographic tie: (a,b)=1 vs (b,a)=1 -> (a,b) first
    assert(Bpe.learnMerges(Seq(("ab", 1L), ("ba", 1L)), 1) ==
      IndexedSeq(("a", "b")))
    // self-pair run: "aaa" counts (a,a)=2 but merges non-overlapping
    assert(Bpe.learnMerges(Seq(("aaa", 1L)), 2) ==
      IndexedSeq(("a", "a"), ("aa", "a")))
    // end-to-end: the learned Table passes the load invariant and
    // segments per its merges
    import spark.implicits._
    val corpus = Seq((1L, "abab ab abab"), (2L, "ba abab"))
      .toDF("doc_id", "text")
    val t = Bpe.train(corpus, "text", numMerges = 2, topWords = 100)
    assert(t.merges == IndexedSeq(("a", "b"), ("ab", "ab")))
    def seg(word: String): Seq[String] =
      ids(t, t.encode(arr(word))).map {
        case -1 => "?"
        case i  => t.vocab(i)
      }
    assert(seg("abab") == Seq("abab"))
    assert(seg("ababab") == Seq("abab", "ab"))
    assert(seg("ba") == Seq("b", "a"))
  }

  test("Bpe.encode as a DataFrame column (codegen path) matches the " +
    "kernel, and countTokens counts it") {
    val df = Seq((1L, "the customer window"), (2L, ""), (3L, "value"))
      .toDF("id", "text")
      .select(col("id"), Text.tokens(col("text")).as("t"))
      .select(col("id"), Bpe.encode(col("t")).as("ids"),
        Bpe.countTokens(col("t")).as("n"))
      .orderBy("id")
    val rows = df.as[(Long, Seq[Int], Int)].collect().toSeq
    val t = Bpe.default
    def enc(ws: String*) = ids(t, t.encode(arr(ws: _*)))
    assert(rows(0)._2 == enc("the", "customer", "window"))
    assert(rows(1)._2 == Nil && rows(1)._3 == 0)
    assert(rows(2)._2 == enc("value"))
    assert(rows.forall(r => r._2.size == r._3))
  }

  test("decode is total over any id stream: the -1 encode() emits for " +
    "out-of-vocab tokens maps to U+FFFD instead of killing the query " +
    "(ANSI element_at index 0), ids <= -2 do not read from the vocab " +
    "TAIL (negative indexing), and ids past the end do not error") {
    val n = Bpe.default.vocab.size
    val first = Bpe.default.vocab.head
    val got = Seq(Seq(0, -1, -2, n)).toDF("ids")
      .select(Bpe.decode(col("ids")).as("s")).as[String].head()
    assert(got == first + "���", got)
  }
}
