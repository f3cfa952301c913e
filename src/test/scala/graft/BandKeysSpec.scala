package graft

import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.llm.Dedup

/** Pins the native [[graft.functions.BandKeys]] kernel to the HOF
  * formulation it replaced (`xxhash64(b, slice(sig, b*r+1, r))` per
  * band, empty array below numHashes elements) — band keys are STATE:
  * they live in exported band-winner indexes, streaming NearDupOp
  * checkpoints, and the DuckDB oracle's XXH64 replay, so a kernel that
  * drifted by one bit would silently unband every existing index. */
class BandKeysSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"),
    (3L, "a completely different document about spark physical plans"),
    (4L, "one two"), // shingle-less → empty hs → short signature
    (5L, ""),
    (6L, "ünïcode tökens ärë fine ünïcode tökens ärë fine okay")
  ).toDF("id", "text")

  test("native band keys == HOF executable spec over a real corpus, " +
    "several (numHashes, bands) shapes") {
    val hs = corpus
      .select(col("id"), Text.tokens(col("text")).as("ts"))
      .select(col("id"), Dedup.shingleHashes(col("ts"), 3).as("hs"))
    for ((n, b) <- Seq((128, 32), (128, 16), (64, 64), (8, 2))) {
      val both = hs.select(col("id"),
        Dedup.minhashSigFromHashes(col("hs"), n).as("sig"))
        .select(col("id"),
          Dedup.bandKeysFromSig(col("sig"), n, b).as("native"),
          Dedup.bandKeysFromSigHof(col("sig"), n, b).as("hof"))
      val bad = both.filter(not(col("native") <=> col("hof"))).count()
      assert(bad == 0L,
        s"($n,$b): ${both.collect().mkString("\n")}")
    }
  }

  test("signatures shorter than numHashes yield an EMPTY key array " +
    "(the sentinel/short-doc path never produces content bands)") {
    val short = Seq((1L, Array(1L, 2L, 3L))).toDF("id", "sig")
    val got = short
      .select(Dedup.bandKeysFromSig(col("sig"), 8, 2).as("ks"))
      .select(size(col("ks"))).as[Int].head()
    assert(got == 0)
  }

  test("SigAgreement kernel == size(filter(zip_with(a, b, =), id)) on " +
    "full, sentinel, mismatched-length and null signatures") {
    val hs = corpus
      .select(col("id"), Text.tokens(col("text")).as("ts"))
      .select(col("id"), Dedup.shingleHashes(col("ts"), 3).as("hs"))
      .select(col("id"), Dedup.minhashSigFromHashes(col("hs"), 32)
        .as("sig"))
    val pairs = hs.select(col("id").as("ia"), col("sig").as("sa"))
      .crossJoin(hs.select(col("id").as("ib"), col("sig").as("sb")))
    def hof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      size(filter(zip_with(a, b, (x, y) => x === y), v => v))
    val bad = pairs.filter(not(
      graft.functions.SigAgreement(col("sa"), col("sb")) <=>
        hof(col("sa"), col("sb")))).count()
    assert(bad == 0L)
    // mismatched lengths + nulls
    val edge = Seq(
      (Array(1L, 2L, 3L), Array(1L, 9L)),
      (Array.empty[Long], Array(1L)),
      (null, Array(1L, 2L)),
      (Array(5L), null)
    ).toDF("sa", "sb")
    val badE = edge.filter(not(
      graft.functions.SigAgreement(col("sa"), col("sb")) <=>
        hof(col("sa"), col("sb")))).count()
    assert(badE == 0L)
  }
}
