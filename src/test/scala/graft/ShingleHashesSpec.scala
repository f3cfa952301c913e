package graft

import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.llm.Dedup

/** Pins the native [[graft.functions.ShingleHashes]] kernel to the HOF
  * formulation it replaced (same join separator, same xxhash64-over-bytes,
  * same first-occurrence distinct) — every shingle-based dedup operator
  * inherits its exactness from this. */
class ShingleHashesSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the quick brown fox"), // dup shingles
    (3L, "one two"),            // shorter than shingle size → empty
    (4L, "exactly three tokens"),
    (5L, "  spaced   out\ttokens\nand  more  "),
    (6L, "ünïcode tökens ärë fine ünïcode tökens ärë fine"),
    (7L, "")).toDF("id", "text")

  test("native shingle hashes == HOF executable spec, n = 1..4") {
    for (n <- 1 to 4) {
      val both = docs
        .select(col("id"), Text.tokens(col("text")).as("ts"))
        .select(col("id"),
          Dedup.shingleHashes(col("ts"), n).as("native"),
          Dedup.shingleHashesHof(col("ts"), n).as("hof"))
      val bad = both.filter(not(col("native") <=> col("hof"))).count()
      assert(bad == 0L, s"n=$n: ${both.collect().mkString("\n")}")
    }
  }

  test("long tokens exceed the initial buffer and still hash correctly") {
    val big = Seq((1L, Seq.fill(5)("x" * 300).mkString(" "))).toDF("id", "text")
    val both = big
      .select(Text.tokens(col("text")).as("ts"))
      .select(Dedup.shingleHashes(col("ts"), 3).as("native"),
        Dedup.shingleHashesHof(col("ts"), 3).as("hof"))
    assert(both.filter(not(col("native") <=> col("hof"))).count() == 0L)
  }
}
