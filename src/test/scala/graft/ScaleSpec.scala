package graft

import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Scale-behavior pins: what must stay TRUE as the corpus multiplies.
  * Duplicate-heavy input is the norm at crawl scale (mirrors, CDNs,
  * re-crawls), so the near-dup machinery is exercised under k-fold
  * corpus replication and held to an EXACT combinatorial identity —
  * not a smoke test: if banding, bucket collection, pair dedup or
  * signature verification mishandled duplicate signatures, the count
  * could not come out right. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("minhash pairs under 8x corpus replication obey the exact " +
    "pair-count identity (k^2 cross pairs per base pair + C(k,2) " +
    "self pairs per doc)") {
    val docs = graft.core.Tables
      .table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val nDocs = docs.count()
    // cap lifted so the identity is exact (replication inflates every
    // band bucket k-fold; a capped bucket would drop pairs by design)
    val base = Dedup.minhashPairs(docs, "doc_id", "text",
      threshold = 0.4, maxBucketSize = 1000000).collect()

    val k = 8
    val rep = (0 until k)
      .map(j => docs.select((col("doc_id") + j * 100000L).as("doc_id"),
        col("text")))
      .reduce(_.unionByName(_))
    val n = Dedup.minhashPairs(rep, "doc_id", "text",
      threshold = 0.4, maxBucketSize = 1000000).count()

    // every base pair (a,b): one pair per (copy of a, copy of b) = k^2;
    // every doc: its k identical copies pair up = C(k,2), est = 1.0
    val expected = base.length.toLong * k * k + nDocs * k * (k - 1) / 2
    assert(n == expected, s"base=${base.length} nDocs=$nDocs got=$n")
  }

  test("bucket cap degrades replicated boilerplate to ZERO pairs for " +
    "the overflowing bucket, never a partial/skewed subset") {
    // 60 identical docs with a cap of 50: every band bucket holds all
    // 60 -> every bucket overflows -> no candidates at all (the
    // documented boilerplate trade), rather than an arbitrary 50-subset
    val docs = (0L until 60L)
      .map(i => (i, "same exact boilerplate text repeated here always"))
      .toDF("doc_id", "text")
    val n = Dedup.minhashPairs(docs, "doc_id", "text",
      threshold = 0.4, maxBucketSize = 50).count()
    assert(n == 0L)
  }
}
