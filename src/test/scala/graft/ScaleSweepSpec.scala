package graft

import org.apache.spark.sql.functions._

/** Pins for the scale-tier CORPUS DERIVATION (graft.ScaleSweep) — the
  * measurement is only as good as the derived corpus, so the
  * generator's contracts are unit-pinned: replica permutations are
  * pairwise distinct (else replicas collide in shingle space and the
  * near-dup tiers measure a duplicate-density change, not scale),
  * replica 0 is the base corpus verbatim, counts multiply exactly,
  * and every foreign key still joins within its replica. */
class ScaleSweepSpec extends SparkSpec {

  test("permFor: 125 pairwise-distinct permutations, identity at k=0, " +
    "every dst a permutation of its src classes") {
    val perms = (0 until 125).map(ScaleSweep.permFor)
    assert(perms.map(_._2).distinct.size == 125,
      "replica permutations collide")
    val (src0, dst0) = ScaleSweep.permFor(0)
    assert(src0 == dst0, "k=0 must be the identity")
    perms.foreach { case (src, dst) =>
      assert(src.length == dst.length)
      // each rotated 5-class maps onto itself (letters stay in-class,
      // so token length and character class stats are preserved)
      Seq(0, 5, 10).foreach { off =>
        assert(src.slice(off, off + 5).sorted ==
          dst.slice(off, off + 5).sorted)
      }
    }
  }

  test("generate at factor 2 on sf0.001: counts double, replica 0 is " +
    "verbatim, shifted FKs still join, text stats survive") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_scale_spec").toString
    ScaleSweep.generate(spark, "/root/testdata/sf0.001", out, factor = 2)
    val baseDocs = core.Tables.table(spark, "/root/testdata/sf0.001",
      "documents")
    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.count() == 2 * baseDocs.count())
    val maxId = baseDocs.agg(max("doc_id")).head.getLong(0) + 1
    // replica 0 == base, column for column
    assert(docs.filter(col("doc_id") < maxId)
      .except(baseDocs).isEmpty, "replica 0 must be the base corpus")
    // replica 1 has the same n_chars profile but different text
    val r1 = docs.filter(col("doc_id") >= maxId)
      .withColumn("doc_id", col("doc_id") - maxId)
    assert(r1.select(sum(length(col("text")))).head.getLong(0) ==
      baseDocs.select(sum(length(col("text")))).head.getLong(0),
      "letter permutation must preserve lengths")
    val changed = r1.alias("a").join(baseDocs.alias("b"), "doc_id")
      .filter(col("a.text") =!= col("b.text")).count()
    assert(changed > 0, "replica 1 text must differ from base")
    // relational: every scaled lineitem row finds its order, and
    // orders find customers — FK shifts are consistent per replica
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    val ord = spark.read.parquet(s"$out/orders.parquet")
    val cust = spark.read.parquet(s"$out/customer.parquet")
    assert(li.join(ord, col("l_orderkey") === col("o_orderkey"),
      "left_anti").isEmpty, "orphaned lineitem rows after key shift")
    assert(ord.join(cust, col("o_custkey") === col("c_custkey"),
      "left_anti").isEmpty, "orphaned orders after custkey shift")
    // idempotence: a second generate is a no-op (done-markers)
    ScaleSweep.generate(spark, "/root/testdata/sf0.001", out, factor = 2)
    assert(docs.count() == 2 * baseDocs.count())
  }
}
