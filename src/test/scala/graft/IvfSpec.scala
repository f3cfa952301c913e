package graft

import org.apache.spark.sql.functions._

import graft.llm.{Ivf, SimSearch}

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.core.Tables.table(
    spark, "/root/testdata/sf0.001", "embeddings")

  test("ivf training is deterministic; topK returns k ranked neighbors") {
    val m1 = Ivf.train(emb, "vec_id", "embedding", k = 8)
    val m2 = Ivf.train(emb, "vec_id", "embedding", k = 8)
    assert(m1.centroids.map(_.toSeq).toSeq ==
      m2.centroids.map(_.toSeq).toSeq)
    val queries = emb.filter(col("vec_id") < 3)
    val got = Ivf.topK(emb, queries, "vec_id", "embedding", k = 5,
      m1, nProbe = 3)
    val byQuery = got.groupBy("query_id").count()
      .select("count").as[Long].collect()
    assert(byQuery.forall(_ == 5))
    // ranks are 1..5 per query
    val ranks = got.filter(col("query_id") === 0)
      .orderBy("rank").select("rank").as[Int].collect().toSeq
    assert(ranks == Seq(1, 2, 3, 4, 5))
  }

  test("ivf recall vs brute force is reasonable at nProbe=4") {
    val model = Ivf.train(emb, "vec_id", "embedding", k = 8)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = SimSearch.bruteForceTopK(emb, queries,
      "vec_id", "embedding", k = 5)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val approx = Ivf.topK(emb, queries, "vec_id", "embedding", k = 5,
      model, nProbe = 4)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall") // half the cells probed
  }

  test("nearest-cell kernel is LOUD on a vector/centroid dimension " +
    "mismatch — a truncated distance fold would return plausible but " +
    "wrong cell assignments (stale quantizer vs re-projected vectors)") {
    val tbl = new graft.functions.CentroidTable(
      Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)))
    val threeDim = new org.apache.spark.sql.catalyst.util
      .GenericArrayData(Array(1.0, 2.0, 3.0))
    val ex = intercept[IllegalArgumentException](
      tbl.nearest(threeDim, 1, isFloat = false))
    assert(ex.getMessage.contains("dim"), ex.getMessage)
    // matched dims still work
    val two = new org.apache.spark.sql.catalyst.util
      .GenericArrayData(Array(0.9, 1.1))
    assert(tbl.nearest(two, 1, isFloat = false).getInt(0) == 1)
  }
}
