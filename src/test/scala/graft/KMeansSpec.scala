package graft

import org.apache.spark.sql.functions._

import graft.llm.KMeans

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("seed takes the k smallest ids in order") {
    val df = vecs(3L -> Seq(3f, 0f), 1L -> Seq(1f, 0f), 2L -> Seq(2f, 0f))
    val m = KMeans.seed(df, "vec_id", "embedding", 2)
    assert(m.centroids.map(_.toSeq).toSeq ==
      Seq(Seq(1.0, 0.0), Seq(2.0, 0.0)))
  }

  test("assign picks nearest centroid, ties to the lowest cell") {
    val df = vecs(1L -> Seq(0f, 0f), 2L -> Seq(10f, 0f),
      3L -> Seq(5f, 0f)) // equidistant from both centroids
    val m = KMeans.Model(Array(Array(0.0, 0.0), Array(10.0, 0.0)))
    val got = KMeans.assign(df, "vec_id", "embedding", m)
      .select("id", "cell").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 0))
  }

  test("fit(iters=0) is the seed; one Lloyd round moves centroids to " +
    "exact cluster means (integer-valued floats: no fp-order sensitivity)") {
    val df = vecs(
      1L -> Seq(0f, 0f), 2L -> Seq(2f, 0f),   // cluster A mean (1, 0)
      3L -> Seq(10f, 0f), 4L -> Seq(12f, 2f)) // cluster B mean (11, 1)
    assert(KMeans.fit(df, "vec_id", "embedding", 2, iters = 0)
      .centroids.map(_.toSeq).toSeq ==
      KMeans.seed(df, "vec_id", "embedding", 2).centroids.map(_.toSeq).toSeq)
    // seed = (0,0), (2,0): row 3 and 4 join cell 1 (closer to (2,0))
    val m1 = KMeans.fit(df, "vec_id", "embedding", 2, iters = 1)
    assert(m1.centroids(0).toSeq == Seq(0.0, 0.0))
    assert(m1.centroids(1).toSeq == Seq(8.0, 2.0 / 3.0))
  }

  test("fit keeps the previous centroid for an emptied cell") {
    // both rows sit on centroid 0; cell 1 receives nothing
    val df = vecs(1L -> Seq(0f, 0f), 2L -> Seq(0f, 0f))
    val m = KMeans.fit(df, "vec_id", "embedding", 2, iters = 1)
    assert(m.centroids(1).toSeq == Seq(0.0, 0.0) ||
      m.centroids(1).toSeq == KMeans.seed(df, "vec_id", "embedding", 2)
        .centroids(1).toSeq)
  }

  test("semanticPairs finds pairs only within a cluster") {
    // two tight groups on opposite axes: cosine within group = 1,
    // across groups = 0
    val df = vecs(
      1L -> Seq(1f, 0f), 2L -> Seq(2f, 0f),
      10L -> Seq(0f, 1f), 11L -> Seq(0f, 3f))
    val m = KMeans.Model(Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    val got = KMeans.semanticPairs(df, "vec_id", "embedding", m, 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (10L, 11L)))
  }

  test("semanticDedup keeps the min id per component and all unpaired rows") {
    val df = vecs(
      1L -> Seq(1f, 0f), 2L -> Seq(2f, 0f), 3L -> Seq(3f, 0f),
      10L -> Seq(0f, 1f))
    val m = KMeans.Model(Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    val kept = KMeans.semanticDedup(df, "vec_id", "embedding", m, 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 10L))
  }

  test("semanticDedup keeper=far_from_centroid keeps the component " +
    "member with the LOWEST centroid cosine (SemDeDup proper), ties " +
    "to the min id") {
    // cell 0 centroid (1,0): ids 1,2 colinear with it (cosine 1), id 3
    // tilted off-axis (cosine < 1) -> far keeper picks 3, min-id picks 1
    val df = vecs(
      1L -> Seq(1f, 0f), 2L -> Seq(2f, 0f), 3L -> Seq(3f, 1f),
      10L -> Seq(0f, 1f))
    val m = KMeans.Model(Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    def kept(k: String) = KMeans.semanticDedup(
        df, "vec_id", "embedding", m, 0.9, keeper = k)
      .select("vec_id").as[Long].collect().toSet
    assert(kept("far_from_centroid") == Set(3L, 10L))
    assert(kept("min_id") == Set(1L, 10L))
    // exact tie on cosine (colinear trio) -> min id wins under BOTH
    val tied = vecs(5L -> Seq(1f, 0f), 6L -> Seq(2f, 0f),
      7L -> Seq(0f, 1f))
    val k2 = KMeans.semanticDedup(tied, "vec_id", "embedding", m, 0.9,
        keeper = "far_from_centroid")
      .select("vec_id").as[Long].collect().toSet
    assert(k2 == Set(5L, 7L))
    intercept[IllegalArgumentException] {
      KMeans.semanticDedup(df, "vec_id", "embedding", m, 0.9,
        keeper = "nearest")
    }
  }

  test("fit is LOUD on a mixed-dimension corpus instead of a bare " +
    "AIOOBE / order-dependent centroids") {
    val mixed = Seq(
      (1L, Array(0.0, 0.0)), (2L, Array(1.0, 1.0)),
      (3L, Array(0.5, 0.5, 0.5))).toDF("id", "v")
    val ex = intercept[Exception](
      graft.llm.KMeans.fit(mixed, "id", "v", k = 2, iters = 1))
    def all(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ all(t.getCause)
    assert(all(ex).exists(m => m.contains("dim")),
      s"unexpected: ${ex.getMessage}")
  }
}
