package graft

import org.apache.spark.sql.functions._

import graft.llm.Pca

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.core.Tables.table(
    spark, "/root/testdata/sf0.001", "embeddings")

  test("the long-kernel and decimal-explode Gram paths produce " +
    "BIT-IDENTICAL models (exact integer sums, execution shape only)") {
    val fast = Pca.fit(emb, "embedding", k = 2, iters = 8)
    val slow = Pca.fitPath(emb, "embedding", k = 2, iters = 8,
      forceDecimal = true)
    assert(fast.eigenvalues.toSeq == slow.eigenvalues.toSeq)
    assert(fast.components.map(_.toSeq).toSeq ==
      slow.components.map(_.toSeq).toSeq)
  }

  test("null vector elements refuse loudly (kernel would NPE, " +
    "declarative sum would silently deflate the moments)") {
    val bad = Seq(
      (1L, Seq[java.lang.Double](1.0, null, 3.0)),
      (2L, Seq[java.lang.Double](1.0, 2.0, 3.0)))
      .toDF("id", "embedding")
    val e = intercept[IllegalArgumentException](
      Pca.fit(bad, "embedding", k = 1, iters = 2))
    assert(e.getMessage.contains("null vector ELEMENTS"), e.getMessage)
  }

  test("whole-null vectors are excluded from n: fit with a null row " +
    "is bit-identical to fit without it (no moment deflation)") {
    val base = Seq(
      (1L, Array(1f, 2f, 3f)), (2L, Array(4f, 5f, 6f)),
      (3L, Array(-2f, 0f, 7f)), (4L, Array(3f, -1f, 2f)))
      .toDF("id", "embedding")
    val withNull = base.union(Seq((5L, null: Array[Float]))
      .toDF("id", "embedding"))
    val a = Pca.fit(base, "embedding", k = 2, iters = 6)
    val b = Pca.fit(withNull, "embedding", k = 2, iters = 6)
    assert(a.eigenvalues.toSeq == b.eigenvalues.toSeq)
    assert(a.components.map(_.toSeq).toSeq ==
      b.components.map(_.toSeq).toSeq)
  }

  test("fit is exactly deterministic and components are unit-norm") {
    // NOTE: orthogonality/ordering claims live on the planted-direction
    // test below — on the near-isotropic synthetic corpus the eigengap
    // is tiny, so 8 power iterations are deliberately unconverged (the
    // contract is the exact op sequence, not convergence)
    val m1 = Pca.fit(emb, "embedding", k = 2, iters = 8)
    val m2 = Pca.fit(emb, "embedding", k = 2, iters = 8)
    assert(m1.components.map(_.toSeq).toSeq ==
      m2.components.map(_.toSeq).toSeq)
    assert(m1.eigenvalues.toSeq == m2.eigenvalues.toSeq)
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    assert(m1.components.forall(c => math.abs(norm(c) - 1.0) < 1e-12))
  }

  test("top component recovers a planted direction") {
    // points spread along (3,4)/5 with tiny noise on the other axis
    val dir = Array(0.6, 0.8)
    val pts = (0 until 200).map { i =>
      val a = (i - 100) / 10.0
      val n = (i % 7 - 3) / 100.0
      (i.toLong, Array((a * dir(0) - n * dir(1)).toFloat,
        (a * dir(1) + n * dir(0)).toFloat))
    }.toDF("vec_id", "embedding")
    val m = Pca.fit(pts, "embedding", k = 1, iters = 12)
    val cos = math.abs(m.components(0)(0) * dir(0) +
      m.components(0)(1) * dir(1))
    assert(cos > 0.999, s"top component misses planted direction: $cos")
  }

  test("on anisotropic data: orthogonal components, descending " +
    "eigenvalues, variance concentrates on p0") {
    // strong 2:1 spectrum in a 3-dim space → power iteration converges
    val pts = (0 until 300).map { i =>
      val a = (i - 150) / 10.0          // primary axis, sd ~ 8.7
      val b = (i % 50 - 25) / 10.0      // secondary axis, sd ~ 1.4
      val c = (i % 7 - 3) / 100.0       // noise axis
      (i.toLong, Array(a.toFloat, b.toFloat, c.toFloat))
    }.toDF("vec_id", "embedding")
    val m = Pca.fit(pts, "embedding", k = 2, iters = 20)
    val dot = m.components(0).zip(m.components(1))
      .map { case (x, y) => x * y }.sum
    assert(math.abs(dot) < 1e-6, s"components not orthogonal: $dot")
    assert(m.eigenvalues(0) > m.eigenvalues(1))
    val proj = Pca.project(pts, "vec_id", "embedding", m)
    val (v0, v1) = proj.agg(var_samp(col("p0")), var_samp(col("p1")))
      .as[(Double, Double)].head()
    assert(v0 > v1, s"var(p0)=$v0 <= var(p1)=$v1")
  }

  test("guards: ragged dims and oversized d refuse") {
    val ragged = Seq((0L, Array(1f, 2f)), (1L, Array(1f, 2f, 3f)))
      .toDF("vec_id", "embedding")
    assertThrows[IllegalArgumentException] {
      Pca.fit(ragged, "embedding", k = 1, iters = 2)
    }
    val wide = Seq((0L, Array.fill(129)(1f)), (1L, Array.fill(129)(2f)))
      .toDF("vec_id", "embedding")
    assertThrows[IllegalArgumentException] {
      Pca.fit(wide, "embedding", k = 1, iters = 2)
    }
  }
}
