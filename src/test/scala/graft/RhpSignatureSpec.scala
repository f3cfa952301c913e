package graft

import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Pins the native [[graft.functions.RhpSignature]] expression to the HOF
  * formulation it replaced: identical hash chain ⇒ identical signatures,
  * so every pre-existing LSH bucket assignment is preserved. */
class RhpSignatureSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq.tabulate(64) { r =>
    (r.toLong, Array.tabulate(16)(i =>
      (math.sin(r * 31 + i) * 10).toFloat))
  }.toDF("id", "v")

  test("native rhp signature == HOF executable spec, several seeds/widths") {
    for (seed <- Seq(1, 2, 7); nBits <- Seq(1, 12, 63)) {
      val both = vecs.select(
        Vectors.rhpSignature(col("v"), nBits, seed).as("native"),
        Vectors.rhpSignatureHof(col("v"), nBits, seed).as("hof"))
      val mismatches = both.filter(col("native") =!= col("hof")).count()
      assert(mismatches == 0L, s"seed=$seed nBits=$nBits")
    }
  }

  test("signature is deterministic across evaluations and plans") {
    val a = vecs.select(col("id"),
      Vectors.rhpSignature(col("v"), 16, 3).as("sig"))
    val b = vecs.repartition(3).select(col("id"),
      Vectors.rhpSignature(col("v"), 16, 3).as("sig"))
    assert(a.join(b, "id").filter(a("sig") =!= b("sig")).count() == 0L)
  }

  test("rhpProject sign bits equal rhpSignature bit-for-bit (shared " +
    "plane table), and the projection is deterministic across plans") {
    for (seed <- Seq(1, 7); k <- Seq(8, 16)) {
      val rows = vecs.select(col("id"),
        Vectors.rhpProject(col("v"), k, seed).as("p"),
        Vectors.rhpSignature(col("v"), k, seed).as("sig"))
        .as[(Long, Seq[Double], Long)].collect()
      rows.foreach { case (id, p, sig) =>
        assert(p.length == k, s"id=$id")
        p.zipWithIndex.foreach { case (v, j) =>
          assert((v >= 0.0) == ((sig >> j & 1L) == 1L),
            s"id=$id seed=$seed k=$k j=$j v=$v")
        }
      }
    }
    val a = vecs.select(col("id"),
      Vectors.rhpProject(col("v"), 16, 3).as("p"))
    val b = vecs.repartition(3).select(col("id"),
      Vectors.rhpProject(col("v"), 16, 3).as("p"))
    assert(a.join(b, "id").filter(a("p") =!= b("p")).count() == 0L)
  }

  test("rhpProject preserves squared norms in expectation (JL scaling)") {
    // mean over vectors of ||proj||^2 / ||v||^2 should sit near 1
    val ratio = vecs.select(
      (graft.functions.DotProduct(
        Vectors.rhpProject(col("v"), 16, 11).cast("array<double>"),
        Vectors.rhpProject(col("v"), 16, 11).cast("array<double>")) /
        graft.functions.DotProduct(col("v"), col("v"))).as("r"))
      .agg(avg("r")).head().getDouble(0)
    assert(ratio > 0.6 && ratio < 1.4, s"mean norm ratio $ratio")
  }

  test("double-element arrays are accepted and match float semantics " +
    "on exactly-representable values") {
    val d = Seq((1L, Array(1.0, -2.0, 3.0, -4.0))).toDF("id", "v")
    val f = Seq((1L, Array(1.0f, -2.0f, 3.0f, -4.0f))).toDF("id", "v")
    val sd = d.select(Vectors.rhpSignature(col("v"), 8, 5)).head().getLong(0)
    val sf = f.select(Vectors.rhpSignature(col("v"), 8, 5)).head().getLong(0)
    assert(sd == sf)
  }

  test("dot_product accepts integer/long element arrays (typed codegen " +
    "getters — the erased getter arm passed analysis then crashed at " +
    "runtime under whole-stage codegen)") {
    val got = Seq((Array(1, 2, 3), Array(4L, 5L, 6L))).toDF("a", "b")
      .select(graft.functions.DotProduct(col("a"), col("b")).as("d"))
      .as[Double].head()
    assert(got == 32.0, got)
  }
}
