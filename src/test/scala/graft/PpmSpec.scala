package graft

import org.apache.spark.sql.functions._

import graft.llm.{Multimodal, Ppm}

class PpmSpec extends SparkSpec {
  import spark.implicits._

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/ppm/$name")
    require(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  test("P6 and P3 fixtures decode to the same pixels (comments and " +
    "whitespace handled per ppm(5))") {
    val p6 = Ppm.decode(res("gradient.p6.ppm"))
    val p3 = Ppm.decode(res("gradient.p3.ppm"))
    assert(p6.width == 4 && p6.height == 3 && p6.maxVal == 255)
    assert(p3.width == 4 && p3.height == 3 && p3.maxVal == 255)
    assert(p6.pixels.toSeq == p3.pixels.toSeq)
    // generator: pixel (x,y,c) = (x*40 + y*25 + c*10) % 256
    assert(p6.pixels.take(6).toSeq == Seq(0, 10, 20, 40, 50, 60))
    assert(p6.pixels((2 * 4 + 3) * 3 + 1) == (3 * 40 + 2 * 25 + 10) % 256)
  }

  test("encodeP6/encodeP3 round-trip through decode") {
    val img = Ppm.synthetic(42L, 5, 4)
    assert(Ppm.decode(Ppm.encodeP6(img)).pixels.toSeq == img.pixels.toSeq)
    assert(Ppm.decode(Ppm.encodeP3(img)).pixels.toSeq == img.pixels.toSeq)
  }

  test("decode refuses bad magic, truncated raster, and wide maxval") {
    val img = Ppm.synthetic(1L, 2, 2)
    val p6 = Ppm.encodeP6(img)
    assert(intercept[IllegalArgumentException] {
      Ppm.decode("PX\n2 2\n255\n".getBytes ++ new Array[Byte](12))
    }.getMessage.contains("magic"))
    assert(intercept[IllegalArgumentException] {
      Ppm.decode(p6.dropRight(1))
    }.getMessage.contains("truncated"))
    assert(intercept[IllegalArgumentException] {
      Ppm.decode("P3\n1 1\n65535\n65535 0 0\n".getBytes)
    }.getMessage.contains("2-byte"))
  }

  test("band tiling: 4 bands of an 8x6 image have heights 1,2,1,2 and " +
    "concatenate back to the original raster") {
    val img = Ppm.synthetic(7L, 8, 6)
    val bands = (0 until 4).flatMap(f => Ppm.band(img, f, 4))
    assert(bands.map(_.height) == Seq(1, 2, 1, 2))
    assert(bands.flatMap(_.pixels).toSeq == img.pixels.toSeq)
    // h < nFrames: empty bands vanish, the rest still tile
    val short = Ppm.synthetic(7L, 8, 2)
    val sb = (0 until 4).flatMap(f => Ppm.band(short, f, 4))
    assert(sb.map(_.height).sum == 2 &&
      sb.flatMap(_.pixels).toSeq == short.pixels.toSeq)
  }

  test("nearest-neighbor resize: 2x2 -> 1x1 keeps the top-left pixel; " +
    "8x6 -> 4x3 samples even rows/cols") {
    val img = Ppm.Image(2, 2, 255, Array(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12))
    assert(Ppm.resize(img, 1, 1).pixels.toSeq == Seq(1, 2, 3))
    val big = Ppm.synthetic(3L, 8, 6)
    val r = Ppm.resize(big, 4, 3)
    assert(r.width == 4 && r.height == 3)
    // dst (x=1, y=2) == src (2, 4)
    assert(r.pixels.slice((2 * 4 + 1) * 3, (2 * 4 + 1) * 3 + 3).toSeq ==
      big.pixels.slice((4 * 8 + 2) * 3, (4 * 8 + 2) * 3 + 3).toSeq)
  }

  test("features: hand-computed on a 1x2 image") {
    val img = Ppm.Image(1, 2, 255, Array(10, 20, 30, 40, 50, 60))
    val f = Ppm.features(img)
    assert(f(0) == (50.0 / 2 / 255).toFloat)  // mean R
    assert(f(1) == (70.0 / 2 / 255).toFloat)  // mean G
    assert(f(2) == (90.0 / 2 / 255).toFloat)  // mean B
    val lum = 299L * 10 + 587 * 20 + 114 * 30 + 299 * 40 + 587 * 50 + 114 * 60
    assert(f(3) == (lum.toDouble / 1000.0 / 2 / 255).toFloat)
    assert(f(4) == (40.0 / 255).toFloat && f(5) == (50.0 / 255).toFloat &&
      f(6) == (60.0 / 255).toFloat)
    assert(f(7) == (40.0 / 2 / 255).toFloat) // |10-30| + |40-60| = 40
  }

  test("extractImageFeatures DataFrame path is deterministic and decodes " +
    "both P6 and P3 payloads") {
    val rows = Seq(
      (1L, Ppm.encodeP6(Ppm.synthetic(1L, 8, 6))),
      (2L, Ppm.encodeP3(Ppm.synthetic(2L, 8, 6))))
    val df = rows.toDF("doc_id", "content")
    def run() = Multimodal.extractImageFeatures(df, "doc_id")
      .orderBy("id").as[(Long, Int, Int, Seq[Float])].collect().toSeq
    val a = run()
    assert(a == run()) // deterministic
    assert(a.map(r => (r._1, r._2, r._3)) == Seq((1L, 8, 6), (2L, 8, 6)))
    assert(a(0)._4 == Ppm.features(Ppm.synthetic(1L, 8, 6)).toSeq)
    assert(a(1)._4 == Ppm.features(Ppm.synthetic(2L, 8, 6)).toSeq)
  }
}
