package graft

import org.apache.spark.sql.functions._

import graft.llm.{Multimodal, Y4m}

class Y4mSpec extends SparkSpec {
  import spark.implicits._

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/y4m/$name")
    require(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  test("fixture decodes: extra header tags (Ip/A/X) and FRAME " +
    "parameters tolerated, non-integer frame rate parsed") {
    val v = Y4m.decode(res("tiny.y4m"))
    assert(v.width == 2 && v.height == 2)
    assert(v.fpsNum == 30000 && v.fpsDen == 1001)
    assert(v.frames.length == 3)
    // generator: frame f sample j = (f*50 + j*11) % 256
    assert(v.frames(1).toSeq ==
      (0 until 12).map(j => (50 + j * 11) % 256))
  }

  test("encode round-trips through decode") {
    val v = Y4m.synthetic(42L, 3, 2, 4)
    val back = Y4m.decode(Y4m.encode(v))
    assert(back.width == 3 && back.height == 2 &&
      back.frames.length == 4)
    assert(back.frames.zip(v.frames).forall {
      case (a, b) => a.toSeq == b.toSeq
    })
  }

  test("decode refuses bad magic, wrong colorspace, missing dims, " +
    "truncated frames") {
    val ok = Y4m.encode(Y4m.synthetic(1L, 2, 2, 2))
    assert(intercept[IllegalArgumentException] {
      Y4m.decode("XUV4MPEG2 W2 H2\nFRAME\n".getBytes)
    }.getMessage.contains("magic"))
    assert(intercept[IllegalArgumentException] {
      Y4m.decode("YUV4MPEG2 W2 H2 C422\nFRAME\n".getBytes ++
        new Array[Byte](8))
    }.getMessage.contains("colorspace"))
    assert(intercept[IllegalArgumentException] {
      Y4m.decode("YUV4MPEG2 F25:1\nFRAME\n".getBytes)
    }.getMessage.contains("missing W/H"))
    assert(intercept[IllegalArgumentException] {
      Y4m.decode(ok.dropRight(1))
    }.getMessage.contains("truncated frame"))
  }

  test("C420 family: quarter-size chroma planes parse for every siting " +
    "variant, round-trip, and feature divisors follow the plane sizes") {
    // 2x2 C420: frame = 4 Y + 1 U + 1 V samples
    val fr0 = Array(10, 20, 30, 40, 50, 60)
    val fr1 = Array(12, 22, 32, 42, 52, 62)
    val v = Y4m.Video(2, 2, 25, 1, IndexedSeq(fr0, fr1), "C420")
    assert(v.chromaSize == 1 && v.frameSamples == 6)
    val back = Y4m.decode(Y4m.encode(v))
    assert(back.chroma == "C420" && back.frames.length == 2 &&
      back.frames(0).toSeq == fr0.toSeq)
    // siting variants share the layout
    Seq("C420jpeg", "C420mpeg2", "C420paldv").foreach { cs =>
      val hdr = s"YUV4MPEG2 W2 H2 F25:1 $cs\nFRAME\n"
      val bytes = hdr.getBytes("US-ASCII") ++ fr0.map(_.toByte)
      val d = Y4m.decode(bytes)
      assert(d.chroma == cs && d.frames.head.toSeq == fr0.toSeq)
    }
    // features: Y mean over 2*4 samples, U/V means over 2*1, motion
    // over 1*6
    val f = Y4m.features(v)
    assert(f(0) == ((10 + 20 + 30 + 40 + 12 + 22 + 32 + 42).toDouble
      / 8 / 255.0).toFloat)
    assert(f(1) == ((50 + 52).toDouble / 2 / 255.0).toFloat)
    assert(f(2) == ((60 + 62).toDouble / 2 / 255.0).toFloat)
    assert(f(3) == (12.0 / 6 / 255.0).toFloat) // six deltas of 2
    // odd dims under 4:2:0 are refused
    assert(intercept[IllegalArgumentException] {
      Y4m.decode("YUV4MPEG2 W3 H2 C420\nFRAME\n".getBytes ++
        new Array[Byte](9))
    }.getMessage.contains("even dimensions"))
    // sampled frames keep the colorspace
    val (_, kf) = Y4m.sampleFrames(v, 1).head
    assert(kf.chroma == "C420" && Y4m.decode(Y4m.encode(kf)).chroma == "C420")
  }

  test("features: hand-computed on a 1x1 two-frame clip") {
    val v = Y4m.Video(1, 1, 25, 1,
      IndexedSeq(Array(10, 20, 30), Array(40, 10, 35)))
    val f = Y4m.features(v)
    assert(f(0) == (50.0 / 2 / 255).toFloat)  // Y: 10+40
    assert(f(1) == (30.0 / 2 / 255).toFloat)  // U: 20+10
    assert(f(2) == (65.0 / 2 / 255).toFloat)  // V: 30+35
    // motion: |40-10| + |10-20| + |35-30| = 45 over 1*3*1 samples
    assert(f(3) == (45.0 / 3 / 255).toFloat)
  }

  test("sampleFrames picks evenly-spaced source frames; nSel beyond " +
    "the clip returns every frame once") {
    val v = Y4m.synthetic(3L, 2, 2, 6)
    assert(Y4m.sampleFrames(v, 3).map(_._1) == Seq(0, 2, 4))
    assert(Y4m.sampleFrames(v, 6).map(_._1) == (0 until 6))
    assert(Y4m.sampleFrames(v, 10).map(_._1) == (0 until 6))
    val (src, fv) = Y4m.sampleFrames(v, 3)(1)
    assert(src == 2 && fv.frames.length == 1 &&
      fv.frames.head.toSeq == v.frames(2).toSeq)
  }

  test("extractVideoFeatures / sampleVideoFrames DataFrame paths are " +
    "deterministic and match the kernels") {
    val rows = Seq(
      (1L, Y4m.encode(Y4m.synthetic(1L, 4, 4, 6))),
      (2L, Y4m.encode(Y4m.synthetic(2L, 4, 4, 6))))
    val df = rows.toDF("doc_id", "content")
    def feats() = Multimodal.extractVideoFeatures(df, "doc_id")
      .orderBy("id").as[(Long, Int, Int, Int, Seq[Float])].collect().toSeq
    val a = feats()
    assert(a == feats())
    assert(a.map(r => (r._2, r._3, r._4)) == Seq((4, 4, 6), (4, 4, 6)))
    assert(a(0)._5 == Y4m.features(Y4m.synthetic(1L, 4, 4, 6)).toSeq)
    val fr = Multimodal.sampleVideoFrames(df, "doc_id", 3)
      .orderBy("id", "frame_idx")
      .as[(Long, Int, Array[Byte])].collect().toSeq
    assert(fr.map(r => (r._1, r._2)) ==
      Seq((1L, 0), (1L, 2), (1L, 4), (2L, 0), (2L, 2), (2L, 4)))
    val dec = Y4m.decode(fr(1)._3)
    assert(dec.frames.length == 1 &&
      dec.frames.head.toSeq == Y4m.synthetic(1L, 4, 4, 6).frames(2).toSeq)
  }
}
