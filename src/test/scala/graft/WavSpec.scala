package graft

import org.apache.spark.sql.functions._

import graft.llm.{Multimodal, Wav}

class WavSpec extends SparkSpec {
  import spark.implicits._

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/wav/$name")
    require(in != null, s"missing test resource $name")
    try in.readAllBytes() finally in.close()
  }

  private val fixtureSamples =
    Seq(0, 1000, -1000, 32760, -32760, 5, -5, 123).map(_.toShort)

  test("plain fixture decodes: header fields and signed LE samples") {
    val a = Wav.decode(res("tone.wav"))
    assert(a.sampleRate == 8000 && a.channels == 1)
    assert(a.samples.toSeq == fixtureSamples)
  }

  test("chunk walking: LIST (odd size + pad byte) before fmt and a fact " +
    "chunk are skipped per RIFF framing; stereo fmt decodes") {
    val a = Wav.decode(res("chunky.wav"))
    assert(a.sampleRate == 44100 && a.channels == 2)
    assert(a.samples.toSeq == fixtureSamples)
  }

  test("encode round-trips through decode") {
    val a = Wav.synthetic(42L, 50)
    val back = Wav.decode(Wav.encode(a))
    assert(back.sampleRate == a.sampleRate &&
      back.channels == a.channels &&
      back.samples.toSeq == a.samples.toSeq)
    // and the fixture re-encodes byte-identically (same canonical form)
    val tone = Wav.decode(res("tone.wav"))
    assert(Wav.encode(tone).toSeq == res("tone.wav").toSeq)
  }

  test("decode refuses bad magic, truncated data, non-PCM and wide " +
    "samples") {
    val ok = Wav.encode(Wav.synthetic(1L, 4))
    assert(intercept[IllegalArgumentException] {
      Wav.decode("RIFX".getBytes ++ ok.drop(4))
    }.getMessage.contains("magic"))
    assert(intercept[IllegalArgumentException] {
      Wav.decode(ok.dropRight(1))
    }.getMessage.contains("truncated"))
    val nonPcm = ok.clone(); nonPcm(20) = 3 // format code 3 = float
    assert(intercept[IllegalArgumentException] {
      Wav.decode(nonPcm)
    }.getMessage.contains("unsupported audio format"))
    val wide = ok.clone(); wide(34) = 32 // bits/sample
    assert(intercept[IllegalArgumentException] {
      Wav.decode(wide)
    }.getMessage.contains("sample width"))
  }

  test("features: hand-computed on a tiny clip") {
    val a = Wav.Audio(8000, 1, Array[Short](100, -200, 300, -400))
    val f = Wav.features(a)
    assert(f(0) == ((100 - 200 + 300 - 400).toDouble / 4 / 32768.0).toFloat)
    val sq = 100.0 * 100 + 200 * 200 + 300 * 300 + 400 * 400
    assert(f(1) == (math.sqrt(sq / 4) / 32768.0).toFloat)
    assert(f(2) == (3.0 / 3).toFloat) // three sign changes
    assert(f(3) == (400.0 / 32768.0).toFloat)
  }

  test("clip slicing tiles the sample stream exactly (frames, not raw " +
    "samples — stereo slices stay frame-aligned)") {
    val mono = Wav.synthetic(7L, 10)
    val clips = (0 until 4).flatMap(f => Wav.clip(mono, f, 4))
    assert(clips.map(_.samples.length) == Seq(2, 3, 2, 3))
    assert(clips.flatMap(_.samples).toSeq == mono.samples.toSeq)
    val stereo = Wav.Audio(8000, 2, Array.tabulate(12)(_.toShort))
    val sc = (0 until 3).flatMap(f => Wav.clip(stereo, f, 3))
    assert(sc.forall(_.samples.length % 2 == 0))
    assert(sc.flatMap(_.samples).toSeq == stereo.samples.toSeq)
  }

  test("decimate: nearest-neighbor frame sampling keeps channel frames " +
    "together") {
    val a = Wav.Audio(8000, 1, Array.tabulate(8)(i => (i * 10).toShort))
    assert(Wav.decimate(a, 4).samples.toSeq ==
      Seq[Short](0, 20, 40, 60))
    val st = Wav.Audio(8000, 2, Array.tabulate(8)(_.toShort)) // 4 frames
    assert(Wav.decimate(st, 2).samples.toSeq == Seq[Short](0, 1, 4, 5))
  }

  test("extractAudioFeatures DataFrame path is deterministic and " +
    "matches the kernel") {
    val rows = Seq(
      (1L, Wav.encode(Wav.synthetic(1L, 64))),
      (2L, Wav.encode(Wav.synthetic(2L, 64))))
    val df = rows.toDF("doc_id", "content")
    def run() = Multimodal.extractAudioFeatures(df, "doc_id")
      .orderBy("id").as[(Long, Int, Int, Seq[Float])].collect().toSeq
    val a = run()
    assert(a == run())
    assert(a.map(r => (r._1, r._2, r._3)) ==
      Seq((1L, 16000, 64), (2L, 16000, 64)))
    assert(a(0)._4 == Wav.features(Wav.synthetic(1L, 64)).toSeq)
  }

  test("decimate on a zero-frame clip (valid header-only WAV) returns " +
    "it unchanged instead of AIOOBE") {
    val empty = Wav.Audio(16000, 2, Array.empty[Short])
    val got = Wav.decimate(empty, 4)
    assert(got.samples.isEmpty && got.sampleRate == 16000 &&
      got.channels == 2)
  }
}
