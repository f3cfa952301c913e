package graft.llm

/** Pure-JVM decoder/encoder for RIFF/WAVE PCM16 audio — the REAL audio
  * codec behind the multimodal seam, retiring the byte-level stand-in
  * for the audio modality the way [[Ppm]] retired it for images. The
  * format is public and trivially parseable (the Microsoft/IBM RIFF
  * WAVE spec): `RIFF <size> WAVE` then chunks; `fmt ` declares PCM
  * (audio format 1) 16-bit samples, `data` carries little-endian
  * interleaved frames; unknown chunks (LIST, fact, ...) are skipped
  * per the spec's chunk framing.
  *
  * Scope: PCM16 only (format code 1, 16 bits/sample) — compressed or
  * 8/24/32-bit forms error explicitly. Decode failures throw: a
  * corrupt clip is an input error, not a silent zero-feature row.
  *
  * Everything downstream of decode is deterministic integer/IEEE
  * arithmetic (exact long sums → fixed double division/sqrt chains →
  * one float rounding), so feature extraction, clip slicing, and
  * decimation replay in SQL (q_wav_features, q_wav_clips) — sqrt is
  * IEEE-correctly-rounded in both engines. */
object Wav extends Serializable {

  val Mime = "audio/x-wav"

  /** Decoded clip: interleaved PCM16 samples (frame-major). */
  case class Audio(sampleRate: Int, channels: Int, samples: Array[Short]) {
    require(sampleRate > 0, s"bad sample rate: $sampleRate")
    require(channels > 0, s"bad channel count: $channels")
  }

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  def decode(bytes: Array[Byte]): Audio = {
    require(bytes.length >= 12, "truncated wav: no RIFF header")
    require(tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
      s"not a wav payload (magic '${tag(bytes, 0)}'/'${tag(bytes, 8)}')")
    var pos = 12
    var rate = 0
    var channels = 0
    var haveFmt = false
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length && samples == null) {
      val id = tag(bytes, pos)
      val sz = le32(bytes, pos + 4)
      // compare against the REMAINING byte count — `pos + 8 + sz` could
      // wrap negative for a crafted ~2^31 size and sail past the check
      require(sz >= 0 && sz <= bytes.length - pos - 8,
        s"truncated wav chunk '$id': $sz bytes declared at $pos")
      id match {
        case "fmt " =>
          require(sz >= 16, s"fmt chunk too short: $sz")
          val fmt = le16(bytes, pos + 8)
          require(fmt == 1, s"unsupported audio format $fmt (PCM=1 only)")
          channels = le16(bytes, pos + 10)
          rate = le32(bytes, pos + 12)
          val bits = le16(bytes, pos + 22)
          require(bits == 16, s"unsupported sample width $bits (16 only)")
          haveFmt = true
        case "data" =>
          require(haveFmt, "data chunk before fmt chunk")
          require(sz % 2 == 0, s"odd PCM16 data size: $sz")
          val n = sz / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) {
            out(i) = le16(bytes, pos + 8 + 2 * i).toShort
            i += 1
          }
          samples = out
        case _ => // LIST/fact/...: skip per RIFF chunk framing
      }
      pos += 8 + sz + (sz & 1) // chunks are word-aligned (pad byte)
    }
    require(samples != null, "no data chunk")
    Audio(rate, channels, samples)
  }

  def encode(a: Audio): Array[Byte] = {
    val dataSz = a.samples.length * 2
    val out = new Array[Byte](44 + dataSz)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII")
      System.arraycopy(b, 0, out, off, b.length)
    }
    def p16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def p32(off: Int, v: Int): Unit = { p16(off, v); p16(off + 2, v >> 16) }
    put(0, "RIFF"); p32(4, 36 + dataSz); put(8, "WAVE")
    put(12, "fmt "); p32(16, 16); p16(20, 1); p16(22, a.channels)
    p32(24, a.sampleRate); p32(28, a.sampleRate * a.channels * 2)
    p16(32, a.channels * 2); p16(34, 16)
    put(36, "data"); p32(40, dataSz)
    var i = 0
    while (i < a.samples.length) {
      p16(44 + 2 * i, a.samples(i) & 0xffff); i += 1
    }
    out
  }

  /** Deterministic synthetic clip (the oracle replays the generator):
    * sample j is `((id*31 + j*7) mod 65521) - 32760`, mono. */
  def synthetic(id: Long, n: Int, rate: Int = 16000): Audio =
    Audio(rate, 1, Array.tabulate(n)(j =>
      (((id * 31 + j * 7) % 65521) - 32760).toShort))

  /** 4 deterministic features, each an exact integer sum → fixed
    * double chain → one float rounding (SQL-replayable):
    * f0 mean/32768, f1 RMS/32768 (IEEE sqrt), f2 zero-crossing rate
    * (strict sign(x) = x<0 changes over consecutive samples), f3
    * peak |s|/32768. Computed over the interleaved stream (channel-
    * agnostic; split channels upstream if per-channel stats are
    * wanted). */
  def features(a: Audio): Array[Float] = {
    val n = a.samples.length
    require(n > 1, s"need > 1 sample for features: $n")
    var sum = 0L
    var sumSq = 0L
    var zc = 0L
    var peak = 0L
    var i = 0
    while (i < n) {
      val s = a.samples(i).toLong
      sum += s
      sumSq += s * s
      if (i > 0 && ((a.samples(i - 1) < 0) != (s < 0))) zc += 1
      val abs = math.abs(s)
      if (abs > peak) peak = abs
      i += 1
    }
    Array(
      (sum.toDouble / n / 32768.0).toFloat,
      (math.sqrt(sumSq.toDouble / n) / 32768.0).toFloat,
      (zc.toDouble / (n - 1)).toFloat,
      (peak.toDouble / 32768.0).toFloat)
  }

  /** Time-slice clip `f` of `nClips`: sample FRAMES
    * [f*frames/nClips, (f+1)*frames/nClips) — integer floors tile the
    * clip exactly; empty slices yield None. */
  def clip(a: Audio, f: Int, nClips: Int): Option[Audio] = {
    val frames = a.samples.length / a.channels
    val f0 = f * frames / nClips
    val f1 = (f + 1) * frames / nClips
    if (f1 <= f0) None
    else Some(Audio(a.sampleRate, a.channels,
      java.util.Arrays.copyOfRange(a.samples,
        f0 * a.channels, f1 * a.channels)))
  }

  /** Nearest-neighbor decimation to `newFrames` frames: output frame i
    * samples source frame `i*frames/newFrames` (the [[Ppm.resize]]
    * analogue; a production resampler would low-pass first — this is
    * the deterministic point-sampling form). */
  def decimate(a: Audio, newFrames: Int): Audio = {
    require(newFrames > 0, s"bad target frame count: $newFrames")
    val frames = a.samples.length / a.channels
    // a zero-frame clip (valid header-only WAV, empty data chunk) has
    // nothing to sample — return it unchanged rather than AIOOBE on
    // samples(0) mid-task (clip() and features() both guard this case)
    if (frames == 0) return a
    val out = new Array[Short](newFrames * a.channels)
    var i = 0
    while (i < newFrames) {
      val src = i * frames / newFrames
      var c = 0
      while (c < a.channels) {
        out(i * a.channels + c) = a.samples(src * a.channels + c)
        c += 1
      }
      i += 1
    }
    Audio(a.sampleRate, a.channels, out)
  }
}
