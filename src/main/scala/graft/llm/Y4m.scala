package graft.llm

/** Pure-JVM demuxer/muxer for the YUV4MPEG2 (`.y4m`) video container —
  * the REAL video codec behind the multimodal seam, completing the
  * modality set ([[Ppm]] images, [[Wav]] audio). Y4M is the public
  * uncompressed interchange format of the mjpegtools/x264 toolchain:
  * an ASCII stream header `YUV4MPEG2 W<w> H<h> F<num>:<den> [...]\n`,
  * then per frame an ASCII `FRAME[params]\n` marker followed by raw
  * planar YUV data.
  *
  * Scope: the `C444` colorspace (three full-resolution planes) and
  * the format's default `C420` family (`C420`, `C420jpeg`,
  * `C420mpeg2`, `C420paldv` — quarter-size chroma planes; the siting
  * variants differ only in sample POSITION semantics, not layout, so
  * they parse identically); other colorspaces error explicitly, as do
  * missing W/H, odd dimensions under 4:2:0, truncated frames, and
  * unknown-magic payloads. Decode failures throw — a corrupt clip is
  * an input error, not a silent zero-feature row.
  *
  * Everything downstream of decode is deterministic integer/IEEE
  * arithmetic, so per-plane statistics, the temporal-motion proxy, and
  * frame extraction replay in SQL byte-for-byte (q_y4m_features,
  * q_y4m_frames). */
object Y4m extends Serializable {

  val Mime = "video/x-yuv4mpeg"

  /** Decoded clip: per-frame planar YUV samples in [0,255] — the Y
    * plane (width×height) then U then V ([[chromaSize]] each; equal to
    * the luma plane under C444, a quarter of it under the C420
    * family). */
  case class Video(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                   frames: IndexedSeq[Array[Int]],
                   chroma: String = "C444") {
    require(width > 0 && height > 0, s"bad dimensions: $width x $height")
    require(fpsNum > 0 && fpsDen > 0, s"bad rate: $fpsNum:$fpsDen")
    require(chroma == "C444" || chroma.startsWith("C420"),
      s"unsupported colorspace $chroma")
    require(chroma == "C444" || (width % 2 == 0 && height % 2 == 0),
      s"4:2:0 needs even dimensions: $width x $height")
    require(width.toLong * height * 3 <= Int.MaxValue,
      s"frame too large: $width x $height")
    /** samples per chroma plane */
    def chromaSize: Int =
      if (chroma == "C444") width * height else (width / 2) * (height / 2)
    def frameSamples: Int = width * height + 2 * chromaSize
    require(frames.forall(_.length == frameSamples), "frame size mismatch")
  }

  def decode(bytes: Array[Byte]): Video = {
    val magic = "YUV4MPEG2"
    require(bytes.length > magic.length &&
      new String(bytes, 0, magic.length, "US-ASCII") == magic,
      "not a y4m payload (bad magic)")
    var pos = magic.length
    def readLine(): String = {
      val start = pos
      while (pos < bytes.length && bytes(pos) != '\n') pos += 1
      require(pos < bytes.length, "truncated y4m header line")
      val s = new String(bytes, start, pos - start, "US-ASCII")
      pos += 1 // consume '\n'
      s
    }
    val header = readLine()
    var w = -1
    var h = -1
    var num = 30
    var den = 1
    var chroma = "C444"
    header.split(' ').filter(_.nonEmpty).foreach { p =>
      p.head match {
        case 'W' => w = p.tail.toInt
        case 'H' => h = p.tail.toInt
        case 'F' =>
          val nd = p.tail.split(':')
          require(nd.length == 2, s"bad frame-rate tag: $p")
          num = nd(0).toInt; den = nd(1).toInt
        case 'C' => require(p == "C444" || p.startsWith("C420"),
          s"unsupported colorspace ${p} (C444 / C420 family only)")
          chroma = p
        case _ => // Ip/A../X.. tags: accepted, ignored
      }
    }
    require(w > 0 && h > 0, s"missing W/H in header: '$header'")
    require(w.toLong * h * 3 <= Int.MaxValue,
      s"frame too large: $w x $h") // no silent 32-bit product wrap
    // C420 siting variants (jpeg/mpeg2/paldv) share the quarter-chroma
    // LAYOUT; the distinction is sample positioning, irrelevant here
    val chromaSz =
      if (chroma == "C444") w * h
      else {
        require(w % 2 == 0 && h % 2 == 0,
          s"4:2:0 needs even dimensions: $w x $h")
        (w / 2) * (h / 2)
      }
    val frameBytes = w * h + 2 * chromaSz
    val frames = IndexedSeq.newBuilder[Array[Int]]
    while (pos < bytes.length) {
      val marker = readLine()
      require(marker == "FRAME" || marker.startsWith("FRAME "),
        s"expected FRAME marker, got '$marker'")
      require(bytes.length - pos >= frameBytes,
        s"truncated frame: ${bytes.length - pos} of $frameBytes bytes")
      val fr = new Array[Int](frameBytes)
      var i = 0
      while (i < frameBytes) { fr(i) = bytes(pos + i) & 0xff; i += 1 }
      frames += fr
      pos += frameBytes
    }
    val fs = frames.result()
    require(fs.nonEmpty, "no frames")
    Video(w, h, num, den, fs, chroma)
  }

  def encode(v: Video): Array[Byte] = {
    val header =
      s"YUV4MPEG2 W${v.width} H${v.height} F${v.fpsNum}:${v.fpsDen} ${v.chroma}\n"
        .getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val frameBytes = v.frameSamples
    val out = new Array[Byte](header.length +
      v.frames.length * (marker.length + frameBytes))
    System.arraycopy(header, 0, out, 0, header.length)
    var off = header.length
    v.frames.foreach { fr =>
      System.arraycopy(marker, 0, out, off, marker.length)
      off += marker.length
      var i = 0
      while (i < frameBytes) { out(off + i) = fr(i).toByte; i += 1 }
      off += frameBytes
    }
    out
  }

  /** Deterministic synthetic clip (the oracle replays the generator):
    * frame f, plane-sample j is `(id*31 + f*101 + j*7) mod 251`. */
  def synthetic(id: Long, width: Int, height: Int, nFrames: Int): Video =
    Video(width, height, 25, 1, IndexedSeq.tabulate(nFrames)(f =>
      Array.tabulate(3 * width * height)(j =>
        ((id * 31 + f * 101 + j * 7) % 251).toInt)))

  /** 4 deterministic features over the whole clip, each an exact
    * integer sum → fixed double chain → one float rounding
    * (SQL-replayable): f0..f2 per-plane (Y/U/V) means / 255; f3 the
    * temporal-motion proxy — mean |sample(f) − sample(f−1)| over all
    * consecutive frame pairs / 255 (needs ≥ 2 frames). */
  def features(v: Video): Array[Float] = {
    val n = v.frames.length
    require(n > 1, s"need > 1 frame for motion: $n")
    val y = v.width * v.height
    val c = v.chromaSize
    val sums = new Array[Long](3)
    var motion = 0L
    var f = 0
    while (f < n) {
      val fr = v.frames(f)
      val prev = if (f > 0) v.frames(f - 1) else null
      var j = 0
      while (j < fr.length) {
        sums(if (j < y) 0 else if (j < y + c) 1 else 2) += fr(j)
        if (prev != null) motion += math.abs(fr(j) - prev(j))
        j += 1
      }
      f += 1
    }
    Array(
      (sums(0).toDouble / (n.toLong * y) / 255.0).toFloat,
      (sums(1).toDouble / (n.toLong * c) / 255.0).toFloat,
      (sums(2).toDouble / (n.toLong * c) / 255.0).toFloat,
      (motion.toDouble / ((n - 1).toLong * (y + 2L * c)) / 255.0)
        .toFloat)
  }

  /** Evenly-spaced keyframe selection: sampled frame i is source frame
    * `i*frames/nSel` (integer floor — the demuxer seek pattern), each
    * re-encoded as a standalone single-frame clip. */
  def sampleFrames(v: Video, nSel: Int): IndexedSeq[(Int, Video)] = {
    require(nSel > 0, s"bad sample count: $nSel")
    def one(src: Int) = (src, Video(v.width, v.height, v.fpsNum,
      v.fpsDen, IndexedSeq(v.frames(src)), v.chroma))
    if (nSel >= v.frames.length) v.frames.indices.map(one)
    else (0 until nSel).map(i => one(i * v.frames.length / nSel))
  }
}
