package graft.llm

/** Pure-JVM demuxer/muxer for the YUV4MPEG2 (`.y4m`) video container —
  * the REAL video codec behind the multimodal seam, completing the
  * modality set ([[Ppm]] images, [[Wav]] audio). Y4M is the public
  * uncompressed interchange format of the mjpegtools/x264 toolchain:
  * an ASCII stream header `YUV4MPEG2 W<w> H<h> F<num>:<den> [...]\n`,
  * then per frame an ASCII `FRAME[params]\n` marker followed by raw
  * planar YUV data.
  *
  * Scope: the `C444` colorspace (three full-resolution planes per
  * frame — no chroma subsampling arithmetic to misreplicate); other
  * colorspaces error explicitly, as do missing W/H, truncated frames,
  * and unknown-magic payloads. Decode failures throw — a corrupt clip
  * is an input error, not a silent zero-feature row.
  *
  * Everything downstream of decode is deterministic integer/IEEE
  * arithmetic, so per-plane statistics, the temporal-motion proxy, and
  * frame extraction replay in SQL byte-for-byte (q_y4m_features,
  * q_y4m_frames). */
object Y4m extends Serializable {

  val Mime = "video/x-yuv4mpeg"

  /** Decoded clip: per-frame planar YUV444 samples in [0,255],
    * `frames(f).length == 3 * width * height` (Y plane, then U, then
    * V). */
  case class Video(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                   frames: IndexedSeq[Array[Int]]) {
    require(width > 0 && height > 0, s"bad dimensions: $width x $height")
    require(fpsNum > 0 && fpsDen > 0, s"bad rate: $fpsNum:$fpsDen")
    require(frames.forall(_.length == 3 * width * height),
      "frame size mismatch")
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
    header.split(' ').filter(_.nonEmpty).foreach { p =>
      p.head match {
        case 'W' => w = p.tail.toInt
        case 'H' => h = p.tail.toInt
        case 'F' =>
          val nd = p.tail.split(':')
          require(nd.length == 2, s"bad frame-rate tag: $p")
          num = nd(0).toInt; den = nd(1).toInt
        case 'C' => require(p == "C444",
          s"unsupported colorspace ${p} (C444 only)")
        case _ => // Ip/A../X.. tags: accepted, ignored
      }
    }
    require(w > 0 && h > 0, s"missing W/H in header: '$header'")
    val frameBytes = 3 * w * h
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
    Video(w, h, num, den, fs)
  }

  def encode(v: Video): Array[Byte] = {
    val header =
      s"YUV4MPEG2 W${v.width} H${v.height} F${v.fpsNum}:${v.fpsDen} C444\n"
        .getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val frameBytes = 3 * v.width * v.height
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
    val plane = v.width * v.height
    val sums = new Array[Long](3)
    var motion = 0L
    var f = 0
    while (f < n) {
      val fr = v.frames(f)
      var j = 0
      while (j < fr.length) {
        sums(j / plane) += fr(j)
        if (f > 0) motion += math.abs(fr(j) - v.frames(f - 1)(j))
        j += 1
      }
      f += 1
    }
    val perPlane = n.toLong * plane
    Array(
      (sums(0).toDouble / perPlane / 255.0).toFloat,
      (sums(1).toDouble / perPlane / 255.0).toFloat,
      (sums(2).toDouble / perPlane / 255.0).toFloat,
      (motion.toDouble / ((n - 1).toLong * 3 * plane) / 255.0).toFloat)
  }

  /** Evenly-spaced keyframe selection: sampled frame i is source frame
    * `i*frames/nSel` (integer floor — the demuxer seek pattern), each
    * re-encoded as a standalone single-frame clip. */
  def sampleFrames(v: Video, nSel: Int): IndexedSeq[(Int, Video)] = {
    require(nSel > 0, s"bad sample count: $nSel")
    def one(src: Int) = (src, Video(v.width, v.height, v.fpsNum,
      v.fpsDen, IndexedSeq(v.frames(src))))
    if (nSel >= v.frames.length) v.frames.indices.map(one)
    else (0 until nSel).map(i => one(i * v.frames.length / nSel))
  }
}
