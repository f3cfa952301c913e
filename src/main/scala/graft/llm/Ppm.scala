package graft.llm

/** Pure-JVM decoder/encoder for the netpbm portable pixmap format
  * (PPM: binary `P6` and ASCII `P3`) — the REAL image codec behind the
  * multimodal seam ([[Multimodal]]), replacing the round-5 decode stub.
  * PPM is a public, trivially-parseable format (netpbm ppm(5) man
  * page): `P6`/`P3` magic, whitespace/comment-separated width, height,
  * maxval in the header, then raw (P6) or ASCII (P3) RGB triplets.
  *
  * Scope: maxval ≤ 255 (the single-byte-per-sample P6 encoding; the
  * 2-byte big-endian wide form errors explicitly), `#` comments
  * anywhere in the header per the spec. Decode failures throw — a
  * corrupt image is an input error, not a silent zero-feature row.
  *
  * Everything downstream of decode is deterministic integer/IEEE
  * arithmetic, so feature extraction, frame banding, and resizing are
  * all REPLAYABLE in SQL (q_multimodal_features, q_ppm_frames,
  * q_ppm_resize) — the oracle recomputes the same pixels and the same
  * fixed operation order. */
object Ppm extends Serializable {

  val Mime = "image/x-portable-pixmap"

  /** Decoded image: interleaved RGB samples in [0, maxVal], row-major,
    * `pixels.length == width * height * 3`. */
  case class Image(width: Int, height: Int, maxVal: Int,
                   pixels: Array[Int]) {
    require(width > 0 && height > 0, s"bad dimensions: $width x $height")
    require(maxVal > 0 && maxVal <= 255, s"unsupported maxval: $maxVal")
    require(pixels.length == width * height * 3,
      s"pixel count ${pixels.length} != $width*$height*3")
  }

  /** Parse a P6 or P3 payload. */
  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length >= 2, "truncated ppm: no magic")
    val magic = new String(bytes, 0, 2, "US-ASCII")
    require(magic == "P6" || magic == "P3",
      s"not a ppm payload (magic '$magic')")
    var pos = 2

    // header token scan: skip whitespace and '#'-to-end-of-line
    // comments (ppm(5): comments may appear anywhere in the header)
    def skipSpace(): Unit = {
      var going = true
      while (going && pos < bytes.length) {
        val b = bytes(pos)
        if (b == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else if (b == ' ' || b == '\t' || b == '\r' || b == '\n') pos += 1
        else going = false
      }
    }
    def nextInt(): Int = {
      skipSpace()
      require(pos < bytes.length, "truncated ppm header")
      var v = 0
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        // no silent 32-bit wrap: a corrupt header must throw, not
        // decode "valid" wrong dimensions
        require(v <= 100000000, s"header integer too large at byte $pos")
        v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
      }
      require(any, s"expected integer at byte $pos")
      v
    }

    val width = nextInt()
    val height = nextInt()
    val maxVal = nextInt()
    require(maxVal <= 255,
      s"maxval $maxVal needs the 2-byte sample form (unsupported)")
    require(width.toLong * height * 3 <= Int.MaxValue,
      s"raster too large: $width x $height")
    val n = width * height * 3
    val px = new Array[Int](n)
    if (magic == "P6") {
      // exactly ONE whitespace byte separates the header from raster
      require(pos < bytes.length && (bytes(pos) == '\n' ||
        bytes(pos) == ' ' || bytes(pos) == '\t' || bytes(pos) == '\r'),
        "P6: missing raster separator")
      pos += 1
      require(bytes.length - pos >= n,
        s"truncated P6 raster: ${bytes.length - pos} of $n bytes")
      var i = 0
      while (i < n) { px(i) = bytes(pos + i) & 0xff; i += 1 }
    } else {
      var i = 0
      while (i < n) {
        val v = nextInt()
        require(v <= maxVal, s"P3 sample $v > maxval $maxVal")
        px(i) = v; i += 1
      }
    }
    Image(width, height, maxVal, px)
  }

  def encodeP6(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n${img.maxVal}\n"
      .getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < img.pixels.length) {
      out(header.length + i) = img.pixels(i).toByte; i += 1
    }
    out
  }

  def encodeP3(img: Image): Array[Byte] = {
    val sb = new StringBuilder(s"P3\n${img.width} ${img.height}\n${img.maxVal}\n")
    img.pixels.grouped(3).foreach(t => sb.append(t.mkString(" ")).append('\n'))
    sb.toString.getBytes("US-ASCII")
  }

  /** Deterministic synthetic test image (the oracle replays the same
    * generator arithmetically): sample j is `(id*31 + j*7) mod 251`. */
  def synthetic(id: Long, width: Int, height: Int): Image =
    Image(width, height, 255,
      Array.tabulate(width * height * 3)(j => ((id * 31 + j * 7) % 251).toInt))

  /** 8 deterministic pixel features, each a fixed integer-sum →
    * double-division → float chain (bit-replayable in SQL, see the
    * fixed-point notes in the KMeans scaladoc):
    * f0..f2 channel means / maxval; f3 integer-weighted luminance mean
    * (299/587/114, ÷1000); f4..f6 channel maxima / maxval;
    * f7 mean |R−B| / maxval. */
  def features(img: Image): Array[Float] = {
    val n = img.width * img.height
    val sum = new Array[Long](3)
    val max = new Array[Int](3)
    var lum = 0L
    var ad = 0L
    var p = 0
    while (p < n) {
      val r = img.pixels(3 * p)
      val g = img.pixels(3 * p + 1)
      val b = img.pixels(3 * p + 2)
      sum(0) += r; sum(1) += g; sum(2) += b
      if (r > max(0)) max(0) = r
      if (g > max(1)) max(1) = g
      if (b > max(2)) max(2) = b
      lum += 299L * r + 587L * g + 114L * b
      ad += math.abs(r - b)
      p += 1
    }
    val m = img.maxVal.toDouble
    Array(
      (sum(0).toDouble / n / m).toFloat,
      (sum(1).toDouble / n / m).toFloat,
      (sum(2).toDouble / n / m).toFloat,
      (lum.toDouble / 1000.0 / n / m).toFloat,
      (max(0).toDouble / m).toFloat,
      (max(1).toDouble / m).toFloat,
      (max(2).toDouble / m).toFloat,
      (ad.toDouble / n / m).toFloat)
  }

  /** Horizontal band `f` of `nFrames`: pixel rows
    * [f*h/nFrames, (f+1)*h/nFrames) — integer floors, so bands tile the
    * image exactly; empty bands (h < nFrames) yield None. */
  def band(img: Image, f: Int, nFrames: Int): Option[Image] = {
    val y0 = f * img.height / nFrames
    val y1 = (f + 1) * img.height / nFrames
    if (y1 <= y0) None
    else Some(Image(img.width, y1 - y0, img.maxVal,
      java.util.Arrays.copyOfRange(img.pixels,
        y0 * img.width * 3, y1 * img.width * 3)))
  }

  /** Nearest-neighbor resize: destination (x, y) samples source
    * (x*w/newW, y*h/newH) — integer floors, the standard
    * point-sampling decimator. */
  def resize(img: Image, newW: Int, newH: Int): Image = {
    require(newW > 0 && newH > 0, s"bad resize target: $newW x $newH")
    val px = new Array[Int](newW * newH * 3)
    var y = 0
    while (y < newH) {
      val sy = y * img.height / newH
      var x = 0
      while (x < newW) {
        val sx = x * img.width / newW
        var c = 0
        while (c < 3) {
          px((y * newW + x) * 3 + c) =
            img.pixels((sy * img.width + sx) * 3 + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Image(newW, newH, img.maxVal, px)
  }
}
