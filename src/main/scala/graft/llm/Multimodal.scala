package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2.6): image/audio/video payloads
  * as opaque `binary` columns with a typed metadata struct. The in-reference
  * precedent is model zips flowing through topics as raw bytes
  * (reference makinage/model_publisher/model_publisher.py:30-34, `none`
  * codec).
  *
  * IMAGE payloads are decoded for REAL: [[Ppm]] is a full pure-JVM
  * netpbm P6/P3 codec, and [[extractImageFeatures]] /
  * [[sampleImageRows]] / [[resizeImage]] run on actual decoded pixels
  * (oracled: q_multimodal_features, q_ppm_frames, q_ppm_resize). The
  * same goes for audio ([[Wav]]) and video ([[Y4m]]);
  * [[extractFeatures]] dispatches payloads to those real codecs by
  * magic bytes ([[sniffModality]], oracled as q_magic_features). The
  * BYTE-level kernels (the [[extractFeatures]] fallback branch,
  * [[sampleFrames]], [[resizeTo]]) remain the documented seam for
  * formats whose codecs aren't in this container: deterministic byte
  * arithmetic behind the same `mapPartitions`/map-only shapes, so the
  * Spark-side contract (schema, batch shape, partitioning) is real and
  * tested; in production the byte kernel is replaced by the codec
  * call, nothing else changes.
  */
object Multimodal {

  /** Metadata schema carried beside every binary payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("sha256", StringType)))

  /** Wrap a string column as a multimodal (binary, metadata) pair — the
    * test-corpus stand-in for real media bytes. sha256 gives content
    * addressing: dedup/joins move 32-byte digests, never payloads. */
  def asBinaryDoc(df: DataFrame, idCol: String, payloadCol: String,
                  mime: String = "text/plain"): DataFrame =
    df.select(
      col(idCol),
      encode(col(payloadCol), "UTF-8").as("content"),
      struct(
        lit(mime).as("mime"),
        length(encode(col(payloadCol), "UTF-8")).cast("long").as("n_bytes"),
        sha2(encode(col(payloadCol), "UTF-8"), 256).as("sha256")).as("meta"))

  /** Content-addressed exact dedup: group by digest, keep min id. The
    * payload never crosses the shuffle — only (digest, id). */
  def dedupByContent(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol), col("meta.sha256").as("sha256"))
      .groupBy("sha256")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))

  /** Feature-extraction schema produced by [[extractFeatures]]:
    * `modality` records which codec the magic bytes dispatched to
    * ("image"/"audio"/"video", or "bytes" for the generic fallback). */
  val featureSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("modality", StringType),
    StructField("n_bytes", LongType),
    StructField("feature", ArrayType(FloatType))))

  /** Modality sniffed from the payload's MAGIC BYTES — the dispatch
    * rule for corpora that carry no (or untrustworthy) mime column:
    * netpbm "P6"/"P3" + whitespace → image, RIFF····WAVE → audio,
    * "YUV4MPEG2" → video, anything else → "bytes" (generic fallback).
    * Pure function of the first 12 bytes; a payload that matches a
    * magic but fails its codec is an input error (decode throws), not
    * a silent fallback — a corrupt image should fail the run, not
    * quietly become a byte histogram. */
  def sniffModality(bytes: Array[Byte]): String = {
    def ascii(off: Int, n: Int): String =
      if (bytes.length >= off + n)
        new String(bytes, off, n,
          java.nio.charset.StandardCharsets.US_ASCII)
      else ""
    val p2 = ascii(0, 2)
    val pbmWs = bytes.length >= 3 && (bytes(2) == ' ' ||
      bytes(2) == '\n' || bytes(2) == '\t' || bytes(2) == '\r')
    if ((p2 == "P6" || p2 == "P3") && pbmWs) "image"
    else if (ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE") "audio"
    else if (ascii(0, 9) == "YUV4MPEG2") "video"
    else "bytes"
  }

  /** Decode + feature-extract over binary payloads, dispatching each
    * payload to its REAL codec by [[sniffModality]] magic bytes:
    * [[Ppm.features]] (8 pixel features), [[Wav.features]] (4 sample
    * features), [[Y4m.features]] (4 plane/motion features). Payloads
    * matching no magic take the deterministic `dim`-bucket strided
    * byte-histogram fallback — the documented seam for formats whose
    * codecs aren't in this container; in production that branch is
    * another codec call, nothing else changes. Batched per partition
    * so codec state loads once per task (the 1000-executor pattern:
    * partition count ≈ cluster parallelism; payloads stay where they
    * were read — map-only, no shuffle). Mime-keyed routing (explicit
    * mime column, unknown mime refused) is
    * [[graft.streaming.ops.MediaFeaturesOp]].
    */
  def extractFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                      dim: Int = 8): DataFrame =
    // typed mapPartitions with the public row encoder — stays inside the
    // Dataset pipeline (Deserialize→MapPartitions→Serialize), unlike an
    // `.rdd` hop whose createDataFrame re-enters the planner through a
    // Scan ExistingRDD with no lineage back to the parquet source
    // (pattern: Serve.inferBatch)
    df.select(col(idCol).cast("long").as("id"), col("content"))
      .mapPartitions { rows =>
        // per-partition setup happens HERE once (codec/model init in prod)
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val modality = sniffModality(bytes)
          val feature = modality match {
            case "image" => Ppm.features(Ppm.decode(bytes))
            case "audio" => Wav.features(Wav.decode(bytes))
            case "video" => Y4m.features(Y4m.decode(bytes))
            case _ => Array.tabulate(dim) { i =>
              var acc = 0L
              var j = i
              while (j < bytes.length) { acc += (bytes(j) & 0xff); j += dim }
              (acc % 1000).toFloat / 1000f
            }
          }
          Row(id, modality, bytes.length.toLong, feature)
        }
      }(org.apache.spark.sql.Encoders.row(featureSchema))

  /** Feature schema of [[extractImageFeatures]]: decoded dimensions
    * ride along so a parser regression is visible, not just a feature
    * drift. */
  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** REAL decode + feature extraction for PPM image payloads: parse
    * the P6/P3 raster ([[Ppm.decode]]) and compute the 8 deterministic
    * pixel features ([[Ppm.features]]) — per-partition batching like
    * every decode kernel here (codec state loads once per task,
    * payloads never shuffle; map-only). A non-PPM payload is an input
    * error (decode throws): route other mimes to their own kernel. */
  def extractImageFeatures(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val img = Ppm.decode(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), img.width, img.height, Ppm.features(img))
        }
      }(org.apache.spark.sql.Encoders.row(imageFeatureSchema))

  /** REAL frame sampling for PPM payloads: decode, split into
    * `nFrames` horizontal pixel-row bands ([[Ppm.band]] — the video
    * analogue: evenly-spaced slices of the real raster, not byte
    * ranges), re-encode each band as a standalone P6 image. Map-only
    * generator like [[sampleFrames]]; short images yield fewer
    * frames. */
  def sampleImageRows(df: DataFrame, idCol: String, nFrames: Int)
      : DataFrame = {
    require(nFrames > 0, "nFrames must be positive")
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
    df.select(col(idCol).cast("long").as("id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val img = Ppm.decode(r.getAs[Array[Byte]](1))
          (0 until nFrames).flatMap { f =>
            Ppm.band(img, f, nFrames).map(b =>
              Row(r.getLong(0), f, Ppm.encodeP6(b)))
          }
        }
      }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** REAL resize for PPM payloads: decode, nearest-neighbor resample
    * ([[Ppm.resize]]), re-encode, metadata recomputed over the new
    * payload (same contract as [[resizeTo]]). */
  def resizeImage(df: DataFrame, idCol: String, newW: Int, newH: Int)
      : DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("content", BinaryType)))
    df.select(col(idCol).cast("long").as("id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val img = Ppm.decode(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), Ppm.encodeP6(Ppm.resize(img, newW, newH)))
        }
      }(org.apache.spark.sql.Encoders.row(schema))
      .select(col("id").as(idCol), col("content"),
        struct(
          lit(Ppm.Mime).as("mime"),
          length(col("content")).cast("long").as("n_bytes"),
          sha2(col("content"), 256).as("sha256")).as("meta"))
  }

  /** Feature schema of [[extractAudioFeatures]] — decoded rate/length
    * ride along so a parser regression is visible. */
  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("n_samples", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** REAL decode + feature extraction for WAV payloads ([[Wav]] PCM16
    * codec): mean/RMS/zero-crossings/peak over actual decoded samples.
    * Same kernel shape as [[extractImageFeatures]]. */
  def extractAudioFeatures(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val a = Wav.decode(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), a.sampleRate, a.samples.length,
            Wav.features(a))
        }
      }(org.apache.spark.sql.Encoders.row(audioFeatureSchema))

  /** REAL clip sampling for WAV payloads: decode, slice into `nClips`
    * time ranges ([[Wav.clip]]), re-encode each as a standalone WAV.
    * The audio analogue of [[sampleImageRows]]. */
  def sampleAudioClips(df: DataFrame, idCol: String, nClips: Int)
      : DataFrame = {
    require(nClips > 0, "nClips must be positive")
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("clip_idx", IntegerType),
      StructField("clip", BinaryType)))
    df.select(col(idCol).cast("long").as("id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val a = Wav.decode(r.getAs[Array[Byte]](1))
          (0 until nClips).flatMap { f =>
            Wav.clip(a, f, nClips).map(c =>
              Row(r.getLong(0), f, Wav.encode(c)))
          }
        }
      }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** REAL decimation for WAV payloads: nearest-neighbor down-sample to
    * `newFrames` frames ([[Wav.decimate]]), re-encoded, metadata
    * refreshed — the audio analogue of [[resizeImage]]. */
  def decimateAudio(df: DataFrame, idCol: String, newFrames: Int)
      : DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("content", BinaryType)))
    df.select(col(idCol).cast("long").as("id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val a = Wav.decode(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), Wav.encode(Wav.decimate(a, newFrames)))
        }
      }(org.apache.spark.sql.Encoders.row(schema))
      .select(col("id").as(idCol), col("content"),
        struct(
          lit(Wav.Mime).as("mime"),
          length(col("content")).cast("long").as("n_bytes"),
          sha2(col("content"), 256).as("sha256")).as("meta"))
  }

  /** Feature schema of [[extractVideoFeatures]]. */
  val videoFeatureSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** REAL demux + feature extraction for Y4M video payloads ([[Y4m]]):
    * per-plane means + temporal-motion proxy over actual decoded
    * frames. Same kernel shape as the image/audio extractors. */
  def extractVideoFeatures(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val v = Y4m.decode(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), v.width, v.height, v.frames.length,
            Y4m.features(v))
        }
      }(org.apache.spark.sql.Encoders.row(videoFeatureSchema))

  /** REAL keyframe sampling for Y4M payloads: demux, select `nSel`
    * evenly-spaced frames ([[Y4m.sampleFrames]] — the demuxer seek
    * pattern the byte-slicing [[sampleFrames]] stands in for), emit
    * each as a standalone single-frame clip. Output: (id, frame_idx =
    * SOURCE frame number, frame binary). */
  def sampleVideoFrames(df: DataFrame, idCol: String, nSel: Int)
      : DataFrame = {
    require(nSel > 0, "nSel must be positive")
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
    df.select(col(idCol).cast("long").as("id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val v = Y4m.decode(r.getAs[Array[Byte]](1))
          Y4m.sampleFrames(v, nSel).map { case (src, fv) =>
            Row(r.getLong(0), src, Y4m.encode(fv))
          }
        }
      }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** STUB frame sampling for video-shaped payloads: emit `nFrames`
    * evenly-spaced "frames" per payload — one output row per frame,
    * (id, frame_idx, frame binary). Real implementation: the container
    * demuxer seeks to the n evenly-spaced keyframes; here each frame is a
    * deterministic byte slice so tests pin the row-explosion shape,
    * ordering, and determinism.
    *
    * Scale posture: map-only (a generator, no shuffle) and the ×nFrames
    * row growth happens AFTER any filter/dedup upstream — sample frames
    * from the deduped survivors, never the raw corpus. */
  def sampleFrames(df: DataFrame, idCol: String, nFrames: Int): DataFrame = {
    require(nFrames > 0, "nFrames must be positive")
    val total = length(col("content"))
    val width = greatest(floor(total / nFrames), lit(1)).cast("int")
    df.select(col(idCol).cast("long").as("id"),
        posexplode(transform(sequence(lit(0), lit(nFrames - 1)),
          i => substring(col("content"), (i * width + 1).cast("int"),
            width))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame")
      .filter(length(col("frame")) > 0) // payloads shorter than nFrames
  }

  /** STUB resize/transcode: binary payload → bounded-size payload with
    * updated metadata. Real implementation decodes, resizes to
    * `maxBytes`-budget quality, re-encodes; the stub truncates
    * deterministically. Shape contract: per-row, map-only, metadata
    * (n_bytes, sha256) recomputed over the NEW payload so downstream
    * content addressing stays consistent. */
  def resizeTo(df: DataFrame, maxBytes: Int): DataFrame = {
    require(maxBytes > 0, "maxBytes must be positive")
    val resized = substring(col("content"), 1, maxBytes)
    df.withColumn("content", resized)
      .withColumn("meta", struct(
        col("meta.mime").as("mime"),
        length(col("content")).cast("long").as("n_bytes"),
        sha2(col("content"), 256).as("sha256")))
  }
}
