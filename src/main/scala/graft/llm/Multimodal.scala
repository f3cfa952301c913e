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
  * The decode/feature-extract kernels are STUBS (the real image/audio codecs
  * are not in this container) behind `mapPartitions` with deterministic fake
  * outputs — the Spark-side contract (schema, batch shape, partitioning) is
  * real and tested. In production the stub body is replaced by the codec
  * call; nothing else changes.
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

  /** Feature-extraction schema produced by [[extractFeatures]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("n_bytes", LongType),
    StructField("feature", ArrayType(FloatType))))

  /** STUB decode + feature-extract over binary payloads.
    *
    * Real implementation: an image/audio codec decodes `content` and a model
    * produces an embedding, batched per partition so the codec/model loads
    * once per task (the 1000-executor pattern: partition count ≈ cluster
    * parallelism; payloads stay where they were read — map-only, no
    * shuffle). Here the "feature" is a deterministic fake derived from the
    * payload bytes, so tests pin schema/shape/determinism.
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
          // ??? real codec goes here; deterministic fake: byte histogram
          val feature = Array.tabulate(dim) { i =>
            var acc = 0L
            var j = i
            while (j < bytes.length) { acc += (bytes(j) & 0xff); j += dim }
            (acc % 1000).toFloat / 1000f
          }
          Row(id, bytes.length.toLong, feature)
        }
      }(org.apache.spark.sql.Encoders.row(featureSchema))

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
