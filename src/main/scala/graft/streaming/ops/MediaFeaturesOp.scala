package graft.streaming.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.{Ppm, Wav, Y4m}
import graft.streaming.OperatorFactory

/** Mixed-media feature extraction as a topology factory: one pass over
  * a stream/batch of (id, mime, content) rows, routing each payload to
  * its REAL codec by mime — [[Ppm]] images, [[Wav]] audio, [[Y4m]]
  * video — and emitting one unified feature row per payload. The
  * production shape for a crawl table that interleaves modalities: the
  * decode state loads once per task (`mapPartitions`), payloads never
  * shuffle, and the operator is stateless, so it composes with
  * streaming sources, `config_topic` reconfig, and partitioned sinks
  * straight from YAML.
  *
  * Output schema: `(id, modality, d1, d2, d3, n_feats, f0..f3)` — the
  * modality-specific dims land in d1..d3 (image: width/height/1;
  * audio: rate/samples/channels; video: width/height/frames) and the
  * first four features are universal (the full 8-feature image vector
  * is available via [[graft.llm.Multimodal.extractImageFeatures]]).
  * An unknown mime throws: route exotic formats to their own operator
  * rather than silently zero-filling.
  *
  * Config: `id_col` ("doc_id"), `mime_col` ("mime"), `content_col`
  * ("content"). Oracled end-to-end over a mixed corpus as
  * q_media_features. */
object MediaFeaturesOp extends OperatorFactory {

  val schema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("modality", StringType),
    StructField("d1", IntegerType),
    StructField("d2", IntegerType),
    StructField("d3", IntegerType),
    StructField("n_feats", IntegerType),
    StructField("f0", FloatType),
    StructField("f1", FloatType),
    StructField("f2", FloatType),
    StructField("f3", FloatType)))

  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val df = sources.head
    val idCol = config.getOrElse("id_col", "doc_id").toString
    val mimeCol = config.getOrElse("mime_col", "mime").toString
    val contentCol = config.getOrElse("content_col", "content").toString
    val out = df
      .select(col(idCol).cast("long").as("id"), col(mimeCol).as("mime"),
        col(contentCol).as("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](2)
          r.getString(1) match {
            case Ppm.Mime =>
              val img = Ppm.decode(bytes)
              val f = Ppm.features(img)
              Row(id, "image", img.width, img.height, 1, f.length,
                f(0), f(1), f(2), f(3))
            case Wav.Mime =>
              val a = Wav.decode(bytes)
              val f = Wav.features(a)
              Row(id, "audio", a.sampleRate, a.samples.length,
                a.channels, f.length, f(0), f(1), f(2), f(3))
            case Y4m.Mime =>
              val v = Y4m.decode(bytes)
              val f = Y4m.features(v)
              Row(id, "video", v.width, v.height, v.frames.length,
                f.length, f(0), f(1), f(2), f(3))
            case other => throw new IllegalArgumentException(
              s"unsupported media mime '$other' for id $id")
          }
        }
      }(org.apache.spark.sql.Encoders.row(schema))
    Seq(out)
  }
}
