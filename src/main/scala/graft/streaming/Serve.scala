package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** The serve operator (reference makinage/serve/serve.py:104-148): a data
  * stream scored by a hot-swappable model with pre/post transforms and
  * count batching.
  *
  * Reference semantics re-expressed on micro-batches (SURVEY.md §3.3):
  *  - model + config are slowly-changing side inputs. The reference joins
  *    them per-EVENT with `with_latest_from` (serve.py:141); we re-resolve
  *    them per MICRO-BATCH in foreachBatch — the documented
  *    batch-granularity contract (SURVEY.md §7.4.2).
  *  - `batch` (serve.py:82-101) groups `batchSize` events per predict()
  *    call; here batching happens inside partitions via grouped(n) — the
  *    model sees the same batch shape, executor-local, no shuffle.
  *  - per-item errors are dropped, not fatal (serve.py:54-57): infer
  *    returns Option and Nones are filtered.
  *
  * The model is distributed by broadcast once per swap, not per batch —
  * at 1000 executors a per-batch resend of a 100 MB model would dominate;
  * the version check makes rebroadcast a no-op while the model is stable.
  */
object Serve {

  /** A loaded model: opaque predict over a batch of feature vectors.
    * (Stands in for mlflow pyfunc load, serve.py:22-28.) */
  case class Model(version: Long, predict: Seq[Double] => Seq[Double])
      extends Serializable

  /** The bytes→Model boundary (the reference's load_mlflow_model,
    * makinage/serve/serve.py:22-28, exercised against a golden artifact
    * in tests/test_serve.py:81-83). The container has no mlflow runtime,
    * so the shipped format is a minimal self-describing linear-model
    * binary; any richer loader (JPMML/ONNX-style) plugs in at the same
    * seam — artifact bytes arrive through a model topic
    * ([[ModelPublisher]]) and are decoded once per hot-swap.
    *
    * Layout (big-endian): magic "GRFTLM01" ·· version int64 ··
    * intercept float64 ·· slope float64 (32 bytes). */
  val ModelMagic: Array[Byte] =
    "GRFTLM01".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  def encodeLinearModel(version: Long, intercept: Double,
                        slope: Double): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(32)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.put(ModelMagic).putLong(version).putDouble(intercept)
      .putDouble(slope)
    buf.array()
  }

  def loadModel(bytes: Array[Byte]): Model = {
    require(bytes.length == 32, s"model artifact: ${bytes.length} bytes")
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    val magic = new Array[Byte](8)
    buf.get(magic)
    require(java.util.Arrays.equals(magic, ModelMagic),
      "model artifact: bad magic")
    val version = buf.getLong()
    val intercept = buf.getDouble()
    val slope = buf.getDouble()
    Model(version, xs => xs.map(x => slope * x + intercept))
  }

  /** inputField supports nested paths ("payload.x") — the reference's
    * dict-event case (input_field/output_field,
    * reference makinage/sample/serve.py:4-21). pre/post are whole-frame
    * transforms applied around inference (create_transform_functions,
    * reference serve.py:60-79), resolvable from config by reflection via
    * [[resolveTransform]]. */
  case class ServeConfig(batchSize: Int = 1,
                         inputField: String = "value",
                         outputField: String = "prediction",
                         pre: DataFrame => DataFrame = identity,
                         post: DataFrame => DataFrame = identity)

  /** Reflection loader for transform objects (the import_function
    * analogue, reference makinage/util.py:5-23): FQCN of a Scala object
    * extending `DataFrame => DataFrame`. */
  def resolveTransform(fqcn: String): DataFrame => DataFrame =
    Class.forName(fqcn + "$").getField("MODULE$").get(null)
      .asInstanceOf[DataFrame => DataFrame]

  /** Provider called once per micro-batch: returns the CURRENT model —
    * the `start_from: last` + hot-swap contract of the model topic
    * (reference config.sample.serve.yml:8-10). */
  type ModelProvider = () => Model

  /** Score a bounded batch: the shared kernel for batch + streaming. */
  def inferBatch(df0: DataFrame, model: Model, cfg: ServeConfig)
      : DataFrame =
    inferVia(df0, () => model, cfg)

  /** The shared inference plan over a serializable model ACCESSOR: the
    * mapPartitions closure captures only `modelRef`, so the streaming
    * path can pass `() => bc.value` (a broadcast handle — the model
    * ships once per executor per swap) while the direct batch path
    * passes `() => model` (task-serialized, fine for one-shot scoring). */
  private def inferVia(df0: DataFrame, modelRef: () => Model,
                       cfg: ServeConfig): DataFrame = {
    val df = cfg.pre(df0)
    // project the (possibly nested) input to a trailing column so the
    // partition kernel reads by position — supports dict-shaped events
    val withIn = df.withColumn("__in", col(cfg.inputField).cast("double"))
    val inIdx = withIn.schema.length - 1
    val bSize = cfg.batchSize
    val outSchema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(
        cfg.outputField, org.apache.spark.sql.types.DoubleType))
    // typed Dataset.mapPartitions (not an RDD hop): stays in the encoder
    // pipeline, so the scored frame composes with downstream codegen
    val scored = withIn.mapPartitions { rows =>
      val predict = modelRef().predict // resolved executor-side
      rows.grouped(bSize).flatMap { group =>
        // infer (serve.py:46-57): errors drop the batch, not the query
        try {
          val preds = predict(group.map(_.getDouble(inIdx)))
          // a model returning the wrong number of predictions is a batch
          // inference error, not silent row loss/misalignment via zip
          require(preds.size == group.size,
            s"predict returned ${preds.size} values for ${group.size} rows")
          group.zip(preds).map { case (r, p) =>
            Row.fromSeq(r.toSeq.dropRight(1) :+ p)
          }
        } catch { case _: Exception => Seq.empty[Row] }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    cfg.post(scored.toDF())
  }

  /** Streaming serve: wire a streaming DataFrame through per-micro-batch
    * model resolution + batched inference into `sink`. The model is
    * BROADCAST once per version swap (the object-doc contract): each
    * micro-batch's inference plan captures only the broadcast handle,
    * so executors fetch the artifact once per swap instead of receiving
    * it in every task's closure; the superseded broadcast is released
    * on swap. */
  def serveStream(data: DataFrame, provider: ModelProvider,
                  cfg: ServeConfig)(sink: DataFrame => Unit)
      : DataStreamWriter[Row] = {
    val current = new AtomicReference[
      (Long, org.apache.spark.broadcast.Broadcast[Model])]()
    data.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val m = provider() // latest model wins, per micro-batch
        val prev = current.get()
        if (prev == null || prev._1 != m.version) {
          val bc = batch.sparkSession.sparkContext.broadcast(m)
          if (prev != null) prev._2.unpersist(blocking = false)
          current.set((m.version, bc))
        }
        val bc = current.get()._2
        sink(inferVia(batch, () => bc.value, cfg))
      }
  }
}
