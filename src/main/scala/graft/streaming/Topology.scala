package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.yaml.snakeyaml.Yaml

/** A user operator factory — the Spark counterpart of the reference's
  * operator factory functions `(config, *sources) -> (sink, ...)`
  * (reference makinage/operator.py:196-229, docs/configuration.rst:48-57).
  * Implementations are Scala `object`s resolved by reflection from the
  * YAML `factory:` entry (the analogue of `module:function` specs loaded
  * by import_function, reference makinage/util.py:5-23). */
trait OperatorFactory {
  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame]
}

/** Topic declaration (reference makinage/operator.py:26-73): name + codec +
  * replay policy, generalized with a source `kind` so the same topology
  * runs Kafka-backed (production) or file-backed (tests/batch).
  *
  * Event-time fields mirror the reference `Topic`'s timestamp_mapper /
  * map_partition (makinage/operator.py:26-73):
  *  - `timestampCol` + `watermark`: the event-time column and allowed
  *    lateness; stream sources with both set are watermarked at the
  *    source, so windowed/stateful operators downstream are reachable
  *    straight from YAML.
  *  - `partitionSelector`: column whose value keys the sink records
  *    (Kafka partition routing — the reference's map_partition). */
case class TopicSpec(name: String, codec: String, startFrom: String,
                     kind: String, path: String, endpoint: String,
                     timestampCol: String = "", watermark: String = "",
                     partitionSelector: String = "",
                     schema: String = "")

case class OperatorSpec(name: String, factory: String,
                        sources: Seq[String], sinks: Seq[String])

/** YAML topology runner — the engine's `makinage --config app.yaml`
  * equivalent (reference makinage/makinage.py:66-135 + operator.py:162-279):
  * topics become DataFrame sources/sinks, operator factories wire them, and
  * each sink becomes a streaming query (stream mode) or a parquet write
  * (batch mode — the same unified-API promise as the reference,
  * reference README.rst:38).
  */
object Topology {

  def parse(yamlText: String): Topology = {
    val root = new Yaml().load[java.util.Map[String, Object]](yamlText)
      .asScala.toMap

    def asMap(o: Any): Map[String, Any] = o match {
      case m: java.util.Map[_, _] =>
        m.asScala.toMap.map { case (k, v) => k.toString -> v }
      case null => Map.empty
      case other =>
        throw new IllegalArgumentException(s"expected map, got $other")
    }

    val topics = root.getOrElse("topics", new java.util.ArrayList[Object]())
      .asInstanceOf[java.util.List[Object]].asScala.map { o =>
        val m = asMap(o)
        TopicSpec(
          name = m("name").toString,
          codec = m.getOrElse("codec", "string").toString, // default codec
          startFrom = m.getOrElse("start_from", "end").toString,
          kind = m.getOrElse("kind", "kafka").toString,
          path = m.getOrElse("path", "").toString,
          endpoint = m.getOrElse("endpoint", "").toString,
          timestampCol = m.getOrElse("timestamp_col", "").toString,
          watermark = m.getOrElse("watermark", "").toString,
          partitionSelector =
            m.getOrElse("partition_selector", "").toString,
          schema = m.getOrElse("schema", "").toString)
      }.toSeq

    val operators = asMap(root.getOrElse("operators", null)).map {
      case (name, o) =>
        val m = asMap(o)
        OperatorSpec(
          name = name,
          factory = m("factory").toString,
          sources = m.getOrElse("sources", new java.util.ArrayList[Object]())
            .asInstanceOf[java.util.List[Object]].asScala
            .map(_.toString).toSeq,
          sinks = m.getOrElse("sinks", new java.util.ArrayList[Object]())
            .asInstanceOf[java.util.List[Object]].asScala
            .map(_.toString).toSeq)
    }.toSeq

    Topology(topics, operators, asMap(root.getOrElse("config", null)))
  }

  /** Reflection loader for factory objects (import_function analogue). */
  def loadFactory(fqcn: String): OperatorFactory = {
    val clazz = Class.forName(fqcn + "$")
    clazz.getField("MODULE$").get(null).asInstanceOf[OperatorFactory]
  }

  /** Topic codec instance (json codecs take the topic's declared DDL
    * schema — explicit schemas, SURVEY.md §1.2). */
  def codecOf(t: TopicSpec): graft.functions.Codec =
    graft.functions.Codecs.byName(t.codec,
      if (t.schema.nonEmpty)
        Some(org.apache.spark.sql.types.StructType.fromDDL(t.schema))
      else None)

  /** Consumer-side codec application for a Kafka frame: decode the binary
    * `value` per the topic codec, keep key/timestamp/partition metadata —
    * what operator factories receive (the reference decodes per-topic
    * before handing items to operators, makinage/operator.py:93-96). */
  def decodeFrame(df: org.apache.spark.sql.DataFrame, t: TopicSpec)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    df.withColumn("value", codecOf(t).decode(col("value")))
  }

  /** Producer-side codec application: encode the typed `value` column to
    * the binary Kafka frame value (reference makinage/operator.py:244-251). */
  def encodeFrame(df: org.apache.spark.sql.DataFrame, t: TopicSpec)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    df.withColumn("value", codecOf(t).encode(col("value")))
  }
}

case class Topology(topics: Seq[TopicSpec], operators: Seq[OperatorSpec],
                    config: Map[String, Any]) {

  private def topic(name: String): TopicSpec =
    topics.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"undeclared topic: $name"))

  /** Build a bounded source for a topic (batch mode). */
  private def batchSource(spark: SparkSession, t: TopicSpec): DataFrame =
    t.kind match {
      case "parquet" => spark.read.parquet(t.path)
      case "kafka" =>
        // bounded Kafka read — reference's data/pull.py batch consumer;
        // value decoded per the topic codec before factories see it
        Topology.decodeFrame(
          spark.read.format("kafka")
            .option("kafka.bootstrap.servers", t.endpoint)
            .option("subscribe", t.name)
            .option("startingOffsets", "earliest")
            .option("endingOffsets", "latest")
            .load(), t)
      case other =>
        throw new IllegalArgumentException(s"batch source kind: $other")
    }

  /** Build an unbounded source (stream mode). start_from maps to
    * startingOffsets (reference makinage/operator.py:50-53).
    *
    * `start_from: last` (the reference's model-topic hot-swap contract —
    * the subscriber must see the newest already-published record,
    * makinage/operator.py:50-53, config.sample.serve.yml:10):
    *  - parquet topics satisfy it natively — the file source replays every
    *    retained file, and readers take the max version.
    *  - kafka STREAM sources cannot (Structured Streaming can't union a
    *    bounded tail read into an unbounded source), so `last` is the
    *    side-input contract instead: resolve the topic per micro-batch via
    *    [[Topology.latestRecord]] (the [[Serve.ModelProvider]] pattern,
    *    SURVEY.md §7.4.2) — requesting it as a stream source is a config
    *    error, rejected here rather than silently degraded to `latest`.
    */
  private def streamSource(spark: SparkSession, t: TopicSpec): DataFrame = {
    val src = t.kind match {
      case "parquet" =>
        val schema = spark.read.parquet(t.path).schema
        spark.readStream.schema(schema).parquet(t.path)
      case "kafka" =>
        val starting = t.startFrom match {
          case "beginning" => "earliest"
          case "last" =>
            throw new IllegalArgumentException(
              s"topic ${t.name}: start_from 'last' is not a kafka stream " +
                "source; resolve it per micro-batch via " +
                "Topology.latestRecord (model side-input contract)")
          case _ => "latest" // "end"
        }
        Topology.decodeFrame(
          spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", t.endpoint)
            .option("subscribe", t.name)
            .option("startingOffsets", starting)
            .load(), t)
      case other =>
        throw new IllegalArgumentException(s"stream source kind: $other")
    }
    // declared event time ⇒ watermark at the source, so windowed/stateful
    // operators are reachable straight from YAML
    if (t.timestampCol.nonEmpty && t.watermark.nonEmpty)
      src.withWatermark(t.timestampCol, t.watermark)
    else src
  }

  /** Resolve the newest record of a `start_from: last` topic as a bounded
    * 1-row DataFrame — called per micro-batch by model providers (the
    * reference re-reads the newest retained model record on restart,
    * makinage/operator.py:50-53). Kafka model topics are expected to be
    * small/compacted (the reference relies on retention the same way). */
  def latestRecord(spark: SparkSession, name: String): DataFrame = {
    val t = topic(name)
    t.kind match {
      case "parquet" => ModelPublisher.latestFromPath(spark, t.path)
      case "kafka" =>
        // decoded like every other consumer path, so callers get the
        // same record shape from both topic kinds
        Topology.decodeFrame(
          spark.read.format("kafka")
            .option("kafka.bootstrap.servers", t.endpoint)
            .option("subscribe", t.name)
            .option("startingOffsets", "earliest")
            .option("endingOffsets", "latest")
            .load()
            // newest across partitions: broker timestamp, offset tie-break
            .orderBy(org.apache.spark.sql.functions.col("timestamp").desc,
              org.apache.spark.sql.functions.col("offset").desc)
            .limit(1), t)
      case other =>
        throw new IllegalArgumentException(s"latest-record kind: $other")
    }
  }

  private def wire(spark: SparkSession,
                   source: TopicSpec => DataFrame)
      : Seq[(TopicSpec, DataFrame)] =
    operators.flatMap { op =>
      val factory = Topology.loadFactory(op.factory)
      val sources = op.sources.map(n => source(topic(n)))
      val outs = factory(config, sources)
      require(outs.size == op.sinks.size,
        s"operator ${op.name}: ${outs.size} outputs for " +
          s"${op.sinks.size} declared sinks")
      op.sinks.map(topic).zip(outs)
    }

  /** Batch run: every sink topic is written as parquet under `outDir`
    * (file-backed topics) — the unified batch path. Returns sink names. */
  def runBatch(spark: SparkSession, outDir: String): Seq[String] = {
    wire(spark, batchSource(spark, _)).map { case (sinkTopic, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/${sinkTopic.name}")
      sinkTopic.name
    }
  }

  /** Stream run: each sink becomes a streaming query (kafka sink for kafka
    * topics, parquet sink for file topics). Caller owns awaiting. */
  def runStream(spark: SparkSession, checkpointRoot: String)
      : Seq[StreamingQuery] = {
    wire(spark, streamSource(spark, _)).map { case (sinkTopic, df) =>
      // partition_selector routes sink records: the named column becomes
      // the Kafka message key (keyed hashing picks the partition — the
      // reference Topic's map_partition, makinage/operator.py:26-73)
      val routed =
        if (sinkTopic.partitionSelector.nonEmpty && sinkTopic.kind == "kafka")
          df.withColumn("key", org.apache.spark.sql.functions
            .col(sinkTopic.partitionSelector).cast("string").cast("binary"))
        else df
      // kafka sinks get the topic codec applied to `value` (producer-side
      // encode, reference makinage/operator.py:244-251)
      val framed =
        if (sinkTopic.kind == "kafka") Topology.encodeFrame(routed, sinkTopic)
        else routed
      val w = framed.writeStream
        .option("checkpointLocation",
          s"$checkpointRoot/${sinkTopic.name}")
      (sinkTopic.kind match {
        case "kafka" => w.format("kafka")
          .option("kafka.bootstrap.servers", sinkTopic.endpoint)
          .option("topic", sinkTopic.name)
        case "parquet" => w.format("parquet")
          .option("path", sinkTopic.path)
        case "memory" => w.format("memory").queryName(sinkTopic.name)
        case other =>
          throw new IllegalArgumentException(s"sink kind: $other")
      }).start()
    }
  }
}
