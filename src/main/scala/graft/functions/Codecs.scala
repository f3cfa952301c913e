package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Per-topic wire codecs (reference makinage/encoding package, SURVEY.md §2.2) as
  * Column transform pairs: decode(binary value) → typed column(s), and
  * encode(typed) → binary value. Matches the Kafka frame shape
  * (`value: binary`), so the same codec works on batch DataFrames and
  * Structured-Streaming Kafka sources.
  */
sealed trait Codec {
  /** binary → decoded column */
  def decode(value: Column): Column
  /** decoded column → binary */
  def encode(v: Column): Column
}

object Codecs {

  /** `string` codec — the reference default (makinage/operator.py:40-42),
    * charset-parameterized (makinage/encoding/string.py:3-17). */
  final case class StringCodec(charset: String = "UTF-8") extends Codec {
    def decode(value: Column): Column = org.apache.spark.sql.functions
      .decode(value, charset)
    def encode(v: Column): Column = org.apache.spark.sql.functions
      .encode(v.cast("string"), charset)
  }

  /** `json` codec (makinage/encoding/json.py:4-15): bytes ↔ structured row.
    * Decoding needs the target schema — schema is explicit in our engine
    * (SURVEY.md §1.2), inferable in dev via `schema_of_json`. */
  final case class JsonCodec(schema: DataType) extends Codec {
    def decode(value: Column): Column =
      from_json(org.apache.spark.sql.functions.decode(value, "UTF-8"),
        schema)
    def encode(v: Column): Column =
      org.apache.spark.sql.functions.encode(to_json(v), "UTF-8")
  }

  /** `none` codec (makinage/encoding/none.py): raw bytes passthrough —
    * the model-topic codec (reference config.sample.serve.yml:10-12). */
  case object NoneCodec extends Codec {
    def decode(value: Column): Column = value
    def encode(v: Column): Column = v.cast("binary")
  }

  /** The reference's `pickle` codec carries arbitrary Python objects
    * (makinage/encoding/pickle.py) — non-portable by design. Our nearest
    * equivalent is typed Datasets internally; on the wire we only emit
    * portable formats (SURVEY.md §7.4.4). Kryo-style opaque binary can ride
    * [[NoneCodec]]. */

  def byName(name: String, schema: Option[DataType] = None): Codec =
    name match {
      case "string" => StringCodec()
      case "json" => JsonCodec(schema.getOrElse(
        throw new IllegalArgumentException("json codec needs a schema")))
      case "none" => NoneCodec
      case other =>
        throw new IllegalArgumentException(s"unknown codec: $other")
    }

  /** Round-trip helper for tests: decode(encode(x)) must be identity. */
  def roundTrip(codec: Codec, v: Column): Column =
    codec.decode(codec.encode(v))

  /** Build a Kafka-frame projection: (key, value [, partition]) columns
    * ready for the kafka sink — the producer side of a topic
    * (encode + map_partition, reference makinage/operator.py:244-251).
    *
    * By default NO `partition` column is emitted: Spark's Kafka sink
    * treats one as the PHYSICAL partition index, and the reference's
    * 0..999 spread (operator.py:44-48) was a key-spread convention, not
    * a topic layout — a literal id >= the topic's partition count makes
    * the producer throw. Default = the topic's own partitioner hashes
    * `key` (safe on any partition count). Pass `numPartitions` only
    * when the topic is KNOWN to have at least that many partitions;
    * the spread is then a deterministic key hash (the reproducible
    * upgrade over the reference's random spread). */
  def toKafkaFrame(df: DataFrame, codec: Codec, valueCol: Column,
                   keyCol: Column, numPartitions: Option[Int] = None)
      : DataFrame = {
    val base = Seq(
      org.apache.spark.sql.functions.encode(keyCol.cast("string"), "UTF-8")
        .as("key"),
      codec.encode(valueCol).as("value"))
    val cols = numPartitions match {
      case Some(n) =>
        require(n > 0, s"numPartitions must be positive: $n")
        base :+ pmod(xxhash64(keyCol), lit(n)).cast("int").as("partition")
      case None => base
    }
    df.select(cols: _*)
  }

  /** Decode the consumer side of a Kafka frame: value → typed column. */
  def fromKafkaFrame(df: DataFrame, codec: Codec,
                     as: String = "decoded"): DataFrame =
    df.withColumn(as, codec.decode(col("value")))
}
