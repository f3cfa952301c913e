package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Topology, TopicSpec}

/** The broker contract, pinned WITHOUT a broker. This container cannot
  * run Kafka end-to-end — /opt/spark/jars ships neither
  * spark-sql-kafka-0-10 nor kafka-clients, and zero egress means no jar
  * can be added (docs/kafka.md records the proof + the live-cluster
  * runbook) — so the risk concentrates in the OPTION MAP each site
  * hands to `format("kafka")`. That map is now a pure function
  * ([[Topology.kafkaSourceOptions]] / [[Topology.kafkaSinkOptions]])
  * shared by all five read/write sites, and this suite pins every
  * start_from / backpressure mapping the reference defines
  * (makinage/operator.py:50-53, :216-269), end-to-end from YAML parse.
  * The value-decode half of the wire contract (binary `value` → typed
  * column per topic codec) is pinned over hand-built kafka-shaped
  * frames in TopologySpec ("topic codecs apply to kafka frames"). */
class KafkaContractSpec extends AnyFunSuite {

  private def spec(startFrom: String = "end", maxPerTrigger: Long = 0,
                   endpoint: String = "broker-1:9092,broker-2:9092")
      : TopicSpec =
    TopicSpec(name = "raw_events", codec = "json", startFrom = startFrom,
      kind = "kafka", path = "", endpoint = endpoint,
      maxPerTrigger = maxPerTrigger)

  test("stream source options: start_from end (the reference default) " +
    "-> latest; beginning -> earliest; subscribe + bootstrap verbatim") {
    assert(Topology.kafkaSourceOptions(spec("end"), streaming = true) ==
      Map("kafka.bootstrap.servers" -> "broker-1:9092,broker-2:9092",
        "subscribe" -> "raw_events",
        "startingOffsets" -> "latest"))
    assert(Topology.kafkaSourceOptions(spec("beginning"),
      streaming = true) ==
      Map("kafka.bootstrap.servers" -> "broker-1:9092,broker-2:9092",
        "subscribe" -> "raw_events",
        "startingOffsets" -> "earliest"))
  }

  test("max_per_trigger maps to maxOffsetsPerTrigger on streams only " +
    "(the PID-backpressure analogue); absent when unset") {
    val s = Topology.kafkaSourceOptions(spec("end", maxPerTrigger = 512),
      streaming = true)
    assert(s("maxOffsetsPerTrigger") == "512")
    assert(!Topology.kafkaSourceOptions(spec("end"), streaming = true)
      .contains("maxOffsetsPerTrigger"))
    // a bounded pull reads the whole retained topic; no trigger bound
    assert(!Topology.kafkaSourceOptions(spec("end", maxPerTrigger = 512),
      streaming = false).contains("maxOffsetsPerTrigger"))
  }

  test("batch (pull) source options are bounded earliest->latest " +
    "regardless of start_from (reference data/pull.py)") {
    Seq("end", "beginning").foreach { sf =>
      val m = Topology.kafkaSourceOptions(spec(sf), streaming = false)
      assert(m("startingOffsets") == "earliest" &&
        m("endingOffsets") == "latest", sf)
    }
  }

  test("start_from 'last' refuses as a STREAM source with the " +
    "side-input guidance; a bounded pull of the same topic is fine") {
    val e = intercept[IllegalArgumentException](
      Topology.kafkaSourceOptions(spec("last"), streaming = true))
    assert(e.getMessage.contains("latestRecord"))
    val m = Topology.kafkaSourceOptions(spec("last"), streaming = false)
    assert(m("startingOffsets") == "earliest")
  }

  test("sink options carry topic + bootstrap only (routing key and " +
    "codec are applied to the FRAME, not the writer)") {
    assert(Topology.kafkaSinkOptions(spec()) ==
      Map("kafka.bootstrap.servers" -> "broker-1:9092,broker-2:9092",
        "topic" -> "raw_events"))
  }

  test("a kafka topic without an endpoint, or a non-kafka topic, " +
    "refuses loudly at option-build time") {
    intercept[IllegalArgumentException](
      Topology.kafkaSourceOptions(spec(endpoint = ""), streaming = true))
    intercept[IllegalArgumentException](
      Topology.kafkaSinkOptions(spec(endpoint = "")))
    val parquet = spec().copy(kind = "parquet")
    intercept[IllegalArgumentException](
      Topology.kafkaSourceOptions(parquet, streaming = true))
    intercept[IllegalArgumentException](
      Topology.kafkaSinkOptions(parquet))
  }

  test("YAML -> option map end-to-end: the docs/kafka.md sample topic " +
    "produces the exact reader options short of the broker") {
    val yaml =
      """topics:
        |  - name: raw_events
        |    kind: kafka
        |    endpoint: broker-1:9092
        |    codec: json
        |    start_from: beginning
        |    max_per_trigger: 10000
        |""".stripMargin
    val t = Topology.parse(yaml).topics.head
    assert(Topology.kafkaSourceOptions(t, streaming = true) == Map(
      "kafka.bootstrap.servers" -> "broker-1:9092",
      "subscribe" -> "raw_events",
      "startingOffsets" -> "earliest",
      "maxOffsetsPerTrigger" -> "10000"))
  }
}
