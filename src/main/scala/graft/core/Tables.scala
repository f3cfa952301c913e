package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the driver-generated parquet tables (TESTDATA.md).
  *
  * Plays the role of the reference's topic registry
  * (makinage/operator.py:21-75): a named catalog of sources. Here sources
  * are parquet tables under a scale-factor directory; in streaming mode the
  * same names bind to Kafka topics via [[graft.streaming.Topology]].
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table; column pruning + predicate pushdown reach the scan
    * because we hand Catalyst the raw parquet relation.
    *
    * The driver has shipped `events.parquet` with two different `ts`
    * physical encodings across rounds, both normalized here to a plain
    * UTC TimestampType so every operator sees one type:
    *  - TIMESTAMP(NANOS): rejected by Spark's reader by default — enable
    *    the nanos-as-long legacy read (runtime conf, safe on any session)
    *    and rebuild a microsecond TimestampType with integer arithmetic
    *    (ns epoch exceeds 2^53, so `div`, not double division);
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): read as TIMESTAMP_NTZ,
    *    cast to TimestampType — the session timezone is pinned UTC by
    *    every entrypoint, so the wall-clock reinterpretation is the
    *    identity (and NTZ would otherwise break `cast(ts as long)` and
    *    NTZ/TZ comparisons downstream). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  /** Register all tables as temp views (idempotent) and return the session.
    * Lets operators and tests address tables by name via spark.table(...). */
  def registerAll(spark: SparkSession, sfDir: String): SparkSession = {
    names.foreach { n =>
      table(spark, sfDir, n).createOrReplaceTempView(n)
    }
    spark
  }
}
