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
    * `events.parquet` carries TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects by default; we enable the nanos-as-long legacy read (runtime
    * conf, safe on any session) and rebuild a microsecond TimestampType
    * column with integer arithmetic (ns epoch exceeds 2^53, so `div`, not
    * double division). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.find(f => f.name == "ts" &&
        f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
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
