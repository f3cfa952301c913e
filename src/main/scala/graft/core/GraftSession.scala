package graft.core

import org.apache.spark.sql.SparkSession

/** Production SparkSession builder with the engine's scale posture baked
  * in, so `graft.Main` (and embedders) get the same configuration the
  * 100 TB design assumes instead of stock defaults:
  *
  *  - AQE on, with skew-join splitting and partition coalescing — the
  *    runtime re-plan layer the skew-sensitive operators (range join,
  *    bucket joins) rely on beyond the manual salting escape hatch.
  *  - UTC session time zone (oracle-checked time semantics assume it).
  *  - `nanosAsLong` parquet compatibility (the corpus's TIMESTAMP(NANOS)
  *    columns; `Tables.table` rebuilds µs timestamps on top).
  *  - graft's native expressions registered for SQL via GraftExtensions.
  *
  * `shufflePartitions` defaults to the cluster's default parallelism when
  * 0 — on local[N] that is N (the driver contract's local[32] → 32); on a
  * real cluster set it explicitly to ~2-3× total cores.
  */
object GraftSession {

  def builder(master: String = "", shufflePartitions: Int = 0)
      : SparkSession.Builder = {
    val b = SparkSession.builder()
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
    val withMaster = if (master.nonEmpty) b.master(master) else b
    if (shufflePartitions > 0)
      withMaster.config("spark.sql.shuffle.partitions",
        shufflePartitions.toString)
    else withMaster
  }
}
