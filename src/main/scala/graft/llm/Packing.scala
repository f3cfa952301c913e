package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ops

/** Training-sequence packing (SURVEY.md §2.6 pipeline extension): assign
  * each document to the fixed-token-budget training sequence it starts
  * in — the concat-then-chunk packing used to build pre-training batches
  * (documents are concatenated in a deterministic order and the token
  * stream is cut every `budget` tokens; a document may straddle a cut).
  *
  * Scale shape: a single global concatenation order is a sequential
  * prefix sum — inherently serial — so packing is SHARDED: documents are
  * Lehmer-hashed into `shards` independent streams
  * ([[Ops.idBucket]] — deterministic across engines/runs/layouts), and
  * the running token total is a per-shard window sum. Shards are the
  * parallelism unit: at cluster scale use shards ≈ O(executors·cores);
  * each WindowExec partition is one shard, never the whole corpus.
  * Output: (id, cost, shard, seq_id, seq_offset) where seq_id counts
  * sequences within the shard and seq_offset is the document's start
  * position inside its sequence.
  */
object Packing {

  def pack(df: DataFrame, idCol: String, costCol: String,
           budget: Long, shards: Int): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(shards > 0, s"shards must be positive: $shards")
    // NULL cost would ride free past the sequence budget (window sums
    // skip NULLs) and poison seq_id/seq_offset — an input error, same
    // contract as sampleToBudget's guards (Ops.refuseNull)
    val guardedCost = Ops.refuseNull(col(costCol),
      concat(lit("pack: NULL cost for id="), col(idCol).cast("string")))
      .cast("long")
    val sharded = df.select(col(idCol), guardedCost.as("cost"))
      .withColumn("shard", Ops.idBucket(col(idCol), shards))
    val w = Window.partitionBy("shard").orderBy(idCol)
    // running total INCLUDING this doc; the doc starts at cum - cost
    val start = sum(col("cost")).over(w) - col("cost")
    sharded
      .withColumn("seq_id", floor(start / budget))
      .withColumn("seq_offset", pmod(start, lit(budget)))
  }
}
