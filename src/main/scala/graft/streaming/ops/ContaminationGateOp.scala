package graft.streaming.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.llm.Dedup
import graft.streaming.OperatorFactory

/** Streaming benchmark-decontamination gate — the ingest-time face of
  * [[graft.llm.Dedup.contaminationBloom]]: the evaluation set's
  * distinct shingle hashes are frozen into a Bloom filter at wire time
  * (both build actions touch only the small benchmark side) whose bit
  * array rides the plan as a foldable binary literal, so the gate is
  * fully STATELESS per row — the row's own shingle array is probed via
  * the native codegen `BloomFilterMightContain` inside a higher-order
  * `filter` lambda: no explode, no join, no shuffle, no state store;
  * composes with `config_topic` reconfig for benchmark refresh.
  *
  * Per row: `n_shingles` (distinct `shingle_size`-gram shingles),
  * `n_shared` (shingles hitting the filter), `contaminated` (by
  * `min_shared`, or by `min_frac` when set — the [[
  * graft.llm.Dedup.contaminationFraction]] length-normalized form).
  * With `drop: true` (default) contaminated rows are dropped — the
  * decontamination a pipeline actually wants at ingest; `drop: false`
  * annotates only. Shingle-less rows (< shingle_size tokens) have
  * nothing to match: n_shared = 0, never contaminated, kept.
  *
  * Exact batch parity BY CONSTRUCTION: n_shared counts the same
  * distinct-shingle Bloom hits as `contaminationBloom` over the same
  * benchmark (same filter seeds — deterministic for fixed data), so a
  * doc's count here equals the batch operator's row (pinned by
  * TextDedupSpec, which also pins the no-false-negative superset
  * relation to exact [[graft.llm.Dedup.contamination]]).
  *
  * TINY-benchmark caveat (measured, not theoretical): Spark's Bloom
  * filter probes by double hashing (`h1 + i·h2 mod m`), which
  * degenerates when `h2` aligns with a small `m` — a filter sized for
  * a handful of shingles (m = a few hundred bits) shows ~1% per-probe
  * false positives where the fpp math promises 1e-6 (observed twice
  * in this repo's development on 2- and 7-shingle benchmarks).
  * Real evaluation suites (≥ thousands of shingles) are unaffected;
  * for toy benchmarks raise `min_shared` to ≥ 2 or use the exact
  * batch operator.
  *
  * Config: `bench_path` (parquet evaluation corpus), `text_col`
  * ("text"), `bench_text_col` (defaults to `text_col`), `shingle_size`
  * (3), `min_shared` (1), `min_frac` (optional — overrides min_shared),
  * `fpp` (1e-6), `drop` (true). Output: source columns +
  * (n_shingles, n_shared, contaminated) — contaminated rows removed
  * when `drop`. */
object ContaminationGateOp extends OperatorFactory {
  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val benchPath = config.getOrElse("bench_path",
      sys.error("ContaminationGateOp needs config key bench_path")).toString
    val textCol = config.getOrElse("text_col", "text").toString
    val benchTextCol =
      config.getOrElse("bench_text_col", textCol).toString
    val shingleSize = config.getOrElse("shingle_size", 3).toString.toInt
    val minShared = config.getOrElse("min_shared", 1).toString.toLong
    val minFrac = config.get("min_frac").map(_.toString.toDouble)
    val fpp = config.getOrElse("fpp", 1e-6).toString.toDouble
    val drop = config.getOrElse("drop", true).toString.toBoolean
    require(minShared > 0, s"min_shared must be positive: $minShared")
    minFrac.foreach(f =>
      require(f > 0 && f <= 1, s"min_frac must be in (0,1]: $f"))
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")

    val spark = sources.head.sparkSession
    val bytes = Dedup.benchBloomBytes(
      spark.read.parquet(benchPath), benchTextCol, shingleSize, fpp)

    val hs = coalesce(
      Dedup.textShingleHashes(col(textCol), shingleSize),
      array().cast("array<bigint>"))
    val annotated = sources.head
      .withColumn("__hs", hs)
      .withColumn("n_shingles", size(col("__hs")).cast("long"))
      .withColumn("n_shared",
        size(filter(col("__hs"),
          h => Dedup.bloomMightContain(bytes, h))).cast("long"))
      .withColumn("contaminated", minFrac match {
        case Some(f) => col("n_shingles") > 0L &&
          (col("n_shared").cast("double") /
            col("n_shingles").cast("double") >= lit(f))
        case None => col("n_shared") >= lit(minShared)
      })
      .drop("__hs")
    Seq(if (drop) annotated.filter(!col("contaminated")) else annotated)
  }
}
