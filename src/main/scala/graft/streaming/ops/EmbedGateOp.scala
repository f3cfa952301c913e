package graft.streaming.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.streaming.OperatorFactory

/** Streaming embedding-space decontamination gate — the ingest-time
  * face of [[graft.llm.Dedup.embeddingDedupAgainst]]: a row is
  * contaminated when its embedding is within cosine `threshold` of ANY
  * reference vector (an eval set's embeddings, yesterday's corpus
  * centroids). The reference index is FROZEN at wire time — RHP-LSH
  * band keys computed per seed over the reference, bucket → member
  * vectors — and rides the plan as one map literal (the [[Bm25Op]]/
  * [[NbGateOp]] frozen-model pattern), so the gate is fully STATELESS
  * per row: band keys via the native codegen [[
  * graft.functions.RhpSignature]], candidate lookup from the literal
  * map, exact cosine verify over the candidates only — no explode, no
  * join, no shuffle, no state store; `config_topic`-recomposable.
  *
  * Same candidate generation as the batch twin (identical
  * `xxhash64(seed, rhpSignature)` band keys, identical exact-cosine
  * verify), so a stream row is suppressed iff the batch operator would
  * drop it — test-pinned equality on caps large enough that no bucket
  * overflows. Bounds: the reference must be eval-set-sized
  * (`max_ref`, default 20k vectors — REFUSED beyond, the bounded
  * wire-time-collect discipline; decontamination references are eval
  * suites, not corpora — at corpus-sized references run the batch
  * operator); buckets over `max_bucket` members are dropped WHOLE at
  * wire time with a warning (the [[graft.functions.BoundedCollect]]
  * zero-pairs overflow rule — boilerplate directions degrade to
  * no-candidates, never to a skewed subset). NULL embeddings are
  * refused loudly (the engine-wide NULL-contract rule): a gate
  * silently passing un-probeable rows would launder contamination.
  *
  * Config: `ref_path` (parquet reference embeddings), `ref_vec_col`
  * ("embedding"), `vec_col` ("embedding"), `threshold` (0.95),
  * `n_bits` (12), `seeds` ("1,2"), `max_ref` (20000), `max_bucket`
  * (2000), `drop` (true). Output: source columns + (n_cands,
  * contaminated) — contaminated rows removed when `drop`. */
object EmbedGateOp extends OperatorFactory {
  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val refPath = config.getOrElse("ref_path",
      sys.error("EmbedGateOp needs config key ref_path")).toString
    val refVecCol = config.getOrElse("ref_vec_col", "embedding").toString
    val vecCol = config.getOrElse("vec_col", "embedding").toString
    val threshold = config.getOrElse("threshold", 0.95).toString.toDouble
    val nBits = config.getOrElse("n_bits", 12).toString.toInt
    val seeds = config.getOrElse("seeds", "1,2").toString
      .split(",").map(_.trim.toInt).toSeq
    val maxRef = config.getOrElse("max_ref", 20000).toString.toInt
    val maxBucket = config.getOrElse("max_bucket", 2000).toString.toInt
    val drop = config.getOrElse("drop", true).toString.toBoolean
    require(nBits >= 1 && nBits <= 63, "n_bits in [1,63]")
    require(seeds.nonEmpty, "seeds must be non-empty")
    require(maxRef > 0 && maxBucket > 0,
      "max_ref and max_bucket must be positive")

    val spark = sources.head.sparkSession
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    val ref = spark.read.parquet(refPath)
      .select(col(refVecCol).cast("array<float>").as("__v"))
    val nRef = ref.count()
    require(nRef <= maxRef,
      s"EmbedGateOp: reference has $nRef vectors > max_ref=$maxRef — " +
        "an ingest-gate index must be eval-set-sized; use the batch " +
        "Dedup.embeddingDedupAgainst for corpus-sized references")
    // bucket build: band keys per seed batch-side, members collected
    // per bucket on the driver (bounded by nRef × seeds rows of
    // (key, vector))
    val banded = ref
      .select(col("__v"), explode(array(seeds.map(s =>
        xxhash64(lit(s), Vectors.rhpSignature(col("__v"), nBits, s)))
        : _*)).as("__bkey"))
      .collect()
      .map(r => r.getLong(1) -> r.getSeq[Float](0))
    val grouped = banded.groupBy(_._1)
    val overflow = grouped.filter(_._2.length > maxBucket)
    if (overflow.nonEmpty) log.warn(
      s"EmbedGateOp: ${overflow.size} bucket(s) over max_bucket=" +
        s"$maxBucket dropped WHOLE (boilerplate direction - no " +
        "candidates, never a skewed subset)")
    val buckets: Map[Long, Seq[Seq[Float]]] = grouped
      .filter(_._2.length <= maxBucket)
      .map { case (k, ms) => k -> ms.map(_._2.toSeq).toSeq }
    require(buckets.nonEmpty,
      s"EmbedGateOp: reference at $refPath produced no usable buckets")
    val bucketsLit = typedLit(buckets)

    val vRaw = col(vecCol)
    val v = when(vRaw.isNull, raise_error(lit(
      "EmbedGateOp: NULL embedding — a gate cannot probe a missing " +
        "vector; filter or impute upstream"))).otherwise(
      vRaw.cast("array<float>"))
    val keys = array(seeds.map(s =>
      xxhash64(lit(s), Vectors.rhpSignature(v, nBits, s))): _*)
    // candidates may repeat across seed tables — `exists` short-
    // circuits, so duplicates cost a re-check, never a wrong answer
    val cands = flatten(transform(keys,
      k => coalesce(element_at(bucketsLit, k),
        expr("CAST(array() AS array<array<float>>)"))))
    val annotated = sources.head
      .withColumn("__cands", cands)
      .withColumn("n_cands", size(col("__cands")).cast("long"))
      .withColumn("contaminated",
        exists(col("__cands"),
          c => Vectors.cosine(v, c) >= lit(threshold)))
      .drop("__cands")
    Seq(if (drop) annotated.filter(!col("contaminated")) else annotated)
  }
}
