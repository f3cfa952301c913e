package graft.streaming.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TopKCollect, Vectors}
import graft.llm.{Ivf, KMeans}
import graft.streaming.OperatorFactory

/** Streaming similarity search against a FROZEN corpus index — the
  * serving face of [[graft.llm.Ivf]]: query embeddings arrive on a
  * topic, and each finalized window emits the top-k nearest corpus
  * vectors per query. The retrieval-augmentation / online-dedup shape:
  * the corpus is last night's batch artifact, the queries are tonight's
  * stream, and nothing about the index mutates in-flight (swap the
  * corpus path and restart for a new index — the
  * [[graft.streaming.Serve]] hot-swap seam handles models; ANN indexes
  * version like datasets, not like models).
  *
  * Plan shape (the stream stays on the LEFT, the batch [[Ivf.topK]]
  * broadcasts queries — exactly wrong for an unbounded query stream):
  *  - at build: train the deterministic IVF coarse quantizer on the
  *    corpus (bounded ordered sample, driver fold — Ivf.train), assign
  *    every corpus vector its cell ONCE (map-only static frame,
  *    pre-partitioned by cell);
  *  - per micro-batch: each query explodes to its `nprobe` nearest
  *    cells (native [[graft.functions.NearestCells]] kernel, centroids
  *    ride the plan), a STREAM-STATIC equi-join on `cell` pulls only
  *    the probed cells' vectors (stateless — no stream state grows),
  *    exact cosine per candidate;
  *  - one watermarked windowed [[TopKCollect]] aggregate (map-side
  *    partials carry ≤ k rows per query) finalizes (window_start,
  *    query_id, rank, nbr_id, cosine) in append mode.
  * A (query, neighbor) pair appears at most once per micro-batch —
  * each corpus vector lives in exactly ONE cell — so no dedup
  * aggregation is needed before the top-k.
  *
  * Config: `corpus_dir` (parquet path of the frozen corpus — REQUIRED),
  * `id_col` ("vec_id"), `vec_col` ("embedding"), `timestamp_col`
  * ("ts"), `window` ("1 hour"), `k` (10), `ivf_k` (16), `nprobe` (2).
  * Batch sources take the same path (one factory, both modes) and then
  * equal [[Ivf.topK]] per query row up to the window column —
  * StreamingSpec pins the parity. */
object SimSearchOp extends OperatorFactory {
  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val corpusDir = config.getOrElse("corpus_dir",
      sys.error("SimSearchOp: corpus_dir is required")).toString
    val idCol = config.getOrElse("id_col", "vec_id").toString
    val vecCol = config.getOrElse("vec_col", "embedding").toString
    val tsCol = config.getOrElse("timestamp_col", "ts").toString
    val win = config.getOrElse("window", "1 hour").toString
    val k = config.getOrElse("k", 10).toString.toInt
    val ivfK = config.getOrElse("ivf_k", 16).toString.toInt
    val nProbe = config.getOrElse("nprobe", 2).toString.toInt
    require(k >= 1, s"SimSearchOp: k must be >= 1: $k")
    require(nProbe >= 1, s"SimSearchOp: nprobe must be >= 1: $nProbe")
    val spark = sources.head.sparkSession
    val corpus = spark.read.parquet(corpusDir)
    val model = Ivf.train(corpus, idCol, vecCol, ivfK)
    val cents = model.centroids.map(_.toSeq).toSeq
    val p = spark.sparkContext.defaultParallelism
    val cells = corpus.select(col(idCol).as("nbr_id"),
        col(vecCol).as("cv"), Vectors.norm(col(vecCol)).as("cn"),
        KMeans.cellOf(col(vecCol), model).as("cell"))
      .repartition(p, col("cell"))
    val q = sources.head.select(
        window(col(tsCol), win).as("__win"),
        col(idCol).as("query_id"), col(vecCol).as("qv"),
        Vectors.norm(col(vecCol)).as("qn"))
      .withColumn("cell",
        explode(graft.functions.NearestCells(col("qv"), cents, nProbe)))
    val cand = q.join(cells, Seq("cell"))
      .filter(col("query_id") =!= col("nbr_id"))
      .select(col("__win"), col("query_id"), col("nbr_id"),
        Vectors.cosineWithNorms(col("qv"), col("cv"),
          col("qn"), col("cn")).as("cosine"))
    val ranked = cand
      .groupBy(col("__win"), col("query_id"))
      .agg(TopKCollect.topk(k)(col("nbr_id").cast("long"),
        col("cosine")).as("__tk"))
      .select(col("__win.start").as("window_start"), col("query_id"),
        posexplode(col("__tk")))
      .select(col("window_start"), col("query_id"),
        (col("pos") + 1).as("rank"), col("col._1").as("nbr_id"),
        col("col._2").as("cosine"))
    Seq(ranked)
  }
}
