package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Document chunking for retrieval / RAG pipelines: split each document
  * into overlapping fixed-size token windows. The standard preprocessing
  * step between a cleaned corpus and an embedding/indexing stage — every
  * retrieval system (and most long-context training recipes) wants
  * "chunks of ~N tokens with ~M tokens of overlap" rather than whole
  * documents.
  *
  * Reference scope note: the reference (a stream-wiring framework) has
  * no text operators at all — this is a north-star extension op
  * (SURVEY.md §2.6 corpus-assembly family), sibling to
  * [[graft.llm.Packing]] (which concatenates-and-cuts for training;
  * chunking preserves per-document provenance for retrieval).
  */
object Chunk {

  /** Overlapping token-window chunking.
    *
    * Windows start every `stride` tokens: chunk i covers tokens
    * `[i*stride, min(i*stride + chunkTokens, n))`. A document with
    * `n <= chunkTokens` tokens yields exactly one chunk; otherwise
    * `1 + ceil((n - chunkTokens) / stride)` — the last chunk may be
    * shorter than `chunkTokens` but never empty, and every token is
    * covered (stride <= chunkTokens enforces overlap >= 0). Empty
    * documents (zero tokens) yield no chunks.
    *
    * Scale shape: map-only — tokenize once per doc, one `explode` over
    * the per-doc chunk index sequence (bounded by n/stride); no shuffle,
    * no window functions, embarrassingly parallel at 100 TB. Chunk count
    * arithmetic is integer (exact in any engine).
    *
    * Output: (idCol, chunk_id, chunk_start, n_chunk_tokens, chunk_text)
    * — chunk_id 0-based per doc, chunk_start = token offset. */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
                chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1: $chunkTokens")
    require(strideTokens >= 1 && strideTokens <= chunkTokens,
      s"strideTokens must be in [1, chunkTokens]: $strideTokens")
    val c = lit(chunkTokens)
    val s = lit(strideTokens)
    // floor((n - chunk + stride - 1) / stride): Int inputs here stay
    // well under 2^52, so the double division floors exactly
    val extra = floor((col("__n") - c + s - lit(1)) / s).cast("long")
    val nChunks = when(col("__n") <= c, lit(1L)).otherwise(lit(1L) + extra)
    df.select(col(idCol), Text.tokens(col(textCol)).as("__t"))
      .withColumn("__n", size(col("__t")))
      .filter(col("__n") > 0)
      .withColumn("chunk_id", explode(sequence(lit(0L), nChunks - 1)))
      .select(
        col(idCol),
        col("chunk_id"),
        (col("chunk_id") * s).as("chunk_start"),
        least(c.cast("long"), col("__n") - col("chunk_id") * s)
          .as("n_chunk_tokens"),
        array_join(
          slice(col("__t"), (col("chunk_id") * s + 1).cast("int"), c),
          " ").as("chunk_text"))
  }
}
