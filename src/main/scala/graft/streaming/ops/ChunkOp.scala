package graft.streaming.ops

import org.apache.spark.sql.DataFrame

import graft.streaming.OperatorFactory

/** Streaming document chunking — the topology form of
  * [[graft.llm.Chunk.chunkDocs]]: each arriving document fans out into
  * its overlapping token-window chunks (RAG ingest: crawl topic →
  * chunk topic → embedding/indexing stage). Stateless and map-only, so
  * batch and streaming modes run the IDENTICAL plan — no watermark, no
  * state store, at-least-once redelivery just re-emits the same
  * deterministic chunks (idempotent under a downstream exact-dedup
  * keyed on (id, chunk_id)).
  *
  * Config: `id_col` ("doc_id"), `text_col` ("text"), `chunk_tokens`
  * (64), `stride_tokens` (48). Passthrough columns are dropped (the
  * output schema is the chunk frame: id, chunk_id, chunk_start,
  * n_chunk_tokens, chunk_text). */
object ChunkOp extends OperatorFactory {
  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val idCol = config.getOrElse("id_col", "doc_id").toString
    val textCol = config.getOrElse("text_col", "text").toString
    val chunk = config.getOrElse("chunk_tokens", 64).toString.toInt
    val stride = config.getOrElse("stride_tokens", 48).toString.toInt
    Seq(graft.llm.Chunk.chunkDocs(sources.head, idCol, textCol,
      chunk, stride))
  }
}
