package graft.streaming.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.streaming.OperatorFactory

/** Content dedup as a topology factory — exact dedup declared from YAML
  * over any topic, the streaming-ingest face of [[graft.llm.Dedup]]
  * (reference precedent: operator chains in config.sample.processor.yml;
  * dedup itself is the north-star pipeline op).
  *
  * Config keys (flat, namespaced):
  *  - `dedup_text` (default `text`): the payload column fingerprinted
  *    with [[Text.fingerprint]] (whitespace/case-normalized md5) — the
  *    dedup key is always the 16-byte fingerprint, never the payload.
  *  - stream sources: `dedup_ts` (default `ts`) + `dedup_lateness`
  *    (default `10 minutes`) — first occurrence passes, replays within
  *    the watermark horizon are dropped, and state is BOUNDED by the
  *    horizon ([[graft.llm.Dedup.exactByContentStream]]); an unbounded
  *    dropDuplicates would grow state forever on a continuous topic.
  *  - batch sources: one representative row (min by the row struct,
  *    deterministic) per distinct fingerprint, same output schema as
  *    the input — the bounded-replay analogue.
  *
  * Do NOT combine with `config_topic`: re-wiring per micro-batch would
  * reset streaming dedup state each batch (the [[Roll]] rule — stateful
  * operators need a restart for config changes). */
object DedupOp extends OperatorFactory {
  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val df = sources.head
    val textCol = config.getOrElse("dedup_text", "text").toString
    if (df.isStreaming) {
      val ts = config.getOrElse("dedup_ts", "ts").toString
      val lateness =
        config.getOrElse("dedup_lateness", "10 minutes").toString
      Seq(graft.llm.Dedup.exactByContentStream(df, ts, textCol, lateness))
    } else {
      val cols = df.columns.toIndexedSeq
      Seq(df
        .withColumn("__fp", Text.fingerprint(col(textCol)))
        .groupBy("__fp")
        .agg(min(struct(cols.map(col): _*)).as("__r"))
        .select(cols.map(c => col(s"__r.$c").as(c)): _*))
    }
  }
}
