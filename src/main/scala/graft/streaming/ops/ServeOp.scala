package graft.streaming.ops

import org.apache.spark.sql.DataFrame

import graft.streaming.{OperatorFactory, Serve}

/** Model serving as a topology factory — the reference's flagship
  * `config.sample.serve.yml` wired from YAML (reference
  * makinage/serve/serve.py:104-148: model topic + data topic → scored
  * sink). Declare the MODEL topic as the operator's `config_topic`: the
  * per-micro-batch config resolution then delivers the newest model
  * record's `content` bytes to this factory each batch, so publishing a
  * new artifact hot-swaps the model with no restart — exactly the
  * reference's `start_from: last` model-subscription contract, at
  * micro-batch granularity.
  *
  * Config keys: `content` (model artifact bytes — injected by
  * config_topic resolution, [[graft.streaming.Topology.latestConfig]]),
  * `serve_input_field`, `serve_output_field`, `serve_batch_size`.
  * Stateless per batch (inference only), so the dynamic foreachBatch
  * path is safe. Errors inside a predict batch drop that batch's rows,
  * not the query ([[Serve.inferBatch]]). */
object ServeOp extends OperatorFactory {
  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    // file-backed model topics deliver the artifact under the literal
    // 'content' column; a KAFKA model topic's record reaches the
    // factory as its decoded value under 'value' (Topology.configMap's
    // kafka contract) — accept both, or the reference-flagship kafka
    // hot-swap path can never load a model
    val model = config.get("content").orElse(config.get("value")) match {
      case Some(bytes: Array[Byte]) => Serve.loadModel(bytes)
      case _ => throw new IllegalArgumentException(
        "serve: no model artifact in config — declare the model topic " +
          "as this operator's config_topic so its newest record's " +
          "content bytes (file topics) or raw value bytes (kafka " +
          "topics, codec none) reach the factory")
    }
    val cfg = Serve.ServeConfig(
      batchSize = config.getOrElse("serve_batch_size", 1).toString.toInt,
      inputField = config.getOrElse("serve_input_field", "value").toString,
      outputField =
        config.getOrElse("serve_output_field", "prediction").toString)
    Seq(Serve.inferBatch(sources.head, model, cfg))
  }
}
