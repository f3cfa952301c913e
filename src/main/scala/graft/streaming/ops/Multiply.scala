package graft.streaming.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.OperatorFactory

/** The reference's sample operator (makinage/sample/processor.py:6-14):
  * `int(value) * config.multiply`, re-stringified — registered here as a
  * topology factory so YAML configs can reference it by FQCN. */
object Multiply extends OperatorFactory {
  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val factor = config.getOrElse("multiply", 1).toString.toInt
    val values = sources.head
    Seq(values.withColumn("value",
      (col("value").cast("long") * factor).cast("string")))
  }
}
