// dev scratch: time one query at a given SF
package graft
import org.apache.spark.sql.SparkSession
object TimeOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args.take(2)
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
    // ad-hoc conf overrides for A/B runs (the Scratch convention):
    // SPARK_GRAFT_CONF="k1=v1;k2=v2" — ';'-separated so conf VALUES may
    // contain commas (e.g. excludedRules lists; r15 advice: the ','
    // split silently truncated such values); ',' still accepted when no
    // ';' is present for backward compatibility with old notes
    sys.env.get("SPARK_GRAFT_CONF").foreach(s =>
      s.split(if (s.contains(';')) ';' else ',').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => builder.config(k, v)
        case _ => ()
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.split(",").foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9 }
      println(f"TIMING $n%s min=${ts.min}%.2f max=${ts.max}%.2f")
    }
    spark.stop()
  }
}
