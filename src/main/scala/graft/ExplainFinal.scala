// dev scratch: dump the FINAL (post-AQE) physical plan of queries at a
// given SF. ExplainOne prints the initial plan (isFinalPlan=false);
// AQE's runtime rewrites (SMJ->BHJ conversions, AQEShuffleRead
// coalescing, skew splits) only exist after execution, so this tool
// executes the Dataset's own plan via collect() and re-prints it —
// the same QueryExecution object, whose AdaptiveSparkPlanExec has been
// mutated into its final form. Guide §7.2: "the SQL tab shows the
// final re-optimised plan after the query has run" — this is that
// view, minus the UI.
package graft
import org.apache.spark.sql.SparkSession
object ExplainFinal {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args.take(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.split(",").foreach { n =>
      println(s"===== $n =====")
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.collect() // executes df's OWN QueryExecution (count() would plan a new one)
      df.explain("formatted")
    }
    spark.stop()
  }
}
