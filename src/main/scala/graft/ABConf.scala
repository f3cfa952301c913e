// dev scratch: load-robust A/B of a RUNTIME SQL conf on a query list.
// Within ONE JVM (shared JIT/codegen cache), each query alternates
// arm A (conf unset/default) and arm B (conf set) for `n` rounds —
// interleaving makes a box-load ramp hit both arms equally, the same
// reasoning as Bench's full-suite sweeps. Reports per-arm min.
//   runMain graft.ABConf <sfDir> <q1,q2,..> <confKey=valB> [rounds]
package graft
import org.apache.spark.sql.SparkSession
object ABConf {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names, kv) = args.take(3)
    val rounds = args.lift(3).map(_.toInt).getOrElse(3)
    val Array(key, vB) = kv.split("=", 2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // getOption + unset: a conf with no default (e.g. spark.sql.optimizer
    // .excludedRules) would throw on get, and restoring arm A via set()
    // differs subtly from 'never set' (r15 advice)
    val vA: Option[String] = spark.conf.getOption(key)
    def setA(): Unit = vA match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
    names.split(",").foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm
      spark.conf.set(key, vB)
      fn(spark, sfDir).count() // warm arm B's plan shape too
      def sample(): Double = {
        val t0 = System.nanoTime(); fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val (as, bs) = (Array.fill(rounds)(0.0), Array.fill(rounds)(0.0))
      (0 until rounds).foreach { i =>
        setA(); as(i) = sample()
        spark.conf.set(key, vB); bs(i) = sample()
      }
      setA()
      println(f"AB $n%-24s A(min=${as.min}%.2f med=${as.sorted.apply(rounds / 2)}%.2f) " +
        f"B(min=${bs.min}%.2f med=${bs.sorted.apply(rounds / 2)}%.2f)  " +
        f"B/A=${bs.min / as.min}%.2f")
    }
    spark.stop()
  }
}
