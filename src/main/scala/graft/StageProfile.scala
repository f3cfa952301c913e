// dev scratch: per-stage wall/time attribution for one query — the
// "which stage is slow" empirical loop of guide §1.1/§7.1, minus the
// UI (spark.ui.enabled=false everywhere in this sandbox). Runs the
// query once warm, then once instrumented with a SparkListener that
// records each stage's submit->complete wall span, task-time sum,
// shuffle read/write bytes and row counts; prints stages sorted by
// wall span. Job boundaries (count, broadcast builds, persists,
// localCheckpoints) show up as separate jobs — a query whose time is
// many small stages is scheduling-bound, not compute-bound.
package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable
object StageProfile {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args.take(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class St(name: String, submitted: Long, completed: Long,
                  taskTimeMs: Long, gcMs: Long, shufRead: Long,
                  shufWrite: Long, inRows: Long, outRows: Long,
                  tasks: Int)
    names.split(",").foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm: JIT + codegen + page cache
      // buffers written from the listener-bus thread, read from main
      // after the drain sleep — guarded by one lock (r15 advice: the
      // unsynchronized read raced late events on a backed-up bus)
      val lock = new Object
      val stages = mutable.ArrayBuffer.empty[St]
      val jobs = mutable.ArrayBuffer.empty[(Int, Long, Long)]
      val jobStart = mutable.Map.empty[Int, Long]
      val listener = new SparkListener {
        override def onStageCompleted(
            sc: SparkListenerStageCompleted): Unit = lock.synchronized {
          val si = sc.stageInfo
          val m = si.taskMetrics
          stages += St(si.name.takeWhile(_ != '\n').take(90),
            si.submissionTime.getOrElse(0L),
            si.completionTime.getOrElse(0L),
            m.executorRunTime,
            m.jvmGCTime,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten,
            m.inputMetrics.recordsRead,
            m.shuffleWriteMetrics.recordsWritten,
            si.numTasks)
        }
        override def onJobStart(js: SparkListenerJobStart): Unit =
          lock.synchronized { jobStart(js.jobId) = js.time }
        override def onJobEnd(je: SparkListenerJobEnd): Unit =
          lock.synchronized {
            jobs += ((je.jobId, jobStart.getOrElse(je.jobId, 0L), je.time))
          }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // drain the async bus fully (poll until stage count stabilizes,
      // bounded) instead of a fixed 400ms hope
      var last = -1
      var spins = 0
      while (spins < 20 && lock.synchronized(stages.size) != last) {
        last = lock.synchronized(stages.size)
        Thread.sleep(200)
        spins += 1
      }
      spark.sparkContext.removeSparkListener(listener)
      println(f"\n===== $n%s wall=$wall%.2fs jobs=${jobs.size}%d " +
        f"stages=${stages.size}%d =====")
      val j0 = jobs.map(_._2).minOption.getOrElse(0L)
      jobs.sortBy(_._1).foreach { case (id, s, e) =>
        println(f"  job $id%3d  +${(s - j0) / 1000.0}%6.2fs  " +
          f"len=${(e - s) / 1000.0}%6.2fs")
      }
      stages.sortBy(s => -(s.completed - s.submitted)).take(14)
        .foreach { s =>
          println(f"  stage wall=${(s.completed - s.submitted) / 1000.0}%6.2fs " +
            f"taskSum=${s.taskTimeMs / 1000.0}%6.2fs gc=${s.gcMs / 1000.0}%5.2fs " +
            f"tasks=${s.tasks}%3d " +
            f"sr=${s.shufRead / 1024}%8dKB sw=${s.shufWrite / 1024}%8dKB " +
            f"rows(in=${s.inRows}%d,out=${s.outRows}%d) ${s.name}%s")
        }
    }
    spark.stop()
  }
}
