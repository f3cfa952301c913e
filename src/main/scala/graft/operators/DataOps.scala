package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Pipe.Op

/** Guard for the UNKEYED window forms ([[DataOps.roll]]/[[DataOps.split]]/
  * [[DataOps.timeSplit]]/[[Ops.scan]] with empty `partition`): those plan a
  * single-partition WindowExec — the reference's single-threaded semantics,
  * correct but inherently sequential. Fine for small/driver-side streams;
  * a scale hazard on a real corpus. The guard estimates the input from
  * optimizer statistics (no job) and, above `spark.graft.unkeyed.warnBytes`
  * (default 64 MB), logs a warning steering to partition keys or the dense
  * fast paths ([[DataOps.rollDense]]/[[DataOps.batchDense]]/
  * [[DataOps.sampleEveryDense]]) — or THROWS when
  * `spark.graft.unkeyed.fail=true` (opt-in hard mode for production
  * pipelines where a silent single-partition sort must never ship). */
private[operators] object UnkeyedGuard {
  val FailConf = "spark.graft.unkeyed.fail"
  val WarnBytesConf = "spark.graft.unkeyed.warnBytes"
  def check(df: DataFrame, op: String, hint: String): Unit = {
    // streaming frames report defaultSizeInBytes (Long.Max) — a window
    // over them is rejected by Spark itself, so the guard would only
    // add a spurious warning on the batch-mode factories' stream path
    if (df.isStreaming) return
    val conf = df.sparkSession.conf
    val warnBytes = BigInt(conf.get(WarnBytesConf, (64L << 20).toString))
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (size > warnBytes) {
      val msg = s"graft.$op called WITHOUT partition keys on an input " +
        s"estimated at $size bytes (> $warnBytes): this plans a " +
        s"SINGLE-partition global sort. $hint Raise $WarnBytesConf to " +
        s"silence, or set $FailConf=true to make this an error."
      if (conf.get(FailConf, "false").toBoolean)
        throw new IllegalArgumentException(msg)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
    }
  }
}

/** rxsci `rs.data.*` family: count windows, batching, splitting
  * (SURVEY.md §2.4). The flagship is [[roll]] — the reference README's
  * headline demo is `rs.data.roll(window=3, stride=3)` + mean ⇒ `2.0, 5.0`
  * over [1..7] (reference README.rst:75-90).
  */
object DataOps {

  /** Column name added by [[roll]]/[[batch]]/[[split]]/[[timeSplit]]
    * identifying the window/batch/segment a row belongs to. */
  val WindowCol = "window_id"

  /** `rs.data.roll(window, stride)` (reference README.rst:65): count-based
    * sliding/tumbling windows. Row i (0-based within its key, under `order`)
    * belongs to window k iff `k*stride <= i < k*stride + window`; only
    * COMPLETE windows are emitted (the reference drops the trailing partial
    * window: [1..7] w=3 s=3 → windows {1,2,3},{4,5,6}, the 7 is dropped).
    *
    * Implementation: row_number → explode the (small, ≤⌈window/stride⌉-sized)
    * set of window ids each row belongs to → groupBy-ready. One shuffle for
    * the row numbering, one for the downstream aggregate; with `partition`
    * keys both are hash-partitioned by key and scale linearly. Without keys
    * the numbering is a global sort — inherently sequential, matching the
    * reference's single-threaded semantics; use keyed rolls at scale.
    *
    * Returns rows tagged with `window_id` (and the partition keys); feed to
    * an aggregate such as [[MathOps.mean]].
    */
  def roll(window: Int, stride: Int, order: Seq[Column],
           partition: Seq[Column] = Nil): Op = { df =>
    require(window > 0 && stride > 0, "window and stride must be positive")
    if (partition.isEmpty) UnkeyedGuard.check(df, "DataOps.roll",
      "Pass partition keys, or use rollDense/batchDense for dense " +
        "0-based order columns.")
    val w0 = if (partition.isEmpty) Window.partitionBy()
             else Window.partitionBy(partition: _*)
    val i = row_number().over(w0.orderBy(order: _*)) - 1 // 0-based
    val n = count(lit(1)).over(w0) // rows per key, to drop partial windows
    // k ranges over [ceil((i-window+1)/stride), floor(i/stride)] ∩ [0, ∞);
    // materialize the window exprs first — explode(window_expr) directly is
    // unresolvable (generators can't contain window functions).
    val kLo = greatest(
      ceil((col("__i") - window + 1).cast("double") / stride), lit(0))
      .cast("long")
    val kHi = floor(col("__i").cast("double") / stride).cast("long")
    df.withColumn("__i", i)
      .withColumn("__n", n)
      // kLo > kHi (possible when stride > window: rows BETWEEN windows)
      // must yield an empty set — bare sequence() would emit a DESCENDING
      // range there, fabricating window ids.
      .withColumn(WindowCol, explode(
        when(kLo <= kHi, sequence(kLo, kHi))
          .otherwise(array().cast("array<long>"))))
      // complete windows only: window k spans [k*stride, k*stride+window-1]
      .filter(col(WindowCol) * stride + window <= col("__n"))
      .drop("__i", "__n")
  }

  /** `rs.data.batch` / serve's count-batcher (makinage/serve/serve.py:82-101):
    * tumbling count batches of size n = roll(n, n). */
  def batch(n: Int, order: Seq[Column],
            partition: Seq[Column] = Nil): Op =
    roll(n, n, order, partition)

  /** [[roll]] fast path for a DENSE 0-based order column (row i has
    * idx == i, e.g. a synthetic event counter): window ids are derived
    * arithmetically from idx — no global sort, no single-partition
    * WindowExec, so the op is a map + one broadcast side input and
    * parallelizes at any scale. The row count (for the complete-window
    * filter) comes from a 1-row max aggregate broadcast back in. */
  def rollDense(window: Int, stride: Int, idx: Column): Op = { df =>
    require(window > 0 && stride > 0, "window and stride must be positive")
    val nDf = df.agg((max(idx.cast("long")) + 1L).as("__n"))
    val i = idx.cast("long")
    val kLo = greatest(
      ceil((i - window + 1).cast("double") / stride), lit(0))
      .cast("long")
    val kHi = floor(i.cast("double") / stride).cast("long")
    df.crossJoin(broadcast(nDf))
      .withColumn(WindowCol, explode(
        when(kLo <= kHi, sequence(kLo, kHi))
          .otherwise(array().cast("array<long>"))))
      .filter(col(WindowCol) * stride + window <= col("__n"))
      .drop("__n")
  }

  /** [[batch]] fast path for a dense 0-based order column. */
  def batchDense(n: Int, idx: Column): Op = rollDense(n, n, idx)

  /** `rs.data.split`: segment a stream at predicate boundaries — a row where
    * `boundary` is true starts a new segment. Segment id = running count of
    * boundary markers (one window shuffle; per-key with `partition`). */
  def split(boundary: Column, order: Seq[Column],
            partition: Seq[Column] = Nil): Op = { df =>
    if (partition.isEmpty) UnkeyedGuard.check(df, "DataOps.split",
      "Pass partition keys (per-key segmenting scales linearly).")
    val w0 = if (partition.isEmpty) Window.partitionBy()
             else Window.partitionBy(partition: _*)
    val w = w0.orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(WindowCol,
      sum(when(boundary, 1L).otherwise(0L)).over(w))
  }

  /** `rs.data.time_split` (session split): a gap of more than `gapSeconds`
    * between consecutive events starts a new segment — the batch
    * (gaps-and-islands) form of session windows; the streaming form is
    * Spark's native `session_window` (SURVEY.md §2.5). */
  def timeSplit(ts: Column, gapSeconds: Long,
                partition: Seq[Column] = Nil,
                tieBreak: Seq[Column] = Nil): Op = { df =>
    if (partition.isEmpty) UnkeyedGuard.check(df, "DataOps.timeSplit",
      "Pass partition keys (per-key sessionizing scales linearly); " +
        "streams use the native session_window instead.")
    val w0 = if (partition.isEmpty) Window.partitionBy()
             else Window.partitionBy(partition: _*)
    // tieBreak pins a total order among equal timestamps — without it the
    // lag() peer order is engine-dependent and segment ids can differ
    // between runs (and between Spark and any oracle) on tied events.
    val order = ts +: tieBreak
    val prev = lag(ts, 1).over(w0.orderBy(order: _*))
    val isBoundary = prev.isNull ||
      (ts.cast("double") - prev.cast("double")) > gapSeconds
    val w = w0.orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(WindowCol,
      sum(when(isBoundary, 1L).otherwise(0L)).over(w))
  }

  /** rxsci `to_deque`: collect each window/segment's ordered values into an
    * array column — apply after [[roll]]/[[split]]/[[timeSplit]]. Bounded
    * by window size, so safe state; order pinned by sorting on `orderIn`.
    * Self-contained: materializes its own order/value columns, so it works
    * standalone (it previously required a separate [[withDequeCols]] step
    * and silently read stale `__o`/`__v` columns without it). */
  def toDeque(valueCol: Column, orderIn: Column,
              keys: Seq[Column] = Nil): Op = { df =>
    df.withColumn("__o", orderIn).withColumn("__v", valueCol)
      .groupBy(keys :+ col(WindowCol): _*)
      .agg(expr("transform(array_sort(collect_list(struct(__o, __v))), " +
        "x -> x.__v)").as("values"))
  }

  /** rxsci `pad_start`: prepend `n` copies of a literal default row. */
  def padStart(n: Int, defaults: DataFrame): Op = { df =>
    val pad = (1 until n).foldLeft(defaults)((d, _) => d.unionByName(defaults))
    if (n <= 0) df else pad.unionByName(df)
  }
}
