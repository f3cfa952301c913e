package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A keyed numeric event — the typed shape used by streaming stateful ops.
  * (Streaming count windows need typed state; for wider rows, project the
  * key/value in and join results back by key+window.) */
case class KeyedEvent(key: String, seq: Long, value: Double)

/** Emitted when a count window closes. */
case class WindowAgg(key: String, window_id: Long, n: Long,
                     sum: Double, mean: Double)

/** State for one key's open count-windows. */
case class RollState(nextIdx: Long, open: List[(Long, Long, Double)])
// open = (windowId, countSoFar, sumSoFar)

/** Streaming forms of the count-window family (SURVEY.md §7.3: Spark has no
  * built-in count windows — this is the one genuinely custom stateful
  * operator, via flatMapGroupsWithState).
  *
  * Semantics match [[graft.operators.DataOps.roll]]: row i (0-based, in
  * `seq` order per key) belongs to window k iff k*stride ≤ i < k*stride+w;
  * a window emits exactly once, when its w-th row arrives (complete windows
  * only — the reference drops trailing partials, reference README.rst:87-90).
  *
  * Ordering contract: events must arrive in `seq` order per key (Kafka
  * gives this per partition; with event-time ordering needed, sort within
  * micro-batch upstream). State is O(window/stride) per key — bounded.
  */
object StreamOps {

  def rollStream(events: Dataset[KeyedEvent], window: Int, stride: Int)
      : Dataset[WindowAgg] = {
    import events.sparkSession.implicits._
    require(window > 0 && stride > 0)

    def step(key: String, rows: Iterator[KeyedEvent],
             state: GroupState[RollState]): Iterator[WindowAgg] = {
      var st = state.getOption.getOrElse(RollState(0L, Nil))
      val out = scala.collection.mutable.ListBuffer[WindowAgg]()
      rows.toSeq.sortBy(_.seq).foreach { ev =>
        val i = st.nextIdx
        // open a new window when i is a stride boundary
        val opened =
          if (i % stride == 0) st.open :+ ((i / stride, 0L, 0.0))
          else st.open
        // add this row to every open window it belongs to, close full ones
        val (closed, stillOpen) = opened.map { case (k, n, s) =>
          (k, n + 1, s + ev.value)
        }.partition(_._2 == window)
        closed.foreach { case (k, n, s) =>
          out += WindowAgg(key, k, n, s, s / n)
        }
        st = RollState(i + 1, stillOpen)
      }
      state.update(st)
      out.iterator
    }

    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(step)
  }

  /** [[rollStream]] over an arbitrary-schema DataFrame: name the key /
    * sequence / value columns and the projection into the typed state
    * shape happens here — so YAML topologies run count windows on real
    * topics (events, kafka frames) without hand-mapping to
    * [[KeyedEvent]]. Count windows AGGREGATE by contract (the emitted
    * row is the closed window's stats, reference rxsci roll+mean,
    * README.rst:79-96), so non-key columns are consumed by the window,
    * not carried — project-in is lossless for the operator's semantics.
    * Key is coerced to string, sequence to long, value to double. */
  def rollStreamRows(df: DataFrame, keyCol: String, seqCol: String,
                     valueCol: String, window: Int, stride: Int)
      : DataFrame = {
    import df.sparkSession.implicits._
    val typed = df.select(
      col(keyCol).cast("string").as("key"),
      col(seqCol).cast("long").as("seq"),
      col(valueCol).cast("double").as("value")).as[KeyedEvent]
    rollStream(typed, window, stride).toDF()
  }

  /** Event-time tumbling/sliding window aggregate with watermark — the
    * streaming counterpart of q_tumbling_hour/q_sliding_hour; late rows
    * beyond `lateness` are dropped (the reference has no lateness policy at
    * all — late events just flow, reference makinage/operator.py:133-144;
    * we pin watermark semantics instead, SURVEY.md §2.5). */
  def windowedAgg(df: DataFrame, tsCol: String, lateness: String,
                  window_ : String, slide: Option[String] = None)
      : DataFrame = {
    val w = slide match {
      case Some(s) => window(col(tsCol), window_, s)
      case None => window(col(tsCol), window_)
    }
    df.withWatermark(tsCol, lateness)
      .groupBy(w.as("win"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("win.start").as("window_start"), col("n"),
        col("sum_value"))
  }

  /** Session windows (gap-based) — streaming form of
    * [[graft.operators.DataOps.timeSplit]], on Spark's native
    * session_window. */
  def sessionAgg(df: DataFrame, tsCol: String, keyCol: String,
                 gap: String, lateness: String): DataFrame =
    df.withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap).as("win"), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col(keyCol), col("win.start").as("session_start"), col("n"))
}
