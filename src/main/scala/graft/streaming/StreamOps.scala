package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A keyed numeric event — the typed shape used by streaming stateful ops.
  * (Streaming count windows need typed state; for wider rows, project the
  * key/value in and join results back by key+window.) */
case class KeyedEvent(key: String, seq: Long, value: Double)

/** [[KeyedEvent]] with an event-time ordering key: `ts` orders rows
  * WITHIN a micro-batch (ties to `seq`) when the transport does not
  * deliver in sequence order — the `roll_order: event_time` contract. */
case class KeyedTsEvent(key: String, ts: Long, seq: Long, value: Double)

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
object StreamOps extends Serializable {

  /** The count-window fold shared by both ordering modes: consume this
    * micro-batch's values for one key IN ORDER, open a window at every
    * stride boundary, close (emit) each window on its `window`-th row.
    * State stays the O(window/stride) open-window ring. */
  private def foldWindows(key: String, values: Iterator[Double],
                          st0: RollState, window: Int, stride: Int)
      : (RollState, List[WindowAgg]) = {
    var st = st0
    val out = scala.collection.mutable.ListBuffer[WindowAgg]()
    values.foreach { v =>
      val i = st.nextIdx
      // open a new window when i is a stride boundary
      val opened =
        if (i % stride == 0) st.open :+ ((i / stride, 0L, 0.0))
        else st.open
      // add this row to every open window it belongs to, close full ones
      val (closed, stillOpen) = opened.map { case (k, n, s) =>
        (k, n + 1, s + v)
      }.partition(_._2 == window)
      closed.foreach { case (k, n, s) =>
        out += WindowAgg(key, k, n, s, s / n)
      }
      st = RollState(i + 1, stillOpen)
    }
    (st, out.toList)
  }

  def rollStream(events: Dataset[KeyedEvent], window: Int, stride: Int)
      : Dataset[WindowAgg] = {
    import events.sparkSession.implicits._
    require(window > 0 && stride > 0)

    def step(key: String, rows: Iterator[KeyedEvent],
             state: GroupState[RollState]): Iterator[WindowAgg] = {
      val (st, out) = foldWindows(key,
        rows.toSeq.sortBy(_.seq).iterator.map(_.value),
        state.getOption.getOrElse(RollState(0L, Nil)), window, stride)
      state.update(st)
      out.iterator
    }

    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(step)
  }

  /** [[rollStream]] with EVENT-TIME ordering inside each micro-batch:
    * rows are consumed by `(ts, seq)` per key instead of `seq` — the
    * `roll_order: event_time` contract for transports that deliver
    * within-batch out of order (a multi-partition Kafka topic keyed
    * differently than the roll key, a file source picking up files
    * non-chronologically). CROSS-batch reordering is out of scope by
    * design: an event whose ts sorts before an ALREADY-CONSUMED batch
    * still lands after it (count windows consume rows exactly once;
    * buffering across batches would need watermark-style state — use
    * event-time windows, [[windowedAgg]], when that is the need). */
  def rollStreamEventTime(events: Dataset[KeyedTsEvent], window: Int,
                          stride: Int): Dataset[WindowAgg] = {
    import events.sparkSession.implicits._
    require(window > 0 && stride > 0)

    def step(key: String, rows: Iterator[KeyedTsEvent],
             state: GroupState[RollState]): Iterator[WindowAgg] = {
      val (st, out) = foldWindows(key,
        rows.toSeq.sortBy(e => (e.ts, e.seq)).iterator.map(_.value),
        state.getOption.getOrElse(RollState(0L, Nil)), window, stride)
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
                     valueCol: String, window: Int, stride: Int,
                     orderByTsCol: String = ""): DataFrame = {
    import df.sparkSession.implicits._
    if (orderByTsCol.isEmpty) {
      val typed = df.select(
        col(keyCol).cast("string").as("key"),
        col(seqCol).cast("long").as("seq"),
        col(valueCol).cast("double").as("value")).as[KeyedEvent]
      rollStream(typed, window, stride).toDF()
    } else {
      // event-time ordering key: micros for timestamps (sub-second
      // order preserved; NTZ via a session-tz cast — monotone under a
      // fixed-offset session tz, which this engine pins to UTC), plain
      // long cast for integrals. Anything else refuses loudly — a
      // silent cast("long") on an unexpected type would truncate to
      // whole seconds and discard exactly the sub-second order this
      // mode exists to honor.
      import org.apache.spark.sql.types._
      val ts = df.schema(orderByTsCol).dataType match {
        case _: TimestampType => unix_micros(col(orderByTsCol))
        case _: TimestampNTZType =>
          unix_micros(col(orderByTsCol).cast("timestamp"))
        case _: LongType | _: IntegerType | _: ShortType | _: ByteType =>
          col(orderByTsCol).cast("long")
        case other => throw new IllegalArgumentException(
          s"roll event-time column '$orderByTsCol' must be a timestamp " +
            s"or integral type, got ${other.catalogString}")
      }
      val typed = df.select(
        col(keyCol).cast("string").as("key"),
        ts.as("ts"),
        col(seqCol).cast("long").as("seq"),
        col(valueCol).cast("double").as("value")).as[KeyedTsEvent]
      rollStreamEventTime(typed, window, stride).toDF()
    }
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
