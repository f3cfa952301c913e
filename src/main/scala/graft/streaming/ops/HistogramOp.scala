package graft.streaming.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.OperatorFactory

/** Windowed streaming histogram as a topology factory — the direct
  * Spark face of the reference project's flagship demo ("Real-Time
  * Histogram Plots on Unbounded Data", rs.math.dist / Distogram;
  * SURVEY.md §2.4): per event-time window, the Ben-Haim/Tom-Tov
  * centroid table of a value stream. One watermarked windowed
  * aggregate whose per-window state is the O(maxBins)
  * [[graft.operators.Distogram]] sketch (mergeable — partial
  * aggregation and the state store both apply the BHTT closest-pair
  * merge), finalized in append mode as
  * `(window_start, bin, value, cnt)` rows.
  *
  * The bin table is the streaming product (the
  * [[ApproxDistinctOp]]/[[CountMinOp]] register-table convention):
  * bounded, mergeable across windows/streams, and any quantile is a
  * batch read over finalized rows ([[quantile]]). Centroid VALUES are
  * merge-order dependent (the documented Distogram trade — counts are
  * exact, positions approximate); the deterministic-replay audit twin
  * is [[graft.operators.Distogram.orderedFold]] (q_distogram_oracle).
  *
  * Config: `window` (default "1 hour"), `timestamp_col` ("ts"),
  * `value_col` ("value"), `max_bins` (32). Batch sources take the
  * same path — one factory, both modes. */
object HistogramOp extends OperatorFactory {
  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val win = config.getOrElse("window", "1 hour").toString
    val tsCol = config.getOrElse("timestamp_col", "ts").toString
    val valCol = config.getOrElse("value_col", "value").toString
    val maxBins = config.getOrElse("max_bins", 32).toString.toInt
    val sk = udaf(graft.operators.Distogram.sketch(maxBins),
      org.apache.spark.sql.Encoders.scalaDouble)
    val out = sources.head
      .filter(col(valCol).isNotNull)
      .groupBy(window(col(tsCol), win).as("__win"))
      .agg(sk(col(valCol).cast("double")).as("__s"))
      .select(col("__win.start").as("window_start"),
        posexplode(col("__s.bins")))
      .select(col("window_start"), (col("pos") + 1).as("bin"),
        col("col._1").as("value"), col("col._2").as("cnt"))
    Seq(out)
  }

  /** Batch finisher: the BHTT interpolated quantile of one window's
    * finalized bin rows (filter `window_start` upstream, or group —
    * the bins of one window are ≤ max_bins rows). */
  def quantile(bins: Seq[(Double, Long)], q: Double): Double =
    graft.operators.Distogram.Sketch(bins.toVector).quantile(q)
}
