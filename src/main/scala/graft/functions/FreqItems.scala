package graft.functions

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy-hitters sketch as a mergeable Aggregator — the
  * streaming/distributed answer to "top tokens / hottest keys" at
  * 100 TB, completing the sketch battery (HLL distinct counts,
  * percentile_approx quantiles, Distogram histograms). Fixed O(m)
  * state, partial-aggregation friendly; merge follows Agarwal et al.,
  * "Mergeable Summaries" (PODS'12): sum counts, then subtract the
  * (m+1)-th largest and drop non-positives.
  *
  * Guarantees (n = stream length): every estimated count is within
  * [true − n/(m+1), true]; any item with true frequency > n/(m+1) is
  * in the sketch. Counts (not membership of the guaranteed heavy
  * hitters) can vary slightly with merge order — read the top-j for
  * j ≪ m, where rankings are stable.
  *
  * Items are longs (hash tokens/keys upstream — the engine-wide
  * shuffle-key rule; join hashes back to strings against a small
  * distinct table for display). */
object FreqItems {

  private class MisraGries(m: Int)
      extends Aggregator[Long, Map[Long, Long], Seq[(Long, Long)]] {
    def zero: Map[Long, Long] = Map.empty

    def reduce(b: Map[Long, Long], item: Long): Map[Long, Long] =
      b.get(item) match {
        case Some(c) => b.updated(item, c + 1)
        case None if b.size < m => b.updated(item, 1L)
        case None => // decrement-all, drop zeros (classic MG step)
          b.flatMap { case (k, c) => if (c > 1) Some(k -> (c - 1)) else None }
      }

    def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] = {
      val summed = y.foldLeft(x) { case (acc, (k, c)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + c)
      }
      if (summed.size <= m) summed
      else {
        // subtract the (m+1)-th largest count, keep strictly positive
        val cut = summed.values.toIndexedSeq.sorted(
          Ordering[Long].reverse)(m)
        summed.flatMap { case (k, c) =>
          if (c > cut) Some(k -> (c - cut)) else None
        }
      }
    }

    /** Descending estimated count, ties to smaller item. */
    def finish(b: Map[Long, Long]): Seq[(Long, Long)] =
      b.toSeq.sortBy { case (k, c) => (-c, k) }

    def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Map[Long, Long]]()
    def outputEncoder =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[(Long, Long)]]()
  }

  /** Column aggregate over a LONG item column: yields
    * `array<struct<_1 item, _2 est_count>>`, best first. */
  def sketch(m: Int): org.apache.spark.sql.expressions
      .UserDefinedFunction = {
    require(m > 0, "m must be positive")
    udaf(new MisraGries(m), Encoders.scalaLong)
  }
}
