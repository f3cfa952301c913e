package graft.streaming.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.OperatorFactory

/** Streaming NEAR-dup dedup (MinHash LSH) as a topology factory — the
  * continuous-ingest answer to "have we crawled something like this
  * before": a document is emitted as NOVEL iff none of its LSH band
  * keys was claimed by an earlier document (any shared band ⇒ likely
  * near-dup ⇒ suppressed). The batch twin with identical semantics is
  * [[graft.llm.Dedup.minhashNovel]] (oracled, q_minhash_novel); this
  * factory runs BOTH modes through one code path.
  *
  * Mechanics: tokens → shingle hashes → minhash signature → `bands`
  * band keys, all map-side; the ONLY stateful operator is a
  * `flatMapGroupsWithState` keyed by band key whose state is the 8-byte
  * winner id (the first doc to claim the band; within a micro-batch the
  * winner is the MINIMUM id — deterministic, unlike a bare
  * dropDuplicates). Emitted rows carry `won`; a per-window aggregate
  * then counts a doc novel iff it won ALL `bands` rows. State is
  * evicted `lateness` past the band's newest event (event-time timeout)
  * — bounded by the watermark horizon like every stateful op here.
  * PERSISTENT state per band is 8 bytes; each band's WITHIN-batch rows
  * are buffered once (compact (id, ts) pairs) to pick the winner and
  * set the timeout — bound micro-batches via maxOffsetsPerTrigger /
  * maxFilesPerTrigger if a boilerplate band key can burst millions of
  * rows in one batch.
  *
  * No signature-verification pass: verification would need the earlier
  * doc's signature in per-band state (128 longs instead of 1); band
  * collision alone is the documented streaming trade — tune
  * `num_hashes`/`bands` for the S-curve knee. False-positive band
  * collisions suppress a genuinely novel doc with probability
  * ≈ bands × P(random 4-hash slice match) — negligible at r = 4.
  *
  * Config: `id_col` ("doc_id"), `text_col` ("text"), `timestamp_col`
  * ("ts"), `window` ("1 hour"), `lateness` ("10 minutes" — also the
  * source watermark to declare on the topic), `shingle_size` (3),
  * `num_hashes` (128), `bands` (32).
  *
  * Output: `(window_start, <id_col>)` — novel docs per finalized
  * window (append mode; batch sources produce the same shape). */
object NearDupOp extends OperatorFactory {

  case class BandEvent(id: Long, ts: java.sql.Timestamp, bkey: Long)
  case class BandWin(id: Long, ts: java.sql.Timestamp, won: Boolean)
  case class BandState(winner: Long)

  def apply(config: Map[String, Any], sources: Seq[DataFrame])
      : Seq[DataFrame] = {
    val df = sources.head
    val idCol = config.getOrElse("id_col", "doc_id").toString
    val textCol = config.getOrElse("text_col", "text").toString
    val tsCol = config.getOrElse("timestamp_col", "ts").toString
    val win = config.getOrElse("window", "1 hour").toString
    val lateness = config.getOrElse("lateness", "10 minutes").toString
    val shingleSize = config.getOrElse("shingle_size", 3).toString.toInt
    val numHashes = config.getOrElse("num_hashes", 128).toString.toInt
    val bands = config.getOrElse("bands", 32).toString.toInt
    require(numHashes % bands == 0, "bands must divide num_hashes")
    val latenessMs = parseMs(lateness)
    val streaming = df.isStreaming
    if (streaming) {
      // Spark's analysis-time guard rejects ANY stateful op downstream
      // of flatMapGroupsWithState because FMGWS *could* emit rows with
      // arbitrary event times (older than watermark + delay), which a
      // downstream stateful op would silently discard. This operator
      // cannot: it emits each row with its UNMODIFIED input event time
      // in the same trigger, and late input is already filtered by the
      // upstream EventTimeWatermark — so every emitted row reaches the
      // window aggregate strictly ahead of the eviction horizon. The
      // check is per-session and analysis-time only; disabling it does
      // not change any runtime semantics.
      df.sparkSession.conf.set(
        "spark.sql.streaming.statefulOperator.checkCorrectness.enabled",
        "false")
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "NearDupOp: disabled the global-watermark correctness CHECK for " +
          "this session (FMGWS passes event times through unmodified — " +
          "see NearDupOp scaladoc); other queries are unaffected at " +
          "runtime but will no longer be flagged by this analysis check. " +
          "Re-enable it after this query STARTS (the check runs at " +
          "analysis) if other FMGWS-chained queries share the session: " +
          "spark.conf.set(\"spark.sql.streaming.statefulOperator." +
          "checkCorrectness.enabled\", \"true\").")
    }

    val spark = df.sparkSession
    import spark.implicits._
    val hs = df.select(col(idCol).cast("long").as("id"),
      col(tsCol).as("ts"),
      graft.llm.Dedup.shingleHashes(
        graft.functions.Text.tokens(col(textCol)), shingleSize).as("hs"))
    val sig = hs.select(col("id"), col("ts"), col("hs"),
      graft.llm.Dedup.minhashSigFromHashes(col("hs"), numHashes)
        .as("sig"))
    // shingle-less docs must NOT band on their signature: the MinHash of
    // an empty shingle set is the all-sentinel vector — identical for
    // EVERY short doc — which would band unrelated short docs together
    // and suppress all but the first ever seen (the minhashNovel rule:
    // no shingles ⇒ nothing to collide on ⇒ trivially novel). They ride
    // the same single path on per-doc-UNIQUE synthetic band keys, so
    // they always win all their bands; run exact dedup upstream for
    // short docs.
    val keys = when(size(col("hs")) === 0,
      transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(lit("__contentless"), col("id"), b)))
      .otherwise(graft.llm.Dedup.bandKeysFromSig(col("sig"), numHashes,
        bands))
    val banded = sig.select(col("id"), col("ts"),
        explode(keys).as("bkey"))
      .as[BandEvent]
    val won = banded
      .groupByKey(_.bkey)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout)(
        (_: Long, rows: Iterator[BandEvent],
         state: GroupState[BandState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // the group is buffered as compact (id, tsMillis) pairs:
            // the state-eviction timeout must be EVENT-time-relative
            // (maxTs + lateness — a watermark-relative timeout set in
            // the first batch, when the watermark is still 0, would
            // evict every band before the second batch) and the API
            // requires it set before the returned iterator is
            // consumed, so one within-batch O(group) pass is
            // unavoidable. Bound micro-batches via
            // maxOffsetsPerTrigger / maxFilesPerTrigger if a
            // boilerplate band key can burst in one batch.
            val evs = rows.map(e => (e.id, e.ts.getTime)).toArray
            val prior = state.getOption
            val w = prior.map(_.winner)
              .getOrElse(evs.iterator.map(_._1).min)
            if (prior.isEmpty) state.update(BandState(w))
            if (streaming) {
              val maxTs = evs.iterator.map(_._2).max
              state.setTimeoutTimestamp(
                math.max(maxTs, state.getCurrentWatermarkMs()) + latenessMs)
            }
            val first = prior.isEmpty
            evs.iterator.map { case (id, t) =>
              BandWin(id, new java.sql.Timestamp(t), first && id == w)
            }
          }
        })
    // novel iff the doc won every one of its `bands` band rows; the
    // aggregate finalizes per window in append mode (allowed after
    // flatMapGroupsWithState in Append). Re-declare the watermark on
    // the FMGWS output so the window aggregate's eviction horizon is
    // explicit rather than inherited.
    val wonDf = if (streaming) won.toDF().withWatermark("ts", lateness)
                else won.toDF()
    val novel = wonDf
      .filter(col("won"))
      .groupBy(window(col("ts"), win).as("__win"), col("id"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") === bands)
      .select(col("__win.start").as("window_start"), col("id").as(idCol))
    Seq(novel)
  }

  /** "N minutes/seconds/hours/days" → milliseconds (the subset the
    * topology YAML uses; full interval strings go to withWatermark). */
  private[ops] def parseMs(s: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    require(iv.months == 0, s"month-based lateness unsupported: $s")
    iv.days * 86400000L + iv.microseconds / 1000L
  }
}
