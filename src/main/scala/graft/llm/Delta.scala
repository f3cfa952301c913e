package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the bookkeeping op of an INCREMENTAL
  * training-data pipeline: given yesterday's corpus and today's crawl,
  * report per document id whether it was added, removed, or changed.
  * Downstream stages then process only the delta (re-embed changed
  * docs, retire removed ones from the index, run dedup/quality gates on
  * added ones) instead of re-reading 100 TB.
  *
  * North-star extension op (SURVEY.md §2.6 corpus assembly); the
  * reference has no batch corpus surface at all. Sibling of
  * [[Dedup.dedupAgainst]] (which answers "is this content already in
  * the reference corpus" — content-keyed; this op is ID-keyed version
  * tracking).
  */
object Delta {

  /** Diff two corpus snapshots by document id.
    *
    * Content comparison uses the 8-byte `xxhash64` of the text computed
    * MAP-SIDE, so the full-outer join shuffles (id, hash, length) — 24
    * bytes per doc — never the documents themselves; equal hashes are
    * taken as equal content (hash-collision odds 2^-64, the engine-wide
    * fingerprinting trade). One hash-partitioned shuffle on the id, no
    * skew (ids are unique per side).
    *
    * Output: (idCol, status, old_n_chars, new_n_chars) with status in
    * {'added','removed','changed'}; unchanged documents are omitted
    * (the whole point — the delta is small). The char lengths ride
    * along for cheap volume accounting; the absent side is NULL. */
  def corpusDelta(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    def prep(df: DataFrame, pfx: String): DataFrame =
      df.select(col(idCol).cast("long").as(s"${pfx}_id"),
        xxhash64(col(textCol)).as(s"${pfx}_h"),
        length(col(textCol)).cast("long").as(s"${pfx}_n_chars"))
    val o = prep(oldDf, "old")
    val n = prep(newDf, "new")
    o.join(n, col("old_id") === col("new_id"), "full_outer")
      .withColumn("status",
        when(col("old_id").isNull, lit("added"))
          .when(col("new_id").isNull, lit("removed"))
          .when(col("old_h") =!= col("new_h"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(coalesce(col("old_id"), col("new_id")).as(idCol),
        col("status"),
        col("old_n_chars"), col("new_n_chars"))
  }
}
