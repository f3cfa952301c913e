package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC apply: latest-wins upsert of a changes feed into a snapshot —
  * the batch compaction step behind every "current state" table a
  * pipeline joins against (the materialized face of the reference's
  * `start_from: last` topic policy, reference config.sample.serve.yml:
  * 8-10: the newest version wins). [[Scd]] keeps the history; this
  * keeps the head.
  *
  * Scale: one union + one keyed window ([[Ops.lastBy]]) — shuffle-linear
  * on the key, no global sort. Ties: `version` columns order the winner
  * (callers pass a tiebreaker, e.g. a change id); an exact tie between
  * a snapshot row and a change resolves to the CHANGE (epoch tag).
  */
object Cdc {

  /** Merge `changes` into `snapshot` by `keys`: per key the row with the
    * highest `version` wins (changes beat snapshot on exact version
    * ties); keys present only in `changes` insert. With `tombstoneCol`
    * (a boolean column on the changes side), a winning tombstone DELETES
    * the key from the result; the column is dropped from the output.
    * Schemas must match by name (`tombstoneCol` may exist on one side
    * only — missing side reads as null/false). */
  def upsert(snapshot: DataFrame, changes: DataFrame, keys: Seq[Column],
             version: Seq[Column], tombstoneCol: Option[String] = None)
      : DataFrame = {
    require(keys.nonEmpty && version.nonEmpty, "upsert: keys + version")
    val tagged = snapshot.withColumn("__epoch", lit(0))
      .unionByName(changes.withColumn("__epoch", lit(1)),
        allowMissingColumns = true)
    val merged = Ops.lastBy(keys, version :+ col("__epoch"))(tagged)
      .drop("__epoch")
    tombstoneCol match {
      case Some(tc) =>
        merged.filter(!coalesce(col(tc), lit(false))).drop(tc)
      case None => merged
    }
  }
}
