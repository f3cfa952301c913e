package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) interval builder: turns a change
  * log (key, order, state) into validity intervals `[effective_from,
  * effective_to)` with consecutive equal states collapsed — the producer
  * side of [[AsOfJoin]]'s reference tables ("which model version was
  * live when the doc arrived" is an as-of join against exactly this
  * output; the reference's `model` topic with `start_from: last`,
  * reference config.sample.serve.yml:8-10, is the streaming face of the
  * same latest-version-wins contract).
  *
  * Scale: every window is keyed by `key` (shuffle-linear across keys, no
  * global sort); the run collapse is one cumulative sum + one aggregate,
  * and the interval close is a |runs|-row window, not an |events| one.
  * State comparison is null-safe (`<=>`), so NULL is a legal state.
  */
object Scd {

  /** One row per (key, run of equal consecutive states): the state, its
    * `[effective_from, effective_to)` validity (to = NULL on the open
    * current run), `is_current`, and the run's event count. Determinism:
    * `(orderCol, tieCol)` must be unique per key. */
  def scd2(df: DataFrame, keyCol: Column, orderCol: Column,
           tieCol: Column, stateCol: Column): DataFrame = {
    val base = df.select(keyCol.as("key"), orderCol.as("ord"),
      tieCol.as("tie"), stateCol.as("state"))
    val w = Window.partitionBy(col("key")).orderBy(col("ord"), col("tie"))
    val runs = base
      .withColumn("__chg",
        when(lag(col("state"), 1).over(w) <=> col("state"), 0L)
          .otherwise(1L))
      .withColumn("__run", sum(col("__chg")).over(w))
      .groupBy(col("key"), col("__run"), col("state"))
      .agg(min(col("ord")).as("effective_from"),
        count(lit(1)).as("n_events"))
    val wo = Window.partitionBy(col("key")).orderBy(col("__run"))
    runs
      .withColumn("effective_to",
        lead(col("effective_from"), 1).over(wo))
      .withColumn("is_current", col("effective_to").isNull)
      .drop("__run")
  }
}
