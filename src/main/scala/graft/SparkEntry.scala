package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.core.Pipe._
import graft.operators.{DataOps, MathOps, Ops}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 registers a bounded-batch demonstration
  * query here; `oracleSql` holds the DuckDB-equivalent ANSI SQL. Column
  * names are aliased identically on both sides (driver hash-compares after
  * sorting columns by name). Numeric outputs follow MathOps' exactness
  * policy (decimal-exact accumulation, one final double conversion) so
  * results are bit-identical at any parallelism.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference README's headline pipeline (README.rst:75-90): rolling
    * mean, window=3 stride=3, over the events stream. */
  def entry(spark: SparkSession): DataFrame = {
    val ev = t(spark, "/root/testdata/sf0.001", "events")
    ev >> DataOps.roll(3, 3, Seq(col("event_id"))) >>
      MathOps.mean(col("value")) >>
      Ops.take(1000, col(DataOps.WindowCol))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- slice 0: README flagship — roll(3,3) + mean(reduce=true) ---
    "q_roll_mean" -> ((s, dir) => {
      t(s, dir, "events") >>
        DataOps.roll(3, 3, Seq(col("event_id"))) >>
        MathOps.mean(col("value")) >>
        (_.orderBy(DataOps.WindowCol))
    }),

    // --- ops.map / sample `multiply` operator (processor.py:6-14) ---
    "q_map_multiply" -> ((s, dir) => {
      t(s, dir, "events") >>
        Ops.map(
          "event_id" -> col("event_id"),
          "multiplied" -> (col("value") * lit(3)).cast("double")) >>
        (_.orderBy("event_id"))
    }),

    // --- ops.filter ---
    "q_filter" -> ((s, dir) => {
      t(s, dir, "events") >>
        Ops.filter(col("event_type") === "purchase" && col("value") > 100) >>
        Ops.map("event_id" -> col("event_id"),
                "user_id" -> col("user_id"),
                "value" -> col("value")) >>
        (_.orderBy("event_id"))
    }),

    // --- groupBy + aggregate (q1-style) ---
    "q_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          MathOps.exactSum(col("l_quantity")).as("sum_qty"),
          MathOps.exactSum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_roll_mean" ->
      """SELECT CAST(floor(event_id / 3) AS BIGINT) AS window_id,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean
        |FROM events
        |GROUP BY 1
        |HAVING count(*) = 3
        |ORDER BY window_id""".stripMargin,
    "q_map_multiply" ->
      """SELECT event_id, value * 3 AS multiplied
        |FROM events ORDER BY event_id""".stripMargin,
    "q_filter" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'purchase' AND value > 100
        |ORDER BY event_id""".stripMargin,
    "q_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin
  )
}
