package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, attach the MOST RECENT right
  * row with `rightTs <= leftTs`, per join key — the standard enrichment of
  * an event stream with slowly-changing reference data, and the batch
  * analogue of the reference's latest-value stream combination
  * (`with_latest_from`, reference makinage/serve/serve.py:141) when the
  * side input is keyed and timestamped.
  *
  * Implementation (sort-merge-as-of, not an inequality join): tag and
  * union both sides, sort per key by (ts, side, tiebreak) with right
  * before left at equal ts (inclusive semantics), carry the last non-null
  * right payload forward with a window `last(ignoreNulls)`, keep left
  * rows. ONE hash shuffle on the key + a per-key sort — shuffle-linear in
  * |left|+|right|. The naive formulation `left.join(right, key && rts <=
  * lts)` explodes to |left|×|right per key| rows and (keyless) plans as a
  * broadcast nested loop; this operator never materializes that blowup,
  * which is the difference between hours and minutes at 100 TB.
  *
  * Ties on rightTs resolve to the largest `rightTiebreak` (deterministic).
  * Left rows with no preceding right row keep null right columns
  * (left-outer semantics).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame,
           leftTs: Column, rightTs: Column,
           leftKey: Column, rightKey: Column,
           rightValueCols: Seq[String],
           rightTiebreak: Column): DataFrame = {
    val rvType = org.apache.spark.sql.types.StructType(
      rightValueCols.map(c => right.schema(c)))
    val l = left
      .withColumn("__ts", leftTs)
      .withColumn("__key", leftKey)
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast("long"))
      .withColumn("__rv", lit(null).cast(rvType))
    // the tiebreak must survive the long cast losslessly: a NULL (or a
    // fractional value truncating to a tie) would make `last()` pick
    // whichever row the partition layout ordered last — run-dependent
    // results against the documented deterministic-ties contract
    val tieGuarded = when(rightTiebreak.isNull ||
      rightTiebreak.cast("long").cast("double") =!=
        rightTiebreak.cast("double"),
      raise_error(concat(lit("asOf: rightTiebreak must be a non-NULL " +
          "integral value (ties would resolve nondeterministically); " +
          "got "), coalesce(rightTiebreak.cast("string"), lit("NULL"))))
        .cast("long"))
      .otherwise(rightTiebreak.cast("long"))
    val r = right
      .withColumn("__ts", rightTs)
      .withColumn("__key", rightKey)
      .withColumn("__side", lit(0))
      .withColumn("__tie", tieGuarded)
      .withColumn("__rv", struct(rightValueCols.map(col): _*))
      .select(left.columns.map(c => lit(null).cast(
        left.schema(c).dataType).as(c)).toIndexedSeq ++
        Seq(col("__ts"), col("__key"), col("__side"), col("__tie"),
          col("__rv")): _*)
    val unioned = l.select(
      left.columns.map(col).toIndexedSeq ++ Seq(col("__ts"), col("__key"),
        col("__side"), col("__tie"), col("__rv")): _*)
      .unionByName(r)
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__latest",
      last(col("__rv"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(left.columns.map(col).toIndexedSeq ++
        rightValueCols.map(c => col(s"__latest.$c").as(c)): _*)
  }
}
