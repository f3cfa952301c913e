package graft

import org.apache.spark.sql.functions._

/** Pins the co-located join scale path: two tables bucketed on the join
  * key sort-merge-join with NO Exchange on either side — at 100 TB this
  * is the difference between a full-fact-table shuffle per join and none
  * (pre-partitioning amortized once at write time). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")

    val li = Seq.tabulate(100)(i => (i.toLong % 20, i.toDouble))
      .toDF("okey", "qty")
    val o = Seq.tabulate(20)(i => (i.toLong, s"o$i"))
      .toDF("okey", "status")

    li.write.bucketBy(4, "okey").sortBy("okey")
      .mode("overwrite").saveAsTable("b_lineitem")
    o.write.bucketBy(4, "okey").sortBy("okey")
      .mode("overwrite").saveAsTable("b_orders")

    // disable broadcast so the join strategy decision is about bucketing
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), "okey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // bucketed-on-join-key tables must not re-shuffle
      assert(!plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in:\n$plan")
      assert(joined.count() == 100)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
