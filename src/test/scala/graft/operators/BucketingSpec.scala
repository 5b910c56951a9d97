package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.sources.Tables

/** Bucketing = the co-located join story at 100 TB: both fact tables
  * bucketed+sorted on the join key join with NO shuffle exchange and no
  * sort — the physical layout carries the partitioning invariant. */
class BucketingSpec extends AnyFunSuite with SparkSpec {

  test("bucketed co-located join plans without any Exchange") {
    val dir = "/root/testdata/sf0.001"
    Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_quantity"))
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.orders(spark, dir).select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")

    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bc  = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"shuffle crept in:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      // Same answer as the unbucketed join.
      val expected = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(j.count() == expected)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
