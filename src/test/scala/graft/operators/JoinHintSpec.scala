package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.sources.Tables

/** Join strategy hints — the per-query override when Catalyst's choice is
  * wrong for a known data shape (tiny-but-unstatted dim → broadcast;
  * uniform big-big → shuffle_hash to skip the sort). */
class JoinHintSpec extends AnyFunSuite with SparkSpec {

  private def planOf(hint: String): String = {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bc  = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dir = "/root/testdata/sf0.001"
      Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir).hint(hint),
          col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  test("broadcast hint forces BroadcastHashJoin") {
    assert(planOf("broadcast").contains("BroadcastHashJoin"))
  }
  test("merge hint forces SortMergeJoin") {
    assert(planOf("merge").contains("SortMergeJoin"))
  }
  test("shuffle_hash hint forces ShuffledHashJoin") {
    assert(planOf("shuffle_hash").contains("ShuffledHashJoin"))
  }
}
