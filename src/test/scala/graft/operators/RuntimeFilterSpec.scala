package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.sources.Tables

/** Runtime bloom-filter join pruning — the 100-TB posture for selective
  * fact⋈dim joins that are too big to broadcast: Catalyst's
  * InjectRuntimeFilter builds a bloom filter over the selective (dim)
  * side's join keys and pushes a `might_contain` probe into the fact
  * scan, so most fact rows die before the shuffle instead of after it.
  * At test scale the size thresholds are lowered; at production scale the
  * defaults (10 MB creation side / 10 GB application side) gate the same
  * rewrite.
  */
class RuntimeFilterSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("selective dim filter injects a bloom-filter probe into the fact side") {
    val prev = (
      spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // Any fact scan qualifies at test scale (default gate: 10 GB).
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // Force a shuffle join — a broadcast join already prunes at runtime.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val bigOrders = Tables.orders(spark, sf).filter(col("o_totalprice") > 400000)
      val joined = Tables.lineitem(spark, sf)
        .join(bigOrders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))

      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected a bloom-filter runtime probe in:\n$optimized")

      // The probe must not change results: same rows as with the rule off.
      val withFilter = joined.orderBy("o_orderpriority").collect().toSeq
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val without = Tables.lineitem(spark, sf)
        .join(bigOrders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))
        .orderBy("o_orderpriority").collect().toSeq
      assert(withFilter === without)
      assert(withFilter.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", prev._1)
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", prev._2)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev._3)
    }
  }
}
