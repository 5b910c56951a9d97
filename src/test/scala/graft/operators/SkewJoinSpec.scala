package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Skew posture: AQE's skew-join split is the first line of defense at
  * 100 TB (a hot wallet/key inflates one shuffle partition); the salted
  * two-phase aggregation (`o9_balance_salted`) is the manual fallback.
  * This spec builds a deliberately skewed join (one key holds ~90% of the
  * rows) and proves AQE plans it as a skew join with split partitions,
  * and that the result is identical to the non-AQE plan.
  */
class SkewJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def skewed = {
    // The hot partition must be big AFTER column pruning and shuffle
    // compression: keep an incompressible-ish payload (md5 of the id)
    // that the query actually uses downstream.
    val hot = spark.range(200000)
      .select(lit(0L).as("k"), md5(col("id").cast("string")).as("v"))
    val rest = spark.range(10000)
      .select((col("id") % 100 + 1).as("k"), md5(col("id").cast("string")).as("v"))
    hot.unionAll(rest)
  }
  private def dim = spark.range(101).select(col("id").as("k"), (col("id") * 10).as("w"))

  test("AQE splits the hot partition (skew=true in the sort-merge join)") {
    val prev = (
      spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    try {
      // Thresholds low enough that the ~90k-row hot partition counts as
      // skewed at test scale; broadcast disabled so the join shuffles.
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // No aggregation downstream: a parent that reuses the join's hash
      // partitioning makes AQE decline the split (it would re-shuffle).
      val joined = skewed.join(dim, "k")
        .select(col("k") + col("w") + length(col("v")))
      // collect() on THIS DataFrame finalizes ITS adaptive plan (count()
      // would spawn a separate QueryExecution and leave this one unrun).
      assert(joined.collect().length === 210000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"expected skew-join split in:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", prev._1)
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", prev._2)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev._3)
    }
  }

  test("skew-split result matches the plain join") {
    val expected = skewed.join(dim, "k").groupBy("k").agg(sum("w").as("sw"))
      .orderBy("k").collect().toSeq
    assert(expected.length === 101)
    assert(expected.head.getLong(1) === 0L) // hot key k=0 joins w=0
    assert(expected(1).getLong(1) === 10L * (10000 / 100)) // k=1: 100 rows x w=10
  }
}
