package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Property-style checks for the warehouse operators whose ENGINE
  * formulation differs structurally from their oracle semantics: the
  * sharded two-pass skyline must equal the naive NOT-EXISTS dominance
  * set on arbitrary data (including duplicate points and dominated
  * same-x rows), and gap sessionization must split exactly on the
  * strict > 30 min boundary. Seeded pseudo-random datasets — the
  * sf0.01 oracle run covers one distribution; these cover adversarial
  * ones (heavy ties, collinear points).
  */
class WarehouseSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Sharded strict-prefix-max skyline, same algorithm as q_skyline. */
  private def shardedSkyline(pts: Seq[(Double, Long)]): Set[(Double, Long)] = {
    import org.apache.spark.sql.expressions.Window
    val stats = pts.toDF("bal", "n")
    val perBal = stats.groupBy(col("bal")).agg(max(col("n")).as("mx"))
      .withColumn("shard", floor(col("bal") / 10).cast("long"))
    val wIn = Window.partitionBy(col("shard")).orderBy(col("bal").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val inner = perBal.withColumn("rin", max(col("mx")).over(wIn))
    val wOff = Window.orderBy(col("shard").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBal.groupBy(col("shard")).agg(max(col("mx")).as("smx"))
      .withColumn("roff", max(col("smx")).over(wOff))
      .select(col("shard"), col("roff"))
    inner.join(broadcast(offsets), "shard")
      .withColumn("rmax", greatest(coalesce(col("rin"), lit(Long.MinValue)),
        coalesce(col("roff"), lit(Long.MinValue))))
      .where(col("mx") > col("rmax"))
      .select(col("bal"), col("mx")).as[(Double, Long)].collect().toSet
  }

  private def naiveSkyline(pts: Seq[(Double, Long)]): Set[(Double, Long)] =
    pts.filter { case (x, y) =>
      !pts.exists { case (bx, by) =>
        bx >= x && by >= y && (bx > x || by > y)
      }
    }.toSet

  test("sharded skyline equals naive dominance on adversarial datasets") {
    val rng = new scala.util.Random(42)
    // Heavy ties: coordinates drawn from small ranges so duplicate points,
    // same-x-different-y, and same-y-different-x all occur.
    val datasets = Seq(
      Seq.fill(200)((rng.nextInt(12).toDouble, rng.nextInt(12).toLong)),
      Seq.fill(200)((rng.nextInt(200).toDouble / 4, rng.nextInt(5).toLong)),
      (0 until 50).map(i => (i.toDouble, (49 - i).toLong)), // anti-chain: all skyline
      Seq.fill(30)((7.0, 7L)) // one duplicated point: skyline keeps it
    )
    datasets.zipWithIndex.foreach { case (pts, i) =>
      assert(shardedSkyline(pts) == naiveSkyline(pts), s"dataset $i")
    }
  }

  test("sessionization splits strictly above the 30-minute gap") {
    import org.apache.spark.sql.expressions.Window
    val gapUs = 1800000000L
    // Events at gaps: exactly 30 min (same session), 30 min + 1 us (new).
    val ts = Seq(0L, gapUs, 2 * gapUs, 3 * gapUs + 1)
    val df = ts.zipWithIndex.map { case (t, i) => (1L, t) }.toDF("user_id", "t")
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"))
    val sess = df.withColumn("ns",
        when(lag(col("t"), 1).over(w).isNull ||
          col("t") - lag(col("t"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("ns")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("t"), col("sid")).as[(Long, Long)].collect().toMap
    assert(sess(0L) == 1 && sess(gapUs) == 1 && sess(2 * gapUs) == 1,
      "gaps of exactly 30 min stay in one session")
    assert(sess(3 * gapUs + 1) == 2, "30 min + 1 us opens a new session")
  }
}
