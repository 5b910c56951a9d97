package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Edge cases of the deterministic hash sampler (ADVICE round 4): p = 1.0
  * must keep EVERY row — including keys whose md5 bucket is exactly "ffff"
  * — and groupSample must not clobber a user column named "rn". */
class SamplingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("hashSample p = 1.0 keeps all rows, p = 0.0 keeps none") {
    val df = (1L to 5000L).toDF("k")
    assert(Sampling.hashSample(df, col("k"), 1.0).count() === 5000L)
    assert(Sampling.hashSample(df, col("k"), 0.0).count() === 0L)
  }

  test("a key in the top hash bucket survives p = 1.0") {
    // Find a key whose 4-hex md5 bucket is "ffff" (the old clamp dropped it).
    val top = (1L to 200000L).toDF("k")
      .where(Sampling.hashBucket(col("k")) === "ffff")
      .limit(1).as[Long].collect()
    assert(top.nonEmpty, "expected at least one ffff-bucket key in 200k")
    val one = Seq(top.head).toDF("k")
    assert(Sampling.hashSample(one, col("k"), 1.0).count() === 1L)
  }

  test("thresholdHex quantization and the p = 1.0 sentinel") {
    assert(Sampling.thresholdHex(0.0) === "0000")
    assert(Sampling.thresholdHex(0.5) === "8000")
    assert(Sampling.thresholdHex(1.0) === "g") // sorts above every hex bucket
  }

  test("groupSample preserves a pre-existing rn column") {
    val df = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 30L))
      .toDF("grp", "k", "rn")
    val out = Sampling.groupSample(df, col("grp"), col("k"), n = 1)
    assert(out.columns.toSeq === Seq("grp", "k", "rn"))
    assert(out.select(sum("rn")).head().getLong(0) > 0L)
  }

  test("monotone fates: a sampled key stays sampled when p grows") {
    val df = (1L to 2000L).toDF("k")
    val p20 = Sampling.hashSample(df, col("k"), 0.2).as[Long].collect().toSet
    val p50 = Sampling.hashSample(df, col("k"), 0.5).as[Long].collect().toSet
    assert(p20.subsetOf(p50))
  }
}
