package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * Random `sample()` is reproducible only per Spark version/partitioning;
  * a corpus pipeline wants splits that are stable across engines, runs,
  * and re-partitioning, and that any auditor can replay. The standard
  * trick is HASH-based systematic sampling: a row is in the p-sample iff
  * the leading hex of `md5(key)` falls below a threshold. Properties:
  *
  *  - deterministic per key (re-runs and other engines agree — md5 hex is
  *    identical everywhere, and the comparison is plain string ordering);
  *  - uniform (md5 is uniform on hex prefixes);
  *  - consistent across tables: the same key lands in the same split
  *    everywhere — exactly how train/test contamination is avoided;
  *  - embarrassingly parallel: a codegen'd per-row predicate, no shuffle,
  *    pushed to the scan side at any scale.
  *
  * The 4-hex-digit prefix gives 65 536 strata (~0.0015% rate granularity).
  */
object Sampling {

  /** `md5(key)` leading-4-hex-digit bucket as a string — the sampling
    * coordinate. Key is stringified first (bigint → decimal form, same in
    * any engine). */
  def hashBucket(key: Column): Column =
    substring(md5(key.cast("string").cast("binary")), 1, 4)

  /** The p-fraction threshold as a hex string: keys whose 4-hex bucket
    * sorts strictly below it are sampled. p is quantized to 1/65536ths;
    * p = 1.0 yields "g" (sorts above every 4-hex bucket → keep all),
    * because clamping to "ffff" would drop the ~1/65536 of keys whose
    * bucket is exactly "ffff". */
  def thresholdHex(p: Double): String = {
    require(p >= 0 && p <= 1, s"fraction must be in [0,1], got $p")
    val q = math.round(p * 65536).toInt
    if (q >= 65536) "g" else f"$q%04x"
  }

  /** Uniform deterministic sample: keep rows with hashBucket(key) < p. */
  def hashSample(df: DataFrame, key: Column, p: Double): DataFrame =
    if (p >= 1.0) df else df.where(hashBucket(key) < lit(thresholdHex(p)))

  /** Stratified deterministic sample: per-stratum fractions (e.g. lang →
    * rate), same hash coordinate so a key keeps its fate if its stratum
    * rate only grows. Strata absent from `rates` are dropped. */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
                           rates: Map[String, Double]): DataFrame = {
    val threshold = rates.foldLeft(lit(null).cast("string")) {
      case (acc, (s, p)) => when(stratum === s, lit(thresholdHex(p))).otherwise(acc)
    }
    df.where(hashBucket(key) < threshold)
  }

  /** Deterministic per-group top-n "reservoir": the n keys with the
    * smallest (md5-hash, key) per group — a stable group sample that any
    * engine reproduces, with the window's map-side group-limit pushdown
    * keeping it one shuffle at scale. */
  def groupSample(df: DataFrame, group: Column, key: Column, n: Int): DataFrame = {
    val w  = Window.partitionBy(group).orderBy(hashBucket(key), key)
    val rn = "__graft_rn" // collision-free: never clobbers a user "rn" column
    df.withColumn(rn, row_number().over(w)).where(col(rn) <= n).drop(rn)
  }

  /** Deterministic weight-proportional sample (Efraimidis–Spirakis A-ES):
    * rank every row by ln(u)/w — the log of the classic u^(1/w) reservoir
    * key, with u derived from the md5 bucket — and keep the global top-n
    * via TakeOrderedAndProject (no global window, no shuffle of losers).
    * Higher-weight rows are proportionally likelier to be kept, yet the
    * draw is replayable in any engine. ln() only decides MEMBERSHIP; it is
    * never emitted, so last-ulp libm differences cannot reach the output
    * (order flips would need two keys within ~1e-16 — not attainable from
    * 65,536 distinct u levels and integer weights at any realistic n). */
  def weightedSample(df: DataFrame, key: Column, weight: Column, n: Int): DataFrame = {
    val u = (conv(hashBucket(key), 16, 10).cast("long") + 1) / 65537.0
    df.withColumn("__graft_wkey", log(u) / weight)
      .orderBy(col("__graft_wkey").desc, key)
      .limit(n)
      .drop("__graft_wkey")
  }

  /** Train/validation/test split assignment from the same coordinate:
    * [0, train) → "train", [train, train+valid) → "valid", rest → "test".
    * Per-key stable — joining any table sampled with the same key column
    * never crosses splits. */
  def splitAssign(key: Column, trainP: Double, validP: Double): Column = {
    require(trainP + validP <= 1.0, "train+valid fractions exceed 1")
    val b = hashBucket(key)
    when(b < lit(thresholdHex(trainP)), "train")
      .when(b < lit(thresholdHex(trainP + validP)), "valid")
      .otherwise("test")
  }
}
