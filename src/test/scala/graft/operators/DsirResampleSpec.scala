package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.sources.Tables

/** Round-13 DSIR resampling invariants: the accept decision is the
  * documented integer-grid rule (u16 < cap_u16), saturating weights keep
  * every target-looking doc, and the accept set is a deterministic
  * sub-multiset of the weights table (same doc scores, nothing invented).
  */
class DsirResampleSpec extends AnyFunSuite with SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private val isTarget = col("doc_id") % 7 === 0

  test("accepted rows are exactly the weights rows passing the u16 grid rule") {
    val docs = Tables.documents(spark, dir)
    val w = Corpus.dsirLogWeights(docs, buckets = 128, isTarget)
    val expected = w
      .withColumn("cap_u16",
        floor(least(exp(col("log_weight")), lit(1.0)) * 65536 + 0.5).cast("long"))
      .withColumn("u16",
        conv(substring(md5(concat(lit("rs|"), col("doc_id").cast("string"))
          .cast("binary")), 1, 4), 16, 10).cast("long"))
      .where(col("u16") < col("cap_u16"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val got = Corpus.dsirResample(docs, buckets = 128, isTarget)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty)
    assert(got == expected)
  }

  test("non-negative log weights saturate the cap: every such doc is kept") {
    val docs = Tables.documents(spark, dir)
    val res = Corpus.dsirResample(docs, buckets = 128, isTarget)
    // cap is bounded to the 16-bit grid and saturates at exactly 65536
    val caps = res.agg(min(col("cap_u16")), max(col("cap_u16"))).first()
    assert(caps.getLong(0) >= 0L && caps.getLong(1) <= 65536L)
    val positive = Corpus.dsirLogWeights(docs, buckets = 128, isTarget)
      .where(col("log_weight") >= 0).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val kept = res.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(positive.subsetOf(kept),
      s"${(positive -- kept).size} non-negative-weight docs were dropped")
  }
}
