package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** The banding tuning curve must be CONSISTENT with the live pair path:
  * its (4, 3) row surveys the same banding dedup_minhash_lsh runs, so the
  * verified count there equals the verified pair count. Candidate volume
  * growing with the band count is guaranteed only between NESTED
  * factorizations (a collision on a wide band implies one on a contained
  * narrow band; non-nested boundaries like 3x4 vs 4x3 can in principle
  * cross) — asserted here as an empirical property of this corpus and
  * config set, which is the trade the sweep exists to show as data. */
class BandSweepSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val text =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private def corpus = (1L to 12L).map { i =>
    val t =
      if (i % 4 == 0) text // planted exact group: docs 4, 8, 12
      else s"$text unique tail $i marker ${i * 7}"
    (i, t, t.length.toLong)
  }.toDF("doc_id", "text", "n_chars")

  test("(4,3) row matches the live verified-pair path") {
    val row = Dedup.bandSweep(corpus, k = 12)
      .where(col("bands") === 4).head()
    val live = Dedup.minhashLshPairs(corpus, 12, 4, 3, 0.5).count()
    assert(row.getAs[Long]("n_verified") == live)
  }

  test("verified never exceeds candidates; both non-negative") {
    val rows = Dedup.bandSweep(corpus, k = 12).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_verified") <= r.getAs[Long]("n_candidates"))
      assert(r.getAs[Long]("n_verified") >= 0L)
    }
  }

  test("candidate volume is monotone non-decreasing in the band count") {
    val byBands = Dedup.bandSweep(corpus, k = 12).collect()
      .sortBy(_.getAs[Int]("bands"))
    byBands.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("n_candidates") <= hi.getAs[Long]("n_candidates"),
        s"candidates must not shrink as bands grow: " +
          s"bands=${lo.getAs[Int]("bands")} -> ${hi.getAs[Int]("bands")}")
    }
  }

  test("a config that does not factor k is rejected") {
    intercept[IllegalArgumentException] {
      Dedup.bandSweep(corpus, k = 12, configs = Seq((5, 2)))
    }
  }
}
