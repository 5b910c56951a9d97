package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** The banding tuning curve must be CONSISTENT with the live pair path:
  * its (4, 3) row surveys the same banding dedup_minhash_lsh runs, so the
  * verified count there equals the verified pair count, and candidate
  * volume must be monotone in the band count (more, narrower bands can
  * only add collisions — each config's candidate set at fixed k grows as
  * rows-per-band shrinks on THIS corpus shape; the sweep exists to show
  * that trade as data). */
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

  test("a config that does not factor k is rejected") {
    intercept[IllegalArgumentException] {
      Dedup.bandSweep(corpus, k = 12, configs = Seq((5, 2)))
    }
  }
}
