package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** The curriculum SCHEDULE's semantic properties — things the oracle's
  * value hash implies but a reader shouldn't have to derive: the pacing
  * must admit every document exactly once, fill all phases, and be a
  * true easy→hard curriculum (per-phase mean difficulty strictly
  * increasing, per-phase max non-decreasing). The sqrt-competence law
  * also fixes the cumulative admission fraction at each phase boundary:
  * after phase p, exactly ⌊N·√(p/10)⌋ documents are admissible
  * (rank r is in phases ≤ p iff 10·r² ≤ p·N², i.e. r ≤ N·√(p/10)) —
  * checked exactly, not approximately. */
class CurriculumSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val rows =
    SparkEntry.queries("pipeline_curriculum")(spark, sf)
      .orderBy(col("phase")).collect()

  test("all 10 phases present; admissions partition the corpus exactly once") {
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum == n)
    assert(rows.last.getLong(4) == n) // cum_docs reaches N
  }

  test("the schedule is a curriculum: mean difficulty strictly increases") {
    val avg = rows.map(_.getDouble(2))
    avg.zip(avg.drop(1)).foreach { case (a, b) =>
      assert(a < b, s"avg_len not increasing: $a !< $b")
    }
    val mx = rows.map(_.getLong(3))
    mx.zip(mx.drop(1)).foreach { case (a, b) =>
      assert(a <= b, s"max_len decreased: $a > $b")
    }
  }

  test("sqrt-competence pacing: cumulative admissions hit floor(N*sqrt(p/10))") {
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    rows.foreach { r =>
      val p = r.getLong(0); val cum = r.getLong(4)
      // Exact integer boundary: rank r admits by phase p iff 10r^2 <= pN^2
      // (float sqrt could be off by one at perfect-square boundaries).
      var want = math.sqrt(p * n * n / 10.0).toLong
      while (10 * (want + 1) * (want + 1) <= p * n * n) want += 1
      while (want > 0 && 10 * want * want > p * n * n) want -= 1
      assert(cum == want, s"phase $p: cum $cum != |{r : 10r^2 <= pN^2}| = $want")
    }
  }
}
