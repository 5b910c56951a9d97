package graft.operators

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.sources.Tables

/** Data-quality counters via the Observation API: metrics ride the main
  * action (accumulator-backed, merged per-task) instead of a second scan —
  * at 100 TB a `.count()` re-read for monitoring doubles the job; observe()
  * is free. The pipeline shape mirrored here is the capstone clean-corpus
  * gate: count rows in/kept and the reject tally in one pass.
  */
class ObservationSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("observe() yields row/reject counters from the single pass") {
    val obs = Observation("quality_gate")
    val docs = Tables.documents(spark, sf)
      .observe(obs,
        count(lit(1)).as("rows_in"),
        sum(when(col("n_chars") < 10, 1).otherwise(0)).as("too_short"),
        sum(when(col("lang").isNull, 1).otherwise(0)).as("no_lang"))
      .filter(col("n_chars") >= 10)
    val kept = docs.count()

    val m = obs.get
    val rowsIn = m("rows_in").asInstanceOf[Long]
    val tooShort = m("too_short").asInstanceOf[Long]
    assert(rowsIn > 0)
    assert(m("no_lang").asInstanceOf[Long] === 0L)
    // The observed reject tally must reconcile exactly with the kept count.
    assert(kept === rowsIn - tooShort)
  }
}
