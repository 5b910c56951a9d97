package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.queries.StatsQueries.relWithinTol

/** The approx-sketch queries' DuckDB oracle asserts a literal TRUE for the
  * within-tolerance boolean (the sketch is not replayable), so the oracle
  * cannot catch an inverted or trivially-true predicate. This spec feeds
  * deliberately-bad estimates through [[relWithinTol]] to prove it can go
  * FALSE — closing that gap (ADVICE round 2, item 1).
  */
class ApproxToleranceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def eval(approx: Double, exact: Double, tol: Double): Boolean =
    Seq((approx, exact)).toDF("approx", "exact")
      .select(relWithinTol(col("approx"), col("exact"), tol).as("ok"))
      .head().getBoolean(0)

  test("estimate inside the tolerance band passes") {
    assert(eval(approx = 1040.0, exact = 1000.0, tol = 0.05))
    assert(eval(approx = 960.0, exact = 1000.0, tol = 0.05))
  }

  test("estimate outside the tolerance band FAILS (predicate is not trivially true)") {
    assert(!eval(approx = 1100.0, exact = 1000.0, tol = 0.05))
    assert(!eval(approx = 890.0, exact = 1000.0, tol = 0.05))
    // Inverted-comparison canary: a wildly-off estimate must fail too.
    assert(!eval(approx = 0.0, exact = 1000.0, tol = 0.05))
  }

  test("boundary: exactly at tolerance passes, just beyond fails") {
    assert(eval(approx = 1050.0, exact = 1000.0, tol = 0.05))
    assert(!eval(approx = 1050.001, exact = 1000.0, tol = 0.05))
  }

  test("exact = 0 degrades to equality instead of ANSI div-by-zero") {
    assert(eval(approx = 0.0, exact = 0.0, tol = 0.05))
    assert(!eval(approx = 1.0, exact = 0.0, tol = 0.05))
  }

  test("negative exact is not trivially true (abs denominator)") {
    assert(!eval(approx = -890.0, exact = -1000.0, tol = 0.05))
    assert(eval(approx = -960.0, exact = -1000.0, tol = 0.05))
  }
}
