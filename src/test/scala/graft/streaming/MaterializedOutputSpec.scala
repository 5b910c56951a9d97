package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.SparkEntry

/** Round-7 lifecycle contract of the stream harness: a topology is stood
  * up once per (query, feed); re-invocation performs the feed-fingerprint
  * catch-up check and serves the SAME rows from the materialized output
  * table; invalidation forces a fresh topology that reproduces them.
  */
class MaterializedOutputSpec extends AnyFunSuite with SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, dir)
      .collect().map(_.toString).toSeq

  test("materialized serve returns identical rows, and survives invalidation") {
    val first = rows("stream_check")
    assert(first.nonEmpty)
    val served = rows("stream_check") // cache path (same JVM, same feed)
    assert(served == first)
    graft.queries.StreamQueries.invalidateMaterialized()
    val fresh = rows("stream_check") // full topology again
    assert(fresh == first)
  }

  test("chunked replay matches the single-batch pipeline row-for-row") {
    // Same oracle by construction; assert engine-side too (different
    // feeds, different batch structure, same state-machine fold).
    assert(rows("stream_check_chunked") == rows("stream_check"))
  }
}
