package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.sources.Tables

/** Round-13 DSIR compaction: folding a batch into the history's count
  * artifact (union of sufficient statistics, no history re-read) must
  * produce EXACTLY the rows the full-corpus served path produces for the
  * same batch — the additivity claim as a pinned equality, not prose.
  */
class DsirCompactionSpec extends AnyFunSuite with SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private val isTarget = col("doc_id") % 7 === 0
  private val inBatch = col("doc_id") % 10 === 3

  test("compacted (history artifact + batch fold) == served (full corpus)") {
    val docs = Tables.documents(spark, dir)
    val served = Corpus.dsirServed(docs, buckets = 128, isTarget, inBatch)
      .orderBy(col("doc_id")).collect().toSeq
    val compacted = Corpus.dsirCompacted(docs, buckets = 128, isTarget,
        inBatch)
      .orderBy(col("doc_id")).collect().toSeq
    assert(compacted.nonEmpty)
    assert(compacted == served)
  }
}
