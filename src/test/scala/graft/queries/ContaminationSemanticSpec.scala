package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.operators.Similarity
import graft.sources.Tables

/** Pins for the semantic-contamination census: the served (IVF-probed)
  * radius scan must be a strict SUBSET of the exact radius scan — an
  * approximate index may miss hits (recall), but a hit it reports must
  * be real (no false positives) — and the census must account for every
  * benchmark item exactly once, clean items included.
  */
class ContaminationSemanticSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("served contamination hits are a subset of the exact radius scan") {
    val emb = Tables.embeddings(spark, sf)
    val path = SimilarityQueries.servedIndexPath(spark, sf)
    val served = Similarity.semanticContamination(emb, benchMod = 37,
      minCosine = 0.35, nProbe = 2, indexPath = path)

    // Exact ground truth: brute-force radius scan from the same
    // benchmark set, restricted to non-benchmark neighbors.
    val exact = Similarity.rangeSearch(emb,
        emb.filter(col("vec_id") % 37 === 0), minCosine = 0.35)
      .where(col("nid") % 37 =!= 0)
      .select(col("qid"), col("nid").as("top_nid"), col("cosine"))
      .collect()
    val exactPairs = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactCount = exact.groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.length }

    val rows = served.collect()
    // Census completeness: one row per benchmark item, flags coherent.
    val benchIds = emb.filter(col("vec_id") % 37 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet === benchIds)
    rows.foreach { r =>
      val (qid, nHits, contaminated) = (r.getLong(0), r.getLong(1), r.getBoolean(2))
      assert(contaminated === (nHits > 0L), s"flag/count mismatch at $qid")
      assert(contaminated === !r.isNullAt(3) && contaminated === !r.isNullAt(4),
        s"clean rows must carry null top columns at $qid")
      // Recall can lose hits to unprobed cells, never invent them.
      assert(nHits <= exactCount.getOrElse(qid, 0),
        s"served n_hits $nHits exceeds exact at $qid")
      if (contaminated)
        assert(exactPairs.contains((qid, r.getLong(3))),
          s"served top hit (${r.getLong(3)}) not in the exact radius set at $qid")
    }
    // Non-degenerate on this corpus: both contaminated and clean rows.
    assert(rows.exists(_.getBoolean(2)) && rows.exists(!_.getBoolean(2)))
  }
}
