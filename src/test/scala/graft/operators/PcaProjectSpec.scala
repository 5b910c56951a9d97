package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.sources.Tables

/** Top-PC projection: the model trains once (exact-integer covariance
  * moments + grid-snapped power iterations), persists read-through, and the
  * projection must be deterministic and non-degenerate. The exactness
  * contract is weaker than the rerank kernels' (PCA has no brute-force
  * twin) — what must hold is bit-stable replay, which the DuckDB oracle
  * pins value-for-value and these tests pin across cache tiers.
  */
class PcaProjectSpec extends AnyFunSuite with SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables.embeddings(spark, dir)

  private def proj(): Seq[(Long, Double)] =
    Similarity.pcaProject(emb, iters = 3).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq.sortBy(_._1)

  test("projection is deterministic run-to-run") {
    assert(proj() == proj())
  }

  test("projection is identical after a model-cache clear (disk read-through)") {
    val first = proj()
    Similarity.invalidateModelCache()
    assert(proj() == first,
      "pca projection changed across the model-cache clear")
  }

  test("projection is non-degenerate and captures spread") {
    val ps = proj().map(_._2)
    assert(ps.distinct.size > ps.size / 2, "projection collapsed to few values")
    val mean = ps.sum / ps.size
    val variance = ps.map(x => (x - mean) * (x - mean)).sum / ps.size
    // The dominant direction of 64-dim uniform-ish vectors must carry at
    // least coordinate-scale variance (each coordinate has ~1/12 · span²).
    assert(variance > 1e-4, s"pc1 variance $variance suspiciously small")
  }
}
