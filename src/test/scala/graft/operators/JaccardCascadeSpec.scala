package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.sources.Tables

/** Round-12 layered artifact cascade for the char-jaccard family: the
  * VERIFIED pair list persists read-through over the CANDIDATE list,
  * which persists over the shingle/prefix tables. Whatever layer a run
  * resolves at — pairs hit, pairs miss + cands hit, or fully inline (an
  * in-memory corpus has no files, so no cache key exists) — the emitted
  * rows must be identical. Guards the cascade added with `char8_pairs`:
  * a stale or deleted upper layer must REBUILD from the layer below,
  * never change results.
  *
  * The corpus is a filtered slice of sf0.001 documents so its content
  * fingerprint (and therefore every artifact path) is disjoint from any
  * other suite running in the same JVM.
  */
class JaccardCascadeSpec extends AnyFunSuite with SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def corpus = Tables.documents(spark, dir)
    .where(col("doc_id") % 3 =!= 2)

  private def run(): Seq[org.apache.spark.sql.Row] =
    Dedup.charJaccardPairs(corpus, k = 8, maxDiff = 10, threshold = 0.4)
      .orderBy(col("id_a"), col("id_b")).collect().toSeq

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmTree)
    f.delete()
  }

  test("pairs-served, cands-rebuilt, and inline paths emit identical rows") {
    val first = run()  // cold: builds every layer
    assert(first.nonEmpty, "fixture produced no near-dup pairs")
    assert(first == run(), "pairs-artifact serve diverged from its build")

    // Drop ONLY the pairs artifact: the next run must rebuild it from
    // the persisted candidate list and reproduce the same rows.
    val fp = Dedup.docFp(corpus)
    val pairsDir = new java.io.File(IndexCache.path("char8_pairs", "k8d10t0.4", fp))
    assert(pairsDir.isDirectory, s"expected pairs artifact at $pairsDir")
    rmTree(pairsDir)
    assert(first == run(), "rebuild-from-candidates diverged from the original build")

    // Fully inline reference: the same data as an in-memory relation has
    // no input files, so no cache key — the kernel runs end-to-end live.
    val rows = corpus.collect().toSeq
    val mem = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), corpus.schema)
    val inline = Dedup.charJaccardPairs(mem, k = 8, maxDiff = 10, threshold = 0.4)
      .orderBy(col("id_a"), col("id_b")).collect().toSeq
    assert(first == inline, "artifact cascade diverged from the inline path")
  }
}
