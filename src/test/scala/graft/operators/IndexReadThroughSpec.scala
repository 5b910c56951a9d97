package graft.operators

import java.io.File
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}
import graft.queries.{DedupQueries, SimilarityQueries}

/** Pins the read-through contract of the served-index queries: after the
  * in-memory path slots are force-cleared (driver cache eviction), the next
  * serve must re-discover the persisted parquet artifact by its recorded
  * fingerprint and NOT rebuild it — the artifact files' mtimes are the
  * witness (a rebuild rewrites them). */
class IndexReadThroughSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def artifactState(root: File): Map[String, Long] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(root).map(f => f.getPath -> f.lastModified()).toMap
  }

  private def run(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq

  test("sim_ivf_served survives a forced cache clear without retraining") {
    val first = run("sim_ivf_served")
    // The artifact dir is deterministic per sf dir inside the JVM's index
    // root; find it via a second resolve after the build.
    val idxDirs = new File(System.getProperty("java.io.tmpdir")).listFiles()
      .filter(_.getName.startsWith("graft_annidx_"))
    assert(idxDirs.nonEmpty, "no ANN index root created")
    val before = idxDirs.map(artifactState).reduce(_ ++ _)
    assert(before.nonEmpty, "no IVF artifact persisted")

    SimilarityQueries.invalidateIndexPathCache()
    val second = run("sim_ivf_served")

    val after = idxDirs.map(artifactState).reduce(_ ++ _)
    assert(after == before,
      "cache clear triggered an index rebuild (artifact files changed)")
    assert(second == first, "served results changed across the cache clear")
  }

  test("dedup_lsh_served survives a forced cache clear without re-shingling") {
    val first = run("dedup_lsh_served")
    val idxDirs = new File(System.getProperty("java.io.tmpdir")).listFiles()
      .filter(_.getName.startsWith("graft_lshidx_"))
    assert(idxDirs.nonEmpty, "no LSH index root created")
    val before = idxDirs.map(artifactState).reduce(_ ++ _)
    assert(before.nonEmpty, "no LSH artifact persisted")

    DedupQueries.invalidateIndexPathCache()
    val second = run("dedup_lsh_served")

    val after = idxDirs.map(artifactState).reduce(_ ++ _)
    assert(after == before,
      "cache clear triggered an index rebuild (artifact files changed)")
    assert(second == first, "served results changed across the cache clear")
  }
}
