package graft.operators

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Small-file compaction: many tiny appended files collapse to the
  * byte-budgeted count, no row lost or duplicated, and the swap is
  * commit-gated (staging `_SUCCESS` before the old dir is removed).
  */
class MaintenanceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("compactParquet merges a small-file tail and preserves every row") {
    val dir = s"${Files.createTempDirectory("graft_compact").toString}/t"
    // 20 single-file appends — the streaming-sink shape.
    (0 until 20).foreach { i =>
      Seq.tabulate(50)(j => (i.toLong * 50 + j, s"row_${i}_$j"))
        .toDF("id", "payload").repartition(1)
        .write.mode("append").parquet(dir)
    }
    val beforeRows = spark.read.parquet(dir).orderBy("id").collect().toSeq
    assert(beforeRows.size == 1000)

    val (nBefore, nAfter) = Maintenance.compactParquet(spark, dir,
      targetFileBytes = 1L * 1024 * 1024)
    assert(nBefore == 20)
    // 20 tiny files total well under 1 MiB -> exactly one output file.
    assert(nAfter == 1)

    val afterRows = spark.read.parquet(dir).orderBy("id").collect().toSeq
    assert(afterRows == beforeRows)
  }

  test("target smaller than total bytes yields multiple evenly-counted files") {
    val dir = s"${Files.createTempDirectory("graft_compact2").toString}/t"
    (0 until 8).foreach { i =>
      Seq.tabulate(500)(j => (i.toLong * 500 + j, "x" * 100))
        .toDF("id", "payload").repartition(1)
        .write.mode("append").parquet(dir)
    }
    val total = spark.read.parquet(dir).count()
    val (_, nAfter) = Maintenance.compactParquet(spark, dir,
      targetFileBytes = 8 * 1024)
    assert(nAfter > 1)
    assert(spark.read.parquet(dir).count() == total)
  }
}
