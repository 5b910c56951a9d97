package graft.operators

import java.io.File
import org.apache.spark.sql.SparkSession

/** Table-maintenance operators. At 100 TB the small-files problem is an
  * operational certainty — every streaming file sink, hourly batch
  * append, and over-partitioned shuffle write leaves a long tail of
  * KB-sized parquet files whose per-file open/footer cost eventually
  * dominates scan time and whose listing cost dominates planning.
  */
object Maintenance {

  /** Compact a parquet directory to ~`targetFileBytes` output files:
    * sizes the output file count from the directory's ACTUAL bytes
    * (never a guessed constant), rewrites via a staging directory, and
    * preserves every row. The rewrite is `repartition(n)` (round-robin)
    * — full-shuffle rather than `coalesce`, because coalesce(n) would
    * collapse the PARALLELISM of the rewrite itself to n tasks and
    * produce skewed files when input files vary in size; the shuffle
    * cost is the price of evenly-sized output, which is the point of
    * compaction.
    *
    * Crash safety: the swap is rename-aside (dir → dir_pre_compact),
    * staging → dir, THEN delete the aside copy — at no point is the
    * data deletable-only-in-staging, so a crash between any two steps
    * leaves a complete copy recoverable by a rename. PRECONDITION: no
    * concurrent writer on `dir` — a file appended after the staging
    * read would be lost in the swap. Compact partitions the writer has
    * finished with (e.g. closed hourly/daily dirs), exactly as
    * production table services schedule it.
    *
    * PRECONDITION (validated): `dir` is a FLAT LOCAL directory of
    * parquet files — one leaf partition of a table, which is the unit
    * production compaction works on. Hive-partitioned roots (subdirs)
    * are rejected rather than silently mis-sized, and the rename-aside
    * swap relies on same-filesystem `File.renameTo`, so remote/URI
    * paths are rejected too. Compact a partitioned table by calling
    * this per leaf directory.
    *
    * Returns (filesBefore, filesAfter).
    */
  def compactParquet(spark: SparkSession, dir: String,
                     targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(!dir.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:.*"),
      s"compactParquet needs a local filesystem path, got URI: $dir")
    require(
      !Option(new File(dir).listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        .exists(f => f.isDirectory && !f.getName.startsWith("_")),
      s"$dir has subdirectories — compact per leaf partition dir, not the table root")
    def parquetFiles(d: String): Seq[File] = {
      val all = Option(new File(d).listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      all.filter(f => f.isFile && f.getName.endsWith(".parquet"))
    }
    // Stale-aside check FIRST: discovering a half-finished previous
    // compaction only after re-reading and re-writing the whole table
    // would waste the full rewrite and orphan a second staging dir.
    val aside = new File(s"${dir}_pre_compact")
    require(!aside.exists(), s"$aside exists — previous compaction did not finish; recover manually")

    val before = parquetFiles(dir)
    require(before.nonEmpty, s"no parquet files under $dir")
    val totalBytes = before.map(_.length()).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)

    val staging = s"${dir}_compact_staging"
    spark.read.parquet(dir).repartition(n)
      .write.mode("overwrite").parquet(staging)
    require(new File(staging, "_SUCCESS").exists(), "staging write did not commit")
    require(new File(dir).renameTo(aside), s"rename $dir -> $aside failed")
    require(new File(staging).renameTo(new File(dir)), s"rename $staging -> $dir failed")
    deleteRecursively(aside)
    (before.size, parquetFiles(dir).size)
  }

  /** Recursive delete (symlink-free local trees). Shared by the stream
    * harness's work-dir cleanup. */
  def deleteRecursively(f: File): Unit = {
    val kids = f.listFiles(); if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
