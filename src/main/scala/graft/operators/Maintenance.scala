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
                     targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) =
    rewriteStaged(spark, dir, targetFileBytes)((df, n) => df.repartition(n))

  /** Sort-clustered in-place rewrite — compaction AND clustering in one
    * maintenance pass (what lakehouse OPTIMIZE does). The rewrite is
    * `repartitionByRange(n, keys)` + `sortWithinPartitions(keys)`, so
    * output files carry DISJOINT key ranges and parquet footer min/max
    * stats become selective: a point or range predicate on the cluster
    * key skips whole files/row groups instead of scanning them. At
    * 100 TB this is the difference between a keyed query reading one
    * file and reading the table — min/max stats on randomly-laid-out
    * data prune nothing because every file spans the full key range.
    *
    * Same precondition and crash-safe staged swap as [[compactParquet]].
    */
  def clusterParquet(spark: SparkSession, dir: String, sortCols: Seq[String],
                     targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(sortCols.nonEmpty, "clusterParquet needs at least one sort column")
    rewriteStaged(spark, dir, targetFileBytes) { (df, n) =>
      val keys = sortCols.map(df.col)
      df.repartitionByRange(n, keys: _*).sortWithinPartitions(keys: _*)
    }
  }

  /** [[clusterParquet]] with a DERIVED cluster key (e.g. a Morton
    * `zorder2(a, b)` code for multi-dimensional locality — see
    * [[graft.plans.ZOrderLong]]). The key column is materialized for the
    * range shuffle + sort and dropped before the write, so the stored
    * schema is unchanged; only the row layout moves.
    */
  def clusterParquetByKey(spark: SparkSession, dir: String,
                          key: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Column,
                          targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) =
    rewriteStaged(spark, dir, targetFileBytes) { (df, n) =>
      val keyed = df.withColumn("__graft_ckey", key(df))
      keyed.repartitionByRange(n, keyed.col("__graft_ckey"))
        .sortWithinPartitions("__graft_ckey")
        .drop("__graft_ckey")
    }

  /** Shared staged in-place parquet rewrite: validates the flat-local-dir
    * precondition, sizes the output file count from ACTUAL bytes, applies
    * `rewrite(df, n)`, and swaps via rename-aside (dir → dir_pre_compact,
    * staging → dir, then delete aside) — at no point is the data only in
    * a deletable staging copy. PRECONDITION: no concurrent writer on
    * `dir` (a file appended after the staging read is lost in the swap).
    */
  private def rewriteStaged(spark: SparkSession, dir: String, targetFileBytes: Long)(
      rewrite: (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame): (Int, Int) = {
    require(!dir.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:.*"),
      s"staged rewrite needs a local filesystem path, got URI: $dir")
    require(
      !Option(new File(dir).listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        .exists(f => f.isDirectory && !f.getName.startsWith("_")),
      s"$dir has subdirectories — rewrite per leaf partition dir, not the table root")
    def parquetFiles(d: String): Seq[File] = {
      val all = Option(new File(d).listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      all.filter(f => f.isFile && f.getName.endsWith(".parquet"))
    }
    // Stale-aside check FIRST: discovering a half-finished previous
    // rewrite only after re-reading and re-writing the whole table
    // would waste the full rewrite and orphan a second staging dir.
    val aside = new File(s"${dir}_pre_compact")
    require(!aside.exists(), s"$aside exists — previous rewrite did not finish; recover manually")

    val before = parquetFiles(dir)
    require(before.nonEmpty, s"no parquet files under $dir")
    val totalBytes = before.map(_.length()).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)

    val staging = s"${dir}_compact_staging"
    rewrite(spark.read.parquet(dir), n)
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
