package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.Dataset
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.model.{KeyedFlagEvent, TimedDeposit}

/** State-store OPERATIONAL edges — the production lifecycle behaviors a
  * 100-TB streaming deployment leans on beyond plain recovery
  * (CheckpointRecoverySpec):
  *
  *  - RocksDB CHANGELOG checkpointing (the incremental-commit mode that
  *    replaces full-snapshot uploads with per-batch deltas — the setting
  *    large state actually runs under): state must survive a restart with
  *    it enabled, and the checkpoint must contain changelog files proving
  *    the mode engaged.
  *  - Stateful shuffle partitioning is FIXED AT FIRST CHECKPOINT: Spark
  *    keys state-store directories by partition id, so a later session
  *    with a different spark.sql.shuffle.partitions must keep running at
  *    the checkpointed width (documented constraint; re-scaling state
  *    means a new checkpoint + replay, which is why the engine sizes
  *    stream partitioning for target scale UP FRONT).
  */
class StateStoreOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def writeBatch(in: String, rows: Seq[TimedDeposit]): Unit =
    rows.toDS().repartition(1).write.mode("append").parquet(in)

  private def runDetectorOnce(in: String, out: String, ckpt: String): Unit = {
    val deposits = spark.readStream
      .schema("walletId STRING, amount DOUBLE, tsUnix LONG, seq LONG")
      .parquet(in).as[TimedDeposit]
    val q = DepositStreams.detector(spark, deposits)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[KeyedFlagEvent], _: Long) =>
        batch.write.mode("append").parquet(out)
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  test("changelog checkpointing: state survives restart and changelogs are written") {
    val root = Files.createTempDirectory("graft_ckpt_cl").toString
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val key = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      writeBatch(in, Seq(TimedDeposit("w1", 6000.0, 1000L, 1L)))
      runDetectorOnce(in, out, ckpt)
      writeBatch(in, Seq(TimedDeposit("w1", 5000.0, 1060L, 2L)))
      runDetectorOnce(in, out, ckpt)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    val events = spark.read.parquet(out).as[KeyedFlagEvent]
      .collect().sortBy(_.seq).toSeq
    // Same semantics as the snapshot-mode recovery spec: no replay, and
    // the open window carried across incarnations (11,000 >= threshold).
    assert(events.map(_.seq) == Seq(1L, 2L))
    assert(events.map(_.flagRemoved) == Seq(true, false))
    // The mode actually engaged: per-batch .changelog files exist under
    // the state store (snapshot-only mode writes .zip/.snapshot instead).
    val stateDir = new java.io.File(s"$ckpt/state")
    def findChangelogs(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(findChangelogs)
      else if (f.getName.endsWith(".changelog")) Seq(f) else Seq.empty
    assert(findChangelogs(stateDir).nonEmpty,
      s"no .changelog files under $stateDir — changelog mode did not engage")
  }

  test("stateful shuffle partitioning is pinned by the first checkpoint") {
    val root = Files.createTempDirectory("graft_ckpt_rescale").toString
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      writeBatch(in, Seq(TimedDeposit("w1", 6000.0, 1000L, 1L)))
      runDetectorOnce(in, out, ckpt)
      // Operator "re-scales" the session to 8 and restarts from the same
      // checkpoint: Spark must keep the stateful query at the
      // checkpointed width, NOT adopt the new conf (state is keyed by
      // partition id; silently re-hashing would orphan every row).
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      writeBatch(in, Seq(TimedDeposit("w1", 5000.0, 1060L, 2L)))
      runDetectorOnce(in, out, ckpt)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
    // Results are correct (the restart found every key's state where the
    // ORIGINAL partitioning put it)...
    val events = spark.read.parquet(out).as[KeyedFlagEvent]
      .collect().sortBy(_.seq).toSeq
    assert(events.map(_.seq) == Seq(1L, 2L))
    assert(events.map(_.flagRemoved) == Seq(true, false))
    // ...and the store stayed at width 4: operator 0's state directory
    // has exactly partitions 0..3, none were added for the new conf.
    val parts = new java.io.File(s"$ckpt/state/0").listFiles()
      .filter(f => f.isDirectory && f.getName.forall(_.isDigit))
      .map(_.getName).toSet
    assert(parts == Set("0", "1", "2", "3"),
      s"state partition dirs changed after conf rescale: $parts")
  }
}
