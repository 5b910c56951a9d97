package graft.queries

import java.util.UUID
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.Q
import graft.model.TimedDeposit
import graft.sources.Tables
import graft.streaming.{CollectorProcessor, DepositStreams, DetectorLogic, DetectorProcessor}

/** The REAL Structured Streaming pipeline (MemoryStream → detector →
  * flagger + collector, two chained streaming queries exactly like the
  * reference's Kafka-linked processors) run under the driver's correctness
  * contract: the DuckDB oracle replays the same per-wallet sequential state
  * machine as a `list_reduce` fold over the time-ordered deposit list.
  * This makes the processing-time state machine itself — reset-discard
  * quirk included — hash-checked against an independent implementation.
  *
  * The MemoryStream feed collects the input to the driver first: that is
  * the TEST harness shape (bounded replay); production is `readStream`
  * from Kafka with identical downstream operators.
  */
object StreamQueries {

  private def streamCheck(s: SparkSession, dir: String, windowSec: Long,
                          threshold: Double,
                          useTws: Boolean = false): DataFrame = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val deposits = Tables.events(s, dir)
      .filter(col("value") > 0)
      .select(
        col("user_id").cast("string").as("walletId"),
        col("value").as("amount"),
        expr("unix_micros(ts) div 1000000").as("tsUnix"),
        col("event_id").as("seq"))
      .as[TimedDeposit]
      .collect()

    def unique = s"stream_${UUID.randomUUID().toString.replace("-", "")}"

    // Hop 1: deposits → detector → flag events (append, like flag_wallet).
    val in1 = MemoryStream[TimedDeposit]
    val detName = unique
    val detected =
      if (useTws) DetectorProcessor.detect(s, in1.toDS(), windowSec, threshold)
      else DepositStreams.detector(s, in1.toDS(), windowSec, threshold)
    val q1 = detected
      .writeStream.format("memory").queryName(detName).outputMode("append").start()
    in1.addData(deposits.toSeq)
    q1.processAllAvailable(); q1.stop()
    val flagEvents = s.table(detName)
      .as[graft.model.KeyedFlagEvent].collect()

    // Hop 2: flag events → flagger (LWW state, update mode).
    val in2 = MemoryStream[graft.model.KeyedFlagEvent]
    val flagName = unique
    val q2 = DepositStreams.flagger(s, in2.toDS())
      .writeStream.format("memory").queryName(flagName).outputMode("update").start()
    in2.addData(flagEvents.toSeq)
    q2.processAllAvailable(); q2.stop()
    val flags = s.table(flagName)
      .select(col("walletId").cast("long").as("wallet_id"),
        col("flagged").as("above_threshold"))

    // Collector on its own query (balance table). The tws variant runs the
    // ListState append-only processor — same oracle, zero history rewrite.
    val in3 = MemoryStream[TimedDeposit]
    val balName = unique
    val collected =
      if (useTws) CollectorProcessor.collect(s, in3.toDS())
      else DepositStreams.collector(s, in3.toDS())
    val q3 = collected
      .writeStream.format("memory").queryName(balName).outputMode("update").start()
    in3.addData(deposits.toSeq)
    q3.processAllAvailable(); q3.stop()
    val balances = s.table(balName)
      .select(col("walletId").cast("long").as("wallet_id"),
        round(col("balance"), 2).as("balance"))

    balances.join(flags, Seq("wallet_id"), "left_outer")
      .select(col("wallet_id"), col("balance"),
        coalesce(col("above_threshold"), lit(false)).as("above_threshold"))
      .orderBy(col("wallet_id"))
  }

  /** DuckDB replay of the detector state machine, iterated as a recursive
    * CTE: step k joins each wallet's k-th event (by (tsec, seq)) onto its
    * state row. (A `list_reduce` fold would be more direct, but DuckDB
    * v1.0.0 miscomputes struct-state list_reduce when the query processes
    * many rows at once — verified: the same fold is correct on a
    * single-wallet slice and wrong multi-row — so the oracle avoids it.) */
  private def checkSql(windowSec: Long, threshold: Double): String = {
    val next =
      s"CASE WHEN s.st = 0 THEN d.tsec WHEN d.tsec - s.st > $windowSec THEN 0 ELSE s.st END"
    val recv =
      s"CASE WHEN s.st <> 0 AND d.tsec - s.st > $windowSec THEN 0.0 ELSE s.rc + d.amount END"
    "WITH RECURSIVE dd AS (SELECT user_id AS wallet_id, epoch_us(ts) // 1000000 AS tsec, " +
      "event_id AS seq, value AS amount FROM events WHERE value > 0), " +
      "d AS (SELECT wallet_id, tsec, amount, " +
      "ROW_NUMBER() OVER (PARTITION BY wallet_id ORDER BY tsec, seq) AS rn, " +
      "COUNT(*) OVER (PARTITION BY wallet_id) AS n FROM dd), " +
      "s AS (" +
      "SELECT wallet_id, CAST(0 AS BIGINT) AS st, CAST(0.0 AS DOUBLE) AS rc, " +
      "true AS fr, CAST(0 AS BIGINT) AS rn, n FROM (SELECT DISTINCT wallet_id, n FROM d) " +
      "UNION ALL " +
      s"SELECT s.wallet_id, CAST($next AS BIGINT), $recv, " +
      s"NOT (($recv) >= $threshold AND ($next) <> 0), s.rn + 1, s.n " +
      "FROM s JOIN d ON d.wallet_id = s.wallet_id AND d.rn = s.rn + 1), " +
      "b AS (SELECT wallet_id, ROUND(SUM(amount), 2) AS balance FROM dd GROUP BY wallet_id), " +
      "f AS (SELECT wallet_id, NOT fr AS above_threshold FROM s WHERE rn = n) " +
      "SELECT b.wallet_id, b.balance, COALESCE(f.above_threshold, FALSE) AS above_threshold " +
      "FROM b LEFT JOIN f USING (wallet_id) ORDER BY wallet_id"
  }

  val all: Seq[Q] = Seq(
    // Reference constants: 120 s window, threshold 10,000 (detector.go:16-17).
    Q("stream_check", checkSql(DetectorLogic.RollingPeriodSec, DetectorLogic.MaxAmount)) {
      (s, d) => streamCheck(s, d, DetectorLogic.RollingPeriodSec, DetectorLogic.MaxAmount)
    },
    // Tuned so verdicts vary on the synthetic feed (1-day window, 300).
    Q("stream_check_tuned", checkSql(86400L, 300.0)) {
      (s, d) => streamCheck(s, d, 86400L, 300.0)
    },
    // Same tuned pipeline through the Spark 4 transformWithState detector
    // (StatefulProcessor + RocksDB state store) — must match the same
    // oracle as the flatMapGroupsWithState form.
    Q("stream_check_tws", checkSql(86400L, 300.0)) {
      (s, d) => streamCheck(s, d, 86400L, 300.0, useTws = true)
    }
  )
}
