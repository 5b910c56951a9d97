package graft.streaming

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.model._

/** End-to-end Structured Streaming scenarios (FIXTURES.md §B) through
  * MemoryStream → stateful processor → memory sink, the test analog of
  * Kafka topic → Goka processor → changelog table. */
class DepositStreamsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  private val n = new AtomicInteger(0)
  private def freshName = s"sink_${n.incrementAndGet()}"

  /** Run the detector over timed-deposit batches; returns all emitted flag
    * events (append mode retains every event, like the flag_wallet topic). */
  private def runDetector(batches: Seq[TimedDeposit]*): Seq[KeyedFlagEvent] = {
    val input = MemoryStream[TimedDeposit]
    val name = freshName
    val q = DepositStreams.detector(spark, input.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    val out = spark.table(name).as[KeyedFlagEvent].collect().toSeq
    q.stop()
    out.sortBy(_.seq)
  }

  private def runCollector(batches: Seq[TimedDeposit]*): Seq[DepositStreams.BalanceRow] = {
    val input = MemoryStream[TimedDeposit]
    val name = freshName
    val q = DepositStreams.collector(spark, input.toDS())
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    val out = spark.table(name).as[DepositStreams.BalanceRow].collect().toSeq
    q.stop()
    // Latest state row per wallet = the one with the most deposits.
    out.groupBy(_.walletId).values.map(_.maxBy(_.nDeposits)).toSeq
  }

  private def runFlagger(events: Seq[KeyedFlagEvent]): Seq[DepositStreams.FlagRow] = {
    val input = MemoryStream[KeyedFlagEvent]
    val name = freshName
    val q = DepositStreams.flagger(spark, input.toDS())
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    input.addData(events)
    q.processAllAvailable()
    val out = spark.table(name).as[DepositStreams.FlagRow].collect().toSeq
    q.stop()
    out
  }

  test("happy path: 2,000 then 9,000 within 120 s flags; balance 11,000") {
    val deposits = Seq(TimedDeposit("w1", 2000.0, 1000L, 1L), TimedDeposit("w1", 9000.0, 1060L, 2L))
    val evs = runDetector(deposits)
    assert(evs.map(_.flagRemoved) == Seq(true, false))
    val flags = runFlagger(evs)
    // The flag event carries the window-open time (t=1000), which the
    // flagger stores (flagger.go:49-55).
    assert(flags == Seq(DepositStreams.FlagRow("w1", flagged = true, 1000L)))
    val bal = runCollector(deposits)
    assert(bal == Seq(DepositStreams.BalanceRow("w1", 2L, 11000.0)))
  }

  test("boundary: cumulative exactly 10,000 flags (>=)") {
    val evs = runDetector(Seq(TimedDeposit("w2", 4000.0, 1000L, 1L), TimedDeposit("w2", 6000.0, 1010L, 2L)))
    assert(evs.map(_.flagRemoved) == Seq(true, false))
  }

  test("reset-discard quirk across micro-batches: second deposit at t=130 is dropped") {
    val evs = runDetector(
      Seq(TimedDeposit("w3", 9000.0, 1000L, 1L)),
      Seq(TimedDeposit("w3", 9000.0, 1130L, 2L)))
    assert(evs.map(_.flagRemoved) == Seq(true, true))
    val bal = runCollector(
      Seq(TimedDeposit("w3", 9000.0, 1000L, 1L)),
      Seq(TimedDeposit("w3", 9000.0, 1130L, 2L)))
    assert(bal.head.balance == 18000.0) // history keeps both; only the counter resets
  }

  test("manual flag (O11) is overwritten by the next detector unflag — LWW") {
    val manual = KeyedFlagEvent("w4", flagRemoved = false, 0L, seq = 100L)
    val detectorUnflag = KeyedFlagEvent("w4", flagRemoved = true, 0L, seq = 200L)
    val flags = runFlagger(Seq(manual, detectorUnflag))
    assert(flags == Seq(DepositStreams.FlagRow("w4", flagged = false, 0L)))
  }

  test("unknown wallet: zero balance, not flagged (SURVEY §2.3.6)") {
    val (id, bal, flagged) = DepositStreams.check(spark,
      spark.emptyDataset[DepositStreams.BalanceRow],
      spark.emptyDataset[DepositStreams.FlagRow], "ghost")
    assert((id, bal, flagged) == (("ghost", 0.0, false)))
  }

  test("streaming detector == pure state machine under arbitrary batch splits") {
    val rnd = new scala.util.Random(7)
    var t = 1000L
    val deposits = (1 to 40).map { i =>
      t += rnd.nextInt(100)
      TimedDeposit("w5", rnd.nextInt(7000).toDouble, t, i.toLong)
    }
    // Split into random micro-batches (state must carry across batches).
    val batches = scala.collection.mutable.ArrayBuffer[Seq[TimedDeposit]]()
    var rest = deposits.toSeq
    while (rest.nonEmpty) {
      val take = 1 + rnd.nextInt(7)
      batches += rest.take(take)
      rest = rest.drop(take)
    }
    val streamed = runDetector(batches.toSeq: _*)
    val (_, expected) = DetectorLogic.run(deposits.map(d => (d.amount, d.tsUnix)))
    assert(streamed.map(_.flagRemoved) == expected.map(_.flagRemoved))
  }
}
