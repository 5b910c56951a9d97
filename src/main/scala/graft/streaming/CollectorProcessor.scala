package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions.{col, timestamp_seconds}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import graft.model.{Deposit, TimedDeposit}
import graft.streaming.DepositStreams.BalanceRow

/** The collector (O3, per-key append history — collector.go:17-29) as a
  * Spark 4 `StatefulProcessor` with `ListState`: the append-only form of
  * [[DepositStreams.collector]]'s `mapGroupsWithState` wiring.
  *
  * Why this is the 100-TB form: `mapGroupsWithState` re-serializes the
  * WHOLE `DepositHistory` on every update — O(history) write amplification
  * per deposit, O(n²) over a wallet's lifetime on unbounded reference-
  * parity state. `ListState.appendValue` writes only the new element
  * (RocksDB merge operand), and the running (count, total) lives in a
  * separate 16-byte `ValueState`, so serving the balance never re-reads
  * the history at all — the reference computes balance at read time by
  * summing the full array (service.go:136-140); the running total is the
  * same value maintained incrementally.
  *
  * State growth (SURVEY §2.3.5): the reference keeps every wallet's full
  * history forever (collector.go has no eviction) — PARITY is the default
  * here (`TTLConfig.NONE`, no timers). Opt-in bounded-state HYGIENE, same
  * two paths as [[DetectorProcessor]]:
  *
  *  - `ttl` — processing-time [[TTLConfig]] applied to both the history
  *    list and the running balance (wall-clock idleness, RocksDB TTL
  *    compaction; not deterministically testable);
  *  - `idleTtlSec` — event-time eviction via timers: each input re-arms a
  *    per-key timer at `lastEventTime + idleTtlSec`; when the watermark
  *    passes it, history + running balance are cleared and a ZERO-VALUE
  *    row (n=0, balance=0) is emitted — exactly the unknown-wallet serve
  *    semantics (§2.3.6: absent = {0, false}), so a downstream balance
  *    table converges to what a fresh lookup would return. Deterministic
  *    under replay; spec'd in `StateTtlSpec`. Unlike the detector there
  *    is no semantic precondition on the TTL length: an evicted history
  *    simply restarts, which is the retention policy the operator opted
  *    into (the balance is a sum over RETAINED history, as in the
  *    reference's read path).
  */
class CollectorProcessor(ttl: TTLConfig = TTLConfig.NONE,
                         idleTtlSec: Option[Long] = None)
    extends StatefulProcessor[String, TimedDeposit, BalanceRow] {
  import CollectorProcessor.RunningBalance

  @transient private var history: ListState[Deposit] = _
  @transient private var running: ValueState[RunningBalance] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    history = getHandle.getListState[Deposit](
      "history", Encoders.product[Deposit], ttl)
    running = getHandle.getValueState[RunningBalance](
      "running", Encoders.product[RunningBalance], ttl)
  }

  override def handleInputRows(key: String, rows: Iterator[TimedDeposit],
                               timerValues: TimerValues): Iterator[BalanceRow] = {
    val sorted = rows.toSeq.sortBy(d => (d.tsUnix, d.seq))
    var st = Option(running.get()).getOrElse(RunningBalance(0L, 0.0))
    sorted.foreach { d =>
      history.appendValue(Deposit(key, d.amount)) // append-only: no rewrite
      st = RunningBalance(st.n + 1, st.total + d.amount)
    }
    running.update(st)
    idleTtlSec.foreach { ttlSec =>
      // Re-arm the idle timer: one live timer per key at MAX-event-time +
      // TTL. The max is against the existing deadline, not just this
      // batch's events: a late-but-valid row (inside the watermark delay)
      // must never move the eviction deadline BACKWARDS.
      val newDeadline = (sorted.last.tsUnix + ttlSec) * 1000L
      val existing = getHandle.listTimers().toSeq
      val deadline = (existing :+ newDeadline).max
      existing.foreach(getHandle.deleteTimer)
      getHandle.registerTimer(deadline)
    }
    Iterator.single(BalanceRow(key, st.n, st.total))
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[BalanceRow] = {
    history.clear()
    running.clear()
    // Zero-value row = the unknown-wallet serve semantics (§2.3.6).
    Iterator.single(BalanceRow(key, 0L, 0.0))
  }
}

object CollectorProcessor {
  /** Incrementally-maintained (count, total) — 16 bytes per wallet. */
  final case class RunningBalance(n: Long, total: Double)

  /** Wire onto a deposit stream (reference-parity form: unbounded state,
    * no timers — TimeMode.None). One BalanceRow per touched key per
    * batch, like the mapGroupsWithState form. */
  def collect(spark: SparkSession,
              deposits: Dataset[TimedDeposit]): Dataset[BalanceRow] = {
    import spark.implicits._
    deposits
      .groupByKey(_.walletId)
      .transformWithState(new CollectorProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Eviction form: event-time idle TTL — watermarked `tsUnix`, timers in
    * `TimeMode.EventTime`, idle wallets reset to the zero-value row. */
  def collectWithTtl(spark: SparkSession, deposits: Dataset[TimedDeposit],
                     idleTtlSec: Long,
                     delay: String = "60 seconds"): Dataset[BalanceRow] = {
    import spark.implicits._
    deposits
      .withColumn("eventTime", timestamp_seconds(col("tsUnix")))
      .withWatermark("eventTime", delay)
      .as[TimedDeposit]
      .groupByKey(_.walletId)
      .transformWithState(
        new CollectorProcessor(TTLConfig.NONE, Some(idleTtlSec)),
        TimeMode.EventTime(), OutputMode.Update())
  }
}
