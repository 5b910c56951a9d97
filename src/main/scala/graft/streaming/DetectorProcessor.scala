package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions.{col, timestamp_seconds}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}
import graft.model.{Counter, KeyedFlagEvent, TimedDeposit}

/** The detector as a Spark 4 `StatefulProcessor` under `transformWithState`
  * — the modern form of the SURVEY §1.1 mapping (Goka keyed callback →
  * per-key state + per-event emit). Same [[DetectorLogic]] state machine as
  * the `flatMapGroupsWithState` wiring in [[DepositStreams.detector]];
  * `transformWithState` additionally buys schema-evolvable state, per-state
  * TTL, and timers for free at the platform level.
  *
  * At production key counts the `ValueState[Counter]` row lives in the
  * RocksDB state store ([[graft.GraftSession]] sets the provider) — ~24
  * bytes per wallet, so a billion wallets is ~24 GB spread across the
  * cluster's state stores.
  *
  * State growth (SURVEY §2.3.5): the reference keeps every wallet's counter
  * forever (detector.go has no eviction), which is parity behavior and the
  * default here (`TTLConfig.NONE`, no timers). For the 100-TB posture the
  * processor supports two eviction paths:
  *
  *  - `ttl` — processing-time [[TTLConfig]] on the value state: the state
  *    store expires a wallet's counter after wall-clock idleness. The
  *    platform path for production (RocksDB TTL compaction), but wall-clock
  *    and therefore not deterministically testable.
  *  - `idleTtlSec` — event-time eviction via timers: each input re-arms a
  *    per-key timer at `lastEventTime + idleTtlSec`; when the watermark
  *    passes it, the counter is cleared and a tombstone unflag event
  *    (`seq = EvictionSeq`) is emitted so a downstream flagger drops the
  *    wallet too. Deterministic under replay — this is the spec'd path
  *    (see `StateTtlSpec`). Requires `TimeMode.EventTime` + a watermark,
  *    wired by [[DetectorProcessor.detectWithTtl]].
  *
  * Evicting an idle wallet is semantics-preserving: an idle counter whose
  * rolling window has lapsed behaves identically to an absent one on the
  * next deposit only when `idleTtlSec >= windowSec` (branch 3 of
  * [[DetectorLogic.step]] zeroes both fields anyway); callers should keep
  * the TTL at least one window long.
  */
class DetectorProcessor(windowSec: Long = DetectorLogic.RollingPeriodSec,
                        threshold: Double = DetectorLogic.MaxAmount,
                        ttl: TTLConfig = TTLConfig.NONE,
                        idleTtlSec: Option[Long] = None)
    extends StatefulProcessor[String, TimedDeposit, KeyedFlagEvent] {

  @transient private var counter: org.apache.spark.sql.streaming.ValueState[Counter] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counter = getHandle.getValueState[Counter](
      "counter", Encoders.product[Counter], ttl)

  override def handleInputRows(key: String, rows: Iterator[TimedDeposit],
                               timerValues: TimerValues): Iterator[KeyedFlagEvent] = {
    var st = Option(counter.get()).getOrElse(Counter(0L, 0.0))
    val sorted = rows.toSeq.sortBy(d => (d.tsUnix, d.seq))
    val out = sorted.map { d =>
      val (next, ev) = DetectorLogic.step(st, d.amount, d.tsUnix, windowSec, threshold)
      st = next
      KeyedFlagEvent(key, ev.flagRemoved, ev.rollingPeriodStartUnix, d.seq)
    }
    counter.update(st)
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
    out.iterator
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[KeyedFlagEvent] = {
    counter.clear()
    // Tombstone so the downstream LWW flagger evicts the wallet too —
    // an evicted counter means no open window, i.e. unflagged.
    Iterator.single(KeyedFlagEvent(key, flagRemoved = true, 0L,
      DetectorProcessor.EvictionSeq))
  }
}

object DetectorProcessor {
  /** `seq` carried by eviction tombstones — sorts before every real event
    * so a tombstone never wins LWW against a same-batch deposit verdict. */
  val EvictionSeq: Long = -1L

  /** Wire the processor onto a deposit stream (reference-parity form:
    * unbounded state, no timers — TimeMode.None). */
  def detect(spark: SparkSession, deposits: Dataset[TimedDeposit],
             windowSec: Long = DetectorLogic.RollingPeriodSec,
             threshold: Double = DetectorLogic.MaxAmount): Dataset[KeyedFlagEvent] = {
    import spark.implicits._
    deposits
      .groupByKey(_.walletId)
      .transformWithState(new DetectorProcessor(windowSec, threshold),
        TimeMode.None(), OutputMode.Append())
  }

  /** Eviction form: event-time idle TTL. Stamps `tsUnix` as the event-time
    * column, watermarks it by `delay`, and runs the processor in
    * `TimeMode.EventTime` so idle-wallet state is cleared once the
    * watermark passes `lastEvent + idleTtlSec` (emitting an unflag
    * tombstone). Late rows behind the watermark are dropped by the
    * platform, as in any event-time stateful op. */
  def detectWithTtl(spark: SparkSession, deposits: Dataset[TimedDeposit],
                    idleTtlSec: Long, delay: String = "60 seconds",
                    windowSec: Long = DetectorLogic.RollingPeriodSec,
                    threshold: Double = DetectorLogic.MaxAmount): Dataset[KeyedFlagEvent] = {
    import spark.implicits._
    deposits
      .withColumn("eventTime", timestamp_seconds(col("tsUnix")))
      .withWatermark("eventTime", delay)
      .as[TimedDeposit]
      .groupByKey(_.walletId)
      .transformWithState(
        new DetectorProcessor(windowSec, threshold, TTLConfig.NONE, Some(idleTtlSec)),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
