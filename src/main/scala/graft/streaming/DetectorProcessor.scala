package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}
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
  */
class DetectorProcessor(windowSec: Long = DetectorLogic.RollingPeriodSec,
                        threshold: Double = DetectorLogic.MaxAmount)
    extends StatefulProcessor[String, TimedDeposit, KeyedFlagEvent] {

  @transient private var counter: org.apache.spark.sql.streaming.ValueState[Counter] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counter = getHandle.getValueState[Counter](
      "counter", Encoders.product[Counter], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[TimedDeposit],
                               timerValues: TimerValues): Iterator[KeyedFlagEvent] = {
    var st = Option(counter.get()).getOrElse(Counter(0L, 0.0))
    val out = rows.toSeq.sortBy(d => (d.tsUnix, d.seq)).map { d =>
      val (next, ev) = DetectorLogic.step(st, d.amount, d.tsUnix, windowSec, threshold)
      st = next
      KeyedFlagEvent(key, ev.flagRemoved, ev.rollingPeriodStartUnix, d.seq)
    }
    counter.update(st)
    out.iterator
  }
}

object DetectorProcessor {
  /** Wire the processor onto a deposit stream. */
  def detect(spark: SparkSession, deposits: Dataset[TimedDeposit],
             windowSec: Long = DetectorLogic.RollingPeriodSec,
             threshold: Double = DetectorLogic.MaxAmount): Dataset[KeyedFlagEvent] = {
    import spark.implicits._
    deposits
      .groupByKey(_.walletId)
      .transformWithState(new DetectorProcessor(windowSec, threshold),
        TimeMode.None(), OutputMode.Append())
  }
}
