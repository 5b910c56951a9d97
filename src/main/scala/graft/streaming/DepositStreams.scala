package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model._

/** Structured Streaming re-expression of the reference's processor topology
  * (SURVEY §3.2): three keyed stateful processors that in the reference are
  * separate Goka consumer groups linked by Kafka topics. Here each is its
  * own streaming query over a `Dataset` source; in production the
  * detector→flagger edge is a Kafka topic exactly as in the reference
  * (`writeStream.format("kafka")` / `readStream` on `flag_wallet`), and the
  * "views" are the queries' sink tables.
  *
  * The per-key `GroupState` row is the analog of the reference's
  * per-partition LevelDB entry, and the `groupByKey` shuffle is the analog
  * of Kafka partition assignment (SURVEY §1.5) — co-partitioning of state
  * with input is automatic, checkpointing upgrades Goka's at-least-once to
  * exactly-once. At scale: RocksDB state store provider + watermarked state
  * eviction (the collector's unbounded history is parity behavior; the
  * incremental balance in [[graft.operators.DepositOps.balances]] is the
  * 100-TB version — SURVEY §2.3.5).
  *
  * Processing time: the reference stamps wall-clock seconds per message
  * (detector.go:57). For deterministic replay and tests, `tsUnix` rides on
  * the event ([[TimedDeposit]]); a Kafka deployment would populate it from
  * the broker ingestion timestamp.
  */
object DepositStreams {

  /** Balance-table row served by GET /check (SURVEY §2.1 O8). */
  final case class BalanceRow(walletId: String, nDeposits: Long, balance: Double)

  /** Flagger-table row. */
  final case class FlagRow(walletId: String, flagged: Boolean,
                           rollingPeriodStartUnix: Long)

  /** Collector: per-wallet deposit history + running balance (O3). Update
    * output — each batch emits the refreshed state row per touched key. */
  def collector(spark: SparkSession, deposits: Dataset[TimedDeposit]): Dataset[BalanceRow] = {
    import spark.implicits._
    deposits
      .groupByKey(_.walletId)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: String, events: Iterator[TimedDeposit], state: GroupState[DepositHistory]) =>
          val sorted = events.toSeq.sortBy(d => (d.tsUnix, d.seq))
          val hist = sorted.foldLeft(state.getOption) { (st, d) =>
            Some(CollectorLogic.step(st, Deposit(d.walletId, d.amount)))
          }.getOrElse(DepositHistory(key, Vector.empty))
          state.update(hist)
          // Balance is computed at read time in the reference
          // (service.go:136-140); emitting it per update keeps the sink
          // table point-lookup ready.
          BalanceRow(key, hist.deposits.size.toLong, hist.deposits.map(_.amount).sum)
      }
  }

  /** Detector: rolling-window running sum + threshold verdict (O4+O5+O6).
    * Append output — every deposit emits exactly one flag/unflag event,
    * keyed by wallet, carrying the deposit's seq (for LWW ordering). */
  def detector(spark: SparkSession, deposits: Dataset[TimedDeposit],
               windowSec: Long = DetectorLogic.RollingPeriodSec,
               threshold: Double = DetectorLogic.MaxAmount): Dataset[KeyedFlagEvent] = {
    import spark.implicits._
    deposits
      .groupByKey(_.walletId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (key: String, events: Iterator[TimedDeposit], state: GroupState[Counter]) =>
          val sorted = events.toSeq.sortBy(d => (d.tsUnix, d.seq))
          var st = state.getOption.getOrElse(Counter(0L, 0.0))
          val out = sorted.map { d =>
            val (next, ev) = DetectorLogic.step(st, d.amount, d.tsUnix,
              windowSec, threshold)
            st = next
            KeyedFlagEvent(key, ev.flagRemoved, ev.rollingPeriodStartUnix, d.seq)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Flagger: LWW flag state (O7). Consumes the flag-event stream — the
    * detector's output unioned with any manual injector events (O11), which
    * in the reference share the `flag_wallet` topic. */
  def flagger(spark: SparkSession, flagEvents: Dataset[KeyedFlagEvent]): Dataset[FlagRow] = {
    import spark.implicits._
    flagEvents
      .groupByKey(_.walletId)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: String, events: Iterator[KeyedFlagEvent], state: GroupState[FlagValue]) =>
          val sorted = events.toSeq.sortBy(_.seq)
          val fv = sorted.foldLeft(state.getOption) { (st, e) =>
            Some(FlaggerLogic.step(st,
              FlagEvent(e.flagRemoved, e.rollingPeriodStartUnix)))
          }.getOrElse(FlagValue(flagged = false, 0L))
          state.update(fv)
          FlagRow(key, fv.flagged, fv.rollingPeriodStartUnix)
      }
  }

  /** Serve path (O8+O9+O10): point lookup against the two sink tables with
    * the unknown-wallet → {0, false} zero-value semantics (SURVEY §2.3.6). */
  def check(spark: SparkSession, balanceTable: Dataset[BalanceRow],
            flagTable: Dataset[FlagRow], walletId: String): (String, Double, Boolean) = {
    import spark.implicits._
    val bal = balanceTable.filter(_.walletId == walletId)
      .collect().headOption.map(_.balance).getOrElse(0.0)
    val flag = flagTable.filter(_.walletId == walletId)
      .collect().headOption.exists(_.flagged)
    (walletId, bal, flag)
  }
}
