package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
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
  */
class CollectorProcessor extends StatefulProcessor[String, TimedDeposit, BalanceRow] {
  import CollectorProcessor.RunningBalance

  @transient private var history: ListState[Deposit] = _
  @transient private var running: ValueState[RunningBalance] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    history = getHandle.getListState[Deposit](
      "history", Encoders.product[Deposit], TTLConfig.NONE)
    running = getHandle.getValueState[RunningBalance](
      "running", Encoders.product[RunningBalance], TTLConfig.NONE)
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
    Iterator.single(BalanceRow(key, st.n, st.total))
  }
}

object CollectorProcessor {
  /** Incrementally-maintained (count, total) — 16 bytes per wallet. */
  final case class RunningBalance(n: Long, total: Double)

  /** Wire onto a deposit stream — one BalanceRow per touched key per
    * batch, like the mapGroupsWithState form. */
  def collect(spark: SparkSession,
              deposits: Dataset[TimedDeposit]): Dataset[BalanceRow] = {
    import spark.implicits._
    deposits
      .groupByKey(_.walletId)
      .transformWithState(new CollectorProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
