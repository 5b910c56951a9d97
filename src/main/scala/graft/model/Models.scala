package graft.model

/** Typed records mirroring the reference's five protobuf messages
  * (/root/reference/proto/wallet.proto:14-22, detector.proto:14-17,
  * flagger.proto:15-23). Money stays Double on purpose — the reference sums
  * IEEE-754 floats (/root/reference/service/service.go:138); see SURVEY §2.3.7.
  */
final case class Deposit(walletId: String, amount: Double)

final case class DepositHistory(walletId: String, deposits: Seq[Deposit])

/** Detector state: rolling-window start (unix secs; 0 = no window open) and
  * the running sum received inside the window
  * (/root/reference/proto/detector.proto:14-17). */
final case class Counter(rollingPeriodStartUnix: Long, received: Double)

/** Detector → flagger event (/root/reference/proto/flagger.proto:15-18). */
final case class FlagEvent(flagRemoved: Boolean, rollingPeriodStartUnix: Long)

/** Flagger state, last-write-wins (/root/reference/proto/flagger.proto:20-23). */
final case class FlagValue(flagged: Boolean, rollingPeriodStartUnix: Long)

/** A deposit with its processing timestamp — the shape the streaming layer
  * consumes (the reference's Deposit has no time field; Goka uses wall clock,
  * /root/reference/detector/detector.go:57). */
final case class TimedDeposit(walletId: String, amount: Double, tsUnix: Long,
                              seq: Long = 0L)

/** Wire shape of a flag event keyed by wallet (detector output + the manual
  * CLI injector, /root/reference/cmd/flag-wallet/main.go:26-33). */
final case class KeyedFlagEvent(
    walletId: String, flagRemoved: Boolean, rollingPeriodStartUnix: Long,
    seq: Long)

/** Full event record for streams that need the type column (stream-stream
  * joins); `tsUs` is epoch micros — the streaming layer re-derives the
  * event-time column (timestamps never sit in a feed parquet directly,
  * keeping the feed readable by any engine without tz coupling). */
final case class TypedEvent(userId: Long, eventId: Long, eventType: String,
                            value: Double, tsUs: Long)
