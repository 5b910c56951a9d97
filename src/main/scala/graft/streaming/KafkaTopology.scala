package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import graft.model.{KeyedFlagEvent, TimedDeposit}

/** Production wiring of the reference's Kafka topology
  * (/root/reference/docker-compose.yml + cmd/processor/main.go): topic
  * `deposit` → collector + detector (independent consumer groups, i.e. two
  * streaming queries on the same source), detector → topic `flag_wallet` →
  * flagger. Serde is the reference's protobuf wire format
  * (depositaja.go:14-34), implemented natively in [[graft.serde.ProtoWire]]
  * and applied here as codegen'd `proto_encode_*`/`proto_decode_*`
  * expressions — byte-for-byte compatible with the Go producers/consumers
  * (this container ships neither the Kafka connector nor spark-protobuf,
  * so the topology resolves its source/sink format at runtime and is
  * exercised on a cluster, while [[DepositStreams]] + MemoryStream cover
  * the operator semantics and [[graft.serde.ProtoWire]] has golden-byte
  * wire tests under test).
  */
object KafkaTopology {

  val DepositTopic   = "deposit"     // depositaja.go:11
  val FlagTopic      = "flag_wallet" // flagger.go:15

  /** O1: Kafka → validated, keyed deposit stream. The broker ingestion
    * timestamp supplies processing time (the reference stamps wall clock at
    * the consumer, detector.go:57; broker time is the deterministic
    * equivalent), the offset supplies the LWW sequence. Values are proto
    * `Deposit` messages (wallet.proto:14-17). */
  def depositSource(spark: SparkSession, brokers: String): Dataset[TimedDeposit] = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", DepositTopic)
      .load()
      .select(
        call_function("proto_decode_deposit", col("value")).as("d"),
        col("timestamp"), col("offset"))
      .select(
        col("d.wallet_id").as("walletId"),
        col("d.amount").as("amount"),
        unix_seconds(col("timestamp")).as("tsUnix"),
        col("offset").as("seq"))
      .where(col("amount") > 0) // service.go:87-91 — reject non-positive
      .as[TimedDeposit]
  }

  /** O6 sink: detector verdicts → flag_wallet topic, keyed by wallet (the
    * manual flag CLI, O11, produces to the same topic). Values are proto
    * `FlagEvent` messages (flagger.proto:15-18). */
  def flagEventSink(events: Dataset[KeyedFlagEvent], brokers: String,
                    checkpoint: String): DataStreamWriter[_] = {
    graft.functions.GraftFunctions.register(events.sparkSession)
    events
      .select(col("walletId").as("key"),
        call_function("proto_encode_flag_event",
          col("flagRemoved"), col("rollingPeriodStartUnix")).as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", FlagTopic)
      .option("checkpointLocation", checkpoint)
  }

  /** O6 source side of the flagger (flagger.go:62). */
  def flagEventSource(spark: SparkSession, brokers: String): Dataset[KeyedFlagEvent] = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", FlagTopic)
      .load()
      .select(col("key").cast("string").as("walletId"),
        call_function("proto_decode_flag_event", col("value")).as("e"),
        col("offset").as("seq"))
      .select(col("walletId"), col("e.flag_removed").as("flagRemoved"),
        col("e.rolling_period_start_unix").as("rollingPeriodStartUnix"),
        col("seq"))
      .as[KeyedFlagEvent]
  }

  /** The whole processor group (cmd/processor/main.go:25-55): three
    * streaming queries under one session; await any termination like the
    * reference's errgroup. Balance/flag tables land as parquet "changelog"
    * directories that the serve path (DepositOps.check) reads. */
  def runProcessors(spark: SparkSession, brokers: String,
                    stateDir: String): Seq[StreamingQuery] = {
    val deposits = depositSource(spark, brokers)
    // State-table updates flow through foreachBatch as append-only
    // changelog rows (mapGroupsWithState is Update-mode; a parquet sink is
    // append-only) — readers take the latest row per key, exactly like a
    // compacted Kafka changelog topic.
    def changelog[T](path: String): (Dataset[T], Long) => Unit =
      (batch, _) => batch.write.mode("append").parquet(path)
    val q1 = DepositStreams.collector(spark, deposits)
      .writeStream
      .option("checkpointLocation", s"$stateDir/ckpt/collector")
      .trigger(Trigger.ProcessingTime("5 seconds"))
      .outputMode("update")
      .foreachBatch(changelog[DepositStreams.BalanceRow](s"$stateDir/balance-table"))
      .start()
    val q2 = flagEventSink(DepositStreams.detector(spark, deposits),
      brokers, s"$stateDir/ckpt/detector").start()
    val q3 = DepositStreams.flagger(spark, flagEventSource(spark, brokers))
      .writeStream
      .option("checkpointLocation", s"$stateDir/ckpt/flagger")
      .trigger(Trigger.ProcessingTime("5 seconds"))
      .outputMode("update")
      .foreachBatch(changelog[DepositStreams.FlagRow](s"$stateDir/flagger-table"))
      .start()
    Seq(q1, q2, q3)
  }
}
