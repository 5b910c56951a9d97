package graft.queries

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
import graft.Q
import graft.model.TimedDeposit
import graft.operators.Maintenance
import graft.sources.Tables
import graft.streaming.{CollectorProcessor, DepositStreams, DetectorLogic, DetectorProcessor}

/** The REAL Structured Streaming pipeline (file-backed replay log →
  * detector → flagger + collector, chained streaming queries exactly like
  * the reference's Kafka-linked processors) run under the driver's
  * correctness contract: the DuckDB oracle replays the same per-wallet
  * sequential state machine as a recursive-CTE fold over the time-ordered
  * deposit list.
  *
  * Feed shape (reference: processors consume a replayable Kafka log,
  * cmd/processor/main.go — they are never handed an in-memory array):
  *
  *  - the deposit feed is written ONCE per sf dir as plain parquet and
  *    consumed via `spark.readStream.schema(..).parquet(dir)` — a
  *    distributed source; nothing is collected to the driver;
  *  - detector (hop 1) and collector both consume that feed as parallel
  *    consumer groups (reference runs them concurrently,
  *    cmd/processor/main.go:30-41) — both queries are started before
  *    either is awaited;
  *  - the detector→flagger edge is a parquet file SINK that hop 2
  *    `readStream`s — the stand-in for the `flag_wallet` topic, replacing
  *    the former driver-side collect between hops. Hop 2 is STARTED
  *    concurrently with hop 1 (its sink metadata dir is pre-created so the
  *    file source reads only sink-committed files) and awaited after hop 1
  *    completes — query start + state-store instantiation overlap hop 1's
  *    execution.
  *
  * Lifecycle — the long-lived-topology contract: a streaming topology is
  * not a batch job re-run per request; it is stood up ONCE, keeps durable
  * state, and serving a query means "ensure the topology has caught up
  * with the source, then read its output table" (exactly how the
  * reference's Goka processors + `service.go` serve: consumers hold
  * committed offsets, GET /check reads the current table). This harness
  * implements that contract per (query, feed):
  *
  *  - first invocation in a JVM stands the topology up, processes the
  *    feed, and MATERIALIZES the output table as parquet under a
  *    JVM-lifetime workspace;
  *  - subsequent invocations perform the catch-up check — the feed dir's
  *    file listing (name+size fingerprint) is compared against the one the
  *    materialization consumed, the file-source analog of "no new Kafka
  *    offsets" — and serve straight from the output table. A changed feed
  *    fingerprint re-runs the topology.
  *
  * The workspace (feeds, checkpoints while running, materialized outputs)
  * lives under one per-JVM root removed by a shutdown hook — no tmpdir
  * leak across JVMs, no stale-feed hazard (the fingerprint check, not an
  * assumption, gates reuse).
  *
  * Determinism: no `maxFilesPerTrigger` is set on the main queries, so
  * every feed file is available to — and consumed in — the FIRST
  * micro-batch; the per-wallet (tsUnix, seq) sort inside each stateful
  * group therefore sees the whole history at once, batch-order-
  * independent, exactly the semantics the oracle replays. The production
  * many-micro-batch shape is `stream_check_chunked`: the feed re-written
  * as three TIME-SLICED single-file chunks (slice k's events all precede
  * slice k+1's — a Kafka log's per-partition time order) consumed with
  * `maxFilesPerTrigger=1`, so per-wallet state provably continues across
  * micro-batch boundaries (same oracle as `stream_check`).
  */
object StreamQueries {

  /** JVM-lifetime workspace root for feeds, checkpoints and materialized
    * stream outputs; deleted on JVM exit (ADVICE round-6: the previous
    * per-feed tmpdir writes were never reclaimed).
    */
  private lazy val wsRoot: String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_streamws_" +
      UUID.randomUUID().toString.replace("-", "")
    new java.io.File(p).mkdirs()
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      Maintenance.deleteRecursively(new java.io.File(p))))
    p
  }

  /** Deposit-feed parquet per sf dir, written once per JVM (all the
    * stream_check* queries replay the same feed — one distributed write,
    * many readers). Driver holds no rows.
    */
  private val feedCache = new ConcurrentHashMap[String, String]()

  private def depositProjection(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("value") > 0)
      .select(
        col("user_id").cast("string").as("walletId"),
        col("value").as("amount"),
        expr("unix_micros(ts) div 1000000").as("tsUnix"),
        col("event_id").as("seq"))

  private def depositFeed(s: SparkSession, dir: String): String =
    feedCache.computeIfAbsent(dir, { _ =>
      val path = s"$wsRoot/feed_" + UUID.randomUUID().toString.replace("-", "")
      depositProjection(s, dir).write.mode("overwrite").parquet(path)
      path
    })

  /** Proto-framed deposit feed: each file row is the Kafka MESSAGE shape —
    * `value` carries the proto3-marshaled `Deposit` bytes exactly as the
    * reference's Go producer emits them (depositaja.go:16, wallet.proto:
    * 14-17, encoded by the codegen'd `proto_encode_deposit` expression),
    * `tsUnix`/`seq` stand in for the broker timestamp and offset. The
    * stream side must run a real wire decode per record to recover the
    * deposit — the byte-compatibility edge a drop-in consumer of the
    * reference's topics exercises. Written once per (JVM, sf dir). */
  private val protoFeedCache = new ConcurrentHashMap[String, String]()

  private def protoDepositFeed(s: SparkSession, dir: String): String =
    protoFeedCache.computeIfAbsent(dir, { _ =>
      graft.functions.GraftFunctions.register(s)
      val path = s"$wsRoot/protofeed_" + UUID.randomUUID().toString.replace("-", "")
      depositProjection(s, dir)
        .select(
          call_function("proto_encode_deposit", col("walletId"), col("amount"))
            .as("value"),
          col("tsUnix"), col("seq"))
        .write.mode("overwrite").parquet(path)
      path
    })

  /** Replay-log STREAM feed for the `graft-replay` connector's streaming
    * leg: the deposit projection framed into 3 offset-ranged segments
    * whose offsets are the ARRIVAL rank (row_number over (tsUnix, seq) —
    * a Kafka partition's offsets are time-ordered by arrival, and the
    * detector's per-wallet fold needs exactly that cross-batch order
    * when the log is consumed a segment at a time). seq := offset is
    * order-equivalent to the original (tsUnix, seq) per wallet, so the
    * same oracle replays the fold. Written once per (JVM, sf dir). The
    * global rank is a build-step cost here; a real Kafka log has
    * per-partition offsets natively. */
  private val replayFeedCache = new ConcurrentHashMap[String, String]()

  private def replayStreamFeed(s: SparkSession, dir: String): String =
    replayFeedCache.computeIfAbsent(dir, { _ =>
      val path = s"$wsRoot/rlfeed_" + UUID.randomUUID().toString.replace("-", "")
      graft.sources.replay.ReplayLog.writeSegments(
        depositProjection(s, dir).select(
          row_number().over(Window.orderBy(col("tsUnix"), col("seq")))
            .cast("long").as("offset"),
          col("tsUnix").as("ts_unix"),
          col("walletId").as("wallet_id"),
          col("amount")),
        path, nSegments = 3)
      path
    })

  /** Typed full-event feed (type column retained) for the stream-stream
    * join; written once per (JVM, sf dir) like [[depositFeed]]. */
  private val eventsFeedCache = new ConcurrentHashMap[String, String]()

  private def eventsFeed(s: SparkSession, dir: String): String =
    eventsFeedCache.computeIfAbsent(dir, { _ =>
      val path = s"$wsRoot/evfeed_" + UUID.randomUUID().toString.replace("-", "")
      Tables.events(s, dir)
        .select(col("user_id").as("userId"), col("event_id").as("eventId"),
          col("event_type").as("eventType"), col("value"),
          expr("unix_micros(ts)").as("tsUs"))
        .write.mode("overwrite").parquet(path)
      path
    })

  /** Chunked-replay feed: the same deposits re-written as three
    * time-range slices (by equal thirds of the [min, max] tsUnix span),
    * each a SINGLE file, written sequentially so file modification order =
    * time order. `maxFilesPerTrigger=1` then replays one slice per
    * micro-batch, and because every event in slice k precedes every event
    * in slice k+1, the per-wallet (tsUnix, seq) batch-local sort composes
    * into the exact global fold order — the Kafka-log time-ordered
    * delivery contract (ChunkedReplaySpec proves the equivalence).
    */
  private val chunkedFeedCache = new ConcurrentHashMap[String, String]()

  private def chunkedDepositFeed(s: SparkSession, dir: String): String =
    chunkedFeedCache.computeIfAbsent(dir, { _ =>
      val path = s"$wsRoot/feedchunks_" + UUID.randomUUID().toString.replace("-", "")
      val dep = depositProjection(s, dir)
      val mm = dep.agg(min(col("tsUnix")), max(col("tsUnix"))).head()
      val (tMin, tMax) = (mm.getLong(0), mm.getLong(1))
      val t1 = tMin + (tMax - tMin) / 3
      val t2 = tMin + 2 * (tMax - tMin) / 3
      val slices = Seq(
        col("tsUnix") <= t1,
        col("tsUnix") > t1 && col("tsUnix") <= t2,
        col("tsUnix") > t2)
      slices.foreach { pred =>
        // One file per slice: events of one slice must share a micro-batch
        // (intra-slice files would replay in arbitrary relative order).
        dep.filter(pred).repartition(1).write.mode("append").parquet(path)
        Thread.sleep(5) // distinct mtimes -> deterministic source file order
      }
      path
    })

  /** Incoming-document feed (doc_id ≡ 0 mod 5 — the same batch
    * convention as dedup_incremental) written as 3 parquet files so the
    * replay spans multiple micro-batches; written once per (JVM, sf dir). */
  private val docsFeedCache = new ConcurrentHashMap[String, String]()

  private def docsBatchFeed(s: SparkSession, dir: String): String =
    docsFeedCache.computeIfAbsent(dir, { _ =>
      val path = s"$wsRoot/docfeed_" + UUID.randomUUID().toString.replace("-", "")
      Tables.documents(s, dir).filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("text"))
        .repartition(3).write.mode("overwrite").parquet(path)
      path
    })

  /** Arriving query-vector feed (vec_id < 10 — `sim_ivf_served`'s query
    * set) written as 3 parquet files so the replay spans multiple
    * micro-batches; written once per (JVM, sf dir). */
  private val embFeedCache = new ConcurrentHashMap[String, String]()

  private def embBatchFeed(s: SparkSession, dir: String): String =
    embFeedCache.computeIfAbsent(dir, { _ =>
      val path = s"$wsRoot/embfeed_" + UUID.randomUUID().toString.replace("-", "")
      Tables.embeddings(s, dir).filter(col("vec_id") < 10)
        .select(col("vec_id"), col("embedding"), col("label"))
        .repartition(3).write.mode("overwrite").parquet(path)
      path
    })

  /** Shared foreachBatch replay scaffold for the artifact-probing ingest
    * queries: stream `feed` one file per micro-batch, run `probe` on each
    * batch, and land every epoch's output under an EPOCH-KEYED
    * subdirectory with overwrite mode — the standard foreachBatch
    * idempotence pattern: a retried epoch (sink committed, checkpoint not
    * yet advanced) rewrites its own subdir instead of appending duplicate
    * rows. Returns the accumulated output (partition-discovery `epoch`
    * column dropped). */
  private def foreachBatchReplay(s: SparkSession, feed: String,
      schema: org.apache.spark.sql.types.StructType)(
      probe: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): DataFrame = {
    def unique = s"stream_${UUID.randomUUID().toString.replace("-", "")}"
    val work = s"$wsRoot/run_$unique"
    val out = s"$work/out"
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      q = s.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "1") // one batch file per micro-batch
        .parquet(feed)
        .writeStream
        .option("checkpointLocation", s"$work/cp")
        .foreachBatch((batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
          probe(batch).write.mode("overwrite").parquet(s"$out/epoch=$epoch"))
        .start()
      drain(q)
      s.read.parquet(out).drop("epoch")
    } finally {
      if (q != null) try q.stop() catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** See the stream_hybrid_serve registration: per-batch probe of BOTH
    * maintained index artifacts + the shared RRF fusion; stateless,
    * composes because rankings are per-query. */
  private def streamHybridServe(s: SparkSession, dir: String): DataFrame = {
    val docsT = Tables.documents(s, dir)
    val embT = Tables.embeddings(s, dir)
    val indexPath = SimilarityQueries.servedIndexPath(s, dir)
    foreachBatchReplay(s, embBatchFeed(s, dir),
      StructType(Seq(
        StructField("vec_id", LongType, nullable = false),
        StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType), nullable = true),
        StructField("label",
          org.apache.spark.sql.types.IntegerType, nullable = true)))) { batch =>
      val sp = graft.operators.Corpus.sparseTopKFor(docsT,
          batch.select(col("vec_id").as("doc_id")), k = 20,
          maxDfFrac = 1.0, postingCap = 64)
        .select(col("qid"), col("nid"), col("rank").as("sr"))
      val dn = graft.operators.Similarity.ivfTopKServed(embT, batch, k = 20,
          nProbe = 2, indexPath = indexPath)
        .select(col("qid"), col("nid"), col("rank").as("dr"))
      CorpusQueries.rrfFuse(sp, dn)
        .where(col("rank") <= 10)
        .select(col("qid"), col("rank"), col("nid"), col("rrf"))
    }.orderBy(col("qid"), col("rank"))
  }

  /** Streaming ANN serving against the PERSISTED IVF index — retrieval at
    * ingest, the vector analog of [[streamLshDedup]]: each micro-batch of
    * arriving query vectors is assigned to its probe cells and served
    * top-k from the index artifact inside `foreachBatch`. The stream is
    * STATELESS (corpus knowledge lives in the artifact; per-batch cost
    * tracks the batch), and because top-k is per-query and every query
    * arrives exactly once, per-batch results compose into the global
    * result: output is row-identical to the batch `sim_ivf_served`, which
    * is the oracle. */
  private def streamAnnServe(s: SparkSession, dir: String): DataFrame = {
    val embT = Tables.embeddings(s, dir)
    val indexPath = SimilarityQueries.servedIndexPath(s, dir)
    foreachBatchReplay(s, embBatchFeed(s, dir),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType), nullable = true),
        org.apache.spark.sql.types.StructField("label",
          org.apache.spark.sql.types.IntegerType, nullable = true)))) { batch =>
      graft.operators.Similarity.ivfTopKServed(embT, batch, k = 3,
        nProbe = 2, indexPath = indexPath)
    }.orderBy(col("qid"), col("rank"))
  }

  /** Streaming ingest dedup against the PERSISTED LSH index — dedup AT
    * INGEST, the production placement of the near-dup gate: each
    * micro-batch of arriving documents shingles, signs, and probes the
    * historical index artifact asymmetrically (batch×history only) via
    * `foreachBatch`, appending verified pairs to the output log. The
    * stream itself is STATELESS — all corpus knowledge lives in the
    * artifact, per-batch cost tracks the batch, and because every doc
    * arrives exactly once, per-batch DISTINCT composes into the global
    * result: the output is row-identical to the batch `dedup_lsh_served`,
    * which is the oracle. */
  private def streamLshDedup(s: SparkSession, dir: String): DataFrame = {
    val hist = Tables.documents(s, dir).filter(col("doc_id") % 5 =!= 0)
    val indexPath = DedupQueries.lshIndexFor(s, dir)
    foreachBatchReplay(s, docsBatchFeed(s, dir),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType, nullable = true)))) { batch =>
      graft.operators.Dedup.lshServedPairs(hist, batch, indexPath)
    }.orderBy(col("new_id"), col("dup_of"))
  }

  /** With SPARK_GRAFT_STREAM_FORENSICS=1, each invocation prints one JSON
    * line to stderr splitting wall time into: feed availability (cached
    * after the first query), hop1+collector (concurrent), hop2, and the
    * state-store/query-start overhead vs batch-execution time reported by
    * StreamingQueryProgress — the setup-vs-steady-state split PERF.md
    * documents. Cache hits print a serve-only line.
    */
  private val forensics = sys.env.get("SPARK_GRAFT_STREAM_FORENSICS").contains("1")

  /** Materialized topology outputs: (query, feed) → (feed fingerprint at
    * materialization time, output-table path).
    */
  private final case class Materialized(feedFp: String, path: String)
  private val outputs = new ConcurrentHashMap[String, Materialized]()

  /** Drop every materialized output — for harnesses that must re-measure
    * the full topology stand-up per run (ScaleSmoke's streaming-throughput
    * row would otherwise time the serve path). */
  def invalidateMaterialized(): Unit = outputs.clear()

  /** Accumulated state-operator totals (rows, reported bytes) across the
    * streaming queries drained since the last [[resetStateMetrics]] —
    * recorded from each query's final progress just before it stops
    * (the per-run workspace and its RocksDB checkpoints are deleted at
    * teardown, so nothing on disk survives to measure). The scale-smoke
    * witness that state scales with KEYS, not events. */
  @volatile private var stateRowsAcc = 0L
  @volatile private var stateBytesAcc = 0L
  def resetStateMetrics(): Unit = { stateRowsAcc = 0L; stateBytesAcc = 0L }
  def stateMetrics: (Long, Long) = (stateRowsAcc, stateBytesAcc)

  /** Per-micro-batch triggerExecution durations (ms) accumulated across
    * the queries drained since the last [[resetBatchDurations]] — the
    * LATENCY distribution behind the throughput number (a scale-up that
    * keeps throughput but fattens the per-batch tail shows here, not
    * there). Sample count is bounded by Spark's recentProgress retention
    * (spark.sql.streaming.numRecentProgressUpdates, default 100 per
    * query) — raise it in the measuring session if a feed exceeds that
    * many micro-batches. */
  private val batchDurAcc = scala.collection.mutable.ArrayBuffer[Long]()
  def resetBatchDurations(): Unit =
    batchDurAcc.synchronized { batchDurAcc.clear() }
  def batchDurations: Seq[Long] =
    batchDurAcc.synchronized { batchDurAcc.toVector }

  /** Drain a streaming query (processAllAvailable), record its final
    * state-operator metrics and per-batch durations, and stop it. */
  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    q.processAllAvailable()
    val p = Option(q.lastProgress).orElse(q.recentProgress.lastOption)
    p.foreach(_.stateOperators.foreach { so =>
      stateRowsAcc += so.numRowsTotal
      stateBytesAcc += so.memoryUsedBytes
    })
    q.recentProgress.foreach { pr =>
      Option(pr.durationMs.get("triggerExecution")).foreach { d =>
        batchDurAcc.synchronized { batchDurAcc += d.toLong }
      }
    }
    q.stop()
  }

  /** Feed-dir file listing fingerprint — the file-source analog of Kafka
    * committed offsets: unchanged listing ⇒ the topology has nothing to
    * catch up on. Local listing of a handful of files; no data read.
    */
  private def feedFingerprint(feed: String): String = {
    val fs = Option(new java.io.File(feed).listFiles()).map(_.toSeq).getOrElse(Seq.empty)
    fs.filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => s"${f.getName}:${f.length}").sorted.mkString(",")
  }

  /** Serve `name` from its materialized output table, running `compute`
    * (the full topology) only when no output exists for the feed's current
    * fingerprint. `reorder` re-applies the query's total order after the
    * parquet round trip.
    */
  private def materialized(s: SparkSession, name: String, feed: String)
                          (compute: => DataFrame)
                          (reorder: DataFrame => DataFrame): DataFrame = {
    val fp = feedFingerprint(feed)
    val key = s"$name|$feed"
    val hit = outputs.get(key)
    if (hit != null && hit.feedFp == fp) {
      if (forensics)
        System.err.println(s"""{"forensics":"$name","serve":"materialized"}""")
      return reorder(graft.operators.IndexCache.resolvedFrame(s, hit.path))
    }
    val t0 = System.nanoTime()
    val df = compute
    val path = s"$wsRoot/out_${name}_" + UUID.randomUUID().toString.replace("-", "")
    df.write.mode("overwrite").parquet(path)
    outputs.put(key, Materialized(fp, path))
    if (forensics)
      System.err.println(
        f"""{"forensics":"$name","serve":"topology","standup_s":${(System.nanoTime() - t0) / 1e9}%.3f}""")
    reorder(graft.operators.IndexCache.resolvedFrame(s, path))
  }

  private def streamCheck(s: SparkSession, dir: String, windowSec: Long,
                          threshold: Double,
                          useTws: Boolean = false,
                          chunked: Boolean = false,
                          proto: Boolean = false,
                          replay: Boolean = false): DataFrame = {
    import s.implicits._

    val t0 = System.nanoTime()
    val feed =
      if (replay) replayStreamFeed(s, dir)
      else if (proto) protoDepositFeed(s, dir)
      else if (chunked) chunkedDepositFeed(s, dir)
      else depositFeed(s, dir)
    val tFeed = System.nanoTime()
    def deposits =
      if (replay) {
        // The engine's own DSv2 connector as the STREAM source: the
        // framed log consumed one segment per trigger (offset-range
        // admission control — the Kafka consumption model), wire frames
        // decoded in the source, state continuing across micro-batches.
        s.readStream.format("graft-replay")
          .option("maxSegmentsPerTrigger", "1")
          .load(feed)
          .select(col("wallet_id").as("walletId"), col("amount"),
            col("ts_unix").as("tsUnix"), col("offset").as("seq"))
          .as[TimedDeposit]
      } else if (proto) {
        // Kafka-message framing: decode the proto3 Deposit wire bytes
        // in-stream (codegen'd expression — the same per-record decode a
        // broker consumer runs), broker ts/offset columns alongside.
        graft.functions.GraftFunctions.register(s)
        s.readStream
          .schema(StructType(Seq(
            StructField("value", BinaryType),
            StructField("tsUnix", LongType),
            StructField("seq", LongType))))
          .parquet(feed)
          .select(call_function("proto_decode_deposit", col("value")).as("d"),
            col("tsUnix"), col("seq"))
          .select(col("d.wallet_id").as("walletId"),
            col("d.amount").as("amount"), col("tsUnix"), col("seq"))
          .as[TimedDeposit]
      } else {
        val r = s.readStream
          .schema(Encoders.product[TimedDeposit].schema)
        val r2 = if (chunked) r.option("maxFilesPerTrigger", "1") else r
        r2.parquet(feed).as[TimedDeposit]
      }

    def unique = s"stream_${UUID.randomUUID().toString.replace("-", "")}"
    val work = s"$wsRoot/run_$unique"
    val balName = unique
    val flagName = unique

    // Any failure must not orphan a running query (it would keep
    // executing no-data batches against the feed for the rest of the
    // JVM) nor leak the memory-sink names / work dir.
    val started = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.streaming.StreamingQuery]
    try {
      // Hop 1: deposits → detector → flag-event LOG (parquet sink = the
      // flag_wallet topic stand-in; detector output is append by design).
      val flagDir = s"$work/flag_events"
      // Pre-create the sink's metadata dir so hop 2's file source, started
      // concurrently below, classifies flagDir as sink output from the
      // first poll and only ever reads sink-COMMITTED files (never a
      // half-written part file).
      new java.io.File(s"$flagDir/_spark_metadata").mkdirs()
      val detected =
        if (useTws) DetectorProcessor.detect(s, deposits, windowSec, threshold)
        else DepositStreams.detector(s, deposits, windowSec, threshold)
      val q1 = detected.writeStream
        .format("parquet").option("path", flagDir)
        .option("checkpointLocation", s"$work/cp_detector")
        .outputMode("append").start()
      started += q1

      // Collector: parallel consumer group over the SAME feed — started
      // before hop 1 is awaited, so both run concurrently.
      val collected =
        if (useTws) CollectorProcessor.collect(s, deposits)
        else DepositStreams.collector(s, deposits)
      val q3 = collected.writeStream
        .format("memory").queryName(balName)
        .option("checkpointLocation", s"$work/cp_collector")
        .outputMode("update").start()
      started += q3

      // Hop 2: flagger consumes the flag-event log (LWW state, update
      // mode). When hop 1 commits exactly once (non-chunked), the flagger
      // is started NOW — before hop 1 is awaited — so its query-start and
      // state-store setup overlap hop 1's execution, and its single data
      // batch still sees the whole committed log at once. A CHUNKED hop 1
      // commits per slice, so an early-started flagger could consume the
      // log across several batches and leave one update-mode snapshot row
      // per wallet per batch — with no batch id in the sink there is no
      // deterministic "latest" to reduce to; there it starts after hop 1,
      // reading everything in one batch.
      def startFlagger() = {
        val flagEvents = s.readStream
          .schema(Encoders.product[graft.model.KeyedFlagEvent].schema)
          .parquet(flagDir)
          .as[graft.model.KeyedFlagEvent]
        val q = DepositStreams.flagger(s, flagEvents).writeStream
          .format("memory").queryName(flagName)
          .option("checkpointLocation", s"$work/cp_flagger")
          .outputMode("update").start()
        started += q
        q
      }
      val q2pre = if (!chunked && !replay) Some(startFlagger()) else None

      drain(q1)
      drain(q3)
      val tHop1 = System.nanoTime()
      val q2 = q2pre.getOrElse(startFlagger())
      drain(q2)
      val tHop2 = System.nanoTime()
      if (forensics) {
        def batchSec(qs: org.apache.spark.sql.streaming.StreamingQuery*) = qs
          .flatMap(_.recentProgress)
          .map(p => Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L))
          .sum / 1e3
        def sec(a: Long, b: Long) = (b - a) / 1e9
        System.err.println(
          f"""{"forensics":"stream_check","tws":$useTws,"chunked":$chunked,"feed_s":${sec(t0, tFeed)}%.3f,""" +
          f""""hop1_collector_wall_s":${sec(tFeed, tHop1)}%.3f,"hop1_collector_batch_s":${batchSec(q1, q3)}%.3f,""" +
          f""""hop2_wall_s":${sec(tHop1, tHop2)}%.3f,"hop2_batch_s":${batchSec(q2)}%.3f}""")
      }
      val flags = s.table(flagName)
        .select(col("walletId").cast("long").as("wallet_id"),
          col("flagged").as("above_threshold"))

      // Update-mode memory sink APPENDS each batch's refreshed rows; with
      // the chunked feed a wallet may carry one row per touched batch, the
      // latest being the one with the largest (strictly increasing)
      // deposit count — max_by collapses to it (identity when the feed is
      // one batch and each wallet has exactly one row).
      val balances = s.table(balName)
        .groupBy(col("walletId").cast("long").as("wallet_id"))
        .agg(round(max_by(col("balance"), col("nDeposits")), 2).as("balance"))

      // Analyzed eagerly, so the plan holds the resolved memory-sink
      // relations — the names and work dir can be retired in the finally.
      balances.join(flags, Seq("wallet_id"), "left_outer")
        .select(col("wallet_id"), col("balance"),
          coalesce(col("above_threshold"), lit(false)).as("above_threshold"))
        .orderBy(col("wallet_id"))
    } finally {
      started.foreach(q =>
        try q.stop() catch { case scala.util.control.NonFatal(_) => () })
      s.catalog.dropTempView(balName)
      s.catalog.dropTempView(flagName)
      Maintenance.deleteRecursively(new java.io.File(work))
    }
  }

  /** Event-time tumbling-window aggregation through the REAL micro-batch
    * engine (the registered `q_tumbling_window` is the batch analog): the
    * deposit feed readStream → watermark → `window('1 day')` → windowed
    * count/sum, update mode. Spark aligns windows to the epoch, so the
    * oracle's `tsec // 86400 * 86400` bucket is the same window start.
    * Money is summed scaled-int (engine-reassociation-proof). The feed is
    * consumed in one micro-batch (see class doc), so the update-mode
    * memory sink holds exactly one final row per window.
    */
  /** Per-day deposit-amount quantiles maintained BY THE STREAM: the
    * custom mergeable quantile sketch ([[graft.functions.QskSketchAgg]])
    * runs as the streaming aggregation's state — each micro-batch folds
    * its rows into the per-window sketch buffer exactly like sum/count
    * state, which is the point of a MERGEABLE sketch: the same aggregate
    * serves batch rollups and incremental streaming maintenance. */
  private def streamQuantile(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    runStream(s, depositFeed(s, dir),
        Encoders.product[TimedDeposit].schema) { src =>
      src
        .withColumn("eventTime", timestamp_seconds(col("tsUnix")))
        .withWatermark("eventTime", "1 hour")
        .groupBy(window(col("eventTime"), "1 day").as("w"))
        .agg(
          call_function("qsk_sketch",
            round(col("amount") * 100).cast("long")).as("sk"),
          count(lit(1)).as("n"))
        .select(unix_timestamp(col("w.start")).as("day_start"), col("n"),
          call_function("qsk_quantile", col("sk"), lit(0.5)).as("p50"),
          call_function("qsk_quantile", col("sk"), lit(0.95)).as("p95"))
    }(_.orderBy(col("day_start")))
  }

  /** Shared harness for the single-query streaming builders: stand up
    * readStream(`schema` over `feed`) → `transform` → memory sink on a
    * fresh checkpoint workspace, drain (recording state + latency
    * metrics), hand the materialized view to `finish`, and ALWAYS tear
    * down (stop, drop view, delete workspace). `s.table` resolves the
    * memory sink's plan eagerly, so the returned frame survives the
    * temp-view drop. */
  private def runStream(s: SparkSession, feed: String,
                        schema: org.apache.spark.sql.types.StructType,
                        outputMode: String = "update")
                       (transform: DataFrame => DataFrame)
                       (finish: DataFrame => DataFrame): DataFrame = {
    val name = s"stream_${UUID.randomUUID().toString.replace("-", "")}"
    val work = s"$wsRoot/run_$name"
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      q = transform(s.readStream.schema(schema).parquet(feed))
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", s"$work/cp")
        .outputMode(outputMode).start()
      drain(q)
      finish(s.table(name))
    } finally {
      if (q != null) try q.stop() catch { case scala.util.control.NonFatal(_) => () }
      s.catalog.dropTempView(name)
      Maintenance.deleteRecursively(new java.io.File(work))
    }
  }

  /** Per-day distinct depositors maintained BY THE STREAM via the custom
    * md5-HLL sketch as streaming aggregation state — like
    * [[streamQuantile]], the integration a mergeable sketch exists for.
    * The exact-distinct column joins in from the batch table (distinct
    * aggregates are unsupported inside streaming aggregations — exactly
    * WHY a production stream maintains the sketch instead). */
  private def streamDistinctHll(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    runStream(s, depositFeed(s, dir),
        Encoders.product[TimedDeposit].schema) { src =>
      src
        .withColumn("eventTime", timestamp_seconds(col("tsUnix")))
        .withWatermark("eventTime", "1 hour")
        .groupBy(window(col("eventTime"), "1 day").as("w"))
        .agg(call_function("hll_md5_sketch", col("walletId")).as("sk"))
        .select(unix_timestamp(col("w.start")).as("day_start"),
          round(call_function("hll_md5_estimate", col("sk")), 2)
            .as("approx_distinct"))
    } { out =>
      val exact = depositProjection(s, dir)
        .groupBy((floor(col("tsUnix") / 86400) * 86400).as("day_start"))
        .agg(countDistinct(col("walletId")).as("exact_distinct"))
      out.join(exact, "day_start").orderBy(col("day_start"))
    }
  }

  /** Per-day heavy-hitter counts maintained BY THE STREAM via the custom
    * mergeable count-min sketch as streaming aggregation state — the
    * third sketch-state integration next to [[streamDistinctHll]] (HLL)
    * and [[streamQuantile]] (quantiles): a per-day GROUP BY user would
    * keep the full key space in state, the CMS keeps a fixed 4×4096
    * integer grid per window. Serve-side, probe keys 1–10 are estimated
    * from the maintained sketch and the exact counts join in from the
    * batch table (all-integer oracle — the estimate compares exactly). */
  private def streamHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val probes = (1L to 10L).toSeq
    runStream(s, eventsFeed(s, dir),
        Encoders.product[graft.model.TypedEvent].schema) { src =>
      src
        .withColumn("eventTime", timestamp_micros(col("tsUs")))
        .withWatermark("eventTime", "1 hour")
        .groupBy(window(col("eventTime"), "1 day").as("w"))
        .agg(call_function("cms_sketch", col("userId")).as("sk"))
        .select(unix_timestamp(col("w.start")).as("day_start"), col("sk"))
    } { out =>
      val est = out.select(col("day_start"),
          explode(array(probes.map(p => struct(
            lit(p).as("user_id"),
            call_function("cms_estimate", col("sk"), lit(p)).as("cms_count"))): _*))
            .as("e"))
        .select(col("day_start"), col("e.user_id").as("user_id"),
          col("e.cms_count").as("cms_count"))
      val exact = Tables.events(s, dir)
        .where(col("user_id").isin(probes: _*))
        .groupBy((floor(expr("unix_micros(ts) div 1000000") / 86400) * 86400)
            .cast("long").as("day_start"),
          col("user_id"))
        .agg(count(lit(1)).as("exact_count"))
      est.join(exact, Seq("day_start", "user_id"), "left_outer")
        .select(col("day_start"), col("user_id"), col("cms_count"),
          coalesce(col("exact_count"), lit(0L)).as("exact_count"))
        .orderBy(col("day_start"), col("user_id"))
    }
  }

  private def streamWindowAgg(s: SparkSession, dir: String): DataFrame =
    runStream(s, depositFeed(s, dir),
        Encoders.product[TimedDeposit].schema) { src =>
      src
        .withColumn("eventTime", timestamp_seconds(col("tsUnix")))
        .withWatermark("eventTime", "1 hour")
        .groupBy(window(col("eventTime"), "1 day").as("w"))
        .agg(count(lit(1)).as("n_deposits"),
          (sum(round(col("amount") * 100).cast("long")) / 100.0).as("total"))
        .select(unix_timestamp(col("w.start")).as("day_start"),
          col("n_deposits"), col("total"))
    }(_.orderBy(col("day_start")))

  /** Streaming windowed TOP-K: the aggregate (day × type totals) is
    * maintained BY the micro-batch engine — that is the streaming-legal
    * part — and the rank is applied to the continuously-maintained output
    * table at serve time (update-mode streams cannot rank across keys
    * in-flight; production serves "top dimensions per window" exactly
    * this way: stream maintains, reader ranks). Integer-cent sums keep
    * the totals engine-exact, so the rank order is portable. */
  private def streamTopK(s: SparkSession, dir: String, k: Int): DataFrame = {
    val feed = eventsFeed(s, dir)
    def unique = s"stream_${UUID.randomUUID().toString.replace("-", "")}"
    val work = s"$wsRoot/run_$unique"
    val name = unique
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      q = s.readStream
        .schema(StructType(Seq(
          StructField("userId", LongType), StructField("eventId", LongType),
          StructField("eventType", org.apache.spark.sql.types.StringType),
          StructField("value", org.apache.spark.sql.types.DoubleType),
          StructField("tsUs", LongType))))
        .parquet(feed)
        .withColumn("eventTime", timestamp_micros(col("tsUs")))
        .withWatermark("eventTime", "1 hour")
        .groupBy(window(col("eventTime"), "1 day").as("w"),
          col("eventType").as("event_type"))
        .agg(count(lit(1)).as("n"),
          (sum(round(col("value") * 100).cast("long")) / 100.0).as("total"))
        .select(unix_timestamp(col("w.start")).as("day_start"),
          col("event_type"), col("n"), col("total"))
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", s"$work/cp")
        .outputMode("update").start()
      drain(q)
      val rw = Window.partitionBy(col("day_start"))
        .orderBy(col("total").desc, col("event_type"))
      s.table(name)
        .withColumn("rnk", row_number().over(rw).cast("long"))
        .where(col("rnk") <= k)
        .select(col("day_start"), col("rnk"), col("event_type"), col("n"),
          col("total"))
        .orderBy(col("day_start"), col("rnk"))
    } finally {
      if (q != null) try q.stop() catch { case scala.util.control.NonFatal(_) => () }
      s.catalog.dropTempView(name)
      Maintenance.deleteRecursively(new java.io.File(work))
    }
  }

  /** Stream ⋈ static enrichment — the canonical streaming dimension
    * join: the event stream joins a BATCH dimension table (customer)
    * that Spark broadcasts into every micro-batch task, stateless (no
    * watermark needed for the join itself — nothing is buffered), then
    * rolls up per segment. At 100 TB/day this is exactly the shape for
    * enriching a firehose with reference data: the dim is broadcast (or
    * a slowly-refreshed state-store side input), the stream partitioning
    * is untouched until the aggregate's own shuffle. */
  private def streamEnrich(s: SparkSession, dir: String): DataFrame = {
    val feed = eventsFeed(s, dir)
    val dim = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    def unique = s"stream_${UUID.randomUUID().toString.replace("-", "")}"
    val work = s"$wsRoot/run_$unique"
    val name = unique
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      q = s.readStream
        .schema(Encoders.product[graft.model.TypedEvent].schema)
        .parquet(feed)
        .join(broadcast(dim), col("userId") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_events"),
          (sum(round(col("value") * 100).cast("long")) / 100.0).as("total"))
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", s"$work/cp")
        .outputMode("complete").start()
      drain(q)
      s.table(name).orderBy(col("segment"))
    } finally {
      if (q != null) try q.stop() catch { case scala.util.control.NonFatal(_) => () }
      s.catalog.dropTempView(name)
      Maintenance.deleteRecursively(new java.io.File(work))
    }
  }

  /** Streaming SESSION windows through the micro-batch engine: dynamic-
    * gap sessionization (30 min of inactivity closes a wallet's session)
    * with watermarked state — the state row for a session is evictable
    * once the watermark passes its close, so state is bounded by ACTIVE
    * sessions, not by history. Session state is keyed by wallet — the
    * shuffle key — exactly the batch `session_window` partitioning.
    */
  private def streamSessionAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feed = depositFeed(s, dir)
    def unique = s"stream_${UUID.randomUUID().toString.replace("-", "")}"
    val work = s"$wsRoot/run_$unique"
    val name = unique
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      // Session windows only emit in APPEND mode, i.e. when the watermark
      // passes a session's close — so the topology runs on a private copy
      // of the feed and, after the real data is processed, appends ONE
      // far-future sentinel deposit whose event time pushes the watermark
      // past every real session close. That is the production shape:
      // sessions are finalized by time advancing, not by someone peeking
      // at unfinished state. The sentinel's own (never-finalized) session
      // is excluded by key.
      val sessionFeed = s"$work/feed"
      s.read.parquet(feed).write.parquet(sessionFeed)
      q = s.readStream
        .schema(Encoders.product[TimedDeposit].schema)
        .parquet(sessionFeed)
        .withColumn("eventTime", timestamp_seconds(col("tsUnix")))
        .withWatermark("eventTime", "1 hour")
        .groupBy(session_window(col("eventTime"), "30 minutes").as("w"),
          col("walletId"))
        .agg(count(lit(1)).as("n"),
          (sum(round(col("amount") * 100).cast("long")) / 100.0).as("total"))
        .select(col("walletId"), unix_timestamp(col("w.start")).as("session_start"),
          col("n"), col("total"))
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", s"$work/cp")
        .outputMode("append").start()
      q.processAllAvailable()
      val maxTs = s.read.parquet(feed).agg(max(col("tsUnix"))).head.getLong(0)
      Seq(TimedDeposit("sentinel", 0.0, maxTs + 2 * 3600 + 1800 + 10, -1L))
        .toDF().coalesce(1).write.mode("append").parquet(sessionFeed)
      drain(q)
      s.table(name)
        .filter(col("walletId") =!= "sentinel")
        .select(col("walletId").cast("long").as("wallet_id"),
          col("session_start"), col("n"), col("total"))
        .orderBy(col("wallet_id"), col("session_start"))
    } finally {
      if (q != null) try q.stop() catch { case scala.util.control.NonFatal(_) => () }
      s.catalog.dropTempView(name)
      Maintenance.deleteRecursively(new java.io.File(work))
    }
  }

  /** Stream-STREAM inner join through the micro-batch engine: click →
    * purchase attribution (each purchase matched to the same user's
    * clicks in the preceding hour). Both sides carry watermarks and the
    * join condition carries the event-time range, so Spark derives a
    * state-eviction bound for BOTH buffers — a click older than the
    * watermark minus the range can never match a future purchase and its
    * state row is dropped. That bounded-state property is the whole
    * point: an un-watermarked stream-stream join buffers each side
    * forever. State is keyed by user — the shuffle key — so at scale the
    * join partitions by user exactly like the batch equivalent.
    */
  private def streamStreamJoin(s: SparkSession, dir: String): DataFrame = {
    val feed = eventsFeed(s, dir)
    def unique = s"stream_${UUID.randomUUID().toString.replace("-", "")}"
    val work = s"$wsRoot/run_$unique"
    val name = unique
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      def ev = s.readStream
        .schema(Encoders.product[graft.model.TypedEvent].schema)
        .parquet(feed)
      val clicks = ev.filter(col("eventType") === "click")
        .select(col("userId").as("c_uid"), col("eventId").as("click_id"),
          timestamp_micros(col("tsUs")).as("click_ts"))
        .withWatermark("click_ts", "2 hours")
      val purchases = ev.filter(col("eventType") === "purchase")
        .select(col("userId").as("user_id"), col("eventId").as("purchase_id"),
          col("value"), timestamp_micros(col("tsUs")).as("purchase_ts"))
        .withWatermark("purchase_ts", "2 hours")
      q = purchases.join(clicks,
          col("user_id") === col("c_uid") &&
            col("click_ts") >= col("purchase_ts") - expr("interval 1 hour") &&
            col("click_ts") <= col("purchase_ts"))
        .select(col("user_id"), col("purchase_id"), col("click_id"),
          col("value"))
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", s"$work/cp")
        .outputMode("append").start()
      drain(q)
      s.table(name).orderBy(col("purchase_id"), col("click_id"))
    } finally {
      if (q != null) try q.stop() catch { case scala.util.control.NonFatal(_) => () }
      s.catalog.dropTempView(name)
      Maintenance.deleteRecursively(new java.io.File(work))
    }
  }

  /** Exactly-once streaming dedup: the feed unioned with ITSELF (every
    * deposit delivered twice — the at-least-once redelivery shape) →
    * `dropDuplicatesWithinWatermark` on the event key, append mode; the
    * deduped stream folds to per-wallet (count, total), which therefore
    * must equal the ONCE-delivered aggregate the oracle computes. Dedup
    * state is watermark-bounded — the 100-TB posture (unbounded
    * `dropDuplicates` state grows with every key ever seen).
    */
  private def streamDedup(s: SparkSession, dir: String): DataFrame = {
    val feed = depositFeed(s, dir)
    def unique = s"stream_${UUID.randomUUID().toString.replace("-", "")}"
    val work = s"$wsRoot/run_$unique"
    val name = unique
    def src = s.readStream
      .schema(Encoders.product[TimedDeposit].schema)
      .parquet(feed)
    var q: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      q = src.union(src)
        .withColumn("eventTime", timestamp_seconds(col("tsUnix")))
        .withWatermark("eventTime", "1 hour")
        .dropDuplicatesWithinWatermark("seq")
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", s"$work/cp")
        .outputMode("append").start()
      drain(q)
      s.table(name)
        .groupBy(col("walletId").cast("long").as("wallet_id"))
        .agg(count(lit(1)).as("n_deposits"),
          (sum(round(col("amount") * 100).cast("long")) / 100.0).as("total"))
        .orderBy(col("wallet_id"))
    } finally {
      if (q != null) try q.stop() catch { case scala.util.control.NonFatal(_) => () }
      s.catalog.dropTempView(name)
      Maintenance.deleteRecursively(new java.io.File(work))
    }
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

  private def byWallet(df: DataFrame): DataFrame = df.orderBy(col("wallet_id"))

  val all: Seq[Q] = Seq(
    // Reference constants: 120 s window, threshold 10,000 (detector.go:16-17).
    Q("stream_check", checkSql(DetectorLogic.RollingPeriodSec, DetectorLogic.MaxAmount)) {
      (s, d) => materialized(s, "stream_check", depositFeed(s, d))(
        streamCheck(s, d, DetectorLogic.RollingPeriodSec, DetectorLogic.MaxAmount))(byWallet)
    },
    // Tuned so verdicts vary on the synthetic feed (1-day window, 300).
    Q("stream_check_tuned", checkSql(86400L, 300.0)) {
      (s, d) => materialized(s, "stream_check_tuned", depositFeed(s, d))(
        streamCheck(s, d, 86400L, 300.0))(byWallet)
    },
    // Same tuned pipeline through the Spark 4 transformWithState detector
    // (StatefulProcessor + RocksDB state store) — must match the same
    // oracle as the flatMapGroupsWithState form.
    Q("stream_check_tws", checkSql(86400L, 300.0)) {
      (s, d) => materialized(s, "stream_check_tws", depositFeed(s, d))(
        streamCheck(s, d, 86400L, 300.0, useTws = true))(byWallet)
    },
    // The reference's actual wire format end-to-end: the feed carries
    // proto3-marshaled Deposit bytes (wallet.proto:14-17) in Kafka message
    // framing, decoded per record by the codegen'd wire codec inside the
    // real micro-batch engine — same oracle as stream_check, so the
    // encode→wire→decode round trip must be value-exact.
    Q("stream_check_proto", checkSql(DetectorLogic.RollingPeriodSec, DetectorLogic.MaxAmount)) {
      (s, d) => materialized(s, "stream_check_proto", protoDepositFeed(s, d))(
        streamCheck(s, d, DetectorLogic.RollingPeriodSec, DetectorLogic.MaxAmount,
          proto = true))(byWallet)
    },
    // The production many-micro-batch shape: the time-sliced chunk feed
    // replayed one file per trigger — per-wallet detector/collector state
    // continues across micro-batch boundaries (reference constants, same
    // oracle as stream_check).
    Q("stream_check_chunked", checkSql(DetectorLogic.RollingPeriodSec, DetectorLogic.MaxAmount)) {
      (s, d) => materialized(s, "stream_check_chunked", chunkedDepositFeed(s, d))(
        streamCheck(s, d, DetectorLogic.RollingPeriodSec, DetectorLogic.MaxAmount,
          chunked = true))(byWallet)
    },

    // The engine's OWN DataSource V2 connector as the STREAMING source:
    // the framed replay log (arrival-ordered offsets) consumed ONE
    // SEGMENT PER TRIGGER through graft-replay's offset-range admission
    // control — per-wallet detector/collector state provably continues
    // across the connector's micro-batch boundaries (same oracle as
    // stream_check; the chunked-feed contract re-proven through the
    // custom source).
    Q("stream_check_replay", checkSql(DetectorLogic.RollingPeriodSec, DetectorLogic.MaxAmount)) {
      (s, d) => materialized(s, "stream_check_replay", replayStreamFeed(s, d))(
        streamCheck(s, d, DetectorLogic.RollingPeriodSec, DetectorLogic.MaxAmount,
          replay = true))(byWallet)
    },

    // Event-time tumbling windows through the real micro-batch engine
    // (epoch-aligned '1 day' windows = the oracle's integer day bucket).
    Q("stream_window_agg",
      "SELECT (epoch_us(ts) // 1000000) // 86400 * 86400 AS day_start, " +
        "COUNT(*) AS n_deposits, " +
        "SUM(CAST(ROUND(value*100) AS BIGINT))/100.0 AS total " +
        "FROM events WHERE value > 0 GROUP BY 1 ORDER BY 1") {
      (s, d) => materialized(s, "stream_window_agg", depositFeed(s, d))(
        streamWindowAgg(s, d))(_.orderBy(col("day_start")))
    },

    // Streaming per-day distinct depositors via the custom md5-HLL as
    // streaming aggregation state (distinct aggs are unsupported in
    // streaming — the sketch IS the production answer); full-value
    // estimate oracle (HllOracle.estCteFor replays the identical
    // estimator keyed by day), exact-distinct joined from the batch
    // table on both engines.
    Q("stream_distinct_hll",
      HllOracle.estCteFor(
        "SELECT (epoch_us(ts) // 1000000) // 86400 * 86400 AS grp, " +
          "md5(CAST(user_id AS VARCHAR)) AS hh FROM events WHERE value > 0") +
        ", ex AS (SELECT (epoch_us(ts) // 1000000) // 86400 * 86400 AS grp, " +
        "COUNT(DISTINCT user_id) AS exact_distinct FROM events " +
        "WHERE value > 0 GROUP BY 1) " +
        "SELECT est.grp AS day_start, est.est AS approx_distinct, " +
        "ex.exact_distinct FROM est JOIN ex ON est.grp = ex.grp " +
        "ORDER BY day_start") {
      (s, d) => materialized(s, "stream_distinct_hll", depositFeed(s, d))(
        streamDistinctHll(s, d))(_.orderBy(col("day_start")))
    },

    // Streaming per-day amount quantiles via the custom MERGEABLE
    // quantile sketch as streaming aggregation state (the cross-family
    // integration a mergeable sketch exists for: identical aggregate,
    // batch rollup or incremental micro-batch maintenance). The oracle
    // replays the integer log-grid selection per day from the same
    // events — see graft.functions.QuantileSketch.
    Q("stream_quantile",
      "WITH e AS (SELECT (epoch_us(ts) // 1000000) // 86400 * 86400 AS day_start, " +
        "CAST(ROUND(value * 100) AS BIGINT) AS c FROM events WHERE value > 0), " +
        "b AS (SELECT day_start, (c >> s) << s AS bk, COUNT(*) AS cnt FROM (" +
        "SELECT day_start, c, GREATEST(length(bin(c)) - 1 - 6, 0) AS s FROM e) " +
        "GROUP BY 1, 2), " +
        "tot AS (SELECT day_start, CAST(SUM(cnt) AS BIGINT) AS n FROM b GROUP BY 1), " +
        "cum AS (SELECT day_start, bk, CAST(SUM(cnt) OVER (" +
        "PARTITION BY day_start ORDER BY bk) AS BIGINT) AS cum FROM b), " +
        "qs AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES (0.5), (0.95)) t(q)), " +
        "sel AS (SELECT cum.day_start AS day_start, qs.q AS q, MIN(cum.bk) AS est " +
        "FROM cum JOIN tot ON cum.day_start = tot.day_start CROSS JOIN qs " +
        "WHERE cum.cum >= GREATEST(CAST(CEIL(qs.q * tot.n) AS BIGINT), 1) " +
        "GROUP BY 1, 2) " +
        "SELECT t.day_start AS day_start, t.n, " +
        "MAX(CASE WHEN sel.q = 0.5 THEN sel.est END) AS p50, " +
        "MAX(CASE WHEN sel.q = 0.95 THEN sel.est END) AS p95 " +
        "FROM sel JOIN tot t ON sel.day_start = t.day_start " +
        "GROUP BY 1, 2 ORDER BY t.day_start") {
      (s, d) => materialized(s, "stream_quantile", depositFeed(s, d))(
        streamQuantile(s, d))(_.orderBy(col("day_start")))
    },

    // Streaming per-day heavy-hitter counts via the custom mergeable CMS
    // as streaming aggregation state (see [[streamHeavyHitters]]); the
    // all-integer oracle replays per-day bucket membership and the min
    // over 4 hash rows exactly like q_cms_heavy_hitters, keyed by day.
    Q("stream_heavy_hitters",
      "WITH rows_ AS (SELECT * FROM (VALUES (0), (1), (2), (3)) r(i)), " +
        "probes AS (SELECT CAST(pk AS BIGINT) AS pk FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),(10)) t(pk)), " +
        "e AS (SELECT (epoch_us(ts) // 1000000) // 86400 * 86400 AS day_start, " +
        "user_id FROM events), " +
        "db AS (SELECT day_start, i, substr(md5(CAST(user_id AS VARCHAR)), 1 + 3 * i, 3) AS b, " +
        "COUNT(*) AS c FROM e CROSS JOIN rows_ GROUP BY 1, 2, 3), " +
        "days AS (SELECT DISTINCT day_start FROM e), " +
        "pb AS (SELECT day_start, pk, i, substr(md5(CAST(pk AS VARCHAR)), 1 + 3 * i, 3) AS b " +
        "FROM days CROSS JOIN probes CROSS JOIN rows_), " +
        "est AS (SELECT day_start, pk, MIN(COALESCE(c, 0)) AS cms_count " +
        "FROM pb LEFT JOIN db USING (day_start, i, b) GROUP BY 1, 2), " +
        "ex AS (SELECT day_start, user_id AS pk, COUNT(*) AS exact_count FROM e " +
        "WHERE user_id BETWEEN 1 AND 10 GROUP BY 1, 2) " +
        "SELECT est.day_start AS day_start, est.pk AS user_id, est.cms_count, " +
        "COALESCE(ex.exact_count, 0) AS exact_count " +
        "FROM est LEFT JOIN ex ON est.day_start = ex.day_start AND est.pk = ex.pk " +
        "ORDER BY day_start, user_id") {
      (s, d) => materialized(s, "stream_heavy_hitters", eventsFeed(s, d))(
        streamHeavyHitters(s, d))(_.orderBy(col("day_start"), col("user_id")))
    },

    // Streaming windowed top-3 event types per day: the day×type totals
    // are maintained by the real micro-batch engine; the rank reads the
    // maintained output (update-mode streams cannot rank across keys
    // in-flight — this maintain-then-rank split IS the production serve
    // shape). Integer-cent sums make the rank order engine-exact.
    Q("stream_topk",
      "WITH e AS (SELECT (epoch_us(ts) // 1000000) // 86400 * 86400 AS day_start, " +
        "event_type, value FROM events), " +
        "d AS (SELECT day_start, event_type, COUNT(*) AS n, " +
        "SUM(CAST(ROUND(value*100) AS BIGINT))/100.0 AS total FROM e GROUP BY 1, 2), " +
        "r AS (SELECT day_start, event_type, n, total, ROW_NUMBER() OVER " +
        "(PARTITION BY day_start ORDER BY total DESC, event_type) AS rnk FROM d) " +
        "SELECT day_start, rnk, event_type, n, total FROM r WHERE rnk <= 3 " +
        "ORDER BY day_start, rnk") {
      (s, d) => materialized(s, "stream_topk", eventsFeed(s, d))(
        streamTopK(s, d, k = 3))(_.orderBy(col("day_start"), col("rnk")))
    },

    // Streaming session windows (30-min inactivity gap) over the deposit
    // feed; the oracle is the gaps-and-islands sessionization of the same
    // second-granularity events. Break condition is STRICTLY > gap: Spark
    // session windows are [start, last + gap] on merge — an event landing
    // exactly at the close still joins the session (verified: the sf0.1
    // data has exactly one such boundary pair).
    Q("stream_session_agg",
      "WITH e AS (SELECT user_id AS wallet_id, epoch_us(ts) // 1000000 AS t, " +
        "value FROM events WHERE value > 0), " +
        "m AS (SELECT *, CASE WHEN LAG(t) OVER w IS NULL " +
        "OR t - LAG(t) OVER w > 1800 THEN 1 ELSE 0 END AS brk " +
        "FROM e WINDOW w AS (PARTITION BY wallet_id ORDER BY t)), " +
        "g AS (SELECT *, SUM(brk) OVER (PARTITION BY wallet_id ORDER BY t " +
        "ROWS UNBOUNDED PRECEDING) AS sid FROM m) " +
        "SELECT wallet_id, MIN(t) AS session_start, COUNT(*) AS n, " +
        "SUM(CAST(ROUND(value*100) AS BIGINT))/100.0 AS total " +
        "FROM g GROUP BY wallet_id, sid ORDER BY wallet_id, session_start") {
      (s, d) => materialized(s, "stream_session_agg", depositFeed(s, d))(
        streamSessionAgg(s, d))(
        _.orderBy(col("wallet_id"), col("session_start")))
    },

    // Stream-stream inner join (click→purchase attribution within 1 hour)
    // with watermark-bounded state on both sides; the oracle is the batch
    // time-range join over the same events.
    Q("stream_join",
      "SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id, " +
        "p.value FROM events p JOIN events c ON p.user_id = c.user_id " +
        "AND p.event_type = 'purchase' AND c.event_type = 'click' " +
        "AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts " +
        "ORDER BY purchase_id, click_id") {
      (s, d) => materialized(s, "stream_join", eventsFeed(s, d))(
        streamStreamJoin(s, d))(_.orderBy(col("purchase_id"), col("click_id")))
    },

    // At-least-once redelivery (feed ∪ feed) collapsed by watermarked
    // streaming dedup — per-wallet totals must equal once-delivery.
    Q("stream_dedup",
      "SELECT user_id AS wallet_id, COUNT(*) AS n_deposits, " +
        "SUM(CAST(ROUND(value*100) AS BIGINT))/100.0 AS total " +
        "FROM events WHERE value > 0 GROUP BY 1 ORDER BY 1") {
      (s, d) => materialized(s, "stream_dedup", depositFeed(s, d))(
        streamDedup(s, d))(byWallet)
    },

    // Stream ⋈ static dimension enrichment: every micro-batch joins the
    // broadcast customer dim (stateless — nothing buffered), per-segment
    // running totals in complete mode. The oracle is the batch join+agg.
    Q("stream_enrich",
      "SELECT c_mktsegment AS segment, COUNT(*) AS n_events, " +
        "SUM(CAST(ROUND(value*100) AS BIGINT))/100.0 AS total " +
        "FROM events JOIN customer ON user_id = c_custkey " +
        "GROUP BY 1 ORDER BY 1") {
      (s, d) => materialized(s, "stream_enrich", eventsFeed(s, d))(
        streamEnrich(s, d))(_.orderBy(col("segment")))
    },

    // Streaming ingest dedup against the persisted LSH index: arriving
    // documents replay one batch file per micro-batch, each probing the
    // historical artifact asymmetrically inside foreachBatch — dedup AT
    // INGEST, stateless in the stream (corpus knowledge lives in the
    // artifact; per-batch cost tracks the batch). Oracle = the batch
    // served/incremental probe: the micro-batch split must be invisible
    // in the pair set.
    Q("stream_lsh_dedup", DedupQueries.incrementalSql) {
      (s, d) => materialized(s, "stream_lsh_dedup", docsBatchFeed(s, d))(
        streamLshDedup(s, d))(_.orderBy(col("new_id"), col("dup_of")))
    },

    // Streaming ANN serving from the persisted IVF index: arriving query
    // vectors replay one batch file per micro-batch, each assigned + served
    // top-3 from the index artifact inside foreachBatch — retrieval at
    // ingest, stateless in the stream. Oracle = the batch sim_ivf_served:
    // the micro-batch split must be invisible in the served rows.
    Q("stream_ann_serve", SimilarityQueries.ivfServedOracleSql) {
      (s, d) => materialized(s, "stream_ann_serve", embBatchFeed(s, d))(
        streamAnnServe(s, d))(_.orderBy(col("qid"), col("rank")))
    },

    // Streaming DSIR scoring at ingest — the data-selection gate placed
    // where a production pipeline runs it: each arriving micro-batch of
    // documents is bucketized and scored against the PERSISTED log-ratio
    // artifact (Corpus.dsirScoreBatch, the same dsir_ratios every batch
    // consumer reads) inside foreachBatch. The stream is STATELESS (all
    // corpus knowledge lives in the artifact; per-batch cost tracks the
    // batch), and because the score is per-doc and every doc arrives
    // exactly once, per-batch results compose into the global result:
    // output is row-identical to the batch served chain over the feed
    // subset, which is the oracle.
    Q("stream_dsir_score", CorpusQueries.dsirStreamSql) {
      (s, d) => materialized(s, "stream_dsir_score", docsBatchFeed(s, d))(
        streamDsirScore(s, d))(_.orderBy(col("doc_id")))
    },

    // Content-defined chunking AT INGEST — the chunker as the fourth
    // member of the stateless-ingest family (near-dup probe, ANN serve,
    // DSIR score): each arriving micro-batch of documents chunks inside
    // foreachBatch. Chunk ids/digests are per-document functions, so the
    // batch split is invisible and the batch chunker over the feed subset
    // is the oracle (same composition argument as stream_dsir_score).
    Q("stream_cdc_chunks", TextQueries.cdcStreamSql) {
      (s, d) => materialized(s, "stream_cdc_chunks", docsBatchFeed(s, d))(
        streamCdcChunks(s, d))(_.orderBy(col("doc_id"), col("chunk_id")))
    },

    // Quality GATE at ingest — the fifth member of the stateless-ingest
    // family (near-dup probe, ANN serve, DSIR score, CDC chunker): each
    // arriving micro-batch scores the text_quality composite inside
    // foreachBatch and only passing documents continue downstream — the
    // standard production placement for Gopher-style corpus filters
    // (score once at the door, never re-scan the lake). The scorer is
    // the SAME shared implementation the batch census audits, and scores
    // are per-document functions, so the batch split is invisible and
    // the batch scorer over the feed subset is the oracle.
    Q("stream_quality_gate", TextQueries.qualityGateStreamSql(0.5)) {
      (s, d) => materialized(s, "stream_quality_gate", docsBatchFeed(s, d))(
        streamQualityGate(s, d, tau = 0.5))(_.orderBy(col("doc_id")))
    },

    // HYBRID retrieval at ingest — the RAG serving edge as a streaming
    // topology: each arriving micro-batch of query vectors probes BOTH
    // maintained index artifacts (the sparse tf-idf postings and the
    // trained IVF inverted file) inside foreachBatch and fuses the two
    // k-bounded rankings by RRF (the SAME shared fusion implementation
    // the batch path uses). Stateless — corpus knowledge lives entirely
    // in the artifacts, per-batch cost tracks the batch — and rankings
    // are per-query functions, so the batch split is invisible: the
    // oracle is the single-statement batch fusion of both serve chains
    // over the feed's query set.
    Q("stream_hybrid_serve", CorpusQueries.hybridServeStreamSql) {
      (s, d) => materialized(s, "stream_hybrid_serve", embBatchFeed(s, d))(
        streamHybridServe(s, d))(_.orderBy(col("qid"), col("rank")))
    },

    // PROVENANCE AT INGEST — the funnel's fate decision placed at the
    // door, the seventh member of the stateless-ingest family: each
    // arriving document gets its first-drop-wins fate (quality gate →
    // exact dedup vs the HISTORY digest artifact → near-dup vs the
    // persisted LSH index → kept) decided inside foreachBatch, so the
    // ingest edge emits the same telemetry record the batch funnel
    // (pipeline_provenance) ships for the lake. Every stage signal is a
    // per-document function of (doc, history) — the SAME shared scorer
    // as stream_quality_gate, the SAME digest/LSH artifacts as the
    // exact/incremental dedup rows — so the micro-batch split is
    // invisible and the oracle replays the identical three stages over
    // the feed subset from the SHARED CTE fragments (no hand-synced
    // replicas).
    Q("stream_provenance", provenanceStreamSql) {
      (s, d) => materialized(s, "stream_provenance", docsBatchFeed(s, d))(
        streamProvenance(s, d))(_.orderBy(col("doc_id")))
    }
  )

  /** See the stream_provenance registration: the at-ingest fate record's
    * oracle, composed from the shared quality-gate and incremental-LSH
    * CTE fragments plus the exact-digest probe. */
  private def provenanceStreamSql: String =
    s"WITH ${DedupQueries.incrementalCtes}, " +
      "nd AS (SELECT DISTINCT new_id AS doc_id FROM v WHERE jaccard >= 0.5), " +
      "ex AS (SELECT DISTINCT a.doc_id FROM documents a JOIN documents b " +
      "ON a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0 AND md5(a.text) = md5(b.text)), " +
      s"${TextQueries.qualityFeedCtes} " +
      "SELECT q.doc_id, CASE WHEN q.quality IS NULL OR q.quality < 0.5 THEN 'quality' " +
      "WHEN q.doc_id IN (SELECT doc_id FROM ex) THEN 'exact_dup' " +
      "WHEN q.doc_id IN (SELECT doc_id FROM nd) THEN 'near_dup' " +
      "ELSE 'kept' END AS fate, q.quality FROM q ORDER BY q.doc_id"

  /** Per-batch fate decision against the history artifacts: quality is
    * the shared scorer (per-doc), exact-dup probes the read-through
    * md5-digest artifact of the history corpus (the production digest
    * index — one semi equi-join on the digest, batch side broadcast),
    * near-dup probes the persisted LSH index asymmetrically (the
    * stream_lsh_dedup machinery). Signals are computed for the WHOLE
    * batch (the funnel reports the first-drop fate; a quality-dropped
    * doc's dup signals are simply outranked by the CASE order). */
  private def streamProvenance(s: SparkSession, dir: String): DataFrame = {
    val hist = Tables.documents(s, dir).filter(col("doc_id") % 5 =!= 0)
    val indexPath = DedupQueries.lshIndexFor(s, dir)
    val digests = graft.operators.IndexCache.cachedFrame(s, "exact_digests",
      "md5", graft.operators.Dedup.docFp(hist)) {
      hist.select(md5(col("text").cast("binary")).as("digest")).distinct()
    }
    foreachBatchReplay(s, docsBatchFeed(s, dir),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType, nullable = true)))) { batch =>
      val scored = TextQueries.qualityScored(batch)
        .select(col("doc_id"), col("quality"))
      val exact = batch
        .select(col("doc_id").as("ex_id"),
          md5(col("text").cast("binary")).as("digest"))
        .join(digests, Seq("digest"), "left_semi")
        .select(col("ex_id"))
      val near = graft.operators.Dedup.lshServedPairs(hist, batch, indexPath)
        .select(col("new_id").as("nd_id")).distinct()
      scored
        .join(exact, scored("doc_id") === col("ex_id"), "left")
        .join(near, scored("doc_id") === col("nd_id"), "left")
        .select(scored("doc_id"),
          when(col("quality").isNull || col("quality") < 0.5, lit("quality"))
            .when(col("ex_id").isNotNull, lit("exact_dup"))
            .when(col("nd_id").isNotNull, lit("near_dup"))
            .otherwise(lit("kept")).as("fate"),
          col("quality"))
    }.orderBy(col("doc_id"))
  }

  /** See the stream_cdc_chunks registration: per-batch chunking,
    * stateless, composes because chunks are per-doc. */
  private def streamCdcChunks(s: SparkSession, dir: String): DataFrame =
    foreachBatchReplay(s, docsBatchFeed(s, dir),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType, nullable = true)))) { batch =>
      graft.operators.Corpus.cdcChunks(batch)
    }.orderBy(col("doc_id"), col("chunk_id"))

  /** See the stream_quality_gate registration: per-batch scoring + gate,
    * stateless, composes because the score is per-doc. */
  private def streamQualityGate(s: SparkSession, dir: String,
                                tau: Double): DataFrame =
    foreachBatchReplay(s, docsBatchFeed(s, dir),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType, nullable = true)))) { batch =>
      TextQueries.qualityScored(batch)
        .where(col("quality") >= tau)
        .select(col("doc_id"), col("n_tokens"), col("quality"))
    }.orderBy(col("doc_id"))

  /** See the stream_dsir_score registration: per-batch artifact probe,
    * stateless, composes because scores are per-doc. */
  private def streamDsirScore(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    foreachBatchReplay(s, docsBatchFeed(s, dir),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType, nullable = true)))) { batch =>
      graft.operators.Corpus.dsirScoreBatch(docs, batch, buckets = 128,
        isTarget = col("doc_id") % 7 === 0)
    }.orderBy(col("doc_id"))
  }
}
