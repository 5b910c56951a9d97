package graft.service

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong
import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.model.TimedDeposit
import graft.streaming.DepositStreams

/** The reference's two HTTP endpoints (/root/reference/service/service.go)
  * over the streaming engine:
  *
  *  - `POST /deposit` `{"wallet_id": w, "amount": a}` — reject
  *    `amount <= 0` with 422 (service.go:87-91), otherwise feed the deposit
  *    stream and ACK only after the micro-batch commits (the analog of the
  *    blocking `EmitSync`, service.go:99). Test hook: an optional
  *    `ts_unix` field pins processing time (the reference stamps wall
  *    clock, detector.go:57).
  *  - `GET /check/{wallet_id}` — balance ⟕ flag with unknown-wallet →
  *    `{balance: 0, above_threshold: false}` and HTTP 200 (SURVEY §2.3.6).
  *
  * Topology: one collector query materializes the balance view; one
  * detector query (the exact state machine) materializes the verdict
  * stream, and the serve path applies the flagger's LWW at read time
  * (`max_by(verdict, seq)`) — the view-over-changelog form of O7.
  * A JDK HttpServer stands in for the reference's chi router; everything
  * engine-side is ordinary Structured Streaming.
  */
final class DepositService(spark: SparkSession, port: Int = 0) {
  import spark.implicits._
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val mapper = new ObjectMapper()
  private val seq = new AtomicLong(0L)
  private val suffix = java.util.UUID.randomUUID().toString.replace("-", "")
  private val balanceTable = s"svc_balance_$suffix"
  private val verdictTable = s"svc_verdicts_$suffix"

  private val input = MemoryStream[TimedDeposit]

  private val collectorQuery = DepositStreams.collector(spark, input.toDS())
    .writeStream.format("memory").queryName(balanceTable)
    .outputMode("update").start()

  private val detectorQuery = DepositStreams.detector(spark, input.toDS())
    .writeStream.format("memory").queryName(verdictTable)
    .outputMode("append").start()

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.createContext("/deposit", (ex: HttpExchange) => handleDeposit(ex))
  server.createContext("/check/", (ex: HttpExchange) => handleCheck(ex))
  server.setExecutor(null)
  server.start()

  def boundPort: Int = server.getAddress.getPort

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def handleDeposit(ex: HttpExchange): Unit =
    try {
      if (ex.getRequestMethod != "POST") { respond(ex, 405, """{"error":"POST only"}"""); return }
      val node = mapper.readTree(ex.getRequestBody)
      val wallet = Option(node.get("wallet_id")).map(_.asText()).getOrElse("")
      val amount = Option(node.get("amount")).map(_.asDouble()).getOrElse(0.0)
      if (wallet.isEmpty) { respond(ex, 400, """{"error":"wallet_id required"}"""); return }
      if (amount <= 0) { // service.go:87-91
        respond(ex, 422, """{"error":"amount must be positive"}"""); return
      }
      val ts = Option(node.get("ts_unix")).map(_.asLong())
        .getOrElse(System.currentTimeMillis() / 1000L)
      input.addData(TimedDeposit(wallet, amount, ts, seq.incrementAndGet()))
      // EmitSync analog: ack only once the engine has absorbed the event.
      collectorQuery.processAllAvailable()
      detectorQuery.processAllAvailable()
      respond(ex, 200, s"""{"wallet_id":"$wallet","status":"ok"}""")
    } catch {
      case _: Throwable => respond(ex, 500, """{"error":"internal"}""")
    }

  private def handleCheck(ex: HttpExchange): Unit =
    try {
      val wallet = ex.getRequestURI.getPath.stripPrefix("/check/")
      val balance = spark.table(balanceTable)
        .filter(col("walletId") === wallet)
        .agg(max_by(col("balance"), col("nDeposits")).as("b"))
        .collect().headOption.flatMap(r => Option(r.get(0)))
        .map(_.asInstanceOf[Double]).getOrElse(0.0)
      val flagged = spark.table(verdictTable)
        .filter(col("walletId") === wallet)
        .agg((!max_by(col("flagRemoved"), col("seq"))).as("f"))
        .collect().headOption.flatMap(r => Option(r.get(0)))
        .exists(_.asInstanceOf[Boolean])
      respond(ex, 200,
        s"""{"wallet_id":"$wallet","balance":$balance,"above_threshold":$flagged}""")
    } catch {
      case _: Throwable => respond(ex, 500, """{"error":"internal"}""")
    }

  def stop(): Unit = {
    server.stop(0)
    collectorQuery.stop()
    detectorQuery.stop()
  }
}
