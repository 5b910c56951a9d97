package graft.streaming

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Stream-static join — the production enrichment shape (a deposit stream
  * joined to a dimension table): the static side needs no watermark and
  * Spark re-plans it per micro-batch, broadcasting when small. At 100 TB
  * the static dim is the broadcast side and the stream never shuffles for
  * the join.
  */
class StreamStaticJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  private val n = new AtomicInteger(0)

  test("deposit stream enriches against a static dim; unknown keys pass as null") {
    val dim = Seq((1L, "GOLD"), (2L, "SILVER")).toDF("wallet_id", "tier")
    val input = MemoryStream[(Long, Double)]
    val name = s"ssj_${n.incrementAndGet()}"
    val joined = input.toDF().toDF("wallet_id", "amount")
      .join(broadcast(dim), Seq("wallet_id"), "left_outer")
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    input.addData((1L, 10.0), (2L, 20.0), (3L, 30.0))
    q.processAllAvailable()
    input.addData((1L, 5.0)) // second batch re-joins the same static side
    q.processAllAvailable(); q.stop()

    val rows = spark.table(name)
      .orderBy("wallet_id", "amount")
      .collect().map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2))))
    assert(rows.toSeq === Seq(
      (1L, 5.0, Some("GOLD")), (1L, 10.0, Some("GOLD")),
      (2L, 20.0, Some("SILVER")), (3L, 30.0, None)))
  }
}
