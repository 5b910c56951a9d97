package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FormattedMode, SimpleMode}

/** CBO evidence on the 6-table TPC-H joins (VERDICT r5 item 6): create
  * catalog tables over the sf parquet, run q7/q9 as HINT-FREE SQL (the
  * registered DataFrame forms hand-place `broadcast()`; here the
  * optimizer must choose), capture plan + wall time, then `ANALYZE TABLE
  * .. COMPUTE STATISTICS FOR ALL COLUMNS` and capture again. The deltas
  * go into PLANS.md (round 6).
  *
  * CBO needs catalog statistics, hence real tables instead of the temp
  * views the query registry uses — at 100 TB this is exactly the
  * metastore + ANALYZE discipline a deployment runs, and the audit shows
  * what the discipline buys (join reordering, build-side choice,
  * broadcast decisions) on the engine's own query shapes.
  */
object CboAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      // NOT histogram.enabled: equi-height histograms over TIMESTAMP_NTZ
      // columns MatchError inside join-reorder stats estimation in Spark
      // 4.1.2 (ToBlockedHistogram path) — basic column stats (ndv,
      // min/max, nulls) are what drive join reordering anyway.
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_cbo_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tables = Seq("nation", "supplier", "customer", "part", "orders", "lineitem")
    tables.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t USING parquet LOCATION '$sfDir/$t.parquet'")
    }

    val q7 =
      """SELECT supp_nation, cust_nation, yr, revenue FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |         CAST(year(l_shipdate) AS BIGINT) AS yr,
        |         SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT))/10000.0 AS revenue
        |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |  WHERE s_suppkey=l_suppkey AND o_orderkey=l_orderkey AND c_custkey=o_custkey
        |    AND s_nationkey=n1.n_nationkey AND c_nationkey=n2.n_nationkey
        |    AND ((n1.n_name='NATION_1' AND n2.n_name='NATION_2')
        |      OR (n1.n_name='NATION_2' AND n2.n_name='NATION_1'))
        |    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1,2,3) ORDER BY 1,2,3""".stripMargin
    val q9 =
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       SUM(CAST(ROUND((l_extendedprice*(1-l_discount) - p_retailprice*l_quantity*0.1)*10000) AS BIGINT))/10000.0 AS profit
        |FROM lineitem, orders, supplier, part, nation
        |WHERE s_suppkey=l_suppkey AND o_orderkey=l_orderkey AND p_partkey=l_partkey
        |  AND s_nationkey=n_nationkey AND p_type='STANDARD'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin

    def audit(tag: String): Unit = Seq("q7" -> q7, "q9" -> q9).foreach { case (n, sql) =>
      val df = spark.sql(sql)
      val t0 = System.nanoTime()
      df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(s"\n===== $n [$tag] ${f"$secs%.2f"}s =====")
      println(df.queryExecution.explainString(SimpleMode))
    }

    // Untimed warmup: run both queries once before either timed pass, so
    // the no-stats numbers aren't inflated by one-off JVM/codegen/footer
    // costs and the before/after delta isolates the ANALYZE effect.
    Seq(q7, q9).foreach(spark.sql(_).count())

    audit("no stats")
    tables.foreach { t =>
      // Not FOR ALL COLUMNS: stats on TIMESTAMP_NTZ columns MatchError in
      // FilterEstimation.evaluateBinary (Spark 4.1.2, FilterEstimation
      // .scala:281) as soon as a query filters on the column. Excluded
      // columns just fall back to default selectivity.
      val cols = spark.table(t).schema.fields
        .filterNot(_.dataType.typeName.startsWith("timestamp"))
        .map(_.name).mkString(", ")
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR COLUMNS $cols")
    }
    // Symmetric warmup: the rewired with-stats plans generate DIFFERENT
    // code, so they too get one untimed compile/execute pass — otherwise
    // the timed with-stats numbers carry first-execution codegen cost the
    // no-stats numbers don't.
    Seq(q7, q9).foreach(spark.sql(_).count())
    audit("with stats")
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.stop()
  }
}
