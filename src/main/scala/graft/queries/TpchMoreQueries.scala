package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Additional TPC-H-shaped analytics (Q10/Q16/Q18 analogs) and the window
  * frame/navigation family (running totals, moving averages, first_value,
  * ntile). */
object TpchMoreQueries {

  val all: Seq[Q] = Seq(

    // Q10 shape: returned-item revenue per customer in a quarter.
    Q("q10_returned_items",
      "SELECT c_custkey, c_name, " +
        "SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue, " +
        "c_acctbal FROM customer, orders, lineitem " +
        "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey " +
        "AND l_returnflag = 'R' " +
        "AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01' " +
        "GROUP BY c_custkey, c_name, c_acctbal " +
        "ORDER BY revenue DESC, c_custkey LIMIT 20") { (s, d) =>
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1996-04-01"))
      Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .agg((sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 10000).cast("long")) / 10000.0).as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"), col("c_acctbal"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // Q16 shape: distinct supplier count per part attribute group.
    Q("q16_parts_suppliers",
      "SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt " +
        "FROM part JOIN lineitem ON p_partkey = l_partkey " +
        "WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 10, 15) " +
        "GROUP BY 1, 2, 3 " +
        "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size") { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#1" &&
          col("p_size").isin(1, 5, 10, 15))
        .join(Tables.lineitem(s, d), col("p_partkey") === col("l_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },

    // Q18 shape: large-quantity orders via HAVING on a grouped subquery.
    Q("q18_large_orders",
      "WITH t AS (SELECT l_orderkey, SUM(l_quantity) AS total_qty FROM lineitem " +
        "GROUP BY 1 HAVING SUM(l_quantity) > 150) " +
        "SELECT c_custkey, o_orderkey, o_orderdate::DATE AS o_orderdate, " +
        "o_totalprice, total_qty FROM t " +
        "JOIN orders ON o_orderkey = l_orderkey " +
        "JOIN customer ON c_custkey = o_custkey ORDER BY o_orderkey") { (s, d) =>
      val t = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .where(col("total_qty") > 150)
      t.join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("o_orderdate"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_orderkey"))
    },

    // Window frames & navigation: running total (rows frame), 3-row moving
    // average, first_value, ntile.
    Q("q_window_frames",
      "SELECT o_custkey, o_orderkey, " +
        "ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total, " +
        "ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg3, " +
        "FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS first_order, " +
        "CAST(NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS price_quartile " +
        "FROM orders ORDER BY o_custkey, o_orderkey") { (s, d) =>
      val byDate = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d).select(
          col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice"))
            .over(byDate.rowsBetween(Window.unboundedPreceding, 0)), 2)
            .as("running_total"),
          round(avg(col("o_totalprice"))
            .over(byDate.rowsBetween(-2, 0)), 6).as("moving_avg3"),
          first(col("o_orderkey")).over(byDate).as("first_order"),
          ntile(4).over(byPrice).cast("long").as("price_quartile"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }
  )
}
