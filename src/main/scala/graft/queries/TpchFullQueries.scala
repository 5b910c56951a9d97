package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** The remaining TPC-H query shapes, adapted to the driver's schema (no
  * partsupp / commit-receipt dates / ship modes / phone prefixes — each
  * substitution is noted inline). Every money aggregate uses the
  * scaled-integer sum (`sum(cast(round(x*10^4) as bigint)) / 10^4`) so
  * Spark partial aggregation and DuckDB's sequential scan cannot differ by
  * reassociation; plain counts and int-valued quantity sums are exact.
  *
  * Join posture for 100 TB: `nation`/`region` are fixed-size dims —
  * always broadcast; `part`/`supplier`/`customer` scale with SF and join
  * via shuffle unless AQE decides otherwise; fact-fact joins shuffle on
  * their keys.
  */
object TpchFullQueries {

  /** Scaled-integer money sum: order-insensitive and engine-exact. */
  private def moneySum(c: org.apache.spark.sql.Column, scale: Int = 10000) =
    sum(round(c * scale).cast("long")) / (scale + 0.0)

  private val revenue = col("l_extendedprice") * (lit(1) - col("l_discount"))

  val all: Seq[Q] = Seq(

    // Q4 order-priority checking. Lateness stand-in (no commit/receipt
    // dates): a lineitem shipped > 30 days after the order date.
    Q("q4_order_priority",
      "SELECT o_orderpriority, COUNT(*) AS n FROM orders " +
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01' " +
        "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey " +
        "AND l_shipdate > o_orderdate + INTERVAL 30 DAY) " +
        "GROUP BY 1 ORDER BY 1") { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1996-04-01"))
        .join(Tables.lineitem(s, d),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    },

    // Q6 forecasting revenue change: the pure filter-and-sum scan (every
    // predicate lands in PushedFilters).
    Q("q6_forecast_revenue",
      "SELECT SUM(CAST(ROUND(l_extendedprice*l_discount*10000) AS BIGINT))/10000.0 AS revenue " +
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
        "AND l_shipdate < TIMESTAMP '1997-01-01' " +
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24") { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(moneySum(col("l_extendedprice") * col("l_discount")).as("revenue"))
    },

    // Q7 volume shipping between two nations, by direction and year.
    Q("q7_volume_shipping",
      "SELECT supp_nation, cust_nation, yr, revenue FROM (" +
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, " +
        "year(l_shipdate)::BIGINT AS yr, " +
        "SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT))/10000.0 AS revenue " +
        "FROM supplier, lineitem, orders, customer, nation n1, nation n2 " +
        "WHERE s_suppkey=l_suppkey AND o_orderkey=l_orderkey AND c_custkey=o_custkey " +
        "AND s_nationkey=n1.n_nationkey AND c_nationkey=n2.n_nationkey " +
        "AND ((n1.n_name='NATION_1' AND n2.n_name='NATION_2') " +
        "OR (n1.n_name='NATION_2' AND n2.n_name='NATION_1')) " +
        "AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01' " +
        "GROUP BY 1,2,3) ORDER BY 1,2,3") { (s, d) =>
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1998-01-01"))
        .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("yr"))
        .agg(moneySum(revenue).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("yr"))
    },

    // Q8 market share of one supplier nation in PROMO-part revenue by year.
    Q("q8_market_share",
      "SELECT yr, ROUND(nat / tot, 6) AS mkt_share FROM (" +
        "SELECT year(o_orderdate)::BIGINT AS yr, " +
        "SUM(CASE WHEN n_name='NATION_3' THEN CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT) ELSE 0 END)/10000.0 AS nat, " +
        "SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT))/10000.0 AS tot " +
        "FROM lineitem, orders, supplier, nation, part " +
        "WHERE l_orderkey=o_orderkey AND l_suppkey=s_suppkey " +
        "AND s_nationkey=n_nationkey AND l_partkey=p_partkey AND p_type='PROMO' " +
        "GROUP BY 1) ORDER BY yr") { (s, d) =>
      val scaled = round(revenue * 10000).cast("long")
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("n_nationkey") === col("s_nationkey"))
        .join(Tables.part(s, d).filter(col("p_type") === "PROMO"),
          col("p_partkey") === col("l_partkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .agg(
          (sum(when(col("n_name") === "NATION_3", scaled).otherwise(lit(0L))) / 10000.0).as("nat"),
          (sum(scaled) / 10000.0).as("tot"))
        .select(col("yr"), round(col("nat") / col("tot"), 6).as("mkt_share"))
        .orderBy(col("yr"))
    },

    // Q9 product profit by nation and year. Cost stand-in (no partsupp
    // supplycost): 10% of retail price per unit.
    Q("q9_product_profit",
      "SELECT n_name, year(o_orderdate)::BIGINT AS yr, " +
        "SUM(CAST(ROUND((l_extendedprice*(1-l_discount) - p_retailprice*l_quantity*0.1)*10000) AS BIGINT))/10000.0 AS profit " +
        "FROM lineitem, orders, supplier, part, nation " +
        "WHERE s_suppkey=l_suppkey AND o_orderkey=l_orderkey AND p_partkey=l_partkey " +
        "AND s_nationkey=n_nationkey AND p_type='STANDARD' " +
        "GROUP BY 1,2 ORDER BY 1,2") { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
        .join(Tables.part(s, d).filter(col("p_type") === "STANDARD"),
          col("p_partkey") === col("l_partkey"))
        .join(broadcast(Tables.nation(s, d)), col("n_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("yr"))
        .agg(moneySum(revenue - col("p_retailprice") * col("l_quantity") * 0.1)
          .as("profit"))
        .orderBy(col("n_name"), col("yr"))
    },

    // Q13 customer order-count distribution (left join keeps zero-order
    // customers; priority filter inside the join condition).
    Q("q13_customer_distribution",
      "SELECT n_orders, COUNT(*) AS n_custs FROM (" +
        "SELECT c_custkey, COUNT(o_orderkey) AS n_orders FROM customer " +
        "LEFT JOIN orders ON c_custkey=o_custkey AND o_orderpriority <> '5-LOW' " +
        "GROUP BY 1) GROUP BY 1 ORDER BY n_custs DESC, n_orders DESC") { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderpriority") =!= "5-LOW"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .groupBy(col("n_orders"))
        .agg(count(lit(1)).as("n_custs"))
        .orderBy(col("n_custs").desc, col("n_orders").desc)
    },

    // Q14 promo revenue share in one month.
    Q("q14_promo_revenue",
      "SELECT ROUND(100.0 * promo / total, 6) AS promo_pct FROM (" +
        "SELECT SUM(CASE WHEN p_type='PROMO' THEN CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT) ELSE 0 END)/10000.0 AS promo, " +
        "SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT))/10000.0 AS total " +
        "FROM lineitem, part WHERE l_partkey=p_partkey " +
        "AND l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01')") { (s, d) =>
      val scaled = round(revenue * 10000).cast("long")
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-09-01") &&
          col("l_shipdate") < lit("1996-10-01"))
        .join(Tables.part(s, d), col("p_partkey") === col("l_partkey"))
        .agg(
          (sum(when(col("p_type") === "PROMO", scaled).otherwise(lit(0L))) / 10000.0).as("promo"),
          (sum(scaled) / 10000.0).as("total"))
        .select(round(lit(100.0) * col("promo") / col("total"), 6).as("promo_pct"))
    },

    // Q15 top supplier by quarterly revenue (scalar-max subquery; the
    // scaled-int revenue makes the double equality engine-exact).
    Q("q15_top_supplier",
      "WITH rev AS (SELECT l_suppkey AS suppkey, " +
        "SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT))/10000.0 AS total_rev " +
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
        "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY 1) " +
        "SELECT s_suppkey, s_name, total_rev FROM supplier JOIN rev ON s_suppkey=suppkey " +
        "WHERE total_rev = (SELECT MAX(total_rev) FROM rev) ORDER BY s_suppkey") { (s, d) =>
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1996-04-01"))
        .groupBy(col("l_suppkey").as("suppkey"))
        .agg(moneySum(revenue).as("total_rev"))
      val top = rev.agg(max(col("total_rev")).as("max_rev"))
      Tables.supplier(s, d)
        .join(rev, col("s_suppkey") === col("suppkey"))
        .join(broadcast(top), col("total_rev") === col("max_rev"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev"))
        .orderBy(col("s_suppkey"))
    },

    // Q17 small-quantity-order revenue: lineitems under 20% of their
    // part's average quantity (per-part avg join; quantity sums are
    // int-valued doubles, so the average is exact in both engines).
    Q("q17_small_quantity",
      "WITH pa AS (SELECT l_partkey AS pk, AVG(l_quantity) AS aq FROM lineitem GROUP BY 1) " +
        "SELECT ROUND(SUM(CAST(ROUND(l_extendedprice*10000) AS BIGINT))/10000.0 / 7.0, 6) AS avg_yearly " +
        "FROM lineitem JOIN part ON p_partkey=l_partkey JOIN pa ON pk=l_partkey " +
        "WHERE p_brand='Brand#12' AND l_quantity < 0.2*aq") { (s, d) =>
      val pa = Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("pk"))
        .agg(avg(col("l_quantity")).as("aq"))
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_brand") === "Brand#12"),
          col("p_partkey") === col("l_partkey"))
        .join(pa, col("pk") === col("l_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("aq"))
        .agg(round(moneySum(col("l_extendedprice")) / 7.0, 6).as("avg_yearly"))
    },

    // Q19 discounted revenue under disjunctive brand/size/quantity bands.
    Q("q19_disjunctive",
      "SELECT SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT))/10000.0 AS revenue " +
        "FROM lineitem, part WHERE p_partkey=l_partkey AND (" +
        "(p_brand='Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11) " +
        "OR (p_brand='Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20) " +
        "OR (p_brand='Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30))") { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("p_partkey") === col("l_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
            col("l_quantity").between(20, 30)))
        .agg(moneySum(revenue).as("revenue"))
    },

    // Q20 heavy PROMO suppliers (grouped-HAVING semi join; quantity sum is
    // exact, threshold ~ p90 of the per-supplier distribution).
    Q("q20_promo_suppliers",
      "SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN (" +
        "SELECT l_suppkey FROM lineitem JOIN part ON p_partkey=l_partkey " +
        "WHERE p_type='PROMO' GROUP BY l_suppkey HAVING SUM(l_quantity) > 2900) " +
        "ORDER BY s_suppkey") { (s, d) =>
      val heavy = Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_type") === "PROMO"),
          col("p_partkey") === col("l_partkey"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("q"))
        .filter(col("q") > 2900)
      Tables.supplier(s, d)
        .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    },

    // Q22 idle high-balance customers (market segments stand in for the
    // phone prefixes; "no order" scoped to the last 20 months — every
    // customer has lifetime orders in this dataset).
    Q("q22_idle_customers",
      "WITH pos AS (SELECT AVG(c_acctbal) AS ab FROM customer " +
        "WHERE c_acctbal > 0 AND c_mktsegment IN ('BUILDING','MACHINERY','HOUSEHOLD')) " +
        "SELECT c_mktsegment, COUNT(*) AS n_cust, " +
        "SUM(CAST(ROUND(c_acctbal*100) AS BIGINT))/100.0 AS total_bal " +
        "FROM customer, pos WHERE c_mktsegment IN ('BUILDING','MACHINERY','HOUSEHOLD') " +
        "AND c_acctbal > ab " +
        "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
        "AND o_orderdate >= TIMESTAMP '2000-01-01') " +
        "GROUP BY 1 ORDER BY 1") { (s, d) =>
      val segs = Seq("BUILDING", "MACHINERY", "HOUSEHOLD")
      val cust = Tables.customer(s, d).filter(col("c_mktsegment").isin(segs: _*))
      val ab = cust.filter(col("c_acctbal") > 0)
        .agg(avg(col("c_acctbal")).as("ab"))
      cust
        .crossJoin(broadcast(ab))
        .filter(col("c_acctbal") > col("ab"))
        .join(Tables.orders(s, d).filter(col("o_orderdate") >= lit("2000-01-01")),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          moneySum(col("c_acctbal"), scale = 100).as("total_bal"))
        .orderBy(col("c_mktsegment"))
    }
  )
}
