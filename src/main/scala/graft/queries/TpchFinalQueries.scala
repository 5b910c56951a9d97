package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** The last four TPC-H shapes (Q2, Q11, Q12, Q21), completing the 22-query
  * sweep. The driver schema has no `partsupp`, ship modes, or
  * commit/receipt dates, so (as in [[TpchFullQueries]]) each query keeps
  * the REFERENCE SHAPE — correlated min over a supply relation, scalar
  * fraction-of-total threshold, dual conditional counts, semi+anti
  * self-joins on the fact — with a documented stand-in:
  *
  *  - supply relation := lineitem grouped by (partkey, suppkey), cost =
  *    min observed unit price in integer cents (exact in any engine);
  *  - ship mode := `l_returnflag`; lateness := shipped > N days after
  *    the order date.
  *
  * Scale posture: every correlated subquery is decorrelated into a
  * group-aggregate + equi-join (Q2's per-part min, Q21's per-order
  * supplier census) — one shuffle each, no nested-loop re-scan, which is
  * the form that survives 100 TB. `nation`/`region` broadcast.
  */
object TpchFinalQueries {

  private val highPrio = Seq("1-URGENT", "2-HIGH")

  val all: Seq[Q] = Seq(

    // Q2 minimum-cost supplier. Supply costs come from observed lineitem
    // unit prices; the correlated "cheapest Europe supplier for this
    // part" subquery becomes a per-part min + self-join.
    Q("q2_min_cost_supplier",
      "WITH ps AS (SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey, " +
        "MIN(CAST(ROUND(l_extendedprice*100/l_quantity) AS BIGINT)) AS ps_cost_cents " +
        "FROM lineitem WHERE l_quantity > 0 GROUP BY 1,2), " +
        "eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name " +
        "FROM supplier JOIN nation ON s_nationkey=n_nationkey " +
        "JOIN region ON n_regionkey=r_regionkey WHERE r_name='EUROPE') " +
        "SELECT CAST(ROUND(s_acctbal*100) AS BIGINT)/100.0 AS s_acctbal, " +
        "s_name, n_name, p_partkey, p_name " +
        "FROM part, ps, eu " +
        "WHERE p_partkey=ps_partkey AND s_suppkey=ps_suppkey " +
        "AND p_size=25 AND p_type='LARGE' " +
        "AND ps_cost_cents = (SELECT MIN(ps2.ps_cost_cents) FROM ps ps2, eu eu2 " +
        "WHERE ps2.ps_partkey=p_partkey AND eu2.s_suppkey=ps2.ps_suppkey) " +
        "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100") { (s, d) =>
      // The correlated min is evaluated only for parts surviving the
      // (p_size, p_type) filter, so lineitem semi-joins the FILTERED part
      // keys BEFORE the (part, supp) aggregation — a broadcast filter
      // that shrinks the agg input to the selected parts' rows; the
      // per-part min over EU suppliers is unchanged for every part that
      // can appear in the output.
      val selParts = Tables.part(s, d)
        .filter(col("p_size") === 25 && col("p_type") === "LARGE")
      val ps = Tables.lineitem(s, d).filter(col("l_quantity") > 0)
        .join(broadcast(selParts.select(col("p_partkey").as("sel_pk"))),
          col("l_partkey") === col("sel_pk"), "left_semi")
        .select(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"),
          round(col("l_extendedprice") * 100 / col("l_quantity")).cast("long")
            .as("cost_cents"))
        .groupBy("ps_partkey", "ps_suppkey")
        .agg(min("cost_cents").as("ps_cost_cents"))
      val eu = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
      // Per-part min as a window over the single euSupply pass — same
      // rows as the agg + self-join decorrelation (ties all kept) but
      // lineitem is scanned and the 3-way join built ONCE; the window
      // partition (suppliers per part) is bounded at any scale.
      val euSupply = ps.join(eu, col("ps_suppkey") === col("s_suppkey"))
      euSupply
        .withColumn("min_cost", min(col("ps_cost_cents")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("ps_partkey"))))
        .where(col("ps_cost_cents") === col("min_cost"))
        .join(broadcast(selParts), col("p_partkey") === col("ps_partkey"))
        .select((round(col("s_acctbal") * 100).cast("long") / 100.0).as("s_acctbal"),
          col("s_name"), col("n_name"), col("p_partkey"), col("p_name"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    },

    // Q11 important stock: per-part shipped value for one nation's
    // suppliers, kept where it exceeds a threshold of the nation's total
    // (scalar-subquery threshold → broadcast single-row cross join).
    // The threshold is SCALE-FREE — TPC-H's own Q11 shrinks its fraction
    // as 0.0001/SF precisely because a fixed fraction empties the result
    // as the part population grows (a fixed 0.001 returned 0 rows at
    // sf0.1: 20x the average share with insufficient skew — caught by the
    // round-12 non-vacuity gate). SF isn't observable here, so the
    // equivalent data-derived rule is "value > 2x the average part
    // value", compared by integer cross-multiply (val*cnt > tot*2) in
    // 38-digit decimal on the Spark side / HUGEINT in DuckDB — exact at
    // any scale, no division, no Long overflow when cnt and val both
    // grow with the corpus.
    Q("q11_important_stock",
      "WITH ps AS (SELECT l_partkey, " +
        "SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS val_cents " +
        "FROM lineitem JOIN supplier ON l_suppkey=s_suppkey " +
        "JOIN nation ON s_nationkey=n_nationkey " +
        "WHERE n_name='NATION_7' GROUP BY 1) " +
        "SELECT l_partkey, val_cents/100.0 AS value FROM ps " +
        "WHERE CAST(val_cents AS HUGEINT) * (SELECT COUNT(*) FROM ps) " +
        "> CAST((SELECT SUM(val_cents) FROM ps) AS HUGEINT) * 2 " +
        "ORDER BY value DESC, l_partkey") { (s, d) =>
      val ps = Tables.lineitem(s, d)
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_7")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("val_cents"))
      val tot = ps.agg(sum("val_cents").as("tot"), count(lit(1)).as("cnt"))
      ps.crossJoin(broadcast(tot))
        .filter(col("val_cents").cast("decimal(38,0)") * col("cnt") >
          col("tot").cast("decimal(38,0)") * 2)
        .select(col("l_partkey"), (col("val_cents") / 100.0).as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    },

    // Q12 shipping modes and order priority. Mode stand-in: l_returnflag;
    // "late receipt" stand-in: shipped > 60 days after the order date.
    Q("q12_shipmode_priority",
      "SELECT l_returnflag, " +
        "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, " +
        "CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count " +
        "FROM orders JOIN lineitem ON o_orderkey=l_orderkey " +
        "WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY " +
        "AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' " +
        "GROUP BY 1 ORDER BY 1") { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS") &&
          col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority").isin(highPrio: _*), 1).otherwise(0))
            .as("high_line_count"),
          sum(when(!col("o_orderpriority").isin(highPrio: _*), 1).otherwise(0))
            .as("low_line_count"))
        .orderBy("l_returnflag")
    },

    // Q21 suppliers who kept orders waiting: the EXISTS (another supplier
    // on the order) + NOT EXISTS (another LATE supplier) pair becomes one
    // per-order supplier census — countDistinct(supplier) and
    // countDistinct(late supplier) — joined back to the late rows. Late
    // stand-in: shipped > 90 days after the order date.
    Q("q21_waiting_suppliers",
      "WITH l AS (SELECT l_orderkey, l_suppkey, " +
        "(l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late " +
        "FROM lineitem JOIN orders ON o_orderkey=l_orderkey WHERE o_orderstatus='F') " +
        "SELECT s_name, COUNT(*) AS numwait " +
        "FROM l l1 JOIN supplier ON s_suppkey=l1.l_suppkey " +
        "JOIN nation ON s_nationkey=n_nationkey " +
        "WHERE l1.late AND n_name IN ('NATION_3','NATION_8') " +
        "AND EXISTS (SELECT 1 FROM l l2 WHERE l2.l_orderkey=l1.l_orderkey " +
        "AND l2.l_suppkey <> l1.l_suppkey) " +
        "AND NOT EXISTS (SELECT 1 FROM l l3 WHERE l3.l_orderkey=l1.l_orderkey " +
        "AND l3.l_suppkey <> l1.l_suppkey AND l3.late) " +
        "GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100") { (s, d) =>
      val l = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("late"))
      // One pass over the order's lineitems replaces both correlated scans:
      // l1.late && n_supp >= 2 && n_late_supp == 1  ⟺  l1's supplier is
      // the only late one on a multi-supplier order. The census rides as
      // whole-partition window aggregates (partition = one order's lines,
      // bounded ~7 at any scale), so the lineitem⋈orders subtree is built
      // ONCE — the former groupBy + self-join shape scanned it twice.
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_orderkey"))
      l.withColumn("n_supp", size(collect_set(col("l_suppkey")).over(w)))
        .withColumn("n_late_supp",
          size(collect_set(when(col("late"), col("l_suppkey"))).over(w)))
        .filter(col("late") && col("n_supp") >= 2 && col("n_late_supp") === 1)
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)
          .filter(col("n_name").isin("NATION_3", "NATION_8"))),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }
  )
}
