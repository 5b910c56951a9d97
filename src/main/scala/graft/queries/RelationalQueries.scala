package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.operators.Relational
import graft.sources.Tables

/** Extended relational operator set (SURVEY §2.2 — the categories absent
  * from the reference, implemented as Catalyst built-ins over the TPC-H-ish
  * tables): multi-way joins (broadcast dims), semi/anti joins, rollup/cube,
  * ranking/lag windows, set ops, distinct aggregates, range join, as-of
  * join, date/time functions, top-k.
  *
  * Type discipline for the oracle: Spark `year()`/`row_number()` return
  * 32-bit ints where DuckDB returns BIGINT — cast to long on the Spark side
  * so schemas agree. Rounded columns are rounded identically in the SQL.
  */
object RelationalQueries {

  val all: Seq[Q] = Seq(

    // TPC-H Q1 shape: the canonical scan→filter→partial/final agg pipeline.
    // Money aggregates sum in scaled-integer space: each product is an exact
    // 2/4/6-decimal rational, so ROUND(x*10^s)::BIGINT recovers it exactly in
    // both engines and the integer sum is order-independent — double sums of
    // products would be association-order-sensitive at the last bit.
    Q("q1_pricing_summary",
      "SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, " +
        "SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price, " +
        "SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS sum_disc_price, " +
        "SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) / 1000000.0 AS sum_charge, " +
        "SUM(l_quantity) / COUNT(*) AS avg_qty, " +
        "SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 / COUNT(*) AS avg_price, " +
        "SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) / 100.0 / COUNT(*) AS avg_disc, " +
        "COUNT(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus") {
      (s, d) =>
        val disc   = col("l_extendedprice") * (lit(1) - col("l_discount"))
        val charge = disc * (lit(1) + col("l_tax"))
        def cents(c: org.apache.spark.sql.Column, scale: Double) =
          sum(round(c * scale).cast("long")) / scale
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") <= lit("1998-09-02"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            cents(col("l_extendedprice"), 100.0).as("sum_base_price"),
            cents(disc, 10000.0).as("sum_disc_price"),
            cents(charge, 1000000.0).as("sum_charge"),
            (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
            (cents(col("l_extendedprice"), 100.0) / count(lit(1))).as("avg_price"),
            (cents(col("l_discount"), 100.0) / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // TPC-H Q3 shape: fact⋈fact⋈broadcast-dim, grouped revenue, top-k.
    Q("q3_shipping_priority",
      "SELECT l_orderkey, SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue, " +
        "o_orderdate::DATE AS o_orderdate, o_orderpriority " +
        "FROM customer, orders, lineitem " +
        "WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey " +
        "AND l_orderkey = o_orderkey AND o_orderdate < TIMESTAMP '1997-01-01' " +
        "AND l_shipdate > TIMESTAMP '1997-01-01' " +
        "GROUP BY l_orderkey, o_orderdate, o_orderpriority " +
        "ORDER BY revenue DESC, l_orderkey LIMIT 20") {
      (s, d) =>
        val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(s, d).filter(col("o_orderdate") < lit("1997-01-01"))
        val l = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1997-01-01"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"),
            col("o_orderpriority"))
          .agg((sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * 10000).cast("long")) / 10000.0).as("revenue"))
          .select(col("l_orderkey"), col("revenue"), col("o_orderdate"),
            col("o_orderpriority"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(20)
    },

    // Left-semi join: customers holding at least one pending order.
    Q("q_semi_join",
      "SELECT c_custkey, c_name FROM customer WHERE c_custkey IN " +
        "(SELECT o_custkey FROM orders WHERE o_orderstatus = 'P') ORDER BY c_custkey") {
      (s, d) =>
        Tables.customer(s, d)
          .join(Tables.orders(s, d).filter(col("o_orderstatus") === "P"),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
    },

    // Left-anti join: customers with no orders since 2001.
    Q("q_anti_join",
      "SELECT c_custkey, c_name, c_acctbal FROM customer WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
        "AND o_orderdate >= TIMESTAMP '2001-01-01') ORDER BY c_custkey") {
      (s, d) =>
        Tables.customer(s, d)
          .join(Tables.orders(s, d).filter(col("o_orderdate") >= lit("2001-01-01")),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
          .orderBy(col("c_custkey"))
    },

    // ROLLUP with grouping indicators (subtotal + grand-total rows).
    Q("q_rollup",
      "SELECT l_returnflag, l_linestatus, " +
        "CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag, " +
        "CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status, " +
        "SUM(l_quantity) AS sum_qty, COUNT(*) AS n " +
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST") {
      (s, d) =>
        Tables.lineitem(s, d)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            grouping(col("l_returnflag")).cast("int").as("g_flag"),
            grouping(col("l_linestatus")).cast("int").as("g_status"),
            sum(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)
    },

    // CUBE over order status × priority.
    Q("q_cube",
      "SELECT o_orderstatus, o_orderpriority, " +
        "CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status, " +
        "CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio, " +
        "COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total " +
        "FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) " +
        "ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST") {
      (s, d) =>
        Tables.orders(s, d)
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            grouping(col("o_orderstatus")).cast("int").as("g_status"),
            grouping(col("o_orderpriority")).cast("int").as("g_prio"),
            count(lit(1)).as("n"),
            round(sum(col("o_totalprice")), 2).as("total"))
          .orderBy(col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first)
    },

    // Ranking window: top-3 customers by balance per market segment.
    // WindowGroupLimit pushes the per-key limit map-side before the shuffle.
    Q("q_window_rank",
      "SELECT * FROM (SELECT c_mktsegment, c_custkey, c_acctbal, " +
        "ROW_NUMBER() OVER (PARTITION BY c_mktsegment " +
        "ORDER BY c_acctbal DESC, c_custkey) AS rn FROM customer) " +
        "WHERE rn <= 3 ORDER BY c_mktsegment, rn") {
      (s, d) =>
        Relational.topKPerGroup(
            Tables.customer(s, d).select(col("c_mktsegment"), col("c_custkey"),
              col("c_acctbal")),
            Seq(col("c_mktsegment")),
            Seq(col("c_acctbal").desc, col("c_custkey")), 3)
          .withColumn("rn", col("rn").cast("long"))
          .orderBy(col("c_mktsegment"), col("rn"))
    },

    // Analytic window: per-customer order-to-order price delta (lag).
    Q("q_window_lag",
      "SELECT o_custkey, o_orderkey, o_totalprice, " +
        "LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price, " +
        "ROUND(o_totalprice - LAG(o_totalprice) OVER " +
        "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS delta " +
        "FROM orders ORDER BY o_custkey, o_orderkey") {
      (s, d) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"))
          .withColumn("delta", round(col("o_totalprice") - col("prev_price"), 2))
          .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // INTERSECT: parts shipped in both 1995 and 1996 (set semantics).
    Q("q_intersect",
      "SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01' " +
        "INTERSECT " +
        "SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' " +
        "ORDER BY l_partkey") {
      (s, d) =>
        val li = Tables.lineitem(s, d)
        def in(y0: String, y1: String) =
          li.filter(col("l_shipdate") >= lit(y0) && col("l_shipdate") < lit(y1))
            .select(col("l_partkey"))
        in("1995-01-01", "1996-01-01").intersect(in("1996-01-01", "1997-01-01"))
          .orderBy(col("l_partkey"))
    },

    // EXCEPT: parts shipped in 1995 but never in 1996.
    Q("q_except",
      "SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01' " +
        "EXCEPT " +
        "SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' " +
        "ORDER BY l_partkey") {
      (s, d) =>
        val li = Tables.lineitem(s, d)
        def in(y0: String, y1: String) =
          li.filter(col("l_shipdate") >= lit(y0) && col("l_shipdate") < lit(y1))
            .select(col("l_partkey"))
        in("1995-01-01", "1996-01-01").except(in("1996-01-01", "1997-01-01"))
          .orderBy(col("l_partkey"))
    },

    // Multiset EXCEPT ALL: per-occurrence difference (keeps duplicates).
    Q("q_except_all",
      "SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-03-01' " +
        "EXCEPT ALL " +
        "SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-03-01' AND l_shipdate < TIMESTAMP '1995-05-01' " +
        "ORDER BY l_partkey") {
      (s, d) =>
        val li = Tables.lineitem(s, d)
        def in(y0: String, y1: String) =
          li.filter(col("l_shipdate") >= lit(y0) && col("l_shipdate") < lit(y1))
            .select(col("l_partkey"))
        in("1995-01-01", "1995-03-01").exceptAll(in("1995-03-01", "1995-05-01"))
          .orderBy(col("l_partkey"))
    },

    // Multiset INTERSECT ALL.
    Q("q_intersect_all",
      "SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-03-01' " +
        "INTERSECT ALL " +
        "SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-03-01' AND l_shipdate < TIMESTAMP '1995-05-01' " +
        "ORDER BY l_partkey") {
      (s, d) =>
        val li = Tables.lineitem(s, d)
        def in(y0: String, y1: String) =
          li.filter(col("l_shipdate") >= lit(y0) && col("l_shipdate") < lit(y1))
            .select(col("l_partkey"))
        in("1995-01-01", "1995-03-01").intersectAll(in("1995-03-01", "1995-05-01"))
          .orderBy(col("l_partkey"))
    },

    // Exact distinct aggregates (expand + two-phase agg under the hood).
    Q("q_distinct_agg",
      "SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts, " +
        "COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag") {
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"))
    },

    // Sketch-based distinct (HLL++): the 100-TB path where exact distinct
    // would shuffle every key. The sketch value is not DuckDB-replayable,
    // so the oracle-able output is the exact distinct plus a boolean
    // asserting the HLL++ estimate (rsd 0.01) landed within 5% — both
    // deterministic (oracle side is literal TRUE).
    Q("q_approx_distinct",
      "SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts, " +
        "TRUE AS within_tol FROM lineitem GROUP BY l_returnflag " +
        "ORDER BY l_returnflag") { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"))
        .withColumn("within_tol",
          StatsQueries.relWithinTol(col("approx_parts"), col("exact_parts"), 0.05))
        .select(col("l_returnflag"), col("exact_parts"), col("within_tol"))
        .orderBy(col("l_returnflag"))
    },

    // Range join: same-wallet deposit pairs within a 1-hour band. The
    // equi-key conjunct keeps the pair space within-key (SURVEY §2.2 joins).
    Q("q_range_join",
      "WITH d AS (SELECT user_id AS wallet_id, epoch_us(ts) AS us, event_id AS seq " +
        "FROM events WHERE value > 0) " +
        "SELECT a.wallet_id, a.seq AS a_id, b.seq AS b_id " +
        "FROM d a JOIN d b ON a.wallet_id = b.wallet_id " +
        "AND b.us > a.us AND b.us <= a.us + 3600000000 " +
        "ORDER BY a.wallet_id, a_id, b_id") {
      (s, d) =>
        val dep = Tables.events(s, d).filter(col("value") > 0)
          .select(col("user_id").as("wallet_id"), unix_micros(col("ts")).as("us"),
            col("event_id").as("seq"))
        Relational.rangeJoin(dep, "wallet_id", "us", "seq", 3600000000L)
          .select(col("wallet_id"), col("a_id"), col("b_id"))
          .orderBy(col("wallet_id"), col("a_id"), col("b_id"))
    },

    // As-of join: each purchase matched to the latest signup at-or-before it
    // (union + running-last window: one shuffle, no pair explosion).
    Q("q_asof_join",
      "WITH ev AS (SELECT user_id AS wallet_id, epoch_us(ts) AS us, event_id AS seq, event_type FROM events), " +
        "p AS (SELECT wallet_id, us, seq FROM ev WHERE event_type = 'purchase'), " +
        "sg AS (SELECT wallet_id, us, MAX(seq) AS signup_seq FROM ev WHERE event_type = 'signup' GROUP BY wallet_id, us) " +
        "SELECT p.wallet_id, p.seq, sg.signup_seq FROM p " +
        "ASOF LEFT JOIN sg ON p.wallet_id = sg.wallet_id AND p.us >= sg.us " +
        "ORDER BY p.wallet_id, p.seq") {
      (s, d) =>
        val ev = Tables.events(s, d).select(
          col("user_id").as("wallet_id"), unix_micros(col("ts")).as("us"),
          col("event_id").as("seq"), col("event_type"))
        val purchases = ev.filter(col("event_type") === "purchase").drop("event_type")
        val signups = ev.filter(col("event_type") === "signup")
          .groupBy(col("wallet_id"), col("us")).agg(max(col("seq")).as("signup_seq"))
        Relational.asOfJoin(purchases, signups, "wallet_id", "us", "signup_seq")
          .select(col("wallet_id"), col("seq"), col("signup_seq"))
          .orderBy(col("wallet_id"), col("seq"))
    },

    // Date truncation: daily activity rollup per event type.
    Q("q_date_trunc",
      "SELECT date_trunc('day', ts)::DATE AS day, event_type, COUNT(*) AS n, " +
        "ROUND(SUM(value), 2) AS total FROM events " +
        "GROUP BY 1, 2 ORDER BY 1, 2") {
      (s, d) =>
        Tables.events(s, d)
          .groupBy(to_date(date_trunc("day", col("ts"))).as("day"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
          .orderBy(col("day"), col("event_type"))
    },

    // Calendar extraction: monthly order volume (year()/month() → BIGINT to
    // match DuckDB).
    Q("q_year_month",
      "SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, CAST(month(o_orderdate) AS BIGINT) AS mo, " +
        "COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total " +
        "FROM orders GROUP BY 1, 2 ORDER BY 1, 2") {
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
            month(col("o_orderdate")).cast("long").as("mo"))
          .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
          .orderBy(col("yr"), col("mo"))
    },

    // Global top-k: agg → broadcast-joined dim → order+limit (TakeOrdered).
    Q("q_top_spenders",
      "SELECT c_custkey, c_name, ROUND(SUM(o_totalprice), 2) AS spend " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_custkey, c_name ORDER BY spend DESC, c_custkey LIMIT 10") {
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(round(sum(col("o_totalprice")), 2).as("spend"))
          .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("spend"))
          .orderBy(col("spend").desc, col("c_custkey"))
          .limit(10)
    },

    // TPC-H Q5 shape: 6-way join (3 broadcast dims), regional revenue.
    Q("q5_regional_revenue",
      "SELECT n_name, SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue " +
        "FROM customer, orders, lineitem, supplier, nation, region " +
        "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey " +
        "AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
        "AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey " +
        "AND r_name = 'ASIA' " +
        "AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01' " +
        "GROUP BY n_name ORDER BY revenue DESC, n_name") {
      (s, d) =>
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1997-01-01"))
        Tables.lineitem(s, d)
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.supplier(s, d)),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg((sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * 10000).cast("long")) / 10000.0).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
    },

    // Explicit Bloom-filter semi-join reduction: the fact side is
    // pre-filtered by a Bloom filter built over the dim side's keys
    // (bloom_agg/bloom_might_contain — graft's mergeable filter value +
    // codegen'd probe) BEFORE the exact join, which then removes the
    // false positives — so the filter is invisible in the result (the
    // oracle is the plain join) while the shuffled fact volume shrinks
    // to matches + fpp. The deterministic, persistable form of the
    // runtime filter Spark injects heuristically.
    Q("q_bloom_join",
      "SELECT p_brand, COUNT(*) AS n_items, " +
        "SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT))/10000.0 AS revenue " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE p_type = 'PROMO' AND p_size >= 40 " +
        "GROUP BY 1 ORDER BY 1") { (s, d) =>
      val dim = Tables.part(s, d)
        .where(col("p_type") === "PROMO" && col("p_size") >= 40)
        .select(col("p_partkey"), col("p_brand"))
      // Sizing count: one scan of the already-filtered dim side (same
      // bounded action as the filter build itself).
      val nKeys = math.max(dim.count(), 64L)
      Relational.bloomSemiJoinReduce(Tables.lineitem(s, d), col("l_partkey"),
          dim, col("p_partkey"), expectedKeys = nKeys, fpp = 0.01)
        .join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          (sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * 10000).cast("long")) / 10000.0).as("revenue"))
        .orderBy(col("p_brand"))
    },

    // The SAME reduction with the filter as a persisted read-through
    // artifact (IndexCache, keyed by (bits, k, dim-key fingerprint)) —
    // the runtime filter over a slowly-changing dim is built once and
    // SERVED to every query; bench forensics shows bloom_filter.disk on
    // warm draws. Same oracle as q_bloom_join: the artifact round trip
    // (and the filter itself) must be invisible in results.
    Q("q_bloom_served",
      "SELECT p_brand, COUNT(*) AS n_items, " +
        "SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT))/10000.0 AS revenue " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE p_type = 'PROMO' AND p_size >= 40 " +
        "GROUP BY 1 ORDER BY 1") { (s, d) =>
      val dim = Tables.part(s, d)
        .where(col("p_type") === "PROMO" && col("p_size") >= 40)
        .select(col("p_partkey"), col("p_brand"))
      val nKeys = math.max(dim.count(), 64L)
      Relational.bloomSemiJoinServed(Tables.lineitem(s, d), col("l_partkey"),
          dim, col("p_partkey"), expectedKeys = nKeys, fpp = 0.01)
        .join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          (sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * 10000).cast("long")) / 10000.0).as("revenue"))
        .orderBy(col("p_brand"))
    }
  )
}
