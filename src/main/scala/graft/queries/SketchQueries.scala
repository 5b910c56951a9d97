package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Mergeable-sketch queries (SURVEY §7.3 escalation; VERDICT r2 item #9):
  * the KMV theta sketch aggregate ([[graft.functions.ThetaSketchAgg]])
  * exercised end-to-end — per-group sketches rolled up with
  * `theta_union_agg`, cross-table set algebra with `theta_union` /
  * `theta_intersect_estimate`.
  *
  * Oracle pattern per `q_approx_distinct` precedent: sketch estimates are
  * not DuckDB-replayable, so the output carries the exact cardinalities
  * (computed exactly by both engines) plus booleans asserting each
  * estimate landed within tolerance (oracle side literal TRUE). The
  * estimates stay in the executed plan — a broken sketch flips a boolean.
  * `ThetaSketchSpec` proves the tolerance predicate CAN go false.
  */
object SketchQueries {

  val all: Seq[Q] = Seq(

    // Two-table sketch merge: A = custkeys that placed orders (built as
    // per-priority sketches, merged with theta_union_agg — the stored-
    // sketch rollup path), B = customers in the BUILDING segment.
    // Union and intersection estimated from the sketches alone; exact
    // values from full recomputation. At 100 TB only 32 KiB sketches
    // cross the shuffle and the rollup never re-scans raw data.
    Q("q_sketch_merge",
      "SELECT " +
        "(SELECT COUNT(DISTINCT o_custkey) FROM orders) AS exact_a, " +
        "(SELECT COUNT(DISTINCT c_custkey) FROM customer " +
        "  WHERE c_mktsegment = 'BUILDING') AS exact_b, " +
        "(SELECT COUNT(DISTINCT o.o_custkey) FROM orders o " +
        "  JOIN customer c ON o.o_custkey = c.c_custkey " +
        "  WHERE c.c_mktsegment = 'BUILDING') AS exact_inter, " +
        "(SELECT COUNT(DISTINCT k) FROM (" +
        "  SELECT o_custkey AS k FROM orders UNION ALL " +
        "  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')) AS exact_union, " +
        "TRUE AS tol_a, TRUE AS tol_b, TRUE AS tol_inter, TRUE AS tol_union") { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val orders   = Tables.orders(s, d)
      val building = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")

      val skA = orders
        .groupBy(col("o_orderpriority"))
        .agg(call_function("theta_sketch", col("o_custkey")).as("sk"))
        .agg(call_function("theta_union_agg", col("sk")).as("sk_a"))
      val skB = building
        .agg(call_function("theta_sketch", col("c_custkey")).as("sk_b"))

      val exactA = orders.agg(countDistinct(col("o_custkey")).as("exact_a"))
      val exactB = building.agg(countDistinct(col("c_custkey")).as("exact_b"))
      val exactInter = orders
        .join(building, col("o_custkey") === col("c_custkey"), "left_semi")
        .agg(countDistinct(col("o_custkey")).as("exact_inter"))
      val exactUnion = orders.select(col("o_custkey").as("k"))
        .union(building.select(col("c_custkey")))
        .agg(countDistinct(col("k")).as("exact_union"))

      def withinTol(est: org.apache.spark.sql.Column,
                    exact: org.apache.spark.sql.Column, tol: Double) =
        abs(est - exact.cast("double")) / exact.cast("double") <= tol

      // All operands are single-row aggregates — the crossJoins are 1×1.
      skA.crossJoin(skB)
        .crossJoin(exactA).crossJoin(exactB)
        .crossJoin(exactInter).crossJoin(exactUnion)
        .select(
          col("exact_a"), col("exact_b"), col("exact_inter"), col("exact_union"),
          withinTol(call_function("theta_estimate", col("sk_a")),
            col("exact_a"), 0.05).as("tol_a"),
          withinTol(call_function("theta_estimate", col("sk_b")),
            col("exact_b"), 0.05).as("tol_b"),
          withinTol(call_function("theta_intersect_estimate", col("sk_a"), col("sk_b")),
            col("exact_inter"), 0.10).as("tol_inter"),
          withinTol(call_function("theta_estimate",
              call_function("theta_union", col("sk_a"), col("sk_b"))),
            col("exact_union"), 0.05).as("tol_union"))
    },

    // The BUILT-IN DataSketches HLL family (hll_sketch_agg / hll_union /
    // hll_sketch_estimate) alongside the custom theta aggregate: same
    // two-table merge discipline, same tolerance-boolean oracle. These
    // sketch binaries are what a 100-TB rollup stores per partition and
    // merges without re-scanning raw data.
    Q("q_hll_union",
      "SELECT (SELECT COUNT(DISTINCT l_suppkey) FROM lineitem) AS exact_li, " +
        "(SELECT COUNT(DISTINCT s_suppkey) FROM supplier) AS exact_s, " +
        "(SELECT COUNT(DISTINCT k) FROM (SELECT l_suppkey AS k FROM lineitem " +
        "UNION ALL SELECT s_suppkey FROM supplier)) AS exact_union, " +
        "TRUE AS tol_li, TRUE AS tol_s, TRUE AS tol_union") { (s, d) =>
      val li = Tables.lineitem(s, d)
      val sup = Tables.supplier(s, d)
      val skLi = li.agg(expr("hll_sketch_agg(l_suppkey)").as("sk_li"))
      val skS = sup.agg(expr("hll_sketch_agg(s_suppkey)").as("sk_s"))
      val eLi = li.agg(countDistinct(col("l_suppkey")).as("exact_li"))
      val eS = sup.agg(countDistinct(col("s_suppkey")).as("exact_s"))
      val eU = li.select(col("l_suppkey").as("k"))
        .union(sup.select(col("s_suppkey")))
        .agg(countDistinct(col("k")).as("exact_union"))
      def withinTol(est: org.apache.spark.sql.Column,
                    exact: org.apache.spark.sql.Column, tol: Double) =
        abs(est - exact.cast("double")) / exact.cast("double") <= tol
      skLi.crossJoin(skS).crossJoin(eLi).crossJoin(eS).crossJoin(eU)
        .select(
          col("exact_li"), col("exact_s"), col("exact_union"),
          withinTol(expr("hll_sketch_estimate(sk_li)"), col("exact_li"), 0.05)
            .as("tol_li"),
          withinTol(expr("hll_sketch_estimate(sk_s)"), col("exact_s"), 0.05)
            .as("tol_s"),
          withinTol(expr("hll_sketch_estimate(hll_union(sk_li, sk_s))"),
            col("exact_union"), 0.05).as("tol_union"))
    },

    // Frequent-items sketch (Spark 4 approx_top_k, DataSketches
    // FrequentItems under the hood). With maxItemsTracked comfortably
    // above the true distinct count the sketch is EXACT, so the oracle
    // replays it as a plain count — the plumbing being checked is the
    // sketch aggregate + struct-array explode. At 100 TB the sketch is
    // the point: heavy-hitter counts merge map-side in bounded memory
    // where a full GROUP BY would shuffle the whole key space.
    Q("q_approx_topk",
      "SELECT l_returnflag || l_linestatus AS item, COUNT(*) AS n " +
        "FROM lineitem GROUP BY 1 ORDER BY n DESC, item") { (s, d) =>
      Tables.lineitem(s, d)
        .select(concat(col("l_returnflag"), col("l_linestatus")).as("item"))
        .agg(expr("approx_top_k(item, 10, 1000)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").as("item"), col("e.count").as("n"))
        .orderBy(col("n").desc, col("item"))
    }
  )
}
