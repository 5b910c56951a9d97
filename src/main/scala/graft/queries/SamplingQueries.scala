package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.operators.Sampling
import graft.sources.Tables

/** Deterministic hash-based sampling — the reproducible-split primitives of
  * a training-data pipeline ([[graft.operators.Sampling]]). All are exact
  * oracle queries: the sampling coordinate is an md5 hex prefix compared as
  * a string, identical in any engine — auditable splits, not RNG draws. */
object SamplingQueries {

  // DuckDB md5 takes VARCHAR directly; Spark needs the binary cast. Both
  // hash the decimal string form of doc_id.
  private def duckBucket(key: String) = s"substr(md5($key::VARCHAR), 1, 4)"

  val all: Seq[Q] = Seq(

    // Weight-proportional top-50 (A-ES reservoir keyed by ln(u)/n_chars):
    // longer documents are proportionally likelier to be drawn.
    Q("q_weighted_sample",
      "WITH a AS (SELECT doc_id, lang, n_chars, " +
        "ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT + 1) / 65537.0) " +
        "/ n_chars AS wkey FROM documents) " +
        "SELECT doc_id, lang, n_chars FROM " +
        "(SELECT * FROM a ORDER BY wkey DESC, doc_id LIMIT 50) ORDER BY doc_id") {
      (s, d) =>
        Sampling.weightedSample(Tables.documents(s, d), col("doc_id"),
            col("n_chars"), n = 50)
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy(col("doc_id"))
    },

    // Uniform 10% sample (threshold 0x199a = round(0.1*65536)/65536).
    Q("q_hash_sample",
      s"SELECT doc_id, lang, n_chars FROM documents " +
        s"WHERE ${duckBucket("doc_id")} < '${Sampling.thresholdHex(0.1)}' " +
        "ORDER BY doc_id") { (s, d) =>
      Sampling.hashSample(Tables.documents(s, d), col("doc_id"), 0.1)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    },

    // Stratified per-lang rates: en half, de quarter, fr eighth, others out.
    Q("q_stratified_sample", {
      val cases = Seq("en" -> 0.5, "de" -> 0.25, "fr" -> 0.125).map {
        case (l, p) => s"WHEN lang = '$l' THEN '${Sampling.thresholdHex(p)}'"
      }.mkString(" ")
      s"SELECT doc_id, lang FROM documents " +
        s"WHERE ${duckBucket("doc_id")} < (CASE $cases ELSE NULL END) " +
        "ORDER BY doc_id"
    }) { (s, d) =>
      Sampling.stratifiedHashSample(Tables.documents(s, d), col("doc_id"),
          col("lang"), Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.125))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    },

    // Deterministic 5-per-(lang, source) group sample. The window's
    // rank<=n predicate runs as a map-side WindowGroupLimit before the
    // shuffle, so at scale each group moves at most n rows.
    Q("q_group_sample",
      s"WITH r AS (SELECT doc_id, lang, source, ROW_NUMBER() OVER " +
        s"(PARTITION BY lang, source ORDER BY ${duckBucket("doc_id")}, doc_id) AS rn " +
        "FROM documents) " +
        "SELECT doc_id, lang, source FROM r WHERE rn <= 5 ORDER BY doc_id") {
      (s, d) =>
        Sampling.groupSample(Tables.documents(s, d),
            struct(col("lang"), col("source")), col("doc_id"), 5)
          .select(col("doc_id"), col("lang"), col("source"))
          .orderBy(col("doc_id"))
    },

    // Train/valid/test assignment (80/10/10) — per-key stable, so joining
    // any table split on the same key never leaks across splits. Output is
    // the per-split census plus a membership digest.
    Q("q_train_test_split", {
      val t80 = Sampling.thresholdHex(0.8)
      val t90 = Sampling.thresholdHex(0.9)
      s"WITH a AS (SELECT doc_id, CASE WHEN ${duckBucket("doc_id")} < '$t80' " +
        s"THEN 'train' WHEN ${duckBucket("doc_id")} < '$t90' THEN 'valid' " +
        "ELSE 'test' END AS split FROM documents) " +
        "SELECT split, COUNT(*) AS n, " +
        "md5(array_to_string(list(doc_id ORDER BY doc_id), ',')) AS member_digest " +
        "FROM a GROUP BY split ORDER BY split"
    }) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          Sampling.splitAssign(col("doc_id"), 0.8, 0.1).as("split"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"),
          md5(array_join(array_sort(collect_list(col("doc_id"))), ",")
            .cast("binary")).as("member_digest"))
        .orderBy(col("split"))
    },

    // APPROXIMATE QUERY PROCESSING over the deterministic sample: per-type
    // count and value-sum estimated from the 10 % md5(event_id) sample,
    // scaled by 1/p, with a 95 % CI (1.96·√n̂ ≈ Poisson) and a coverage
    // check against the exact full-scan answer computed in the same
    // statement. At 100 TB the sample is the only side that's scanned for
    // an interactive estimate — the exact side here exists to PIN the
    // estimator's accuracy as data, the same way sim_recall_* pins ANN
    // quality. The sample is hash-deterministic, so estimate, CI, and
    // coverage are engine-portable (sums rounded before scaling).
    Q("q_sample_estimate", {
      val t = Sampling.thresholdHex(0.1)
      "WITH sm AS (SELECT event_type, COUNT(*)::BIGINT AS n_sample, " +
        "ROUND(SUM(value), 2) AS ssum FROM events " +
        s"WHERE ${duckBucket("event_id")} < '$t' GROUP BY 1), " +
        "fl AS (SELECT event_type, COUNT(*)::BIGINT AS exact_count, " +
        "ROUND(SUM(value), 2) AS fsum FROM events GROUP BY 1) " +
        "SELECT f.event_type, COALESCE(s.n_sample, 0) AS n_sample, " +
        "COALESCE(s.n_sample, 0) * 10 AS est_count, f.exact_count, " +
        "ROUND(19.6 * sqrt(COALESCE(s.n_sample, 0)), 2) AS ci_95, " +
        "ABS(COALESCE(s.n_sample, 0) * 10 - f.exact_count) <= " +
        "ROUND(19.6 * sqrt(COALESCE(s.n_sample, 0)), 2) AS count_covered, " +
        "ROUND(COALESCE(s.ssum, 0) * 10, 2) AS est_sum, f.fsum AS exact_sum " +
        "FROM fl f LEFT JOIN sm s USING (event_type) ORDER BY event_type"
    }) { (s, d) =>
      val events = Tables.events(s, d)
      val sm = Sampling.hashSample(events, col("event_id"), 0.1)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_sample"), round(sum(col("value")), 2).as("ssum"))
      val fl = events.groupBy(col("event_type"))
        .agg(count(lit(1)).as("exact_count"), round(sum(col("value")), 2).as("fsum"))
      val ns = coalesce(col("n_sample"), lit(0L))
      val ci = round(lit(19.6) * sqrt(ns), 2)
      fl.join(sm, Seq("event_type"), "left")
        .select(col("event_type"), ns.as("n_sample"),
          (ns * 10).as("est_count"), col("exact_count"),
          ci.as("ci_95"),
          (abs(ns * 10 - col("exact_count")) <= ci).as("count_covered"),
          round(coalesce(col("ssum"), lit(0.0)) * 10, 2).as("est_sum"),
          col("fsum").as("exact_sum"))
        .orderBy(col("event_type"))
    }
  )
}
