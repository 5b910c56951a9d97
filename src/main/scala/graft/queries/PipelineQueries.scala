package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.functions.TextFunctions._
import graft.operators.{Corpus, Dedup, Sampling}
import graft.sources.Tables

/** Capstone compositions: the operators assembled into the actual
  * training-data-pipeline shapes — a corpus cleaning pass (quality gate →
  * language gate → near-dup removal) and a corpus summary. These are what
  * a user of the engine runs at 100 TB; each stage is one of the
  * already-oracle-checked operators, and the composition is oracle-checked
  * end-to-end too. */
object PipelineQueries {

  private val enPat = langMarkers.toMap.apply("en")

  /** Shared DuckDB oracle fragments — ONE source of truth for the
    * cleaning stages (`pipeline_clean_corpus`, `pipeline_training_mix`)
    * and the provenance funnel that replays them: hand-copied replicas
    * drift silently (the funnel would fail its oracle when a stage
    * string changes but its copy doesn't, and someone must hand-diff
    * two 15-line SQL blocks to find out why). */
  private val toksCte =
    "toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents)"
  /** toks → distinct 3-gram shingles → k=12 minhash → 4 bands → LSH
    * candidate pairs (the k12/b4/r3 chain of Dedup.lshVerifiedPairs). */
  private val lshCandCtes =
    toksCte + ", " +
      "sh AS (SELECT doc_id, CASE WHEN len(t) >= 3 THEN " +
      "list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) " +
      "ELSE CAST([] AS VARCHAR[]) END AS s FROM toks), " +
      "sig AS (SELECT doc_id, s, list_transform(range(0, 12), " +
      "i -> list_min(list_transform(s, x -> md5(i::VARCHAR || '|' || x)))) AS sig FROM sh), " +
      "bandrows AS (SELECT doc_id, j, md5(array_to_string(sig[(j*3+1):(j*3+3)], '|')) AS bh " +
      "FROM sig, range(0, 4) r(j)), " +
      "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM bandrows a " +
      "JOIN bandrows b ON a.j = b.j AND a.bh = b.bh AND a.doc_id < b.doc_id)"
  /** Exact Jaccard over the candidate pair's shingle sets (raw
    * integer-count ratio — bit-identical in any engine, no rounding). */
  private val lshJac =
    "len(list_intersect(sa.s, sb.s))::DOUBLE / len(list_distinct(list_concat(sa.s, sb.s)))"
  /** Per-doc gate features (marker hits + token count). */
  private val gateCte =
    "q AS (SELECT doc_id, lang, text, " +
      s"len(regexp_extract_all(lower(text), '$enPat'))::BIGINT AS stop_hits, " +
      "len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens FROM documents)"
  /** Distinct word 4-grams digested per doc with the bench split flag
    * (the contamination join's key table); references `toks`. */
  private val gram4Cte =
    "g4 AS (SELECT doc_id, doc_id % 20 = 0 AS is_bench, substr(md5(ng), 1, 16) AS gh " +
      "FROM (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 2), " +
      "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS ng " +
      "FROM toks WHERE len(t) >= 4))"

  val all: Seq[Q] = Seq(

    // Clean-corpus pass: docs surviving (1) stopword-ratio quality gate,
    // (2) marker-language gate, (3) near-dup removal (keep-lowest-id rule
    // over MinHash+LSH verified pairs — drop every id_b).
    Q("pipeline_clean_corpus",
      "WITH " + lshCandCtes + ", " +
        "dup AS (SELECT DISTINCT id_b FROM cand JOIN sh sa ON sa.doc_id = id_a " +
        "JOIN sh sb ON sb.doc_id = id_b " +
        s"WHERE $lshJac >= 0.5), " +
        gateCte + " " +
        "SELECT d.doc_id FROM documents d JOIN q USING (doc_id) " +
        "WHERE q.stop_hits / q.n_tokens::DOUBLE >= 0.05 AND q.n_tokens >= 20 " +
        "AND d.doc_id NOT IN (SELECT id_b FROM dup) ORDER BY d.doc_id") { (s, d) =>
      val docs = Tables.documents(s, d)
      val dupIds = Dedup.lshVerifiedPairs(docs, k = 12, bands = 4, rows = 3,
          threshold = 0.5)
        .select(col("id_b").as("doc_id")).distinct()
      docs
        .withColumn("stop_hits", langScore(col("text"), enPat))
        .withColumn("n_tokens", wsTokenCount(col("text")))
        .where(col("stop_hits") / col("n_tokens").cast("double") >= 0.05 &&
          col("n_tokens") >= 20)
        .join(dupIds, Seq("doc_id"), "left_anti")
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    },

    // The full training-mix build: quality gate → exact dedup (keep min
    // id) → benchmark holdout + contamination removal (shared 4-gram with
    // a held-out doc) → deterministic split assignment → per-(lang, split)
    // census. Every stage is an already-oracle-checked operator; this
    // checks the END-TO-END composition a 100-TB pre-training run executes.
    Q("pipeline_training_mix", {
      val t80 = Sampling.thresholdHex(0.8)
      val t90 = Sampling.thresholdHex(0.9)
      "WITH " + gateCte + ", " +
        "gated AS (SELECT * FROM q WHERE stop_hits / n_tokens::DOUBLE >= 0.05 " +
        "AND n_tokens >= 20), " +
        "ded AS (SELECT doc_id, lang, n_tokens FROM (SELECT doc_id, lang, n_tokens, " +
        "ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM gated) " +
        "WHERE rn = 1), " +
        toksCte + ", " + gram4Cte + ", " +
        "cont AS (SELECT DISTINCT g1.doc_id FROM g4 g1 JOIN g4 g2 ON g1.gh = g2.gh " +
        "AND NOT g1.is_bench AND g2.is_bench), " +
        "fin AS (SELECT lang, n_tokens, " +
        s"CASE WHEN substr(md5(doc_id::VARCHAR), 1, 4) < '$t80' THEN 'train' " +
        s"WHEN substr(md5(doc_id::VARCHAR), 1, 4) < '$t90' THEN 'valid' " +
        "ELSE 'test' END AS split FROM ded WHERE doc_id % 20 != 0 " +
        "AND doc_id NOT IN (SELECT doc_id FROM cont)) " +
        "SELECT lang, split, COUNT(*) AS n_docs, " +
        "CAST(SUM(n_tokens) AS BIGINT) AS total_tokens " +
        "FROM fin GROUP BY 1, 2 ORDER BY 1, 2"
    }) { (s, d) =>
      val docs = Tables.documents(s, d)
      val gated = docs
        .withColumn("stop_hits", langScore(col("text"), enPat))
        .withColumn("n_tokens", wsTokenCount(col("text")))
        .where(col("stop_hits") / col("n_tokens").cast("double") >= 0.05 &&
          col("n_tokens") >= 20)
      val deduped = gated
        .withColumn("rn", row_number().over(
          Window.partitionBy(md5(col("text").cast("binary"))).orderBy(col("doc_id"))))
        .where(col("rn") === 1)
      val contaminated = Corpus
        .contaminationPairs(docs, n = 4, isBench = col("doc_id") % 20 === 0)
        .select(col("train_id").as("doc_id")).distinct()
      deduped
        .where(col("doc_id") % 20 =!= 0)
        .join(contaminated, Seq("doc_id"), "left_anti")
        .withColumn("split", Sampling.splitAssign(col("doc_id"), 0.8, 0.1))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
        .orderBy(col("lang"), col("split"))
    },

    // Corpus summary: one row of dataset-level statistics.
    Q("pipeline_corpus_stats",
      // SUMs cast ::BIGINT: DuckDB SUM(BIGINT) yields HUGEINT, which the
      // driver's arrow path renders as decimal/float and hash-mismatches
      // Spark's int64 even when the values are equal.
      "SELECT COUNT(*) AS n_docs, " +
        "CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_tokens, " +
        "CAST(SUM(n_chars) AS BIGINT) AS total_chars, " +
        "COUNT(DISTINCT lang) AS n_langs, COUNT(DISTINCT source) AS n_sources, " +
        "MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars " +
        "FROM documents") { (s, d) =>
      Tables.documents(s, d)
        .agg(
          count(lit(1)).as("n_docs"),
          sum(wsTokenCount(col("text"))).as("total_tokens"),
          sum(col("n_chars")).as("total_chars"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
    },

    // Sequence packing: concatenate-and-chunk documents into fixed
    // token-budget training sequences (the GPT-style pretraining batch
    // layout). Documents are packed GREEDILY IN doc_id ORDER within each
    // language shard: a doc starts in sequence floor(tokens_before / B)
    // and may straddle the boundary — exactly the concat-then-chunk
    // semantics of packed pretraining. Per (lang, seq) the query reports
    // docs started, tokens contributed, and the running fill.
    //
    // Scale shape: the running token total is a window ORDERED within a
    // PARTITION (lang shard) — never a global single-partition cumsum; a
    // 100-TB corpus packs each shard independently, which is how
    // distributed packing is actually run (shard = worker's slice). One
    // hash shuffle on lang, one window pass, one group-aggregate.
    // ADAPTIVE quality gate: instead of one global cutoff, keep each
    // language's top-75 % by the composite quality score (per-lang exact
    // p25 threshold) — the shape real corpus recipes use, since absolute
    // quality scores aren't comparable across languages. The quality
    // expression replays text_quality's term order exactly (bit-identical
    // doubles in both engines); `percentile` ↔ `quantile_cont` parity is
    // the q_percentiles precedent. One aggregate + one broadcast-size
    // join on lang — two passes over the corpus at any scale.
    Q("pipeline_quality_gate",
      "WITH f AS (SELECT doc_id, lang, " +
        "0.4 * (len(regexp_extract_all(lower(text), '" + enPat + "'))::BIGINT " +
        "/ len(string_split_regex(trim(text), '\\s+'))::DOUBLE) " +
        "+ 0.3 * LEAST(1.0, len(string_split_regex(trim(text), '\\s+'))::BIGINT / 100.0) " +
        "+ 0.3 * (1.0 - len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]'))::BIGINT " +
        "/ length(text)::DOUBLE) AS quality FROM documents WHERE length(text) > 0), " +
        "th AS (SELECT lang, quantile_cont(quality, 0.25) AS p25 FROM f GROUP BY 1) " +
        "SELECT f.lang, COUNT(*) AS n_total, " +
        "CAST(SUM(CASE WHEN quality >= p25 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, " +
        "ROUND(MAX(p25), 6) AS p25 " +
        "FROM f JOIN th ON f.lang = th.lang GROUP BY 1 ORDER BY 1") { (s, d) =>
      val f = Tables.documents(s, d)
        .where(length(col("text")) > 0)
        .select(col("doc_id"), col("lang"),
          wsTokenCount(col("text")).as("n_tokens"),
          langScore(col("text"), enPat).as("stop_hits"),
          punctCount(col("text")).as("n_punct"),
          length(col("text")).cast("long").as("n_len"))
        .select(col("doc_id"), col("lang"),
          (lit(0.4) * (col("stop_hits") / col("n_tokens").cast("double"))
            + lit(0.3) * least(lit(1.0), col("n_tokens") / lit(100.0))
            + lit(0.3) * (lit(1.0) - col("n_punct") / col("n_len").cast("double")))
            .as("quality"))
      val th = f.groupBy(col("lang"))
        .agg(expr("percentile(quality, 0.25)").as("p25"))
      f.join(broadcast(th), "lang")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("quality") >= col("p25"), 1L).otherwise(0L)).as("n_kept"),
          round(max(col("p25")), 6).as("p25"))
        .orderBy(col("lang"))
    },

    // Temperature-resampled language mix: the multilingual upsampling
    // step of a pretraining data recipe — natural share p_l per language,
    // temperature-flattened weight p_l^α, resampled share and upsample
    // factor per language. α = 0.5 (sqrt) deliberately: IEEE sqrt is
    // correctly rounded in BOTH engines, so the oracle replays the exact
    // doubles (a generic pow() differs in the last ulp across libms).
    // Pure per-group arithmetic over a 5-row aggregate — the 100-TB cost
    // is one count per language.
    Q("pipeline_temperature_mix",
      "WITH p AS (SELECT lang, COUNT(*)::BIGINT AS n_docs FROM documents GROUP BY 1), " +
        "s AS (SELECT lang, n_docs, " +
        "n_docs::DOUBLE / (SELECT SUM(n_docs) FROM p) AS nat_share, " +
        "sqrt(n_docs::DOUBLE) AS w FROM p) " +
        "SELECT lang, n_docs, ROUND(nat_share, 6) AS nat_share, " +
        "ROUND(w / (SELECT SUM(sqrt(n_docs::DOUBLE)) FROM p), 6) AS temp_share, " +
        "ROUND((w / (SELECT SUM(sqrt(n_docs::DOUBLE)) FROM p)) / nat_share, 4) AS upsample " +
        "FROM s ORDER BY lang") { (s, d) =>
      val counts = Tables.documents(s, d)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      val tot = counts.agg(sum(col("n_docs")).as("tot"),
        sum(sqrt(col("n_docs").cast("double"))).as("wtot"))
      counts.crossJoin(broadcast(tot))
        .select(col("lang"), col("n_docs"),
          round(col("n_docs").cast("double") / col("tot"), 6).as("nat_share"),
          round(sqrt(col("n_docs").cast("double")) / col("wtot"), 6).as("temp_share"),
          round((sqrt(col("n_docs").cast("double")) / col("wtot"))
            / (col("n_docs").cast("double") / col("tot")), 4).as("upsample"))
        .orderBy(col("lang"))
    },

    // Sequence packing: concatenate-and-chunk documents into fixed
    // token-budget training sequences (the GPT-style pretraining batch
    // layout). Documents are packed GREEDILY IN doc_id ORDER within each
    // language shard: a doc starts in sequence floor(tokens_before / B)
    // and may straddle the boundary — exactly the concat-then-chunk
    // semantics of packed pretraining. Per (lang, seq) the query reports
    // docs started, tokens contributed, and the running fill.
    //
    // Scale shape — DISTRIBUTED TWO-PASS PREFIX SUM (round-7 verdict
    // item 3; `lang` alone is NOT a bounded partition — at 100 TB the
    // English shard would serialize one window task):
    //   pass 1: cumsum within (lang, doc_id div W) RANGE sub-shards —
    //           every window partition is bounded by W docs;
    //   pass 2: per-shard token totals (one row per shard) get a running
    //           offset via a window over n/W one-row records, then
    //           before = shard offset + within-shard cumsum.
    // Range (not hash) sub-shards keep doc_id order intact, so the
    // composition is EXACTLY the per-lang cumsum — the oracle keeps the
    // single-window formulation as an independent spec of the same
    // function. W=128 exercises multi-shard composition at sf0.01; at
    // real scale W grows so the pass-2 window stays small (and composes
    // recursively if n/W itself ever gets big — it is the same operator).
    Q("pipeline_pack_sequences",
      "WITH t AS (SELECT doc_id, lang, " +
        "len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tok " +
        "FROM documents WHERE length(trim(text)) > 0), " +
        "c AS (SELECT lang, doc_id, n_tok, " +
        "SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS before " +
        "FROM t), " +
        "s AS (SELECT lang, doc_id, n_tok, CAST(before // 2048 AS BIGINT) AS seq_id FROM c) " +
        "SELECT lang, seq_id, COUNT(*) AS n_docs, " +
        "CAST(SUM(n_tok) AS BIGINT) AS seq_tokens " +
        "FROM s GROUP BY 1, 2 ORDER BY 1, 2") { (s, d) =>
      packedDocs(s, d)
        .groupBy(col("lang"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).cast("long").as("seq_tokens"))
        .orderBy(col("lang"), col("seq_id"))
    },

    // Packing by REAL tokenizer counts — the production contract
    // (sequence budgets are tokenizer tokens, not whitespace words):
    // the same bounded-shard two-pass layout as pipeline_pack_sequences,
    // but each doc's length is its n_bpe_tokens from the bpe_encode
    // ARTIFACT (the fold chain never re-runs — one equi-join attaches
    // the counts; docs with no [a-z]+ words carry no encode row and
    // drop out identically on both engines). The oracle replays BPE
    // train + encode + the identical prefix-sum packing, so a drifted
    // tokenizer OR a drifted layout fails the hash.
    Q("pipeline_pack_bpe",
      s"WITH ${TextQueries.bpeDocCtes(3)}, " +
        "enc AS (SELECT doc_id, CAST(SUM(len(syms)) AS BIGINT) AS n_tok " +
        "FROM d3 GROUP BY doc_id), " +
        "t AS (SELECT e.doc_id, d.lang, e.n_tok FROM enc e " +
        "JOIN documents d USING (doc_id)), " +
        "c AS (SELECT lang, doc_id, n_tok, " +
        "SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS before " +
        "FROM t), " +
        "s AS (SELECT lang, doc_id, n_tok, CAST(before // 2048 AS BIGINT) AS seq_id FROM c) " +
        "SELECT lang, seq_id, COUNT(*) AS n_docs, " +
        "CAST(SUM(n_tok) AS BIGINT) AS seq_tokens " +
        "FROM s GROUP BY 1, 2 ORDER BY 1, 2") { (s, d) =>
      val docs = Tables.documents(s, d)
      val enc = Corpus.bpeEncode(docs, iters = 3)
        .select(col("doc_id"), col("n_bpe_tokens").as("n_tok"))
      val shardW = 128L
      val t = docs.select(col("doc_id"), col("lang"))
        .join(enc, Seq("doc_id"))
        .withColumn("shard", expr(s"doc_id div $shardW"))
      val wShard = Window.partitionBy(col("lang"), col("shard"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val within = t.withColumn("within",
        sum(col("n_tok")).over(wShard) - col("n_tok"))
      val wOff = Window.partitionBy(col("lang")).orderBy(col("shard"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val offsets = t.groupBy(col("lang"), col("shard"))
        .agg(sum(col("n_tok")).as("shard_tok"))
        .withColumn("shard_off", sum(col("shard_tok")).over(wOff) - col("shard_tok"))
        .select(col("lang"), col("shard"), col("shard_off"))
      within.join(broadcast(offsets), Seq("lang", "shard"))
        .withColumn("before", col("within") + col("shard_off"))
        .withColumn("seq_id", expr("before div 2048"))
        .groupBy(col("lang"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).cast("long").as("seq_tokens"))
        .orderBy(col("lang"), col("seq_id"))
    },

    // Document-boundary packing with span output — what a dataloader
    // actually consumes: one row per (doc, sequence) overlap carrying the
    // doc's token span [start_tok, end_tok) WITHIN the sequence, so loss
    // masks / attention resets can be built per sequence. Pure arithmetic
    // over the same two-pass running offset: a doc occupying global
    // tokens [before, before + n_tok) intersects sequences
    // floor(before/B) .. floor((before+n_tok-1)/B). Spans of one sequence
    // tile it disjointly, so (lang, seq_id, start_tok) is a total order.
    Q("pipeline_pack_spans",
      "WITH t AS (SELECT doc_id, lang, " +
        "len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tok " +
        "FROM documents WHERE length(trim(text)) > 0), " +
        "c AS (SELECT lang, doc_id, n_tok, " +
        "CAST(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS BIGINT) AS before " +
        "FROM t), " +
        "x AS (SELECT lang, doc_id, n_tok, before, " +
        "unnest(range(before // 2048, (before + n_tok - 1) // 2048 + 1)) AS seq_id " +
        "FROM c) " +
        "SELECT lang, seq_id, doc_id, " +
        "GREATEST(before - seq_id * 2048, 0) AS start_tok, " +
        "LEAST(before + n_tok - seq_id * 2048, 2048) AS end_tok " +
        "FROM x ORDER BY lang, seq_id, start_tok, doc_id") { (s, d) =>
      val budget = 2048L
      packedDocs(s, d)
        .withColumn("s1", ((col("before") + col("n_tok") - 1) / budget).cast("long"))
        .select(col("lang"), col("doc_id"), col("n_tok"), col("before"),
          explode(sequence(col("seq_id"), col("s1"))).as("seq_id"))
        .select(col("lang"), col("seq_id"), col("doc_id"),
          greatest(col("before") - col("seq_id") * budget, lit(0L)).as("start_tok"),
          least(col("before") + col("n_tok") - col("seq_id") * budget,
            lit(budget)).as("end_tok"))
        .orderBy(col("lang"), col("seq_id"), col("start_tok"), col("doc_id"))
    },

    // Quantile bucketing (rank normalization): global quartile boundaries
    // of a per-doc quality score, each doc assigned its quartile bucket —
    // the curriculum / quality-tiering primitive (quality_gate is the
    // per-group FILTER; this is the global TIERING). The boundaries are a
    // 3-number aggregate BROADCAST onto a narrow bucketing scan — the
    // corpus is never shuffled; the presentation aggregate groups 4 rows.
    // Exact percentile keeps the oracle exact (Spark `percentile` and
    // DuckDB `quantile_cont` share the linear-interpolation definition —
    // same parity pipeline_quality_gate certifies); the 100-TB boundary
    // estimation swaps in approx_percentile/KLL, already certified by
    // q_approx_percentile, without touching the bucketing shape.
    Q("pipeline_quality_buckets",
      "WITH f AS (SELECT doc_id, " +
        "len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens, " +
        "len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]'))::BIGINT AS n_punct, " +
        "length(text)::BIGINT AS n_len FROM documents), " +
        "s AS (SELECT doc_id, 0.5 * LEAST(1.0, n_tokens / 100.0) " +
        "+ 0.5 * (1.0 - n_punct / n_len::DOUBLE) AS q FROM f), " +
        "b AS (SELECT ROUND(quantile_cont(q, 0.25), 6) AS b1, " +
        "ROUND(quantile_cont(q, 0.5), 6) AS b2, " +
        "ROUND(quantile_cont(q, 0.75), 6) AS b3 FROM s) " +
        "SELECT CASE WHEN q < b1 THEN 'p00_25' WHEN q < b2 THEN 'p25_50' " +
        "WHEN q < b3 THEN 'p50_75' ELSE 'p75_100' END AS bucket, " +
        "COUNT(*) AS n, ROUND(AVG(q), 6) AS avg_q " +
        "FROM s, b GROUP BY 1 ORDER BY 1") { (s, d) =>
      val f = Tables.documents(s, d).select(
        col("doc_id"),
        wsTokenCount(col("text")).as("n_tokens"),
        punctCount(col("text")).as("n_punct"),
        length(col("text")).cast("long").as("n_len"))
      val scored = f.select(col("doc_id"),
        (lit(0.5) * least(lit(1.0), col("n_tokens") / lit(100.0))
          + lit(0.5) * (lit(1.0) - col("n_punct") / col("n_len").cast("double")))
          .as("q"))
      val bounds = scored.agg(
        round(expr("percentile(q, 0.25)"), 6).as("b1"),
        round(expr("percentile(q, 0.5)"), 6).as("b2"),
        round(expr("percentile(q, 0.75)"), 6).as("b3"))
      scored.crossJoin(broadcast(bounds))
        .select(col("q"),
          when(col("q") < col("b1"), "p00_25")
            .when(col("q") < col("b2"), "p25_50")
            .when(col("q") < col("b3"), "p50_75")
            .otherwise("p75_100").as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), round(avg(col("q")), 6).as("avg_q"))
        .orderBy(col("bucket"))
    },

    // T5-style span corruption: deterministic span masking over the token
    // stream — spans of 3 tokens, every 5th span masked (20 % mask rate),
    // masked spans replaced by ordinal sentinels in the INPUT and emitted
    // after their sentinel in the TARGET — the denoising-objective sample
    // prep, reduced to its engine skeleton. Pure per-row array transform
    // (no shuffle until the presentation sort); the full input/target
    // strings are pinned by md5 so span boundaries, sentinel numbering,
    // and order are all hash-checked, not just counted.
    Q("pipeline_span_corruption",
      "WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks " +
        "FROM documents WHERE len(regexp_extract_all(lower(text), '[a-z]+')) >= 1), " +
        "m AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens, " +
        "array_to_string(list_filter(list_transform(generate_series(1, len(toks)), i -> " +
        "CASE WHEN ((i-1)//3) % 5 = 0 THEN " +
        "CASE WHEN (i-1) % 3 = 0 THEN '<extra_' || ((i-1)//15)::VARCHAR || '>' ELSE '' END " +
        "ELSE toks[i] END), x -> x <> ''), ' ') AS input_s, " +
        "array_to_string(list_filter(list_transform(generate_series(1, len(toks)), i -> " +
        "CASE WHEN ((i-1)//3) % 5 = 0 THEN " +
        "CASE WHEN (i-1) % 3 = 0 THEN '<extra_' || ((i-1)//15)::VARCHAR || '> ' || toks[i] " +
        "ELSE toks[i] END ELSE '' END), x -> x <> ''), ' ') AS target_s, " +
        "len(list_filter(generate_series(1, len(toks)), i -> ((i-1)//3) % 5 = 0))::BIGINT AS n_masked " +
        "FROM t) " +
        "SELECT doc_id, n_tokens, n_masked, md5(input_s) AS input_md5, " +
        "md5(target_s) AS target_md5 FROM m ORDER BY doc_id") { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)).as("toks"))
        // Empty token arrays would make sequence(1, 0) run DESCENDING in
        // Spark (vs DuckDB's empty generate_series) — exclude them in
        // both engines; a real corpus does carry no-letter rows.
        .where(size(col("toks")) >= 1)
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          expr("array_join(filter(transform(sequence(1, size(toks)), i -> " +
            "CASE WHEN ((i-1) div 3) % 5 = 0 THEN " +
            "CASE WHEN (i-1) % 3 = 0 THEN concat('<extra_', CAST((i-1) div 15 AS STRING), '>') ELSE '' END " +
            "ELSE element_at(toks, i) END), x -> x != ''), ' ')").as("input_s"),
          expr("array_join(filter(transform(sequence(1, size(toks)), i -> " +
            "CASE WHEN ((i-1) div 3) % 5 = 0 THEN " +
            "CASE WHEN (i-1) % 3 = 0 THEN concat('<extra_', CAST((i-1) div 15 AS STRING), '> ', element_at(toks, i)) " +
            "ELSE element_at(toks, i) END ELSE '' END), x -> x != ''), ' ')").as("target_s"),
          expr("CAST(size(filter(sequence(1, size(toks)), i -> ((i-1) div 3) % 5 = 0)) AS BIGINT)")
            .as("n_masked"))
        .select(col("doc_id"), col("n_tokens"), col("n_masked"),
          md5(col("input_s").cast("binary")).as("input_md5"),
          md5(col("target_s").cast("binary")).as("target_md5"))
        .orderBy(col("doc_id"))
    },

    // Deterministic language-interleaved training order (the mixture
    // dataloader prep): each doc's per-language rank, languages then
    // alternating round-robin by (rank, lang) — the order a balanced
    // multilingual epoch reads shards in. Per-lang rank uses the SAME
    // bounded-shard two-pass as pipeline_pack_sequences (row_number
    // inside (lang, doc_id div W) range shards + per-shard count
    // offsets) — never an unbounded per-lang window. Output pins the
    // first 10 rounds of the interleave.
    Q("pipeline_interleave",
      "WITH r AS (SELECT lang, doc_id, ROW_NUMBER() OVER " +
        "(PARTITION BY lang ORDER BY doc_id) AS rnk FROM documents) " +
        "SELECT rnk, lang, doc_id FROM r WHERE rnk <= 10 ORDER BY rnk, lang") { (s, d) =>
      val shardW = 128L
      val t = Tables.documents(s, d)
        .select(col("lang"), col("doc_id"), expr(s"doc_id div $shardW").as("shard"))
      val wIn = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      val within = t.withColumn("rin", row_number().over(wIn).cast("long"))
      val wOff = Window.partitionBy(col("lang")).orderBy(col("shard"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = t.groupBy(col("lang"), col("shard"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
        .select(col("lang"), col("shard"), col("off"))
      within.join(broadcast(offs), Seq("lang", "shard"))
        .select((col("rin") + col("off")).as("rnk"), col("lang"), col("doc_id"))
        .where(col("rnk") <= 10)
        .orderBy(col("rnk"), col("lang"))
    },

    // Deterministic EPOCH SHUFFLE — the dataloader's other ordering need
    // next to interleave: each training epoch visits the corpus in an
    // independent pseudorandom order, reproducible across engines and
    // restarts (md5(doc_id:epoch) is the shuffle key — no RNG state, so a
    // resumed job at any position re-derives the same permutation). The
    // global position is computed by the bounded-shard two-pass: shard =
    // first 2 hex chars of the key (256 uniformly-populated range shards
    // per epoch), row_number inside (epoch, shard), per-shard count
    // offsets over 256 one-row records — never a global single-partition
    // window. Output pins the first 12 positions of each epoch.
    Q("q_epoch_shuffle",
      "WITH ep AS (SELECT unnest(range(1, 3)) AS epoch), " +
        "k AS (SELECT ep.epoch, d.doc_id, md5(CAST(d.doc_id AS VARCHAR) " +
        "|| ':' || CAST(ep.epoch AS VARCHAR)) AS sk FROM documents d, ep), " +
        "r AS (SELECT epoch, doc_id, sk, ROW_NUMBER() OVER " +
        "(PARTITION BY epoch ORDER BY sk, doc_id) AS pos FROM k) " +
        "SELECT CAST(epoch AS BIGINT) AS epoch, pos, doc_id FROM r " +
        "WHERE pos <= 12 ORDER BY epoch, pos") { (s, d) =>
      val k = Tables.documents(s, d)
        .select(col("doc_id"), explode(expr("array(1L, 2L)")).as("epoch"))
        .select(col("epoch"), col("doc_id"),
          md5(concat(col("doc_id").cast("string"), lit(":"),
            col("epoch").cast("string")).cast("binary")).as("sk"))
        .withColumn("shard", substring(col("sk"), 1, 2))
      val wIn = Window.partitionBy(col("epoch"), col("shard"))
        .orderBy(col("sk"), col("doc_id"))
      val within = k.withColumn("rin", row_number().over(wIn).cast("long"))
      val wOff = Window.partitionBy(col("epoch")).orderBy(col("shard"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = k.groupBy(col("epoch"), col("shard"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
        .select(col("epoch"), col("shard"), col("off"))
      within.join(broadcast(offs), Seq("epoch", "shard"))
        .select(col("epoch"), (col("rin") + col("off")).as("pos"),
          col("doc_id"))
        .where(col("pos") <= 12)
        .orderBy(col("epoch"), col("pos"))
    },

    // CURRICULUM ordering (competence-based pacing, the Platanios-style
    // schedule): difficulty = doc length (the classic proxy), docs sorted
    // easy→hard, and a sqrt-competence pacing c(t)=√(t/T) admits the
    // easiest c(t) fraction at step t — so a doc at rank fraction f first
    // becomes admissible at phase ⌈T·f²⌉, kept in EXACT integer space
    // ((T·rank² + N²−1) div N², no float-parity caveats). The global rank
    // is NEVER a single-partition window: row_number runs partitioned BY
    // the difficulty value, and the cross-partition offset comes from the
    // value histogram (distinct n_chars ≈ thousands, broadcast) — the
    // dense-rank decomposition; N itself rides in as a broadcast 1-row
    // cross join. Output = the 10-phase admission schedule; its
    // monotonically increasing avg_len IS the curriculum property the
    // hash pins.
    Q("pipeline_curriculum",
      "WITH n AS (SELECT COUNT(*) AS n FROM documents), " +
        "r AS (SELECT n_chars, ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rnk " +
        "FROM documents), " +
        "p AS (SELECT n_chars, (10 * rnk * rnk + n.n * n.n - 1) // (n.n * n.n) " +
        "AS phase FROM r, n) " +
        "SELECT phase, COUNT(*) AS n_admitted, " +
        "ROUND(AVG(n_chars), 4) AS avg_len, " +
        "CAST(MAX(n_chars) AS BIGINT) AS max_len, " +
        "CAST(SUM(COUNT(*)) OVER (ORDER BY phase) AS BIGINT) AS cum_docs " +
        "FROM p GROUP BY phase ORDER BY phase") { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
      val nRow = broadcast(docs.agg(count(lit(1)).as("n")))
      val wIn = Window.partitionBy(col("n_chars")).orderBy(col("doc_id"))
      val within = docs.withColumn("rin", row_number().over(wIn).cast("long"))
      val wOff = Window.orderBy(col("n_chars"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = docs.groupBy(col("n_chars")).agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
        .select(col("n_chars"), col("off"))
      within.join(broadcast(offs), Seq("n_chars"))
        .withColumn("rnk", col("rin") + col("off"))
        .crossJoin(nRow)
        .withColumn("phase",
          expr("(10 * rnk * rnk + n * n - 1) div (n * n)"))
        .groupBy(col("phase"))
        .agg(count(lit(1)).as("n_admitted"),
          round(avg(col("n_chars")), 4).as("avg_len"),
          max(col("n_chars")).cast("long").as("max_len"))
        .withColumn("cum_docs",
          sum(col("n_admitted")).over(Window.orderBy(col("phase"))))
        .orderBy(col("phase"))
    },

    // TRAINED quality model: 3 steps of full-batch logistic-regression GD
    // run as engine aggregations (Corpus.qualityLrTrain) — the model is a
    // 1-row broadcast weight vector, each step one map-side-combined scan
    // of the feature table; the corpus never shuffles. Rounded-grid
    // features/sigmoid/gradients make the trajectory engine-portable; the
    // oracle unrolls the identical three steps. Output = training trace.
    Q("pipeline_quality_lr", qualityLrSql(3)) { (s, d) =>
      Corpus.qualityLrTrain(Tables.documents(s, d), iters = 3)
    },

    // SERVED quality model — closes the quality-LR lifecycle the way the
    // IVF/LM/DSIR families closed theirs: the final-iteration weights
    // persist read-through (quality_lr artifact, 1 row), and an incoming
    // batch (doc_id % 10 = 7) is featurized + scored by one broadcast
    // join — zero training passes at serve time (forensics:
    // quality_lr.disk warm). The oracle replays the full train + serve
    // chain on the identical 6-dp grid.
    Q("pipeline_quality_served", qualityLrServeSql(3)) { (s, d) =>
      Corpus.qualityLrServe(Tables.documents(s, d),
        col("doc_id") % 10 === 7, iters = 3)
    },

    // PROVENANCE: per-document fate through the cleaning funnel — first
    // dropping stage (quality → lang → exact dedup → near-dup → bench
    // holdout → contamination), its deciding score, and the mix split
    // for survivors. Composed from the already-oracle-checked stage
    // predicates (see Corpus.provenanceFate); the oracle replays the
    // whole funnel, so any drift between a stage query and the funnel's
    // replica of it fails the hash doc-by-doc.
    Q("pipeline_provenance",
      provenanceCtes +
        "SELECT doc_id, fate, CASE fate WHEN 'quality' THEN n_tokens::DOUBLE " +
        "WHEN 'lang' THEN ratio WHEN 'exact_dup' THEN rn::DOUBLE " +
        "WHEN 'near_dup' THEN nd_score WHEN 'contamination' THEN ct_score END AS score, " +
        s"CASE WHEN fate = 'kept' THEN (CASE WHEN substr(md5(doc_id::VARCHAR), 1, 4) < '${Sampling.thresholdHex(0.8)}' THEN 'train' " +
        s"WHEN substr(md5(doc_id::VARCHAR), 1, 4) < '${Sampling.thresholdHex(0.9)}' THEN 'valid' " +
        "ELSE 'test' END) END AS split " +
        "FROM fate ORDER BY doc_id") { (s, d) =>
      Corpus.provenanceFate(Tables.documents(s, d)).orderBy(col("doc_id"))
    },

    // The retention funnel over the same fate table: docs entering each
    // stage (n_in) and dropped there (n_docs), ending in the kept row —
    // the per-stage census a data-governance report publishes next to
    // the corpus. Reads the provenance artifact; one tiny window over
    // ≤ 7 rows.
    Q("pipeline_retention",
      provenanceCtes +
        ", ranked AS (SELECT CASE fate WHEN 'quality' THEN 1 WHEN 'lang' THEN 2 " +
        "WHEN 'exact_dup' THEN 3 WHEN 'near_dup' THEN 4 WHEN 'bench' THEN 5 " +
        "WHEN 'contamination' THEN 6 ELSE 7 END AS ord, fate AS stage, " +
        "COUNT(*) AS n_docs FROM fate GROUP BY 1, 2) " +
        "SELECT ord, stage, CAST(n_docs AS BIGINT) AS n_docs, " +
        "CAST((SELECT COUNT(*) FROM documents) - " +
        "COALESCE(SUM(n_docs) OVER (ORDER BY ord ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_in " +
        "FROM ranked ORDER BY ord") { (s, d) =>
      val fates = Corpus.provenanceFate(Tables.documents(s, d))
      val counts = fates
        .groupBy(col("fate").as("stage"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("ord",
          when(col("stage") === "quality", 1)
            .when(col("stage") === "lang", 2)
            .when(col("stage") === "exact_dup", 3)
            .when(col("stage") === "near_dup", 4)
            .when(col("stage") === "bench", 5)
            .when(col("stage") === "contamination", 6)
            .otherwise(7))
      val w = Window.orderBy(col("ord"))
      counts
        .withColumn("n_in",
          sum(col("n_docs")).over(w.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)) -
            coalesce(sum(col("n_docs")).over(w.rowsBetween(
              Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("ord"), col("stage"), col("n_docs"), col("n_in"))
        .orderBy(col("ord"))
    }
  )

  /** Shared DuckDB CTE chain replaying [[Corpus.provenanceFate]]: the
    * LSH near-dup drop list is `pipeline_clean_corpus`'s k12/b4/r3/τ0.5
    * pipeline with the max verified Jaccard kept per dropped id; the
    * 4-gram contamination list is `pipeline_training_mix`'s, with the max
    * shared-gram count kept; gates and exact-dup rank replay
    * `pipeline_training_mix` (survivors ranked first inside each
    * text-hash group, so the gated rank needs no gated-only subquery). */
  private def provenanceCtes: String =
    "WITH " + lshCandCtes + ", " +
      s"nd AS (SELECT id_b AS doc_id, MAX($lshJac) AS nd_score " +
      "FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b " +
      s"WHERE $lshJac >= 0.5 " +
      "GROUP BY 1), " +
      gram4Cte + ", " +
      "ctp AS (SELECT g1.doc_id AS train_id, g2.doc_id AS bench_id, " +
      "COUNT(DISTINCT g1.gh) AS n_shared FROM g4 g1 JOIN g4 g2 ON g1.gh = g2.gh " +
      "AND NOT g1.is_bench AND g2.is_bench GROUP BY 1, 2), " +
      "ct AS (SELECT train_id AS doc_id, MAX(n_shared)::DOUBLE AS ct_score FROM ctp GROUP BY 1), " +
      gateCte + ", " +
      "b AS (SELECT doc_id, n_tokens, stop_hits / n_tokens::DOUBLE AS ratio, " +
      "ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY " +
      "(n_tokens >= 20 AND stop_hits / n_tokens::DOUBLE >= 0.05) DESC, doc_id) AS rn FROM q), " +
      "fate AS (SELECT b.doc_id, n_tokens, ratio, rn, nd_score, ct_score, " +
      "CASE WHEN n_tokens < 20 THEN 'quality' WHEN ratio < 0.05 THEN 'lang' " +
      "WHEN rn > 1 THEN 'exact_dup' WHEN nd_score IS NOT NULL THEN 'near_dup' " +
      "WHEN b.doc_id % 20 = 0 THEN 'bench' WHEN ct_score IS NOT NULL THEN 'contamination' " +
      "ELSE 'kept' END AS fate " +
      "FROM b LEFT JOIN nd ON nd.doc_id = b.doc_id LEFT JOIN ct ON ct.doc_id = b.doc_id) "

  /** Shared CTE chain replaying [[Corpus.qualityLrTrain]] in DuckDB:
    * feature table `f` + unrolled GD steps ending at `w{iters}t`
    * (regexp_replace needs the 'g' flag — DuckDB replaces only the first
    * match by default, Spark replaces all). */
  private def qualityLrCtes(iters: Int): String = {
    val js = 0 to 3
    val steps = (1 to iters).map { t =>
      val sums = js.map(j =>
        s"ROUND(SUM((p - y) * x$j), 4) AS s$j").mkString(", ")
      val ups = js.map(j =>
        s"ROUND(w.w$j - 1.0 * ROUND(g.s$j / g.n, 6), 6) AS w$j").mkString(", ")
      s"g$t AS (SELECT $sums, COUNT(*)::DOUBLE AS n FROM " +
        "(SELECT y, x0, x1, x2, x3, " +
        "ROUND(1.0 / (1.0 + EXP(-ROUND(w.w0 * x0 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3, 6))), 6) AS p " +
        s"FROM f, w${t - 1}t w)), " +
        s"w${t}t AS (SELECT $ups FROM w${t - 1}t w, g$t g)"
    }.mkString(", ")
    "WITH f AS (SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y, " +
      "1.0 AS x0, ROUND(LEAST(length(text), 2000) / 2000.0, 6) AS x1, " +
      "ROUND((length(text) - length(regexp_replace(text, ' ', '', 'g'))) / length(text)::DOUBLE, 6) AS x2, " +
      "ROUND(length(regexp_replace(text, '[^0-9]', '', 'g')) / length(text)::DOUBLE, 6) AS x3 " +
      "FROM documents WHERE length(text) > 0), " +
      "w0t AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3), " +
      steps
  }

  /** DuckDB replay of [[Corpus.qualityLrTrain]]: training trace output. */
  private def qualityLrSql(iters: Int): String = {
    val out = (1 to iters).map(t =>
      s"SELECT CAST($t AS BIGINT) AS it, w0, w1, w2, w3 FROM w${t}t")
      .mkString(" UNION ALL ")
    s"${qualityLrCtes(iters)} SELECT it, w0, w1, w2, w3 FROM ($out) ORDER BY it"
  }

  /** DuckDB replay of [[Corpus.qualityLrServe]]: train to `w{iters}t`,
    * then score the doc_id % 10 = 7 batch with the identical 6-dp
    * feature/sigmoid expressions. */
  private def qualityLrServeSql(iters: Int): String =
    s"${qualityLrCtes(iters)}, " +
      "b AS (SELECT doc_id, lang, 1.0 AS x0, " +
      "ROUND(LEAST(length(text), 2000) / 2000.0, 6) AS x1, " +
      "ROUND((length(text) - length(regexp_replace(text, ' ', '', 'g'))) / length(text)::DOUBLE, 6) AS x2, " +
      "ROUND(length(regexp_replace(text, '[^0-9]', '', 'g')) / length(text)::DOUBLE, 6) AS x3 " +
      "FROM documents WHERE length(text) > 0 AND doc_id % 10 = 7), " +
      "s AS (SELECT doc_id, lang, " +
      s"ROUND(1.0 / (1.0 + EXP(-ROUND(w.w0 * x0 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3, 6))), 6) AS score " +
      s"FROM b, w${iters}t w) " +
      "SELECT doc_id, score, CAST(score >= 0.5 AS INT) AS pred_en, " +
      "CAST(lang = 'en' AS INT) AS is_en FROM s ORDER BY doc_id"

  /** Shared packing core: (doc_id, lang, n_tok, before, seq_id) with
    * `before` = per-lang running token count ahead of the doc, computed by
    * the bounded-shard two-pass prefix sum described on
    * `pipeline_pack_sequences`. */
  /** The packed-sequence LAYOUT — (doc → global token offset → sequence
    * id) under the bounded-shard two-pass prefix sum — persisted
    * read-through keyed by (budget, shard width, corpus fingerprint):
    * in production this table is the dataloader's index, materialized
    * once per corpus snapshot and consumed every epoch by every pack /
    * span / mask consumer; rows are linear in docs and the build cost
    * (the only all-docs windows in the family) is paid once. */
  private def packedDocs(s: org.apache.spark.sql.SparkSession,
                         d: String): org.apache.spark.sql.DataFrame = {
    val src = Tables.documents(s, d)
    graft.operators.Dedup.cachedDocIndex(src, "packed_layout", "b2048w128") {
      packedDocsBuild(src)
    }
  }

  private def packedDocsBuild(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val budget = 2048L
    val shardW = 128L
    val t = docs
      .where(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("lang"),
        wsTokenCount(col("text")).as("n_tok"),
        expr(s"doc_id div $shardW").as("shard"))
    // Pass 1: cumsum inside the bounded (lang, shard) range sub-shard.
    val wShard = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = t.withColumn("within", sum(col("n_tok")).over(wShard) - col("n_tok"))
    // Pass 2: one row per shard; running offset over those rows is a
    // window over n/W one-row records (tiny — and recursively shardable
    // with the same operator if it ever isn't).
    val wOff = Window.partitionBy(col("lang")).orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = t.groupBy(col("lang"), col("shard"))
      .agg(sum(col("n_tok")).as("shard_tok"))
      .withColumn("shard_off", sum(col("shard_tok")).over(wOff) - col("shard_tok"))
      .select(col("lang"), col("shard"), col("shard_off"))
    within.join(broadcast(offsets), Seq("lang", "shard"))
      .withColumn("before", col("shard_off") + col("within"))
      .withColumn("seq_id", (col("before") / budget).cast("long"))
      .select(col("doc_id"), col("lang"), col("n_tok"), col("before"), col("seq_id"))
  }
}
