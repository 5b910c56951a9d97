package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.operators.{Corpus, Similarity}
import graft.sources.Tables

/** Corpus-level pipeline operators over `documents`: benchmark
  * contamination, repetition quality signals, tf-idf top terms, and
  * unigram-LM surprisal. Every DuckDB oracle mirrors the Spark arithmetic
  * exactly (integer-count ratios unrounded; ln-derived values on the 6-dp
  * grid). */
object CorpusQueries {

  private val toksCte =
    "toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents)"
  private val tokCte =
    "tok1 AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents)"

  // Sparse tf-idf ranking chain (shared by sim_sparse_topk and the RRF
  // fusion): tok1 → ranked candidate list `t(qid, nid, cosine, rank)` for
  // query docs doc_id < 10, df cut open (1.0), posting cap 64 — the exact
  // DuckDB replay of Corpus.sparseTopK.
  private val sparseRankChain =
    "tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok1 GROUP BY 1, 2), " +
      "dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1), " +
      "nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents), " +
      "w AS (SELECT doc_id, tok, ROUND(tf * ln(n_docs::DOUBLE / df), 6) AS w " +
      "FROM tf JOIN dfreq USING (tok), nd WHERE df <= n_docs * 1.0), " +
      "nrm AS (SELECT doc_id, ROUND(sqrt(SUM(w * w)), 6) AS nrm FROM w " +
      "GROUP BY 1 HAVING ROUND(sqrt(SUM(w * w)), 6) > 0), " +
      "wn AS (SELECT doc_id, tok, w, nrm FROM w JOIN nrm USING (doc_id)), " +
      "pr AS (SELECT doc_id, tok, w, nrm FROM (SELECT doc_id, tok, w, nrm, " +
      "ROW_NUMBER() OVER (PARTITION BY tok ORDER BY w DESC, doc_id) AS ir " +
      "FROM wn) WHERE ir <= 64), " +
      "sc AS (SELECT q.doc_id AS qid, c.doc_id AS nid, q.nrm AS nq, c.nrm AS nc, " +
      "ROUND(SUM(q.w * c.w), 6) AS dot FROM wn q JOIN pr c USING (tok) " +
      "WHERE q.doc_id < 10 AND c.doc_id != q.doc_id GROUP BY 1, 2, 3, 4), " +
      "r AS (SELECT qid, nid, ROUND(dot / (nq * nc), 6) AS cosine FROM sc), " +
      "t AS (SELECT qid, nid, cosine, ROW_NUMBER() OVER " +
      "(PARTITION BY qid ORDER BY cosine DESC, nid) AS rank FROM r)"

  // RRF fusion chain (shared by sim_hybrid_rrf and pipeline_rag_pack):
  // sparse top-20 (the chain above) FULL OUTER dense top-20, fused score
  // 1/(60+rank) summed, re-ranked as `rr(qid, nid, rrf, rank)`.
  private val hybridRrfCtes =
    s"$tokCte, $sparseRankChain, " +
      "sp AS (SELECT qid, nid, rank AS sr FROM t WHERE rank <= 20), " +
      "e2 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
      "n2 AS (SELECT vec_id, v, sqrt(list_sum(list_transform(range(1, len(v) + 1), " +
      "i -> v[i] * v[i]))) AS nrm2 FROM e2), " +
      "q2 AS (SELECT vec_id AS qid, v AS qv, nrm2 AS qn FROM n2 WHERE vec_id < 10), " +
      "ds AS (SELECT qid, c.vec_id AS nid, " +
      "ROUND(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * c.v[i])) " +
      "/ (qn * c.nrm2), 6) AS cosine FROM q2, n2 c WHERE c.vec_id != qid), " +
      "dr_ AS (SELECT qid, nid, cosine, ROW_NUMBER() OVER " +
      "(PARTITION BY qid ORDER BY cosine DESC, nid) AS rank FROM ds), " +
      "dn AS (SELECT qid, nid, rank AS dr FROM dr_ WHERE rank <= 20), " +
      "f AS (SELECT COALESCE(s.qid, d.qid) AS qid, COALESCE(s.nid, d.nid) AS nid, " +
      "ROUND(COALESCE(CAST(1 AS DOUBLE) / (60 + s.sr), 0) " +
      "+ COALESCE(CAST(1 AS DOUBLE) / (60 + d.dr), 0), 6) AS rrf " +
      "FROM sp s FULL OUTER JOIN dn d ON s.qid = d.qid AND s.nid = d.nid), " +
      "rr AS (SELECT qid, nid, rrf, ROW_NUMBER() OVER " +
      "(PARTITION BY qid ORDER BY rrf DESC, nid) AS rank FROM f)"

  /** The fused RRF ranking `(qid, nid, rrf, rank)` — the Spark mirror of
    * [[hybridRrfCtes]]'s `rr`. */
  private def hybridFused(s: org.apache.spark.sql.SparkSession,
                          d: String): org.apache.spark.sql.DataFrame = {
    val sp = Corpus.sparseTopK(Tables.documents(s, d), k = 20, nQueries = 10,
        maxDfFrac = 1.0, postingCap = 64)
      .select(col("qid"), col("nid"), col("rank").as("sr"))
    val embT = Tables.load(s, d, "embeddings")
    val dn = Similarity.bruteForceTopK(embT, embT.filter(col("vec_id") < 10), k = 20)
      .select(col("qid"), col("nid"), col("rank").as("dr"))
    // The per-leg ranks (sr/dr, null where the leg missed) ride along so
    // fusion DIAGNOSTICS (sim_fusion_lift) read the same artifact the
    // serving tail does instead of re-running either leg.
    rrfFuse(sp, dn)
  }

  /** ONE RRF implementation — shared by the batch fusion above and the
    * streaming hybrid serve, so the fused score/tie-break can never
    * drift between the two. Inputs: (qid, nid, sr) and (qid, nid, dr)
    * k-bounded rank lists; output carries the per-leg ranks. */
  private[queries] def rrfFuse(sp: org.apache.spark.sql.DataFrame,
                               dn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val fused = sp.join(dn, Seq("qid", "nid"), "full_outer")
      .select(col("qid"), col("nid"), col("sr"), col("dr"),
        round(coalesce(lit(1.0) / (lit(60) + col("sr")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("dr")), lit(0.0)), 6).as("rrf"))
    val w = Window.partitionBy(col("qid")).orderBy(col("rrf").desc, col("nid"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
  }

  /** The fused RRF ranking as a read-through artifact, keyed by BOTH base
    * tables' fingerprints (the fusion reads documents for the sparse leg
    * and embeddings for the dense leg). sim_hybrid_rrf stays the live
    * from-scratch fusion representative; downstream consumers of the
    * ranking (the RAG packing tail) read this instead of re-running the
    * corpus-wide dense scoring and the postings join per draw — the
    * retrieval output is exactly the table a serving tier materializes. */
  private def hybridFusedArtifact(s: org.apache.spark.sql.SparkSession,
                                  d: String): org.apache.spark.sql.DataFrame = {
    val fp = graft.operators.Dedup.docFp(Tables.documents(s, d)) + "x" +
      Similarity.corpusFp(Tables.load(s, d, "embeddings"))
    // params layout tag v2: round 14 added the per-leg sr/dr columns.
    graft.operators.IndexCache.cachedFrame(s, "hybrid_rrf", "k20q10v2", fp)(
      hybridFused(s, d))
  }

  val all: Seq[Q] = Seq(

    // Benchmark contamination: training docs sharing a distinct word 4-gram
    // with the held-out set (doc_id % 20 = 0 stands in for the eval suite).
    // 4 words in this tiny synthetic vocabulary ~ an 8-13-gram in real text.
    Q("contamination_ngram",
      s"WITH $toksCte, " +
        "g AS (SELECT doc_id, doc_id % 20 = 0 AS is_bench, substr(md5(ng), 1, 16) AS gh " +
        "FROM (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 2), " +
        "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS ng " +
        "FROM toks WHERE len(t) >= 4)), " +
        "b AS (SELECT doc_id AS bench_id, gh FROM g WHERE is_bench), " +
        "tr AS (SELECT doc_id AS train_id, gh FROM g WHERE NOT is_bench) " +
        "SELECT train_id, bench_id, COUNT(DISTINCT gh) AS n_shared " +
        "FROM tr JOIN b USING (gh) GROUP BY 1, 2 ORDER BY 1, 2") { (s, d) =>
      Corpus.contaminationPairs(Tables.documents(s, d), n = 4,
          isBench = col("doc_id") % 20 === 0)
        .orderBy(col("train_id"), col("bench_id"))
    },

    // Passage-level dedup: 16-token chunks occurring in >= 2 documents.
    Q("dedup_chunks",
      s"WITH $toksCte, " +
        "ch AS (SELECT doc_id, unnest(list_transform(range(0, len(t) // 16), " +
        "i -> array_to_string(t[i*16+1 : i*16+16], ' '))) AS chunk " +
        "FROM toks WHERE len(t) >= 16) " +
        "SELECT substr(md5(chunk), 1, 16) AS chunk_hash, " +
        "COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occurrences, " +
        "MIN(doc_id) AS keep_doc FROM ch GROUP BY 1 " +
        "HAVING COUNT(DISTINCT doc_id) >= 2 ORDER BY chunk_hash") { (s, d) =>
      Corpus.repeatedChunks(Tables.documents(s, d), n = 16)
        .orderBy(col("chunk_hash"))
    },

    // Gopher-style repetition signals (boilerplate/spam filters).
    Q("text_repetition",
      s"WITH $toksCte, " +
        "gg AS (SELECT doc_id, t, CASE WHEN len(t) >= 2 THEN " +
        "list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) " +
        "ELSE CAST([] AS VARCHAR[]) END AS g FROM toks) " +
        "SELECT doc_id, len(t)::BIGINT AS n_tokens, " +
        "1.0 - len(list_distinct(t)) / len(t)::DOUBLE AS dup_token_frac, " +
        "CASE WHEN len(g) = 0 THEN NULL ELSE " +
        "1.0 - len(list_distinct(g)) / len(g)::DOUBLE END AS dup_2gram_frac, " +
        "CASE WHEN len(g) = 0 THEN NULL ELSE " +
        "list_max(list_transform(list_distinct(g), x -> len(list_filter(g, y -> y = x)))) " +
        "/ len(g)::DOUBLE END AS top_2gram_frac " +
        "FROM gg ORDER BY doc_id") { (s, d) =>
      Corpus.repetitionSignals(Tables.documents(s, d)).orderBy(col("doc_id"))
    },

    // Top-3 terms per doc by tf-idf.
    Q("tfidf_top_terms",
      s"WITH $tokCte, " +
        "tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok1 GROUP BY 1, 2), " +
        "dfreq AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tok1 GROUP BY 1), " +
        "nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents), " +
        "s AS (SELECT doc_id, tok, tf, df, " +
        "ROUND(tf * ln(n_docs::DOUBLE / df), 6) AS tfidf " +
        "FROM tf JOIN dfreq USING (tok), nd), " +
        "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id " +
        "ORDER BY tfidf DESC, tok) AS rank FROM s) " +
        "SELECT doc_id, rank, tok, tf, df, tfidf FROM r WHERE rank <= 3 " +
        "ORDER BY doc_id, rank") { (s, d) =>
      Corpus.tfidfTopTerms(Tables.documents(s, d), k = 3)
        .orderBy(col("doc_id"), col("rank"))
    },

    // Unigram-LM mean surprisal per doc (KenLM-style fluency proxy).
    Q("text_surprisal",
      s"WITH $tokCte, " +
        "vocab AS (SELECT tok, COUNT(*) AS c FROM tok1 GROUP BY 1), " +
        "tot AS (SELECT COUNT(*) AS total FROM tok1) " +
        "SELECT doc_id, COUNT(*) AS n_tokens, " +
        "ROUND(AVG(-ln(c / total::DOUBLE)), 6) AS mean_surprisal " +
        "FROM tok1 JOIN vocab USING (tok), tot " +
        "GROUP BY doc_id ORDER BY doc_id") { (s, d) =>
      Corpus.unigramSurprisal(Tables.documents(s, d)).orderBy(col("doc_id"))
    },

    // Zipf-law fit: OLS slope/R² of ln freq vs ln rank over the top-100
    // token ranks — corpus-health diagnostic. The engine takes top-R via
    // distributed TakeOrdered and ranks only those ≤ R rows; the oracle's
    // window formulation is the same top-R-by-(n DESC, tok) semantics.
    Q("text_zipf_slope",
      s"WITH $tokCte, " +
        "c AS (SELECT tok, COUNT(*)::BIGINT AS n FROM tok1 GROUP BY 1), " +
        "r AS (SELECT tok, n, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rnk FROM c) " +
        "SELECT ROUND(regr_slope(ln(n::DOUBLE), ln(rnk::DOUBLE)), 6) AS zipf_slope, " +
        "ROUND(regr_r2(ln(n::DOUBLE), ln(rnk::DOUBLE)), 6) AS r2, " +
        "COUNT(*) AS n_types FROM r WHERE rnk <= 100") { (s, d) =>
      Corpus.zipfSlope(Tables.documents(s, d), topR = 100)
    },

    // Bigram-LM holdout scoring (add-1 smoothing, train = doc_id % 5 != 0):
    // the model is the distributed bigram count table — "training" is two
    // aggregations, scoring is a (bigram, w1)-keyed join. Mean −ln p per
    // holdout doc, the step up from text_surprisal's unigram fluency proxy.
    Q("corpus_bigram_nll",
      s"WITH $toksCte, " +
        "bg AS (SELECT doc_id, " +
        "unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1])) AS big, " +
        "unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i])) AS w1 " +
        "FROM toks WHERE len(t) >= 2), " +
        "train AS (SELECT big, w1, COUNT(*)::BIGINT AS c2 FROM bg WHERE doc_id % 5 != 0 GROUP BY 1, 2), " +
        "uni AS (SELECT w1, SUM(c2)::BIGINT AS c1 FROM train GROUP BY 1), " +
        "v AS (SELECT COUNT(DISTINCT w1)::BIGINT AS vsize FROM bg), " +
        "hold AS (SELECT doc_id, big, w1 FROM bg WHERE doc_id % 5 = 0) " +
        "SELECT h.doc_id, " +
        "ROUND(AVG(-ln((COALESCE(t.c2, 0) + 1) / (COALESCE(u.c1, 0) + vsize)::DOUBLE)), 6) AS nll, " +
        "COUNT(*) AS n_bigrams " +
        "FROM hold h LEFT JOIN train t ON h.big = t.big AND h.w1 = t.w1 " +
        "LEFT JOIN uni u ON h.w1 = u.w1, v GROUP BY 1 ORDER BY 1") { (s, d) =>
      Corpus.bigramNll(Tables.documents(s, d), holdoutMod = 5)
        .orderBy(col("doc_id"))
    },

    // The SERVED half of the bigram-LM lifecycle: the trained count table
    // and its unigram backoff persist as read-through artifacts (bigram_lm
    // + bigram_uni forensics kinds), and the holdout batch scores against
    // them without re-counting the train split. Same oracle as
    // corpus_bigram_nll — serving from the artifact must be
    // result-invisible, the dedup/IVF served-variant contract applied to
    // a language model.
    Q("corpus_nll_served",
      s"WITH $toksCte, " +
        "bg AS (SELECT doc_id, " +
        "unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1])) AS big, " +
        "unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i])) AS w1 " +
        "FROM toks WHERE len(t) >= 2), " +
        "train AS (SELECT big, w1, COUNT(*)::BIGINT AS c2 FROM bg WHERE doc_id % 5 != 0 GROUP BY 1, 2), " +
        "uni AS (SELECT w1, SUM(c2)::BIGINT AS c1 FROM train GROUP BY 1), " +
        "v AS (SELECT COUNT(DISTINCT w1)::BIGINT AS vsize FROM bg), " +
        "hold AS (SELECT doc_id, big, w1 FROM bg WHERE doc_id % 5 = 0) " +
        "SELECT h.doc_id, " +
        "ROUND(AVG(-ln((COALESCE(t.c2, 0) + 1) / (COALESCE(u.c1, 0) + vsize)::DOUBLE)), 6) AS nll, " +
        "COUNT(*) AS n_bigrams " +
        "FROM hold h LEFT JOIN train t ON h.big = t.big AND h.w1 = t.w1 " +
        "LEFT JOIN uni u ON h.w1 = u.w1, v GROUP BY 1 ORDER BY 1") { (s, d) =>
      Corpus.bigramNllServed(Tables.documents(s, d), holdoutMod = 5)
        .orderBy(col("doc_id"))
    },

    // Sparse tf-idf top-5 neighbors for query docs (doc_id < 10) via an
    // inverted-index probe: pairs accumulate the dot product over SHARED
    // tokens only and the bounded query side broadcasts so the postings
    // scan never shuffles. Two composed posting bounds (Corpus.sparseTopK
    // scaladoc): the df stop cut — open (1.0) here because THIS corpus's
    // 31-word synthetic vocabulary makes every token near-ubiquitous —
    // and the impact-ordered truncation (top-64 postings per token by
    // weight), which engages UNCONDITIONALLY and is what bounds probe
    // work on any corpus; norms stay exact, so the pruned cosine is a
    // documented lower bound. Dense complement: sim_topk_bruteforce.
    Q("sim_sparse_topk",
      s"WITH $tokCte, $sparseRankChain " +
        "SELECT qid, rank, nid, cosine FROM t WHERE rank <= 5 ORDER BY qid, rank") {
      (s, d) =>
        Corpus.sparseTopK(Tables.documents(s, d), k = 5, nQueries = 10,
            maxDfFrac = 1.0, postingCap = 64)
          .orderBy(col("qid"), col("rank"))
    },

    // Token-distribution KL drift between the even/odd doc_id splits —
    // the train/validation distribution monitor: add-1-smoothed unigram
    // distributions over the union vocabulary, KL both directions, ONE
    // token-keyed shuffle + a scalar aggregate.
    Q("corpus_kl_drift",
      s"WITH $tokCte, " +
        "c AS (SELECT tok, CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca, " +
        "CAST(SUM(CASE WHEN doc_id % 2 != 0 THEN 1 ELSE 0 END) AS BIGINT) AS cb FROM tok1 GROUP BY 1), " +
        "t AS (SELECT COUNT(*)::BIGINT AS v, CAST(SUM(ca) AS BIGINT) AS tot_a, " +
        "CAST(SUM(cb) AS BIGINT) AS tot_b FROM c) " +
        "SELECT v, tot_a, tot_b, " +
        "ROUND(SUM(ROUND(((ca + 1) / (tot_a + v)::DOUBLE) * ln(((ca + 1) / (tot_a + v)::DOUBLE) / ((cb + 1) / (tot_b + v)::DOUBLE)), 6)), 6) AS kl_ab, " +
        "ROUND(SUM(ROUND(((cb + 1) / (tot_b + v)::DOUBLE) * ln(((cb + 1) / (tot_b + v)::DOUBLE) / ((ca + 1) / (tot_a + v)::DOUBLE)), 6)), 6) AS kl_ba " +
        "FROM c, t GROUP BY 1, 2, 3") { (s, d) =>
      Corpus.tokenKlDrift(Tables.documents(s, d))
    },

    // Hybrid retrieval: reciprocal-rank fusion (RRF, k0 = 60) of the
    // sparse tf-idf inverted-index ranking (Corpus.sparseTopK — served
    // from the persisted postings artifact) and the dense cosine ranking
    // (Similarity.bruteForceTopK) for the same query ids — the standard
    // sparse+dense serving fusion of a retrieval/RAG pipeline. Both
    // candidate lists are k-bounded (20) per query, so the fusion join
    // and re-rank move O(queries · k) rows regardless of corpus size;
    // 1/(60+rank) terms are exact-integer-denominator doubles, identical
    // in any engine, and the fused score rounds to the 6-dp grid before
    // the tie-broken re-rank.
    Q("sim_hybrid_rrf",
      s"WITH $hybridRrfCtes " +
        "SELECT qid, rank, nid, rrf FROM rr WHERE rank <= 10 ORDER BY qid, rank") {
      (s, d) =>
        hybridFused(s, d)
          .where(col("rank") <= 10)
          .select(col("qid"), col("rank"), col("nid"), col("rrf"))
          .orderBy(col("qid"), col("rank"))
    },

    // Retrieval-to-context packing capstone (the RAG serving tail): the
    // hybrid-RRF top-10 per query joins each hit's token count and keeps
    // the rank-order prefix that fits a 256-token context budget — a
    // per-query running sum over a k-bounded list (WindowGroupLimit-class
    // work; the corpus is touched only by the retrieval stages).
    Q("pipeline_rag_pack",
      s"WITH $hybridRrfCtes, " +
        "top_ AS (SELECT qid, rank, nid FROM rr WHERE rank <= 10), " +
        "tc AS (SELECT doc_id, len(string_split_regex(trim(text), '\\s+'))::BIGINT " +
        "AS n_tokens FROM documents), " +
        "j AS (SELECT t.qid, t.rank, t.nid, tc.n_tokens FROM top_ t " +
        "JOIN tc ON t.nid = tc.doc_id), " +
        "c AS (SELECT qid, rank, nid, n_tokens, CAST(SUM(n_tokens) OVER " +
        "(PARTITION BY qid ORDER BY rank) AS BIGINT) AS cum_tokens FROM j) " +
        "SELECT qid, rank, nid, n_tokens, cum_tokens FROM c " +
        "WHERE cum_tokens <= 256 ORDER BY qid, rank") { (s, d) =>
      val top = hybridFusedArtifact(s, d).where(col("rank") <= 10)
        .select(col("qid"), col("rank"), col("nid"))
      val tc = Tables.documents(s, d).select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long")
          .as("n_tokens"))
      val w = Window.partitionBy(col("qid")).orderBy(col("rank"))
      top.join(tc, top("nid") === tc("doc_id"))
        .select(col("qid"), col("rank"), col("nid"), col("n_tokens"))
        .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .where(col("cum_tokens") <= 256)
        .orderBy(col("qid"), col("rank"))
    },

    // FUSION DIAGNOSTICS — what RRF costs and buys, pinned as oracle
    // data next to the tuning-curve family: for each query, where the
    // exact semantic top-1 (the dense leg's rank-1 item by construction)
    // lands in the SPARSE ranking (does lexical retrieval alone find it?)
    // and in the FUSED ranking (fusion re-ranks by vote, so it can bury
    // the true top-1 below lexical-only hits — the fidelity/robustness
    // trade a hybrid-search owner reads before shipping RRF). Served
    // entirely from the persisted artifacts: the fused table carries the
    // per-leg ranks, the relevant item comes from the shared exact
    // ground truth. 1/rank stays on the 4-dp grid (ranks ≤ 40).
    Q("sim_fusion_lift",
      s"WITH $hybridRrfCtes, " +
        "rel AS (SELECT qid, nid FROM dr_ WHERE rank = 1) " +
        "SELECT rel.qid, COALESCE(s.sr, 0) AS sparse_rank, " +
        "CASE WHEN s.sr IS NOT NULL THEN ROUND(1.0 / s.sr, 4) ELSE 0.0 END AS rr_sparse, " +
        "f.rank AS fused_rank, ROUND(1.0 / f.rank, 4) AS rr_fused " +
        "FROM rel LEFT JOIN sp s ON s.qid = rel.qid AND s.nid = rel.nid " +
        "JOIN rr f ON f.qid = rel.qid AND f.nid = rel.nid " +
        "ORDER BY rel.qid") { (s, d) =>
      val rel = SimilarityQueries.exactCosGt(s, d, k = 1)
        .select(col("qid"), col("nid"))
      val art = hybridFusedArtifact(s, d)
      rel.join(art.select(col("qid"), col("nid"), col("sr")), Seq("qid", "nid"), "left")
        .join(art.select(col("qid"), col("nid"), col("rank").as("fused_rank")),
          Seq("qid", "nid"))
        .select(col("qid"),
          coalesce(col("sr"), lit(0L)).as("sparse_rank"),
          when(col("sr").isNotNull, round(lit(1.0) / col("sr"), 4))
            .otherwise(lit(0.0)).as("rr_sparse"),
          col("fused_rank"),
          round(lit(1.0) / col("fused_rank"), 4).as("rr_fused"))
        .orderBy(col("qid"))
    },

    // CROSS-ENCODER RERANK over the hybrid top-20 — the reranker slot
    // between the RRF fusion and the RAG packing tail
    // (Similarity.crossEncoderRerank): per fused (query, candidate) pair,
    // a deterministic pairwise scorer (distinct-token overlap fraction +
    // the two legs' reciprocal ranks against a broadcast 1-row weight
    // table — the slot a learned cross-encoder fills) re-orders the
    // candidates. Pinned like sim_fusion_lift as RECALL-LIFT data: where
    // the exact semantic top-1 lands in the fused ranking vs after the
    // rerank (0 = fell outside the rerank window). Inputs are all
    // artifact-served (hybrid_rrf + exact_gt) plus a candidate-id-bounded
    // text fetch — the |queries|×k pair-scoring cost shape a production
    // reranker has.
    Q("sim_ce_rerank",
      s"WITH $hybridRrfCtes, " +
        "rel AS (SELECT qid, nid FROM dr_ WHERE rank = 1), " +
        "c AS (SELECT rr.qid, rr.nid, s.sr, d.dr FROM rr " +
        "LEFT JOIN sp s ON s.qid = rr.qid AND s.nid = rr.nid " +
        "LEFT JOIN dn d ON d.qid = rr.qid AND d.nid = rr.nid " +
        "WHERE rr.rank <= 20), " +
        "qt AS (SELECT doc_id, list_distinct(string_split_regex(trim(text), '\\s+')) AS t " +
        "FROM documents), " +
        "feat AS (SELECT c.qid, c.nid, " +
        "CASE WHEN len(q.t) = 0 THEN 0.0 ELSE " +
        "len(list_intersect(q.t, n.t))::DOUBLE / len(q.t) END AS ov, " +
        "COALESCE(CAST(1 AS DOUBLE) / (60 + c.sr), 0) AS rrs, " +
        "COALESCE(CAST(1 AS DOUBLE) / (60 + c.dr), 0) AS rrd " +
        "FROM c JOIN qt q ON q.doc_id = c.qid JOIN qt n ON n.doc_id = c.nid), " +
        "scs AS (SELECT qid, nid, ROUND(1.0 * ov + 30.0 * rrs + 30.0 * rrd, 6) " +
        "AS ce_score FROM feat), " +
        "cr AS (SELECT qid, nid, ROW_NUMBER() OVER " +
        "(PARTITION BY qid ORDER BY ce_score DESC, nid) AS ce_rank FROM scs) " +
        "SELECT rel.qid, f.rank AS fused_rank, ROUND(1.0 / f.rank, 4) AS rr_fused, " +
        "COALESCE(cr.ce_rank, 0) AS ce_rank, " +
        "CASE WHEN cr.ce_rank IS NOT NULL THEN ROUND(1.0 / cr.ce_rank, 4) " +
        "ELSE 0.0 END AS rr_ce " +
        "FROM rel JOIN rr f ON f.qid = rel.qid AND f.nid = rel.nid " +
        "LEFT JOIN cr ON cr.qid = rel.qid AND cr.nid = rel.nid " +
        "ORDER BY rel.qid") { (s, d) =>
      val art = hybridFusedArtifact(s, d)
      val cands = art.where(col("rank") <= 20)
        .select(col("qid"), col("nid"), col("sr"), col("dr"))
      val reranked = Similarity.crossEncoderRerank(
        Tables.documents(s, d), cands)
      val rel = SimilarityQueries.exactCosGt(s, d, k = 1)
        .select(col("qid"), col("nid"))
      rel
        .join(art.select(col("qid"), col("nid"),
          col("rank").as("fused_rank")), Seq("qid", "nid"))
        .join(reranked.select(col("qid"), col("nid"),
          col("ce_rank")), Seq("qid", "nid"), "left")
        .select(col("qid"), col("fused_rank"),
          round(lit(1.0) / col("fused_rank"), 4).as("rr_fused"),
          coalesce(col("ce_rank"), lit(0L)).as("ce_rank"),
          when(col("ce_rank").isNotNull, round(lit(1.0) / col("ce_rank"), 4))
            .otherwise(lit(0.0)).as("rr_ce"))
        .orderBy(col("qid"))
    },

    // DSIR importance weights for target-matched data selection
    // (Corpus.dsirLogWeights): target = doc_id % 7 = 0 (the in-domain
    // exemplar set), raw pool = everything else, 128 hashed-unigram
    // feature buckets, add-1 smoothing. Positive log_weight = document
    // looks more target-like than pool-like; resampling by exp(log w) is
    // a hash-sample on top of this table.
    Q("pipeline_dsir_weights",
      dsirCoreSql("NOT is_t") +
        " SELECT doc_id, n_tokens, log_weight FROM w ORDER BY 1") { (s, d) =>
      Corpus.dsirLogWeights(Tables.documents(s, d), buckets = 128,
          isTarget = col("doc_id") % 7 === 0)
        .orderBy(col("doc_id"))
    },

    // The RESAMPLING step the weights exist for — the corpus DSIR
    // actually emits (Corpus.dsirResample): accept pool doc d with
    // probability min(1, exp(log_weight)) on the md5 hash coordinate
    // (Sampling's discipline — deterministic fate per doc, any engine
    // replays the accept set). Integer-exact decision on a 16-bit grid:
    // u16 = md5("rs|"+doc_id)[0:4] as int < ⌊min(1,exp(lw))·65536+0.5⌋;
    // positive weights saturate at exactly 65536 (every target-looking
    // doc kept), so the only float in control flow is exp() of the
    // already-oracle-checked 6-dp log weight.
    Q("pipeline_dsir_resample",
      dsirCoreSql("NOT is_t") +
        ", r AS (SELECT doc_id, n_tokens, log_weight, " +
        "CAST(FLOOR(LEAST(EXP(log_weight), 1.0) * 65536 + 0.5) AS BIGINT) AS cap_u16 " +
        "FROM w) " +
        "SELECT doc_id, n_tokens, log_weight, cap_u16 FROM r " +
        "WHERE ('0x' || substr(md5('rs|' || doc_id::VARCHAR), 1, 4))::BIGINT < cap_u16 " +
        "ORDER BY doc_id") { (s, d) =>
      Corpus.dsirResample(Tables.documents(s, d), buckets = 128,
          isTarget = col("doc_id") % 7 === 0)
        .orderBy(col("doc_id"))
    },

    // The served DSIR half (Corpus.dsirServed): the 128-row log-ratio
    // table persists as a read-through artifact keyed by (buckets,
    // corpus fingerprint) — bench forensics show dsir_ratios.disk —
    // and the incoming batch (doc_id % 10 = 3) is scored against it
    // without re-reading the training corpus.
    Q("pipeline_dsir_served",
      dsirCoreSql("doc_id % 10 = 3") +
        " SELECT doc_id, n_tokens, log_weight FROM w ORDER BY 1") { (s, d) =>
      Corpus.dsirServed(Tables.documents(s, d), buckets = 128,
          isTarget = col("doc_id") % 7 === 0,
          inBatch = col("doc_id") % 10 === 3)
        .orderBy(col("doc_id"))
    },

    // COMPACTION closing the DSIR ingest loop (Corpus.dsirCompacted) —
    // the lifecycle statement the LSH/IVF families already make, applied
    // to a trained data-selection model: DSIR's sufficient statistics
    // (per-(doc, bucket) counts) are ADDITIVE, so the arriving batch
    // (doc_id % 10 = 3) folds into the HISTORY's persisted count
    // artifact as a pure union + one tokenize pass over just the batch.
    // History text is never re-read, and the merged ratio table is
    // IDENTICAL to retraining on history ∪ batch — certified by the
    // same oracle as the served path (same final rows through a
    // different lifecycle).
    Q("pipeline_dsir_compacted",
      dsirCoreSql("doc_id % 10 = 3") +
        " SELECT doc_id, n_tokens, log_weight FROM w ORDER BY 1") { (s, d) =>
      Corpus.dsirCompacted(Tables.documents(s, d), buckets = 128,
          isTarget = col("doc_id") % 7 === 0,
          inBatch = col("doc_id") % 10 === 3)
        .orderBy(col("doc_id"))
    }
  )

  /** The DSIR replay chain up to the scored-batch CTE `w`: bucketize →
    * per-bucket target/pool counts → smoothed 6-dp log ratios → per-doc
    * Σ cnt·lw over the docs selected by `batchPred` (a predicate over
    * tb's doc_id / is_t columns). Shared by the weights / served /
    * resample queries and the streaming ingest scorer. */
  private def dsirCoreSql(batchPred: String): String =
    s"WITH $tokCte, " +
      "tb AS (SELECT doc_id, doc_id % 7 = 0 AS is_t, " +
      "('0x' || substr(md5(tok), 1, 6))::BIGINT % 128 AS bk FROM tok1), " +
      "bc AS (SELECT bk, SUM(CASE WHEN is_t THEN 1 ELSE 0 END)::BIGINT AS ct, " +
      "SUM(CASE WHEN NOT is_t THEN 1 ELSE 0 END)::BIGINT AS cr FROM tb GROUP BY 1), " +
      "tot AS (SELECT SUM(ct)::BIGINT AS tt, SUM(cr)::BIGINT AS tr FROM bc), " +
      "lr AS (SELECT bk, ROUND(ln(((ct + 1) / (tt + 128)::DOUBLE) " +
      "/ ((cr + 1) / (tr + 128)::DOUBLE)), 6) AS lw FROM bc, tot), " +
      s"dc AS (SELECT doc_id, bk, COUNT(*)::BIGINT AS cnt FROM tb " +
      s"WHERE $batchPred GROUP BY 1, 2), " +
      "w AS (SELECT doc_id, SUM(cnt)::BIGINT AS n_tokens, " +
      "ROUND(SUM(cnt * lw), 6) AS log_weight " +
      "FROM dc JOIN lr USING (bk) GROUP BY 1)"

  /** Oracle for HYBRID retrieval at ingest (stream_hybrid_serve): the
    * sparse tf-idf probe chain (df cut 1.0, posting cap 64 — the exact
    * sparseTopK replay) RRF-fused with the SERVED IVF probe chain
    * (trained 16-cell index, nProbe 2) for the stream feed's query set
    * (vec_id < 10, which is also the sparse chain's doc_id < 10 query
    * convention). Rankings and fusion are per-query functions, so the
    * micro-batch split is invisible and this single-statement batch
    * fusion IS the expected streaming output. */
  private[queries] def hybridServeStreamSql: String =
    SimilarityQueries.ivfKmeansCoreSql(nCells = 16, iters = 3, nProbe = 2,
      nQueries = 10) +
      s", $tokCte, $sparseRankChain, " +
      "hsp AS (SELECT qid, nid, rank AS sr FROM t WHERE rank <= 20), " +
      "hdn AS (SELECT qid, nid, rank AS dr FROM r2 WHERE rank <= 20), " +
      "hf AS (SELECT COALESCE(s.qid, d.qid) AS qid, COALESCE(s.nid, d.nid) AS nid, " +
      "ROUND(COALESCE(CAST(1 AS DOUBLE) / (60 + s.sr), 0) " +
      "+ COALESCE(CAST(1 AS DOUBLE) / (60 + d.dr), 0), 6) AS rrf " +
      "FROM hsp s FULL OUTER JOIN hdn d ON s.qid = d.qid AND s.nid = d.nid), " +
      "hr AS (SELECT qid, nid, rrf, ROW_NUMBER() OVER " +
      "(PARTITION BY qid ORDER BY rrf DESC, nid) AS rank FROM hf) " +
      "SELECT qid, rank, nid, rrf FROM hr WHERE rank <= 10 ORDER BY qid, rank"

  /** Oracle for the STREAMING ingest scorer: the served chain over the
    * stream feed's batch convention (doc_id ≡ 0 mod 5). */
  private[queries] def dsirStreamSql: String =
    dsirCoreSql("doc_id % 5 = 0") +
      " SELECT doc_id, n_tokens, log_weight FROM w ORDER BY 1"
}
