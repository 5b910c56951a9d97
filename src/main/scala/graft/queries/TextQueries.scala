package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.functions.TextFunctions._
import graft.operators.Corpus
import graft.sources.Tables

/** Text-analysis operators over `documents`: language ID (marker-word
  * heuristic), quality scoring, token counting (whitespace + BPE-ish regex),
  * and document fingerprinting (normalized md5 + polynomial rolling hash).
  * All per-row narrow transforms — no shuffle at all at any scale — and
  * every computation is mirrored exactly in the DuckDB oracle SQL.
  */
object TextQueries {

  /** Shared CDC oracle chain through the per-chunk table `ch` (see
    * [[graft.operators.Corpus.cdcChunks]]): tokens → digest-gated
    * boundaries → running chunk ids → per-chunk span + content digest. */
  private val cdcChunkCte: String =
    "toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t " +
      "FROM documents), " +
      "tp AS (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS q FROM toks), " +
      "f AS (SELECT doc_id, q, t[q] AS tok, CASE WHEN q >= 4 AND " +
      "substr(md5(t[q-3] || ' ' || t[q-2] || ' ' || t[q-1] || ' ' || t[q]), 1, 1) = '0' " +
      "THEN 1 ELSE 0 END AS isb FROM tp), " +
      "g AS (SELECT doc_id, q, tok, CAST(COALESCE(SUM(isb) OVER " +
      "(PARTITION BY doc_id ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING " +
      "AND 1 PRECEDING), 0) AS BIGINT) AS cid FROM f), " +
      "ch AS (SELECT doc_id, cid, MIN(q) AS start_tok, MAX(q) AS end_tok, " +
      "COUNT(*)::BIGINT AS n_tokens, md5(string_agg(tok, ' ' ORDER BY q)) AS chunk_md5 " +
      "FROM g GROUP BY doc_id, cid)"

  /** [[cdcChunkCte]] restricted to the streaming feed subset (doc_id %
    * 5 = 0) — the oracle for chunking AT INGEST: chunk ids and digests
    * are per-document functions, so the micro-batch split must be
    * invisible and the batch chunker over the subset IS the expected
    * output. */
  private[queries] val cdcStreamSql: String =
    s"WITH ${cdcChunkCte.replace("FROM documents", "FROM documents WHERE doc_id % 5 = 0")} " +
      "SELECT doc_id, cid AS chunk_id, start_tok, end_tok, n_tokens, chunk_md5 " +
      "FROM ch ORDER BY doc_id, chunk_id"

  private val enPat = langMarkers.toMap.apply("en")

  /** Per-doc quality features + weighted composite — ONE implementation
    * shared by text_quality (the batch census) and stream_quality_gate
    * (the same scorer applied at ingest), so the gate can never drift
    * from the audited score. No rounding: per-row scalar math over
    * identical inputs is bit-identical across engines, while round() at
    * a decimal boundary (e.g. a composite landing exactly on .xxxx5) is
    * NOT portable. Zero-length text divides by zero (ANSI throws);
    * mirror DuckDB's NULL for that degenerate row. (n_tokens is never 0:
    * splitting an empty string still yields one empty token in both
    * engines.) */
  private[queries] def qualityScored(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val t = docs.select(
      col("doc_id"),
      wsTokenCount(col("text")).as("n_tokens"),
      length(regexp_replace(col("text"), "\\s", "")).cast("long").as("n_nonspace"),
      langScore(col("text"), enPat).as("stop_hits"),
      punctCount(col("text")).as("n_punct"),
      length(col("text")).cast("long").as("n_len"))
    def overLen(e: org.apache.spark.sql.Column) =
      when(col("n_len") === 0, lit(null)).otherwise(e)
    t.select(col("doc_id"), col("n_tokens"),
      (col("n_nonspace") / col("n_tokens").cast("double")).as("avg_token_len"),
      (col("stop_hits") / col("n_tokens").cast("double")).as("stopword_ratio"),
      overLen(col("n_punct") / col("n_len").cast("double")).as("punct_ratio"),
      overLen(lit(0.4) * (col("stop_hits") / col("n_tokens").cast("double"))
        + lit(0.3) * least(lit(1.0), col("n_tokens") / lit(100.0))
        + lit(0.3) * (lit(1.0) - col("n_punct") / col("n_len").cast("double")))
        .as("quality"))
  }

  /** Oracle for the quality GATE at ingest: the text_quality composite
    * over the streaming feed subset (doc_id % 5 = 0), kept rows only
    * (quality >= tau; a NULL composite — zero-length text — fails the
    * gate in both engines). Scores are per-document functions, so the
    * micro-batch split is invisible and the batch scorer over the subset
    * IS the expected output — the stream_dsir_score composition argument. */
  /** The f/q CTE pair scoring the streaming feed subset — shared by the
    * quality-gate oracle and the at-ingest provenance funnel's oracle
    * (one source of truth for the gate formula; NOTE the zero-length
    * caveat in [[qualityScored]]: n_len = 0 divides to NULL in DuckDB,
    * which the Spark side mirrors explicitly). */
  private[queries] val qualityFeedCtes =
    "f AS (SELECT doc_id, " +
      "len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens, " +
      s"len(regexp_extract_all(lower(text), '$enPat'))::BIGINT AS stop_hits, " +
      "len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]'))::BIGINT AS n_punct, " +
      "length(text)::BIGINT AS n_len FROM documents WHERE doc_id % 5 = 0), " +
      "q AS (SELECT doc_id, n_tokens, " +
      "0.4 * (stop_hits / n_tokens::DOUBLE) " +
      "+ 0.3 * LEAST(1.0, n_tokens / 100.0) " +
      "+ 0.3 * (1.0 - n_punct / n_len::DOUBLE) AS quality FROM f)"

  private[queries] def qualityGateStreamSql(tau: Double): String =
    s"WITH $qualityFeedCtes " +
      s"SELECT doc_id, n_tokens, quality FROM q WHERE quality >= $tau " +
      "ORDER BY doc_id"

  val all: Seq[Q] = Seq(

    // Language ID: marker-word hit counts per language, argmax with a fixed
    // priority tie-break (en > de > fr > es > und).
    Q("text_langid", {
      val scores = langMarkers.map { case (l, p) =>
        s"len(regexp_extract_all(lower(text), '$p'))::BIGINT AS s_$l"
      }.mkString(", ")
      s"WITH s AS (SELECT doc_id, $scores FROM documents) " +
        "SELECT doc_id, s_en, s_de, s_fr, s_es, " +
        "CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en' " +
        "WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de' " +
        "WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr' " +
        "WHEN s_es > 0 THEN 'es' ELSE 'und' END AS predicted " +
        "FROM s ORDER BY doc_id"
    }) { (s, d) =>
      val withScores = langMarkers.foldLeft(Tables.documents(s, d)) {
        case (df, (l, p)) => df.withColumn(s"s_$l", langScore(col("text"), p))
      }
      withScores.select(col("doc_id"), col("s_en"), col("s_de"), col("s_fr"),
          col("s_es"),
          when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr") &&
            col("s_en") >= col("s_es") && col("s_en") > 0, "en")
            .when(col("s_de") >= col("s_fr") && col("s_de") >= col("s_es") &&
              col("s_de") > 0, "de")
            .when(col("s_fr") >= col("s_es") && col("s_fr") > 0, "fr")
            .when(col("s_es") > 0, "es")
            .otherwise("und").as("predicted"))
        .orderBy(col("doc_id"))
    },

    // Quality scoring: token stats, stopword ratio, punctuation ratio, and a
    // weighted composite — the classic pre-training corpus filter features.
    Q("text_quality",
      "WITH f AS (SELECT doc_id, " +
        "len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens, " +
        "length(regexp_replace(text, '\\s', '', 'g'))::BIGINT AS n_nonspace, " +
        s"len(regexp_extract_all(lower(text), '$enPat'))::BIGINT AS stop_hits, " +
        "len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]'))::BIGINT AS n_punct, " +
        "length(text)::BIGINT AS n_len FROM documents) " +
        "SELECT doc_id, n_tokens, " +
        "n_nonspace / n_tokens::DOUBLE AS avg_token_len, " +
        "stop_hits / n_tokens::DOUBLE AS stopword_ratio, " +
        "n_punct / n_len::DOUBLE AS punct_ratio, " +
        "0.4 * (stop_hits / n_tokens::DOUBLE) " +
        "+ 0.3 * LEAST(1.0, n_tokens / 100.0) " +
        "+ 0.3 * (1.0 - n_punct / n_len::DOUBLE) AS quality " +
        "FROM f ORDER BY doc_id") { (s, d) =>
      qualityScored(Tables.documents(s, d)).orderBy(col("doc_id"))
    },

    // Token counting: whitespace tokens vs a BPE-ish regex segmentation.
    Q("text_token_count",
      "SELECT doc_id, len(string_split_regex(trim(text), '\\s+'))::BIGINT AS ws_tokens, " +
        "len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))::BIGINT AS bpe_tokens, " +
        "length(text)::BIGINT AS n_len FROM documents ORDER BY doc_id") { (s, d) =>
      Tables.documents(s, d).select(
          col("doc_id"),
          wsTokenCount(col("text")).as("ws_tokens"),
          regexp_count(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))
            .cast("long").as("bpe_tokens"),
          length(col("text")).cast("long").as("n_len"))
        .orderBy(col("doc_id"))
    },

    // Corpus vocabulary: top-20 tokens by frequency (explode → count → top-k).
    Q("text_vocab_topk",
      "SELECT tok, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS df FROM " +
        "(SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents) " +
        "GROUP BY tok ORDER BY n DESC, tok LIMIT 20") { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("df"))
        .orderBy(col("n").desc, col("tok"))
        .limit(20)
    },

    // Sliding-window text chunking with overlap (chunk 64 tokens, stride
    // 48 → 16-token overlap): the RAG / pretraining chunker. Chunk k of a
    // doc starts at token 1 + k·48; the tail chunk is shorter. Each chunk
    // carries a content digest so the split itself — boundaries, overlap,
    // tail clipping — is hash-checked, not just counted. Per-row generator
    // over a bound token array: no shuffle until the final sort.
    Q("text_chunk_overlap",
      "WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t " +
        "FROM documents WHERE length(trim(text)) > 0), " +
        "st AS (SELECT doc_id, t, unnest(range(1, len(t) + 1, 48)) AS s FROM toks), " +
        "c AS (SELECT doc_id, (s - 1) // 48 AS chunk_idx, CAST(s AS BIGINT) AS start_tok, " +
        "t[s : s + 63] AS chunk FROM st) " +
        "SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx, start_tok, " +
        "CAST(len(chunk) AS BIGINT) AS chunk_tokens, " +
        "md5(array_to_string(chunk, ' ')) AS digest " +
        "FROM c ORDER BY doc_id, chunk_idx") { (s, d) =>
      val C = 64; val S = 48
      Tables.documents(s, d)
        .where(length(trim(col("text"))) > 0)
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .select(col("doc_id"), col("t"),
          posexplode(sequence(lit(1), size(col("t")), lit(S))).as(Seq("chunk_idx", "start")))
        .select(col("doc_id"), col("chunk_idx"),
          col("start").cast("long").as("start_tok"),
          slice(col("t"), col("start"), lit(C)).as("chunk"))
        .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
          size(col("chunk")).cast("long").as("chunk_tokens"),
          md5(concat_ws(" ", col("chunk")).cast("binary")).as("digest"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // Fingerprinting: md5 of the normalized text + a polynomial rolling hash
    // (mod 1e9+7), both engine-portable.
    Q("text_fingerprint",
      "WITH n AS (SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), " +
        "'[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm FROM documents) " +
        "SELECT doc_id, md5(norm) AS norm_md5, " +
        "list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length(norm) + 1), " +
        "i -> ascii(substr(norm, CAST(i AS INT), 1))::BIGINT)), " +
        "(a, b) -> (a * 31 + b) % 1000000007) AS rolling " +
        "FROM n ORDER BY doc_id") { (s, d) =>
      Tables.documents(s, d)
        .withColumn("norm", normText(col("text")))
        .select(col("doc_id"),
          md5(col("norm").cast("binary")).as("norm_md5"),
          rollingHash(col("norm")).as("rolling"))
        .orderBy(col("doc_id"))
    },

    // Content-defined chunking (FastCDC/rsync family): boundary at token
    // position q whenever md5 of the 4-token window ending at q starts
    // with hex '0' — boundaries depend on CONTENT, not position, so they
    // re-synchronize after insertions (CdcChunkSpec pins that property
    // against fixed-size chunking). Output = every chunk's span + content
    // digest; one doc_id shuffle serves the lag window, the running
    // boundary count, and the per-chunk aggregate.
    Q("text_cdc_chunks",
      s"WITH $cdcChunkCte " +
        "SELECT doc_id, cid AS chunk_id, start_tok, end_tok, n_tokens, chunk_md5 " +
        "FROM ch ORDER BY doc_id, chunk_id") { (s, d) =>
      Corpus.cdcChunks(Tables.documents(s, d))
        .orderBy(col("doc_id"), col("chunk_id"))
    },

    // The census CDC chunking exists to enable: chunk-level storage
    // dedup. Identical chunks (by content digest) across the whole
    // corpus are stored once; this is the per-source accounting of that
    // saving — chunk instances, distinct chunk contents, duplicate-copy
    // mass, and the unique rate — the CDC analog of
    // dedup_rate_by_source's document-level report. One (source,
    // chunk_md5) aggregation over the chunk table + a tiny rollup.
    Q("text_cdc_dedup",
      s"WITH $cdcChunkCte, " +
        "src AS (SELECT doc_id, source FROM documents), " +
        "pc AS (SELECT s.source, c.chunk_md5, COUNT(*) AS n " +
        "FROM ch c JOIN src s USING (doc_id) GROUP BY 1, 2) " +
        "SELECT source, CAST(SUM(n) AS BIGINT) AS n_chunks, " +
        "COUNT(*)::BIGINT AS n_unique, " +
        "CAST(SUM(n) - COUNT(*) AS BIGINT) AS dup_copies, " +
        "ROUND(COUNT(*) / SUM(n)::DOUBLE, 6) AS unique_rate " +
        "FROM pc GROUP BY 1 ORDER BY source") { (s, d) =>
      val docs = Tables.documents(s, d)
      // The chunk table persists read-through (text_cdc_chunks stays the
      // live representative of the chunking cost): storage-dedup
      // accounting is a downstream CONSUMER of the chunk index, which at
      // 100 TB is built once per snapshot and read by every dedup /
      // delta-sync consumer.
      graft.operators.Dedup.cachedDocIndex(docs, "cdc_chunks", "w4") {
        Corpus.cdcChunks(docs)
      }
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source"), col("chunk_md5"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("source"))
        .agg(sum(col("n")).as("n_chunks"), count(lit(1)).as("n_unique"),
          (sum(col("n")) - count(lit(1))).as("dup_copies"),
          round(count(lit(1)) / sum(col("n")).cast("double"), 6).as("unique_rate"))
        .orderBy(col("source"))
    },

    // PII/secret redaction — the scrub pass every training-data pipeline
    // runs before packing. The synthetic corpus carries no real PII, so
    // the query first splices DETERMINISTIC email/phone/API-key spans into
    // each doc (same expression in both engines — the fixture is part of
    // the contract; doc_id residues vary the per-doc counts 0–2), then
    // counts and redacts them with engine-portable regexes (character
    // classes + bounded quantifiers only — the Java-regex/RE2 common
    // subset). Narrow per-row transform, no shuffle at any scale; output
    // pins counts AND the md5 of the fully-redacted text.
    Q("text_redact", {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
      val secret = "\\b[0-9a-f]{32}\\b"
      "WITH base AS (SELECT doc_id, " +
        "substr(text, 1, 40) || ' reach user' || doc_id::VARCHAR || '@mail.example.com' || " +
        "CASE WHEN doc_id % 3 = 0 THEN ' cc user' || doc_id::VARCHAR || '@mail.example.com' ELSE '' END || " +
        "CASE WHEN doc_id % 2 = 0 THEN ' call +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END || " +
        "' apikey ' || md5(doc_id::VARCHAR) || ' ' || substr(text, 41) AS t FROM documents), " +
        "c AS (SELECT doc_id, " +
        s"len(regexp_extract_all(t, '$email'))::BIGINT AS n_email, " +
        s"len(regexp_extract_all(t, '$phone'))::BIGINT AS n_phone, " +
        s"len(regexp_extract_all(t, '$secret'))::BIGINT AS n_secret, " +
        s"regexp_replace(regexp_replace(regexp_replace(t, '$email', '<EMAIL>', 'g'), " +
        s"'$phone', '<PHONE>', 'g'), '$secret', '<SECRET>', 'g') AS red FROM base) " +
        "SELECT doc_id, n_email, n_phone, n_secret, md5(red) AS redacted_md5 " +
        "FROM c ORDER BY doc_id"
    }) { (s, d) =>
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
      val secret = "\\b[0-9a-f]{32}\\b"
      Tables.documents(s, d)
        .select(col("doc_id"), concat(
          expr("substring(text, 1, 40)"), lit(" reach user"),
          col("doc_id").cast("string"), lit("@mail.example.com"),
          when(col("doc_id") % 3 === 0, concat(lit(" cc user"),
            col("doc_id").cast("string"), lit("@mail.example.com"))).otherwise(""),
          when(col("doc_id") % 2 === 0, concat(lit(" call +1-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(""),
          lit(" apikey "), md5(col("doc_id").cast("string").cast("binary")),
          lit(" "), expr("substring(text, 41)")).as("t"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("t"), lit(email), lit(0))).cast("long").as("n_email"),
          size(regexp_extract_all(col("t"), lit(phone), lit(0))).cast("long").as("n_phone"),
          size(regexp_extract_all(col("t"), lit(secret), lit(0))).cast("long").as("n_secret"),
          md5(regexp_replace(regexp_replace(regexp_replace(col("t"),
            lit(email), lit("<EMAIL>")), lit(phone), lit("<PHONE>")),
            lit(secret), lit("<SECRET>")).cast("binary")).as("redacted_md5"))
        .orderBy(col("doc_id"))
    },

    // BM25 ranked retrieval over the corpus for a fixed 3-term query —
    // the classic relevance scorer a corpus-curation pipeline uses for
    // targeted subset mining. One tiny global aggregate (N, Σdl, per-term
    // document frequencies — a single row) is BROADCAST back onto a
    // narrow scoring scan; no shuffle ever touches the corpus itself, so
    // the shape is scan + scalar join at any scale. Every intermediate is
    // forced to DOUBLE in both engines (DuckDB would otherwise do exact
    // DECIMAL arithmetic where Spark does binary-double) and the score is
    // rounded to 6 decimals; top-20 is ordered by (rounded score, doc_id)
    // — a total, engine-portable order.
    Q("text_bm25", {
      def tfSql(t: String) =
        s"len(regexp_extract_all(lower(text), '\\b$t\\b'))::BIGINT"
      "WITH f AS (SELECT doc_id, " +
        s"${tfSql("spark")} AS tf1, ${tfSql("vector")} AS tf2, ${tfSql("stream")} AS tf3, " +
        "len(regexp_extract_all(lower(text), '[a-z]+'))::BIGINT AS dl FROM documents), " +
        "g AS (SELECT COUNT(*)::BIGINT AS n, SUM(dl)::DOUBLE AS sumdl, " +
        "SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)::BIGINT AS df1, " +
        "SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END)::BIGINT AS df2, " +
        "SUM(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END)::BIGINT AS df3 FROM f) " +
        "SELECT doc_id, ROUND(" +
        Seq(1, 2, 3).map(i =>
          s"ln(1 + (n - df$i + 0.5)::DOUBLE / (df$i + 0.5)::DOUBLE) * tf$i * 2.2 / " +
            s"(tf$i + 1.2 * (0.25 + 0.75 * dl / (sumdl / n)))").mkString(" + ") +
        ", 6) AS bm25 FROM f, g ORDER BY bm25 DESC, doc_id LIMIT 20"
    }) { (s, d) =>
      def tf(t: String) =
        size(regexp_extract_all(lower(col("text")), lit(s"\\b$t\\b"), lit(0))).cast("long")
      val f = Tables.documents(s, d).select(col("doc_id"),
        tf("spark").as("tf1"), tf("vector").as("tf2"), tf("stream").as("tf3"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)))
          .cast("long").as("dl"))
      def df(t: String) = sum(when(col(t) > 0, 1L).otherwise(0L))
      val g = f.agg(count(lit(1)).as("n"),
        sum(col("dl")).cast("double").as("sumdl"),
        df("tf1").as("df1"), df("tf2").as("df2"), df("tf3").as("df3"))
      def term(tfc: String, dfc: String) =
        log(lit(1.0) + (col("n") - col(dfc) + lit(0.5)) / (col(dfc) + lit(0.5))) *
          col(tfc) * lit(2.2) /
          (col(tfc) + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") / (col("sumdl") / col("n"))))
      f.crossJoin(broadcast(g))
        .select(col("doc_id"),
          round(term("tf1", "df1") + term("tf2", "df2") + term("tf3", "df3"), 6)
            .as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(20)
    },

    // Quality-model inference: a linear (logistic-regression-style)
    // classifier over the text_quality features with FIXED broadcast
    // weights — the fastText-classifier shape every pretraining corpus
    // filter runs, reduced to its engine skeleton (features → w·x + b →
    // sigmoid → keep decision). Pure narrow scan; the "model" is a
    // handful of literals, i.e. a broadcast however large the corpus.
    // The keep decision compares z against 0 EXACTLY (no transcendental
    // on the decision path); the sigmoid score is rounded to 6.
    Q("text_quality_model",
      "WITH f AS (SELECT doc_id, " +
        "len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens, " +
        s"len(regexp_extract_all(lower(text), '$enPat'))::BIGINT AS stop_hits, " +
        "len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]'))::BIGINT AS n_punct, " +
        "length(text)::BIGINT AS n_len FROM documents), " +
        "z AS (SELECT doc_id, 4.0 * (stop_hits / n_tokens::DOUBLE) " +
        "- 6.0 * (n_punct / n_len::DOUBLE) + 0.02 * n_tokens::DOUBLE - 2.0 AS z FROM f) " +
        "SELECT doc_id, ROUND(1.0 / (1.0 + exp(-z)), 6) AS score, z >= 0.0 AS keep " +
        "FROM z ORDER BY doc_id") { (s, d) =>
      val f = Tables.documents(s, d).select(
        col("doc_id"),
        wsTokenCount(col("text")).as("n_tokens"),
        langScore(col("text"), enPat).as("stop_hits"),
        punctCount(col("text")).as("n_punct"),
        length(col("text")).cast("long").as("n_len"))
      val z = lit(4.0) * (col("stop_hits") / col("n_tokens").cast("double")) -
        lit(6.0) * (col("n_punct") / col("n_len").cast("double")) +
        lit(0.02) * col("n_tokens").cast("double") - lit(2.0)
      f.select(col("doc_id"), z.as("z"))
        .select(col("doc_id"),
          round(lit(1.0) / (lit(1.0) + exp(-col("z"))), 6).as("score"),
          (col("z") >= 0.0).as("keep"))
        .orderBy(col("doc_id"))
    },

    // BPE merge-candidate mining: corpus-wide adjacent-token-pair counts —
    // step 1 of byte-pair-encoding vocabulary induction (the most frequent
    // pair is the next merge). Pairs are built positionally INSIDE each row
    // (array transform over token indexes — linear, no self-join), then one
    // pair-keyed count shuffle; identical shape to text_vocab_topk.
    Q("text_bpe_pairs",
      "WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks FROM documents), " +
        "p AS (SELECT unnest(CASE WHEN len(toks) >= 2 " +
        "THEN list_transform(generate_series(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i + 1]) " +
        "ELSE [] END) AS pair FROM t) " +
        "SELECT pair, COUNT(*)::BIGINT AS cnt FROM p GROUP BY 1 " +
        "ORDER BY cnt DESC, pair LIMIT 30") { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)).as("toks"))
        .select(explode(when(size(col("toks")) >= 2,
          expr("transform(sequence(1, size(toks) - 1), " +
            "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"))
          .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))).as("pair"))
        .groupBy(col("pair"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(30)
    },

    // Iterative BPE TRAINING (3 merge rounds) — the real tokenizer loop:
    // pair counts weighted by word freq, global argmax, greedy
    // left-to-right merge rewrite, repeat. After one corpus word count the
    // loop touches only the vocab (Corpus.bpeTrain). The oracle unrolls
    // the identical three rounds; its rewrite fold is a string-accumulator
    // list_reduce with the same greedy non-overlap semantics as the Spark
    // array fold (a merged token can never re-merge within a round).
    Q("text_bpe_train", bpeTrainSql(3)) { (s, d) =>
      Corpus.bpeTrain(Tables.documents(s, d), iters = 3)
    },

    // BPE ENCODE — the apply half of the tokenizer lifecycle: every
    // document's words fold through the 3 trained merges in training
    // order (merge list = persisted model artifact, broadcast-applied
    // map-side), yielding per-doc chars-vs-tokens compression accounting.
    // The oracle replays training AND the per-document encode folds.
    Q("text_bpe_encode", bpeEncodeSql(3)) { (s, d) =>
      Corpus.bpeEncode(Tables.documents(s, d), iters = 3)
        .orderBy(col("doc_id"))
    },

    // Tokenizer FERTILITY by language — the multilingual-fairness table
    // (tokens a word costs, chars a token buys, per language): a pure
    // rollup of the bpe_encode ARTIFACT joined to the language column —
    // the fold chain never re-runs (forensics: bpe_encode.disk warm).
    // The oracle replays train + encode + the per-language rollup, so a
    // stale or mis-keyed artifact fails the hash, not just the timing.
    Q("text_fertility", bpeFertilitySql(3)) { (s, d) =>
      Corpus.bpeFertility(Tables.documents(s, d), iters = 3)
    },

    // PPMI word-association mining: for each target word, the top-8
    // context words by pointwise mutual information over a directed
    // 3-token co-occurrence window (w at position i, c at i+1..i+3).
    // Pairs are generated IN-ROW (nested transform over the bound token
    // array, the q_market_basket shape — fanout ≤ 3·|doc|, never a
    // positional self-join), so the only corpus-proportional stage is one
    // map-side-combined (w, c) count shuffle; everything downstream runs
    // on the vocab²-bounded pair table (checkpointed once, read 4× for N,
    // both marginals, and the score join). PMI ranking needs no log:
    // log is monotone, so ranking by the RAW ratio N·n(w,c)/(n(w)·n(c))
    // is identical — kept in exact integer space (ratio × 10⁴ via
    // integer division; max magnitude N·max(nwc)·10⁴ ≈ 7.6e12 at sf0.1,
    // six decades inside Long) so both engines produce the same bits
    // with zero float/log-parity caveats. ppmi_e4 > 10000 keeps the
    // positive-PMI half (PPMI's max(0, ·) cut); ties break on c.
    Q("text_ppmi_topk",
      "WITH toks AS (SELECT string_split_regex(trim(text), '\\s+') AS t " +
        "FROM documents WHERE length(trim(text)) > 0), " +
        "pos AS (SELECT t, unnest(range(1, len(t) + 1)) AS i FROM toks), " +
        "pr AS (SELECT t[CAST(i AS INT)] AS w, t[CAST(i + o AS INT)] AS c " +
        "FROM pos CROSS JOIN (VALUES (1), (2), (3)) v(o) WHERE i + o <= len(t)), " +
        "cnt AS (SELECT w, c, COUNT(*) AS nwc FROM pr GROUP BY 1, 2), " +
        "nw AS (SELECT w, CAST(SUM(nwc) AS BIGINT) AS nw FROM cnt GROUP BY 1), " +
        "nc AS (SELECT c, CAST(SUM(nwc) AS BIGINT) AS nc FROM cnt GROUP BY 1), " +
        "nn AS (SELECT CAST(SUM(nwc) AS BIGINT) AS n FROM cnt), " +
        "sc AS (SELECT cnt.w, cnt.c, cnt.nwc, " +
        "CAST((CAST((SELECT n FROM nn) AS HUGEINT) * nwc * 10000) // (CAST(nw.nw AS HUGEINT) * nc.nc) AS BIGINT) AS ppmi_e4 " +
        "FROM cnt JOIN nw ON cnt.w = nw.w JOIN nc ON cnt.c = nc.c WHERE nwc >= 5), " +
        "r AS (SELECT w, c, nwc, ppmi_e4, ROW_NUMBER() OVER " +
        "(PARTITION BY w ORDER BY ppmi_e4 DESC, c) AS rk FROM sc WHERE ppmi_e4 > 10000) " +
        "SELECT w, c, nwc, ppmi_e4, CAST(rk AS INT) AS rk FROM r " +
        "WHERE rk <= 8 ORDER BY w, rk") { (s, d) =>
      // The pair-count table is a corpus-derived build artifact (the
      // tfidf_terms/sparse_postings discipline): one tokenize+count pass
      // per corpus fingerprint, persisted read-through — serving ranks
      // over the artifact instead of re-counting 3·tokens window pairs
      // per query. vocab²-bounded, so the read is trivial at any scale.
      val docsT = Tables.documents(s, d)
      val cnt = graft.operators.IndexCache.cachedFrame(s, "ppmi_pairs",
          "w3", graft.operators.Dedup.docFp(docsT)) {
        docsT
          .where(length(trim(col("text"))) > 0)
          .select(tokens(col("text")).as("t"))
          .select(explode(expr(
            "flatten(transform(t, (x, i) -> " +
              "transform(slice(t, i + 2, 3), y -> struct(x AS w, y AS c))))")).as("p"))
          .select(col("p.w"), col("p.c"))
          .groupBy(col("w"), col("c")).agg(count(lit(1)).as("nwc"))
      }.localCheckpoint() // vocab²-bounded; read 4× below
      val nw = cnt.groupBy("w").agg(sum("nwc").as("nw"))
      val nc = cnt.groupBy("c").agg(sum("nwc").as("nc"))
      val nn = cnt.agg(sum("nwc").as("n"))
      cnt.where(col("nwc") >= 5)
        .join(broadcast(nw), "w").join(broadcast(nc), "c")
        .crossJoin(broadcast(nn))
        .select(col("w"), col("c"), col("nwc"),
          // Numerator in DECIMAL(38,0) (oracle: HUGEINT): N ≈ 3× corpus
          // tokens, so N·max(nwc)·1e4 leaves Long range at large SF —
          // widen the intermediate on BOTH engines, quotient stays tiny.
          expr("cast((cast(n as decimal(38,0)) * nwc * 10000) div " +
            "(cast(nw as decimal(38,0)) * nc) as bigint)").as("ppmi_e4"))
        .where(col("ppmi_e4") > 10000)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("w").orderBy(col("ppmi_e4").desc, col("c"))))
        .where(col("rk") <= 8)
        .orderBy(col("w"), col("rk"))
    },

    // Unigram-LM (SentencePiece-family) tokenizer TRAIN — the second
    // mainstream subword family next to BPE: substring candidate vocab,
    // 2 hard-EM rounds (greedy-segment → weighted usage → prune to the
    // top-24 multi-char pieces; single chars are the never-pruned
    // coverage floor), grid-quantized likelihood p_e6 = cnt*1e6 div Σcnt
    // in DECIMAL/HUGEINT space. All control flow is integer/string-exact;
    // the oracle replays candidate generation and BOTH EM rounds by value.
    Q("text_unigram_train", unigramTrainSql(4, 40, 24, 2)) { (s, d) =>
      Corpus.unigramTrain(Tables.documents(s, d), maxPieceLen = 4,
          nCandidates = 40, keepPieces = 24, rounds = 2)
        .orderBy(col("piece"))
    },

    // Unigram-LM ENCODE — the serve half: trained vocab persisted
    // read-through (the bpe_merges discipline), greedy longest-match fold
    // once per word TYPE, broadcast-joined back to the corpus scan for
    // per-doc compression accounting. The oracle replays train + encode
    // end-to-end, so encode(train(corpus)) determinism is pinned across
    // engines by value.
    Q("text_unigram_encode", unigramEncodeSql(4, 40, 24, 2)) { (s, d) =>
      Corpus.unigramEncode(Tables.documents(s, d), maxPieceLen = 4,
          nCandidates = 40, keepPieces = 24, rounds = 2)
        .orderBy(col("doc_id"))
    }
  )

  /** The greedy longest-match segmentation fold in DuckDB — structurally
    * the SAME fold as [[Corpus]]'s Spark-side `aggregate` (string
    * accumulator "pos|p1 p2 …", longest piece wins, chars are the ELSE
    * floor); list_reduce's accumulator is element-typed, so the position
    * list is VARCHAR and the seed rides in via list_prepend. */
  private def unigramFoldSql(maxLen: Int): String = {
    val pos = "string_split(acc, '|')[1]::INT"
    val ps = "string_split(acc, '|')[2]"
    val whens = (maxLen to 2 by -1).map { l =>
      s"WHEN length(w) - $pos + 1 >= $l AND list_contains(v$l, substr(w, $pos, $l)) " +
        s"THEN ($pos + $l)::VARCHAR || '|' || $ps || ' ' || substr(w, $pos, $l)"
    }.mkString(" ")
    "list_reduce(list_prepend('1|', list_transform(range(1, length(w) + 1), " +
      "i -> i::VARCHAR)), " +
      s"(acc, x) -> CASE WHEN x::INT != $pos THEN acc ELSE CASE $whens " +
      s"ELSE ($pos + 1)::VARCHAR || '|' || $ps || ' ' || substr(w, $pos, 1) END END)"
  }

  /** One-row per-length piece lists (v2..v`maxLen`) from a vocab CTE —
    * the DuckDB side of Corpus.vocabLists. An empty length class yields
    * NULL; list_contains(NULL, x) is NULL which falls through the CASE
    * exactly like Spark's empty-array false. */
  private def unigramVlSql(name: String, src: String, maxLen: Int): String =
    s"$name AS (SELECT " + (2 to maxLen).map(l =>
      s"(SELECT list(piece ORDER BY piece) FROM $src WHERE length(piece) = $l) AS v$l")
      .mkString(", ") + ")"

  /** Shared train CTE chain through the final `model` table (piece, cnt). */
  private def unigramCoreSql(maxLen: Int, nCand: Int, keep: Int,
                             rounds: Int): String = {
    val segPieces =
      s"string_split(trim(string_split(${unigramFoldSql(maxLen)}, '|')[2]), ' ')"
    val roundsSql = (1 to rounds).map { t =>
      s"${unigramVlSql(s"vl${t - 1}", s"voc${t - 1}", maxLen)}, " +
        s"seg$t AS (SELECT freq, unnest($segPieces) AS piece FROM words, vl${t - 1}), " +
        s"u$t AS (SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM seg$t GROUP BY piece), " +
        s"mu$t AS (SELECT piece FROM u$t WHERE length(piece) >= 2 " +
        s"ORDER BY cnt DESC, piece LIMIT $keep), " +
        s"voc$t AS (SELECT piece FROM chars UNION ALL SELECT piece FROM mu$t)"
    }.mkString(", ")
    "words AS (SELECT w, COUNT(*)::BIGINT AS freq FROM " +
      "(SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents) GROUP BY w), " +
      "chars AS (SELECT DISTINCT unnest(string_split(w, '')) AS piece FROM words), " +
      "cand AS (SELECT piece FROM (SELECT piece, SUM(freq) AS wcnt FROM " +
      s"(SELECT freq, unnest(flatten(list_transform(range(2, ${maxLen + 1}), l -> " +
      "CASE WHEN length(w) >= l THEN list_transform(range(1, length(w) - l + 2), " +
      "i -> substr(w, CAST(i AS INT), CAST(l AS INT))) ELSE CAST([] AS VARCHAR[]) END))) AS piece " +
      s"FROM words) GROUP BY piece ORDER BY wcnt DESC, piece LIMIT $nCand)), " +
      "voc0 AS (SELECT piece FROM chars UNION ALL SELECT piece FROM cand), " +
      roundsSql + ", " +
      s"model AS (SELECT v.piece, COALESCE(u$rounds.cnt, 0)::BIGINT AS cnt " +
      s"FROM voc$rounds v LEFT JOIN u$rounds USING (piece))"
  }

  private def unigramTrainSql(maxLen: Int, nCand: Int, keep: Int,
                              rounds: Int): String =
    s"WITH ${unigramCoreSql(maxLen, nCand, keep, rounds)} " +
      "SELECT piece, cnt, CAST(cnt::HUGEINT * 1000000 // t AS BIGINT) AS p_e6 " +
      "FROM model, (SELECT SUM(cnt::HUGEINT) AS t FROM model) tot ORDER BY piece"

  private def unigramEncodeSql(maxLen: Int, nCand: Int, keep: Int,
                               rounds: Int): String = {
    val segPieces =
      s"string_split(trim(string_split(${unigramFoldSql(maxLen)}, '|')[2]), ' ')"
    s"WITH ${unigramCoreSql(maxLen, nCand, keep, rounds)}, " +
      s"${unigramVlSql("vlf", "model", maxLen)}, " +
      "wt AS (SELECT DISTINCT w FROM " +
      "(SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents)), " +
      s"tc AS (SELECT w, len($segPieces)::BIGINT AS n_pieces FROM wt, vlf), " +
      "dw AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w " +
      "FROM documents) " +
      "SELECT doc_id, COUNT(*)::BIGINT AS n_words, " +
      "CAST(SUM(length(w)) AS BIGINT) AS n_chars, " +
      "CAST(SUM(n_pieces) AS BIGINT) AS n_pieces, " +
      "ROUND(SUM(length(w)) / SUM(n_pieces), 4) AS compression " +
      "FROM dw JOIN tc USING (w) GROUP BY doc_id ORDER BY doc_id"
  }

  /** DuckDB replay of [[Corpus.bpeTrain]], `iters` rounds unrolled. The
    * merge rewrite is a list_reduce whose accumulator is the '/'-joined
    * output symbols (symbols are [a-z]+ so '/' cannot collide): when the
    * accumulator ends with '/a' and the next symbol is b, the tail symbol
    * is replaced by a||b — the same greedy left-to-right non-overlapping
    * fold the Spark array aggregate runs. */
  /** The shared training CTE chain (w0 plus p/m/w rounds) up to the
    * final merge tables m1..m`iters` — reused by the encode oracle. */
  private def bpeCoreSql(iters: Int): String = {
    val rounds = (1 to iters).map { t =>
      s"p$t AS (SELECT syms[i] AS a, syms[i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS n " +
        s"FROM w${t - 1}, unnest(range(1, len(syms))) u$t(i) " +
        "WHERE len(syms) >= 2 GROUP BY 1, 2), " +
        s"m$t AS (SELECT a, b, n FROM p$t ORDER BY n DESC, a, b LIMIT 1), " +
        s"w$t AS (SELECT string_split(substr(list_reduce(list_prepend('', syms), " +
        "(acc, x) -> CASE WHEN ends_with(acc, '/' || m.a) AND x = m.b " +
        "THEN left(acc, len(acc) - len(m.a) - 1) || '/' || m.a || m.b " +
        "ELSE acc || '/' || x END), 2), '/') AS syms, freq " +
        s"FROM w${t - 1}, m$t m)"
    }.mkString(", ")
    "w0 AS (SELECT string_split(w, '') AS syms, COUNT(*)::BIGINT AS freq " +
      "FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w " +
      "FROM documents) GROUP BY w), " + rounds
  }

  private def bpeTrainSql(iters: Int): String = {
    val out = (1 to iters).map(t =>
      s"SELECT CAST($t AS BIGINT) AS it, a, b, n FROM m$t").mkString(" UNION ALL ")
    s"WITH ${bpeCoreSql(iters)} SELECT it, a, b, n FROM ($out) ORDER BY it"
  }

  /** DuckDB replay of [[Corpus.bpeEncode]]: the training chain's merge
    * tables m1..m`iters` applied to each DOCUMENT's words with the same
    * string-accumulator fold, then the per-doc chars/tokens rollup. Each
    * round LEFT-joins its merge table (exactly one row on any corpus with
    * pairs left; empty when the pair vocabulary exhausts early) with the
    * merge columns coalesced to a non-letter sentinel, so an exhausted
    * round is a no-op on both engines instead of emptying the oracle's
    * document set through a bare cross join. */
  private[queries] def bpeDocCtes(iters: Int): String = {
    val docRounds = (1 to iters).map { t =>
      s"d$t AS (SELECT doc_id, w, string_split(substr(list_reduce(list_prepend('', syms), " +
        "(acc, x) -> CASE WHEN ends_with(acc, '/' || COALESCE(m.a, chr(1))) " +
        "AND x = COALESCE(m.b, chr(1)) " +
        "THEN left(acc, len(acc) - len(m.a) - 1) || '/' || m.a || m.b " +
        "ELSE acc || '/' || x END), 2), '/') AS syms " +
        s"FROM d${t - 1} LEFT JOIN m$t m ON TRUE)"
    }.mkString(", ")
    s"${bpeCoreSql(iters)}, " +
      "d0 AS (SELECT doc_id, w, string_split(w, '') AS syms " +
      "FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w " +
      "FROM documents)), " +
      s"$docRounds"
  }

  private def bpeEncodeSql(iters: Int): String =
    s"WITH ${bpeDocCtes(iters)} " +
      s"SELECT doc_id, COUNT(*)::BIGINT AS n_words, " +
      "CAST(SUM(len(w)) AS BIGINT) AS n_chars, " +
      "CAST(SUM(len(syms)) AS BIGINT) AS n_bpe_tokens, " +
      "ROUND(CAST(SUM(len(w)) AS DOUBLE) / SUM(len(syms)), 4) AS compression " +
      s"FROM d$iters GROUP BY doc_id ORDER BY doc_id"

  /** DuckDB replay of [[Corpus.bpeFertility]]: the encode chain's per-doc
    * accounting rolled up by the documents' language column. */
  private def bpeFertilitySql(iters: Int): String =
    s"WITH ${bpeDocCtes(iters)}, " +
      s"enc AS (SELECT doc_id, COUNT(*)::BIGINT AS n_words, " +
      "CAST(SUM(len(w)) AS BIGINT) AS n_chars, " +
      "CAST(SUM(len(syms)) AS BIGINT) AS n_bpe_tokens " +
      s"FROM d$iters GROUP BY doc_id) " +
      "SELECT d.lang, COUNT(*)::BIGINT AS n_docs, " +
      "CAST(SUM(e.n_words) AS BIGINT) AS n_words, " +
      "CAST(SUM(e.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens, " +
      "ROUND(CAST(SUM(e.n_chars) AS DOUBLE) / SUM(e.n_bpe_tokens), 4) AS chars_per_token, " +
      "ROUND(CAST(SUM(e.n_bpe_tokens) AS DOUBLE) / SUM(e.n_words), 4) AS tokens_per_word " +
      "FROM enc e JOIN documents d USING (doc_id) GROUP BY d.lang ORDER BY d.lang"
}
