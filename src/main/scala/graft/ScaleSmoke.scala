package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale smoke: synthesize a `SPARK_GRAFT_SCALE_MULT`× corpus (default
  * 10×; 100× gives the second decade) from sf0.1 and measure how the
  * dedup / similarity / corpus heavy set scales, emitting per-query
  * scaling exponents (PERF.md "Scale smoke" section).
  *
  * Corpus synthesis (union + id offset, replica i of `mult`):
  *  - documents: replica i applies a deterministic CHARACTER-SUBSTITUTION
  *    CIPHER (a seeded permutation of [a-zA-Z0-9] via `translate`). A
  *    bijection on characters is a bijection on tokens AND on char
  *    k-shingles, so the intra-replica near-dup structure is preserved
  *    EXACTLY (same Jaccard values, same lengths, same bands) while
  *    cross-replica tokens and shingles are disjoint — pair density
  *    scales linearly with the corpus, the realistic regime. A naive
  *    copy would make every doc a mult-way exact dup and blow the
  *    candidate space quadratically, measuring an artifact. (The earlier
  *    per-token `_i` SUFFIX scheme had exactly that artifact at the
  *    CHAR-shingle level: shingles inside long tokens were identical
  *    across replicas, so every base doc verified as a near-dup of its
  *    same-suffix-length replicas — quadratic OUTPUT, discovered when
  *    the 100× char-jaccard leg wedged on a multi-billion-pair verify.)
  *  - embeddings: replica i multiplies the vector by a deterministic
  *    per-replica ±1 sign pattern — norms and intra-replica dot products
  *    are preserved BIT-FOR-BIT (±1 multiplication is exact), while
  *    cross-replica cosines decorrelate under the independent sign
  *    patterns. (An earlier rotate-by-i transform capped mult at the
  *    vector dimensionality and collided past it; sign patterns support
  *    any mult.)
  *  - orders/lineitem (only when `basket` is in SPARK_GRAFT_SCALE_TABLES):
  *    order keys offset per replica, customer/part keys SHARED — at scale
  *    the fact table grows, the dims don't. Dim tables copy verbatim.
  *  - id offset 100,000,000 per replica (preserves doc_id % 20, the
  *    contamination bench split).
  *
  * Exponent = ln(t_big / t_base) / ln(mult); ~1.0 = linear, the banded /
  * bucketed / broadcast claims hold. Each timing is the min of `runs`
  * (noise floor); the base scale runs first as JIT/codegen warmup.
  *
  * dedup_semantic is measured in its documented operating regime — k
  * grows with n (SemDeDup clusters of roughly constant size), so the
  * big scale runs k×mult; at FIXED k its pairwise stage is quadratic in
  * cluster size by construction.
  */
object ScaleSmoke {

  private val Mult = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULT", "10").toInt
  private val Offset = 100000000L

  /** Which table groups to synthesize: docs,emb always; `events` feeds the
    * streaming/events rows, `basket` feeds orders/lineitem(+dims) rows. */
  private val SynthTables = sys.env
    .getOrElse("SPARK_GRAFT_SCALE_TABLES", "docs,emb,events,basket")
    .split(",").map(_.trim).toSet

  private val CipherAlphabet =
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"

  private def synthesize(spark: SparkSession, baseDir: String, outDir: String): Unit = {
    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
    (0 until Mult).map { i =>
      val txt =
        if (i == 0) col("text")
        else {
          val rnd = new scala.util.Random(0xD0C5 + i)
          val perm = rnd.shuffle(CipherAlphabet.toList).mkString
          translate(col("text"), CipherAlphabet, perm)
        }
      docs.select((col("doc_id") + lit(i * Offset)).as("doc_id"), txt.as("text"),
        col("lang"), col("source"), length(txt).cast("long").as("n_chars"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val emb = spark.read.parquet(s"$baseDir/embeddings.parquet")
    val embDim = emb.select(size(col("embedding")).as("d")).first().getInt(0)
    val embType = emb.schema("embedding").dataType
    (0 until Mult).map { i =>
      val v =
        if (i == 0) col("embedding")
        else {
          // Deterministic per-replica sign pattern (seeded PRNG): exact
          // arithmetic, any mult.
          val rnd = new scala.util.Random(0xC0FFEE + i)
          val signs = array(Seq.fill(embDim)(
            lit(if (rnd.nextBoolean()) 1.0 else -1.0)): _*)
          zip_with(col("embedding"), signs, (a, b) => a * b).cast(embType)
        }
      emb.select((col("vec_id") + lit(i * Offset)).as("vec_id"),
        v.as("embedding"), col("label"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    // Events ×mult for the streaming-throughput smoke: wallet ids offset
    // per replica (mult× keys, each with its replica's intact per-wallet
    // history), seqs offset to stay unique. Load through Tables.events so
    // whatever physical ts type the driver testdata ships (nanos LONG,
    // micros NTZ, micros LTZ — it has changed between regenerations) is
    // normalized to TimestampType; the synth dir then round-trips through
    // the loader's TimestampType branch.
    if (SynthTables("events")) {
      val ev = sources.Tables.events(spark, baseDir)
      (0 until Mult).map { i =>
        ev.select((col("event_id") + lit(i * Offset)).as("event_id"), col("ts"),
          (col("user_id") + lit(i * Offset)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    }

    // Fact-table growth for the basket/graph queries: order keys offset
    // per replica, part/customer keys SHARED (the dims stay dims — at
    // scale the catalog does not grow with the fact table). Dim tables
    // copy verbatim so loaders and broadcast joins work against outDir.
    if (SynthTables("basket")) {
      val ord = spark.read.parquet(s"$baseDir/orders.parquet")
      (0 until Mult).map { i =>
        ord.withColumn("o_orderkey", col("o_orderkey") + lit(i * Offset))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
      val li = spark.read.parquet(s"$baseDir/lineitem.parquet")
      (0 until Mult).map { i =>
        li.withColumn("l_orderkey", col("l_orderkey") + lit(i * Offset))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
      Seq("part", "customer", "supplier", "nation", "region").foreach { t =>
        spark.read.parquet(s"$baseDir/$t.parquet")
          .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_SCALE_RUNS", "2").toInt
    // Shuffle partitions sized to the DATA, not the cores — exactly the
    // knob a production deployment sets per table volume: at 100× the
    // per-partition hash-join build sides and sort runs must shrink with
    // more partitions or they exceed executor memory (AQE re-coalesces
    // the small stages either way).
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bigDir = s"${System.getProperty("java.io.tmpdir")}/graft_scale_x$Mult"
    synthesize(spark, baseDir, bigDir)

    // The heavy set: every query here reads only documents/embeddings.
    val names = Seq(
      "dedup_exact", "dedup_chunks", "dedup_minhash_lsh", "dedup_minhash_estimate",
      "dedup_ngram_jaccard", "dedup_char_jaccard", "dedup_simhash",
      "dedup_components", "dedup_embedding_cosine",
      "sim_topk_bruteforce", "sim_lsh_topk", "sim_lsh_multiprobe",
      "sim_ivf_topk", "sim_pq_topk", "sim_pq_rerank",
      "contamination_ngram", "tfidf_top_terms",
      // Sequence packing: the round-7 two-pass prefix sum must show a
      // bounded window partition — near-linear at 10× docs.
      "pipeline_pack_sequences", "pipeline_pack_spans",
      // Round-7 second batch: positional-span explode (linear rows),
      // canonical selection (LSH→components→bounded quality window),
      // recall eval (brute force dominates — linear in corpus at fixed
      // query count), CDC merge (two pre-aggregated branches over 10×
      // events → one full-outer join on 10× keys).
      "dedup_duplicate_spans", "dedup_canonical", "sim_recall_eval",
      "q_merge_upsert",
      // Round-8 batch: banded-Levenshtein dedup (band² candidates — the
      // exponent documents the blocking's real behavior), BM25 + span
      // corruption + quality buckets (narrow scans / broadcast scalars —
      // expected ~linear), sessionization + time-weighted avg (one keyed
      // shuffle each over 10× events with 10× keys).
      "dedup_edit_distance", "text_bm25", "pipeline_span_corruption",
      "pipeline_quality_buckets", "q_sessionize", "q_time_weighted_avg",
      // Corpus-wide kNN graph (bucket self-join: in-bucket pair cost at
      // FIXED bits=4 is quadratic by construction — production grows bits
      // with the corpus via lshBitsFor; the exponent documents the fixed-
      // bits behavior). q_skyline reads customer/orders, which this
      // documents/embeddings/events synth does not produce.
      "sim_knn_graph", "q_event_sequence_match", "pipeline_interleave",
      // Round-8 fifth batch (events-based; q_rfm_segments and
      // q_correlation_matrix read orders/lineitem, which this synth does
      // not produce): attribution = one user_id-shuffled window pass over
      // 10× events with 10× users; MAD anomaly + Cramér's V = per-group
      // aggregates broadcast onto narrow scans; IVM refresh = two
      // pre-aggregated branches → full-outer merge on 10× keys.
      "q_attribution", "q_anomaly_mad", "q_cramers_v", "q_ivm_refresh",
      // Welch's t-test: two per-type aggregates over 10× events — the
      // same broadcast-stats shape as q_anomaly_mad; expected ~linear.
      "q_ab_ttest",
      // SQ/prefix rerank: brute-force over compressed/truncated codes
      // (linear in corpus at fixed query count) + shortlist-bounded exact
      // rerank — expected ~linear, like sim_topk_bruteforce.
      "sim_sq_rerank", "sim_prefix_rerank",
      // IVF-PQ composite (round 9): both models broadcast, encode/assign
      // map-side, ADC restricted to probed cells — expected ~linear in
      // the corpus (training passes dominate at fixed cells/codes).
      "sim_ivfpq_rerank", "sim_ivfpq_residual",
      // Custom whole-operator fold (round 9): ONE wallet-keyed exchange +
      // per-partition sort, then an O(1)-state streaming fold — expected
      // ~linear over 10× events with 10× wallets.
      "o4_fold_exec",
      // Round-9 trained-model + retrieval batch (documents-only): BPE
      // rounds touch the VOCAB after one corpus count (vocab grows
      // sub-linearly); LR GD = 3 map-side scans; sparse top-k joins
      // postings against a broadcast 10-doc query side; KL drift = one
      // token-keyed shuffle — all expected ~linear or flatter.
      "text_bpe_train", "pipeline_quality_lr", "sim_sparse_topk",
      "corpus_kl_drift",
      // Containment rides the same banded-candidate machinery as
      // dedup_minhash_lsh (pair density linear under the dissimilar-
      // replica synth); gap-fill is one daily aggregate + a types×days
      // spine — both expected ~linear.
      "dedup_containment", "q_gapfill_ma",
      // Late round-9 events-based staples: one (type, day) or bucket
      // aggregate each + bounded windows — expected ~flat.
      // (q_label_propagation reads lineitem, which this synth does not
      // produce; stream_topk is covered by the streaming-throughput row.)
      "q_rolling_median", "q_period_over_period", "q_value_histogram",
      // Late round-8 additions: changepoint + transitions are one keyed
      // shuffle each over 10× events; the dedup-rate report is one
      // (source, hash) aggregation over 10× documents.
      "q_changepoint", "q_event_transitions", "dedup_rate_by_source",
      // Basket-table queries (need `basket` in SPARK_GRAFT_SCALE_TABLES):
      // one broadcast dim join + one basket-keyed shuffle with in-row
      // Apriori pair expansion — fact grows, dims don't, so ~linear.
      "q_market_basket")

    def semanticAt(dir: String, k: Int): DataFrame =
      operators.Dedup.semanticDedup(sources.Tables.embeddings(spark, dir),
        k = k, threshold = 0.3)

    def time(fn: () => DataFrame): Double =
      (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn().count()
        (System.nanoTime() - t0) / 1e9
      }.min

    // Each row is (name, thunk) so SPARK_GRAFT_SMOKE_ONLY=a,b can
    // re-measure a subset without paying for the full sweep (the 10x
    // synthesis is cached on disk either way).
    val measured: Seq[(String, () => (Double, Double))] = names.map { n =>
      n -> { () =>
        val fn = SparkEntry.queries(n)
        (time(() => fn(spark, baseDir)), time(() => fn(spark, bigDir)))
      }
    }

    // Streaming rows: mult× deposits AND mult× state keys (wallets /
    // users / sessions). The feed parquet is rebuilt once per dir by the
    // harness; materialized outputs are dropped per run so every sample
    // measures the topology, not the serve path. Each row also prints its
    // per-run state-store bytes at both scales (delta of the workspace
    // `state/` subtrees) — the witness that state scales with keys.
    def streamRow(name: String): (String, () => (Double, Double)) =
      name -> { () =>
        val fn = SparkEntry.queries(name)
        def fresh(dir: String): DataFrame = {
          queries.StreamQueries.invalidateMaterialized()
          fn(spark, dir)
        }
        queries.StreamQueries.resetStateMetrics()
        val tBase = time(() => fresh(baseDir))
        val (rBase, bBase) = queries.StreamQueries.stateMetrics
        queries.StreamQueries.resetStateMetrics()
        val tBig = time(() => fresh(bigDir))
        val (rBig, bBig) = queries.StreamQueries.stateMetrics
        println(s"""{"query":"$name","state_rows_base":${rBase / runs},""" +
          s""""state_bytes_base":${bBase / runs},""" +
          s""""state_rows_x$Mult":${rBig / runs},""" +
          s""""state_bytes_x$Mult":${bBig / runs}}""")
        (tBase, tBig)
      }
    val withExtra = measured :+ ("dedup_semantic_growk" -> { () =>
      (time(() => semanticAt(baseDir, 8)), time(() => semanticAt(bigDir, 8 * Mult)))
    }) :+ streamRow("stream_check_tuned") :+
      streamRow("stream_check_chunked") :+ // many-micro-batch shape
      streamRow("stream_join") :+ streamRow("stream_session_agg")

    val only = sys.env.get("SPARK_GRAFT_SMOKE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // Print each row AS IT COMPLETES (stdout + flush): a multi-hour 100×
    // leg that dies on query N must not take queries 1..N−1's numbers
    // with it.
    withExtra
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (n, thunk) =>
        val (tBase, tBig) = thunk()
        val exp = math.log(tBig / tBase) / math.log(Mult.toDouble)
        println(
          f"""{"query":"$n","t_base_s":$tBase%.3f,"t_x${Mult}_s":$tBig%.3f,"exponent":$exp%.3f}""")
        System.out.flush()
      }
    spark.stop()
  }
}
