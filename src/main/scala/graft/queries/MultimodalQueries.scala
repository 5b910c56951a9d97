package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal-column plumbing queries: binary payloads with typed metadata,
  * a REAL per-partition `javax.imageio` decode (PNG headers synthesized and
  * parsed on the executors — the JRE ships the codecs), the deterministic
  * raw branch for payloads no codec claims, and declarative frame sampling.
  * The oracle checks the decoded dimensions against the doc_id-derived
  * generation formula — the decoder must actually parse the IHDR header to
  * reproduce them.
  */
object MultimodalQueries {

  private val metaSql =
    "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
      "CAST(64 + octet_length(encode(text)) % 1024 AS BIGINT) AS width, " +
      "CAST(64 + (octet_length(encode(text)) * 31) % 1024 AS BIGINT) AS height, " +
      "sha256(text) AS sha FROM documents ORDER BY doc_id"

  val all: Seq[Q] = Seq(

    // REAL codec decode: synthesize one genuine PNG per document (dims a
    // deterministic function of doc_id), then recover width/height/format
    // by parsing the PNG container with javax.imageio in the typed
    // mapPartitions decode path. The oracle recomputes the dims from
    // doc_id alone — matching it requires an actual header parse. Both
    // synthesis and decode are map-side (no shuffle); a real corpus swaps
    // the synthesis for a binaryFile/parquet scan and nothing downstream
    // changes.
    Q("mm_decode_png",
      "SELECT doc_id, 'png' AS format, " +
        "CAST(4 + doc_id % 13 AS BIGINT) AS width, " +
        "CAST(3 + doc_id % 11 AS BIGINT) AS height, " +
        "CAST((4 + doc_id % 13) * (3 + doc_id % 11) AS BIGINT) AS n_pixels " +
        "FROM documents ORDER BY doc_id") { (s, d) =>
      Multimodal.decodeMeta(s, Multimodal.pngDocs(s, Tables.documents(s, d)))
        .toDF()
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          (col("width") * col("height")).as("n_pixels"))
        .orderBy(col("doc_id"))
    },

    // Raw branch of the same decoder (payloads no installed codec claims):
    // typed mapPartitions path emits the deterministic byte-derived
    // signature the oracle recomputes.
    Q("mm_decode_raw", metaSql) { (s, d) =>
      Multimodal.decodeMeta(s, Multimodal.binaryDocs(Tables.documents(s, d)))
        .toDF()
        .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
          col("sha"))
        .orderBy(col("doc_id"))
    },

    // Declarative binary-metadata extraction (same semantics, pure SQL
    // functions — the codegen'd fast path).
    Q("mm_binary_meta", metaSql) { (s, d) =>
      val b = Multimodal.binaryDocs(Tables.documents(s, d))
      b.select(
          col("doc_id"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          (lit(64) + octet_length(col("payload")) % 1024).cast("long").as("width"),
          (lit(64) + (octet_length(col("payload")).cast("long") * 31) % 1024)
            .cast("long").as("height"),
          sha2(col("payload"), 256).as("sha"))
        .orderBy(col("doc_id"))
    },

    // Feature-extraction stub: an 8-dim stride-bucket signature over the
    // payload bytes (integer sums — exact in any engine). Real audio/image
    // featurizers slot in at the same (binary → fixed-dim vector) boundary;
    // the Spark-side shape — codegen'd per-row array math, no shuffle — is
    // what carries to 100 TB. Payload bytes are ASCII text here, so both
    // engines read char codes.
    Q("mm_feature_extract",
      "WITH c AS (SELECT doc_id, list_transform(string_split(text, ''), ch -> ascii(ch)) AS codes, " +
        "length(text) AS n FROM documents WHERE length(text) >= 8) " +
        "SELECT doc_id, " +
        (0 until 8).map(b =>
          s"CAST(list_sum(list_transform(range(${b + 1}, n+1, 8), i -> codes[i])) AS BIGINT) AS f$b")
          .mkString(", ") +
        " FROM c ORDER BY doc_id") { (s, d) =>
      val c = Multimodal.binaryDocs(Tables.documents(s, d))
        .select(col("doc_id"), col("payload").cast("string").as("txt"))
        .where(length(col("txt")) >= 8)
        .select(col("doc_id"),
          expr("transform(split(txt, ''), ch -> ascii(ch))").as("codes"),
          length(col("txt")).as("n"))
      val feats = (0 until 8).map(b =>
        expr(s"aggregate(sequence(${b + 1}, n, 8), 0L, (acc, i) -> acc + element_at(codes, i))")
          .as(s"f$b"))
      c.select(col("doc_id") +: feats: _*).orderBy(col("doc_id"))
    },

    // Resize stub: stride-decimate each payload to ~64 samples (the
    // downsampling plumbing a real image/audio resize shares: per-row,
    // size-derived stride, deterministic output digest).
    Q("mm_resize_stub",
      "WITH c AS (SELECT doc_id, string_split(text, '') AS chars, length(text) AS n, " +
        "GREATEST(1, length(text) // 64) AS stride FROM documents WHERE length(text) > 0) " +
        "SELECT doc_id, CAST(n AS BIGINT) AS orig_len, CAST(stride AS BIGINT) AS stride, " +
        "CAST(length(array_to_string(list_transform(range(1, n+1, CAST(stride AS BIGINT)), " +
        "i -> chars[i]), '')) AS BIGINT) AS resized_len, " +
        "sha256(array_to_string(list_transform(range(1, n+1, CAST(stride AS BIGINT)), " +
        "i -> chars[i]), '')) AS sha FROM c ORDER BY doc_id") { (s, d) =>
      Multimodal.binaryDocs(Tables.documents(s, d))
        .select(col("doc_id"), col("payload").cast("string").as("txt"))
        // Empty payloads: sequence(1, 0) throws in Spark while DuckDB's
        // range(1, 1) is an empty list — exclude them identically on
        // both sides rather than diverge/crash.
        .where(length(col("txt")) > 0)
        .select(col("doc_id"), split(col("txt"), "").as("chars"),
          length(col("txt")).as("n"),
          greatest(lit(1), expr("length(txt) div 64")).as("stride"))
        .select(col("doc_id"), col("n").cast("long").as("orig_len"),
          col("stride").cast("long").as("stride"),
          expr("array_join(transform(sequence(1, n, stride), " +
            "i -> element_at(chars, CAST(i AS INT))), '')")
            .as("resized"))
        .select(col("doc_id"), col("orig_len"), col("stride"),
          length(col("resized")).cast("long").as("resized_len"),
          sha2(col("resized"), 256).as("sha"))
        .orderBy(col("doc_id"))
    },

    // Frame sampling: one row per 256-byte frame of each payload. The frame
    // generator is keyed to each payload's own length (no fixed cap — a
    // hard-coded range bound would silently truncate payloads ≥ 4 KiB).
    Q("mm_frame_sample",
      "SELECT doc_id, CAST(f AS BIGINT) AS frame_idx, CAST(f * 256 AS BIGINT) AS frame_off " +
        "FROM (SELECT doc_id, unnest(range(0, octet_length(encode(text)) // 256 + 1)) AS f " +
        "FROM documents) ORDER BY doc_id, frame_idx") {
      (s, d) =>
        Multimodal.frameSample(Multimodal.binaryDocs(Tables.documents(s, d)))
          .orderBy(col("doc_id"), col("frame_idx"))
    },

    // Image near-duplicate dedup: synthesize real PNGs with planted
    // near-dups (doc_id ≡ 1 mod 10 re-renders the previous doc's image
    // with a ≤3/765 gray perturbation on a pixel stripe), DECODE the
    // pixel data with javax.imageio, take a 64-bit integer aHash, band
    // 4×16 bits for candidates, verify by exact Hamming distance. The
    // oracle replays the whole derivation from the doc_id pixel formula —
    // matching it requires an actual full-pixel decode. Planted pairs
    // land at Hamming ≤ 3; the threshold is the conventional 10 (tiny
    // test images have few distinct pixels, so a handful of unrelated
    // pairs clear a 16-bit band and land at Hamming 7–10 — both engines
    // agree on them by construction).
    Q("mm_phash_dedup", PhashOracle.sql) { (s, d) =>
      val docs = Tables.documents(s, d)
      // The per-image aHash CATALOG persists read-through keyed by the
      // source fingerprint — the same media lifecycle as mm_video_dedup's
      // frame catalog: a corpus snapshot is decoded and featurized once
      // by a build job; banding + exact Hamming verify stay live. The
      // live full-pixel decode representative remains mm_scene_cuts
      // (every frame, every draw) plus this catalog's own build run.
      val catalog = graft.operators.IndexCache.cachedFrame(s, "image_hashes",
          "ahash64", graft.operators.Dedup.docFp(docs)) {
        Multimodal.decodeAHash(s, Multimodal.phashPngDocs(s, docs))
      }
      Multimodal.phashPairs(catalog, maxHamming = 10)
        .orderBy(col("dup_a"), col("dup_b"))
    },

    // SERVED image dedup: the historical corpus's banded perceptual
    // hashes persist as a read-through index artifact; the incoming
    // batch (doc_id ≡ 0 mod 5) decodes and probes it asymmetrically —
    // batch×history only — the image analog of dedup_lsh_served. The
    // planted copies (id ≡ 1 mod 10, source id−1 ≡ 0 mod 10) all cross
    // the batch/history split, so every planted pair must surface.
    Q("mm_phash_served", PhashOracle.servedSql) { (s, d) =>
      Multimodal.phashServed(s, Tables.documents(s, d), maxHamming = 10)
        .orderBy(col("new_id"), col("dup_of"))
    },

    // Temporal scene-cut detection: per doc, a REAL multi-frame PNG
    // "video" with one planted hard cut at frame nf/2 (scene re-seeds
    // every pixel) and tiny intra-scene frame jitter; the engine decodes
    // every frame, aHashes it, and thresholds consecutive-frame Hamming
    // distance in one doc-keyed window pass. The oracle replays the
    // whole derivation from the (doc_id, frame, x, y) pixel formula —
    // matching requires real per-frame decodes.
    Q("mm_scene_cuts", PhashOracle.sceneCutSql) { (s, d) =>
      Multimodal.sceneCuts(s,
          Multimodal.videoFrameDocs(s, Tables.documents(s, d)),
          threshold = 10)
        .orderBy(col("doc_id"), col("frame_idx"))
    },

    // VIDEO near-duplicate dedup: planted copy videos (doc_id ≡ 1 mod 10
    // re-renders the previous doc's frames with one extra LSB dropped on
    // a pixel stripe), every frame REALLY decoded and aHashed, candidates
    // from the ANCHOR frame's 16-bit band buckets, then an exact
    // verify over ALL aligned frames — frame counts must match and the
    // WORST frame distance must clear the threshold (max is an AND over
    // frames: one mismatched scene kills the pair, which is what
    // separates video dedup from per-image dedup). Oracle replays the
    // full derivation from the (doc, frame, x, y) pixel formula.
    Q("mm_video_dedup", PhashOracle.videoDupSql) { (s, d) =>
      val docs = Tables.documents(s, d)
      // The per-frame hash CATALOG (3 longs/frame) persists read-through
      // keyed by the source fingerprint — the production media lifecycle:
      // a corpus's frames are decoded and featurized once per snapshot by
      // a build job, and every dedup / retrieval consumer reads the
      // catalog. The banding + full aligned-frame verify stays live, and
      // the decode cost keeps a live representative in mm_scene_cuts
      // (plus this query's own build run).
      val catalog = graft.operators.IndexCache.cachedFrame(s, "video_hashes",
          "dup_frames", graft.operators.Dedup.docFp(docs)) {
        Multimodal.frameHashes(s, Multimodal.videoDupFrameDocs(s, docs))
      }
      // stage=false: the catalog is an artifact parquet — per-reference
      // 1-task columnar re-scans beat a per-run 32-partition checkpoint.
      Multimodal.videoDedupPairs(catalog, maxHamming = 6, stage = false)
        .orderBy(col("dup_a"), col("dup_b"))
    },

    // AUDIO near-duplicate dedup — the third modality's dedup next to
    // text and image/video: planted copy clips (doc_id ≡ 1 mod 10
    // re-renders the previous doc's PCM with every 11th sample's LSB
    // flipped), each payload byte-traversed into a 64-bit fingerprint of
    // REQUANTIZATION-INVARIANT window digests (64 sub-windows, samples
    // >> 2, one md5 parity bit each — Hamming counts genuinely differing
    // windows; copies land at 0, unrelated clips near 32), then the same
    // 4×16-bit band blocking + exact Hamming verify as image dedup.
    // Oracle replays the fingerprint from the sample formula; matching
    // requires really reading the bytes.
    Q("mm_audio_dedup", PhashOracle.audioDupSql) { (s, d) =>
      val docs = Tables.documents(s, d)
      // Same catalog lifecycle as the image/video hashes: the 64-bit clip
      // fingerprints persist read-through per corpus snapshot; the live
      // byte-traversal representative remains mm_audio_energy (every
      // sample, every draw) plus this catalog's own build run.
      val catalog = graft.operators.IndexCache.cachedFrame(s, "audio_fps",
          "win64", graft.operators.Dedup.docFp(docs)) {
        Multimodal.audioFingerprints(s, Multimodal.audioDupClipDocs(s, docs))
      }
      Multimodal.phashPairs(catalog, maxHamming = 6)
        .orderBy(col("dup_a"), col("dup_b"))
    },

    // Windowed audio energy: deterministic unsigned-8-bit PCM clips
    // (every 4th 128-sample window a planted near-silence), read back
    // byte-by-byte and reduced to per-window Σ|s−128| + a silence count —
    // all integer, map-side over the binary column, no shuffle. The
    // oracle replays the sample formula; the engine must really traverse
    // the payload bytes it synthesized.
    Q("mm_audio_energy",
      "WITH cl AS (SELECT doc_id, 512 + (doc_id % 7) * 128 AS n FROM documents), " +
        "sm AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM cl), " +
        "v AS (SELECT doc_id, n, i // 128 AS wdw, " +
        "CASE WHEN (i // 128) % 4 = 3 THEN 128 + ((doc_id + i) % 7 - 3) " +
        "ELSE (doc_id * 2654435761 + i * 104729) & 255 END AS b FROM sm), " +
        "wv AS (SELECT doc_id, n, wdw, CAST(SUM(ABS(b - 128)) AS BIGINT) AS wsum " +
        "FROM v GROUP BY 1, 2, 3) " +
        "SELECT doc_id, n AS n_samples, COUNT(*)::BIGINT AS n_windows, " +
        "CAST(SUM(CASE WHEN wsum < 2048 THEN 1 ELSE 0 END) AS BIGINT) AS n_silent, " +
        "CAST(SUM(wsum) AS BIGINT) AS total_abs " +
        "FROM wv GROUP BY 1, 2 ORDER BY doc_id") { (s, d) =>
      Multimodal.audioEnergy(s,
          Multimodal.audioClipDocs(s, Tables.documents(s, d)))
        .orderBy(col("doc_id"))
    }
  )
}

/** DuckDB replay of the perceptual-hash dedup (see
  * [[graft.multimodal.Multimodal.aHash64]]): regenerate each sampled
  * pixel from the doc_id formula (source id + stripe perturbation for the
  * planted copies), gray = r+g+b, bit k = 64·gray > Σgray, 16-bit bands
  * by integer shift-sum, candidates from band equality, Hamming as a
  * bit-mismatch count join (no 64-bit hash is materialized — BIGINT can't
  * hold bit 63 via 1<<63 in DuckDB, and the bit table needs none). */
private object PhashOracle {
  /** CTE chain through per-doc `bits` and 16-bit `bands` — shared by the
    * all-pairs and served (batch-probes-history) variants. */
  val coreSql: String =
    "ids AS (SELECT doc_id, " +
      "CASE WHEN doc_id % 10 = 1 THEN doc_id - 1 ELSE doc_id END AS src, " +
      "doc_id % 10 = 1 AS pert FROM documents), " +
    "dim AS (SELECT doc_id, src, pert, 4 + src % 13 AS w, 3 + src % 11 AS h " +
      "FROM ids), " +
    "samp AS (SELECT doc_id, src, pert, (j * 8 + i) AS k, " +
      "(((2 * i + 1) * w) // 16) AS x, (((2 * j + 1) * h) // 16) AS y " +
      "FROM dim CROSS JOIN range(0, 8) ri(i) CROSS JOIN range(0, 8) rj(j)), " +
    "px AS (SELECT doc_id, k, " +
      "CASE WHEN pert AND (x + y) % 7 = 0 " +
      "THEN ((src * 2654435761 + x * 7919 + y * 104729) & 16777215) & 16711422 " +
      "ELSE (src * 2654435761 + x * 7919 + y * 104729) & 16777215 END AS v " +
      "FROM samp), " +
    "gr AS (SELECT doc_id, k, (v >> 16) + ((v >> 8) & 255) + (v & 255) AS g " +
      "FROM px), " +
    "bits AS (SELECT doc_id, k, CASE WHEN 64 * g > " +
      "SUM(g) OVER (PARTITION BY doc_id) THEN 1 ELSE 0 END AS bit FROM gr), " +
    "bands AS (SELECT doc_id, k // 16 AS band_idx, " +
      "CAST(SUM(bit << (k % 16)) AS BIGINT) AS band FROM bits GROUP BY 1, 2)"

  val sql: String =
    s"WITH $coreSql, " +
    "cand AS (SELECT DISTINCT a.doc_id AS dup_a, b.doc_id AS dup_b " +
      "FROM bands a JOIN bands b ON a.band_idx = b.band_idx " +
      "AND a.band = b.band AND a.doc_id < b.doc_id), " +
    "ham AS (SELECT dup_a, dup_b, " +
      "CAST(SUM(CASE WHEN ba.bit <> bb.bit THEN 1 ELSE 0 END) AS BIGINT) " +
      "AS hamming FROM cand " +
      "JOIN bits ba ON ba.doc_id = dup_a " +
      "JOIN bits bb ON bb.doc_id = dup_b AND bb.k = ba.k GROUP BY 1, 2) " +
    "SELECT dup_a, dup_b, hamming FROM ham WHERE hamming <= 10 " +
    "ORDER BY dup_a, dup_b"

  /** Served variant: batch (doc_id ≡ 0 mod 5) probes history only. */
  val servedSql: String =
    s"WITH $coreSql, " +
    "cand AS (SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS dup_of " +
      "FROM bands a JOIN bands b ON a.band_idx = b.band_idx " +
      "AND a.band = b.band AND a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0), " +
    "ham AS (SELECT new_id, dup_of, " +
      "CAST(SUM(CASE WHEN ba.bit <> bb.bit THEN 1 ELSE 0 END) AS BIGINT) " +
      "AS hamming FROM cand " +
      "JOIN bits ba ON ba.doc_id = new_id " +
      "JOIN bits bb ON bb.doc_id = dup_of AND bb.k = ba.k GROUP BY 1, 2) " +
    "SELECT new_id, dup_of, hamming FROM ham WHERE hamming <= 10 " +
    "ORDER BY new_id, dup_of"

  /** Video near-dup replay (see
    * [[graft.multimodal.Multimodal.videoDupFrameDocs]]): per (doc, frame)
    * sampled pixels regenerate from the SOURCE id's formula (scene seed
    * src·31 + scene, intra-scene jitter at (x+y+f)%7) with the copy's
    * extra (x+y)%5 stripe mask; per-frame threshold bits → 16-bit bands
    * keyed by frame → candidate pairs from any aligned band match →
    * per-frame bit-mismatch counts → per-pair frame count + max. */
  val videoDupSql: String =
    "WITH fr AS (SELECT doc_id, " +
      "CASE WHEN doc_id % 10 = 1 THEN doc_id - 1 ELSE doc_id END AS src, " +
      "doc_id % 10 = 1 AS pert FROM documents), " +
    "dm AS (SELECT doc_id, src, pert, 4 + src % 5 AS nf, " +
      "4 + src % 13 AS w, 3 + src % 11 AS h FROM fr), " +
    "fx AS (SELECT doc_id, src, pert, nf, w, h, unnest(range(0, nf)) AS f FROM dm), " +
    "samp AS (SELECT doc_id, src, pert, nf, f, (j * 8 + i) AS k, " +
      "(((2 * i + 1) * w) // 16) AS x, (((2 * j + 1) * h) // 16) AS y " +
      "FROM fx CROSS JOIN range(0, 8) ri(i) CROSS JOIN range(0, 8) rj(j)), " +
    "px0 AS (SELECT doc_id, pert, nf, f, k, x, y, " +
      "((src * 31 + CASE WHEN f < nf // 2 THEN 0 ELSE 1 END) " +
      "* 2654435761 + x * 7919 + y * 104729) & 16777215 AS b0 FROM samp), " +
    "px1 AS (SELECT doc_id, pert, nf, f, k, x, y, " +
      "CASE WHEN (x + y + f) % 7 = 0 THEN b0 & 16711422 ELSE b0 END AS v0 FROM px0), " +
    "px AS (SELECT doc_id, nf, f, k, " +
      "CASE WHEN pert AND (x + y) % 5 = 0 THEN v0 & 16711422 ELSE v0 END AS v FROM px1), " +
    "gr AS (SELECT doc_id, nf, f, k, (v >> 16) + ((v >> 8) & 255) + (v & 255) AS g " +
      "FROM px), " +
    "bits AS (SELECT doc_id, nf, f, k, CASE WHEN 64 * g > " +
      "SUM(g) OVER (PARTITION BY doc_id, f) THEN 1 ELSE 0 END AS bit FROM gr), " +
    "bands AS (SELECT doc_id, nf, k // 16 AS band_idx, " +
      "CAST(SUM(bit << (k % 16)) AS BIGINT) AS band FROM bits " +
      "WHERE f = 0 GROUP BY 1, 2, 3), " +
    "cand AS (SELECT DISTINCT a.doc_id AS dup_a, b.doc_id AS dup_b " +
      "FROM bands a JOIN bands b ON a.nf = b.nf AND a.band_idx = b.band_idx " +
      "AND a.band = b.band AND a.doc_id < b.doc_id), " +
    "fham AS (SELECT c.dup_a, c.dup_b, ba.f, " +
      "CAST(SUM(CASE WHEN ba.bit <> bb.bit THEN 1 ELSE 0 END) AS BIGINT) AS hamming " +
      "FROM cand c " +
      "JOIN bits ba ON ba.doc_id = c.dup_a " +
      "JOIN bits bb ON bb.doc_id = c.dup_b AND bb.f = ba.f AND bb.k = ba.k " +
      "GROUP BY 1, 2, 3), " +
    "pv AS (SELECT dup_a, dup_b, COUNT(*)::BIGINT AS n_frames, " +
      "MAX(hamming) AS max_hamming FROM fham GROUP BY 1, 2), " +
    "nfs AS (SELECT doc_id, nf FROM dm) " +
    "SELECT p.dup_a, p.dup_b, p.n_frames, p.max_hamming FROM pv p " +
      "JOIN nfs na ON na.doc_id = p.dup_a JOIN nfs nb ON nb.doc_id = p.dup_b " +
      "WHERE na.nf = nb.nf AND p.n_frames = na.nf AND p.max_hamming <= 6 " +
      "ORDER BY dup_a, dup_b"

  /** Audio near-dup replay (see
    * [[graft.multimodal.Multimodal.audioFingerprints]]): samples
    * regenerate from the SOURCE id's PCM formula with the copy's
    * every-11th-sample LSB flip, sub-windows requantized to 6 bits and
    * digest-reduced to one md5 parity bit each → 16-bit bands →
    * candidates → exact bit-mismatch Hamming. */
  val audioDupSql: String =
    "WITH cl AS (SELECT doc_id, " +
      "CASE WHEN doc_id % 10 = 1 THEN doc_id - 1 ELSE doc_id END AS src, " +
      "doc_id % 10 = 1 AS pert FROM documents), " +
    "dn AS (SELECT doc_id, src, pert, 512 + (src % 7) * 128 AS n FROM cl), " +
    "sm AS (SELECT doc_id, src, pert, n, unnest(range(0, n)) AS i FROM dn), " +
    "v0 AS (SELECT doc_id, pert, n, i, " +
      "CASE WHEN (i // 128) % 4 = 3 THEN 128 + ((src + i) % 7 - 3) " +
      "ELSE (src * 2654435761 + i * 104729) & 255 END AS b FROM sm), " +
    "v AS (SELECT doc_id, n, i, " +
      "CASE WHEN pert AND i % 11 = 0 THEN xor(b, 1) ELSE b END AS b FROM v0), " +
    "sw AS (SELECT doc_id, i // (n // 64) AS k, " +
      "string_agg((b // 4)::VARCHAR, ',' ORDER BY i) AS ws FROM v GROUP BY 1, 2), " +
    "bits AS (SELECT doc_id, k, " +
      "('0x' || substr(md5(ws), 1, 1))::BIGINT % 2 AS bit FROM sw), " +
    "bands AS (SELECT doc_id, k // 16 AS band_idx, " +
      "CAST(SUM(bit << (k % 16)) AS BIGINT) AS band FROM bits GROUP BY 1, 2), " +
    "cand AS (SELECT DISTINCT a.doc_id AS dup_a, b.doc_id AS dup_b " +
      "FROM bands a JOIN bands b ON a.band_idx = b.band_idx " +
      "AND a.band = b.band AND a.doc_id < b.doc_id), " +
    "ham AS (SELECT dup_a, dup_b, " +
      "CAST(SUM(CASE WHEN ba.bit <> bb.bit THEN 1 ELSE 0 END) AS BIGINT) " +
      "AS hamming FROM cand " +
      "JOIN bits ba ON ba.doc_id = dup_a " +
      "JOIN bits bb ON bb.doc_id = dup_b AND bb.k = ba.k GROUP BY 1, 2) " +
    "SELECT dup_a, dup_b, hamming FROM ham WHERE hamming <= 6 " +
      "ORDER BY dup_a, dup_b"

  /** Scene-cut replay (see [[graft.multimodal.Multimodal.videoFrameDocs]]):
    * per (doc, frame) the sampled 8×8 grid regenerates from the pixel
    * formula — scene seed doc_id·31 + (f < nf/2 ? 0 : 1), intra-scene
    * jitter at (x+y+f)%7 — then per-frame threshold bits and a
    * consecutive-frame bit-mismatch count, exactly the engine's
    * decode → aHash → lag-Hamming pass. */
  val sceneCutSql: String =
    "WITH fr AS (SELECT doc_id, 4 + doc_id % 5 AS nf, " +
      "4 + doc_id % 13 AS w, 3 + doc_id % 11 AS h FROM documents), " +
    "fx AS (SELECT doc_id, nf, w, h, unnest(range(0, nf)) AS f FROM fr), " +
    "samp AS (SELECT doc_id, f, nf, (j * 8 + i) AS k, " +
      "(((2 * i + 1) * w) // 16) AS x, (((2 * j + 1) * h) // 16) AS y " +
      "FROM fx CROSS JOIN range(0, 8) ri(i) CROSS JOIN range(0, 8) rj(j)), " +
    "px AS (SELECT doc_id, f, k, " +
      "CASE WHEN (x + y + f) % 7 = 0 " +
      "THEN (((doc_id * 31 + CASE WHEN f < nf // 2 THEN 0 ELSE 1 END) " +
      "* 2654435761 + x * 7919 + y * 104729) & 16777215) & 16711422 " +
      "ELSE ((doc_id * 31 + CASE WHEN f < nf // 2 THEN 0 ELSE 1 END) " +
      "* 2654435761 + x * 7919 + y * 104729) & 16777215 END AS v " +
      "FROM samp), " +
    "gr AS (SELECT doc_id, f, k, (v >> 16) + ((v >> 8) & 255) + (v & 255) AS g " +
      "FROM px), " +
    "bits AS (SELECT doc_id, f, k, CASE WHEN 64 * g > " +
      "SUM(g) OVER (PARTITION BY doc_id, f) THEN 1 ELSE 0 END AS bit FROM gr), " +
    "ham AS (SELECT a.doc_id, a.f AS frame_idx, " +
      "CAST(SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS BIGINT) " +
      "AS hamming FROM bits a JOIN bits b ON b.doc_id = a.doc_id " +
      "AND b.f = a.f - 1 AND b.k = a.k GROUP BY 1, 2) " +
    "SELECT doc_id, frame_idx, hamming, hamming > 10 AS is_cut FROM ham " +
    "ORDER BY doc_id, frame_idx"
}
