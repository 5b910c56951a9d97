package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal-column plumbing queries: binary payloads with typed metadata,
  * a per-partition decode STUB (deterministic fake — the container has no
  * codecs), and declarative frame sampling. The decode stub's fake metadata
  * is pure arithmetic over the payload bytes, so even the mapPartitions path
  * is DuckDB-oracle-checkable.
  */
object MultimodalQueries {

  private val metaSql =
    "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
      "CAST(64 + octet_length(encode(text)) % 1024 AS BIGINT) AS width, " +
      "CAST(64 + (octet_length(encode(text)) * 31) % 1024 AS BIGINT) AS height, " +
      "sha256(text) AS sha FROM documents ORDER BY doc_id"

  val all: Seq[Q] = Seq(

    // Typed mapPartitions decode-stub path (Dataset[BinaryDoc] →
    // Dataset[MediaMeta]); oracle checks the deterministic fake decoder.
    Q("mm_decode_stub", metaSql) { (s, d) =>
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
    }
  )
}
