package graft.multimodal

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded media item's metadata (the decode-stub output shape). */
final case class MediaMeta(doc_id: Long, n_bytes: Long, format: String,
                           width: Long, height: Long, sha: String)

/** A binary media payload with typed metadata. */
final case class BinaryDoc(doc_id: Long, payload: Array[Byte], format: String)

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded per-partition.
  *
  * The container has no image/audio codecs, so `decodePartition` is a
  * clearly-marked STUB — a deterministic fake decoder — but everything
  * around it is the real 100-TB shape: binary column + format tag, typed
  * `Dataset[BinaryDoc]`, batched `mapPartitions` (decoder state constructed
  * once per partition, like a real codec context would be), and a typed
  * `MediaMeta` result that downstream queries treat as an ordinary table.
  * Swapping in a real decoder changes only the body of `decodePartition`.
  */
object Multimodal {

  /** Stand-in binary corpus: the documents' UTF-8 bytes tagged as a fake
    * media format. With real data this would be `spark.read.format(
    * "binaryFile")` or a parquet column of encoded frames. */
  def binaryDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("fake/raw").as("format"))

  /** STUB decoder: deterministic pseudo-metadata derived from the payload
    * bytes (a real implementation would parse the codec headers here). */
  private def decodePartition(it: Iterator[BinaryDoc]): Iterator[MediaMeta] = {
    // One digest instance per partition — the "decoder context".
    val digest = MessageDigest.getInstance("SHA-256")
    it.map { b =>
      val n = b.payload.length.toLong
      val sha = digest.digest(b.payload).map("%02x".format(_)).mkString
      MediaMeta(
        doc_id = b.doc_id,
        n_bytes = n,
        format = b.format,
        width = 64L + n % 1024L,
        height = 64L + (n * 31L) % 1024L,
        sha = sha)
    }
  }

  /** Decode a binary-doc DataFrame into typed media metadata. */
  def decodeMeta(spark: SparkSession, bin: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    bin.as[BinaryDoc].mapPartitions(decodePartition)
  }

  /** Frame sampling, declaratively: one row per 256-byte "frame" of the
    * payload (a real pipeline would sample keyframes by timestamp). */
  def frameSample(bin: DataFrame, frameBytes: Int = 256): DataFrame =
    bin.select(
      col("doc_id"),
      explode(sequence(lit(0L),
        floor(octet_length(col("payload")) / frameBytes).cast("long")))
        .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * frameBytes).as("frame_off"))
}
