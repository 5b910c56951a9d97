package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.security.MessageDigest
import javax.imageio.ImageIO
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded media item's metadata. */
final case class MediaMeta(doc_id: Long, n_bytes: Long, format: String,
                           width: Long, height: Long, sha: String)

/** A binary media payload with typed metadata. */
final case class BinaryDoc(doc_id: Long, payload: Array[Byte], format: String)

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded per-partition.
  *
  * The decoder is REAL: `decodePartition` parses actual codec containers
  * with the JDK's `javax.imageio` (PNG/BMP/GIF readers ship with the JRE —
  * no external codec libraries needed), recovering width/height/format from
  * the encoded bytes. Payloads no installed reader recognizes (e.g. raw
  * text bytes) fall through to a deterministic raw-branch signature — the
  * un-decodable branch every production media pipeline also carries. The
  * surrounding shape is the 100-TB one: binary column + format tag, typed
  * `Dataset[BinaryDoc]`, `mapPartitions` with the codec context constructed
  * once per partition, and a typed `MediaMeta` result that downstream
  * queries treat as an ordinary table.
  */
object Multimodal {

  /** Stand-in binary corpus: the documents' UTF-8 bytes tagged as a raw
    * (non-image) format. With real data this would be `spark.read.format(
    * "binaryFile")` or a parquet column of encoded frames. */
  def binaryDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("fake/raw").as("format"))

  /** Deterministic tiny-image dimensions per doc — the ground truth the
    * decode oracle recomputes from doc_id alone (primes keep w and h
    * decorrelated across ids). */
  def pngDims(docId: Long): (Int, Int) =
    (4 + (docId % 13).toInt, 3 + (docId % 11).toInt)

  /** Synthesize a REAL PNG per document: a wxh RGB image whose pixels are a
    * deterministic function of (doc_id, x, y), encoded through the JDK PNG
    * writer on the executors (map-side, no shuffle). The payload column
    * then carries genuine codec containers, so the decode path must parse
    * real IHDR headers to recover the dimensions. */
  def pngDocs(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      // ImageIO defaults to a FILE-backed stream cache — a temp file per
      // encode — which turns these small in-memory payloads into disk
      // I/O. Memory-cached streams are strictly better here (static
      // setting, set executor-side where the partition runs).
      ImageIO.setUseCache(false)
      it.map { id =>
        val (w, h) = pngDims(id)
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, (id * 2654435761L + x * 7919 + y * 104729).toInt & 0xffffff)
            x += 1
          }
          y += 1
        }
        val bos = new ByteArrayOutputStream()
        ImageIO.write(img, "png", bos)
        BinaryDoc(id, bos.toByteArray, "image/png")
      }
    }.toDF()
  }

  /** Real decoder: per partition, ONE shared digest + the ImageIO reader
    * registry context; per image-tagged row, sniff the container with the
    * installed readers (PNG/BMP/GIF/JPEG ship in the JRE) and read the
    * header-declared dimensions. `reader.getWidth/getHeight` parse the
    * header only — pixel data is not decoded for a metadata pass, which is
    * exactly the cheap scan a 100-TB catalog build wants.
    *
    * Sniffing is gated on the typed format tag (an `image/` prefix):
    * raw-tagged
    * payloads go straight to the deterministic byte-signature branch.
    * Trusting the catalog's tag matters for more than speed — arbitrary
    * text bytes can open with a codec magic ("BM", "GIF8") and would
    * otherwise be claimed by a reader and yield container-garbage dims.
    * Image-tagged payloads that fail to parse land in the same raw branch
    * under a `corrupt/` format — the quarantine row a real pipeline emits
    * instead of killing the task. */
  private def decodePartition(it: Iterator[BinaryDoc]): Iterator[MediaMeta] = {
    ImageIO.setUseCache(false) // in-memory payloads: no temp-file cache
    val digest = MessageDigest.getInstance("SHA-256")
    def raw(b: BinaryDoc, n: Long, sha: String, tag: String) =
      MediaMeta(b.doc_id, n, tag, 64L + n % 1024L, 64L + (n * 31L) % 1024L, sha)
    it.map { b =>
      val n = b.payload.length.toLong
      val sha = digest.digest(b.payload).map("%02x".format(_)).mkString
      if (!b.format.startsWith("image/")) raw(b, n, sha, b.format)
      else {
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(b.payload))
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) raw(b, n, sha, s"corrupt/${b.format}")
          else {
            val r = readers.next()
            try MediaMeta(b.doc_id, n, { r.setInput(iis); r.getFormatName.toLowerCase },
              r.getWidth(0).toLong, r.getHeight(0).toLong, sha)
            catch { case _: java.io.IOException => raw(b, n, sha, s"corrupt/${b.format}") }
            finally r.dispose()
          }
        } finally iis.close()
      }
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
