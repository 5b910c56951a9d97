package graft.sources.replay

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream,
  DataOutputStream, EOFException, File, FileInputStream, FileOutputStream}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The replay-log SEGMENT format — the engine's file-backed stand-in for
  * a Kafka topic partition's on-disk log (the reference's deposit topic,
  * /root/reference/depositaja.go:11), and the storage the `graft-replay`
  * DataSource V2 connector ([[ReplaySource]]) reads.
  *
  * A log directory holds segment files named
  *
  *   `seg-<baseOffset>-<lastOffset>-<minTs>-<maxTs>.rlog`
  *
  * (offsets zero-padded to 20 digits so lexicographic = numeric order).
  * The name carries the segment's offset and event-time bounds — the
  * analog of Kafka's base-offset segment naming plus its time index, and
  * the hook [[ReplaySource]] uses for SEGMENT PRUNING: a pushed
  * offset/ts range predicate eliminates whole files at planning time
  * without opening them, exactly like parquet row-group stats or an
  * Iceberg manifest's partition ranges. At 100 TB the directory is a
  * topic's archived log and pruning is the difference between "scan the
  * retention window" and "scan three segments".
  *
  * Each segment is a stream of FRAMES, one per record, mirroring a Kafka
  * message envelope (all integers big-endian):
  * {{{
  *   [4B frameLen][8B offset][8B tsUnixSeconds][2B keyLen][key][value]
  * }}}
  * `frameLen` counts the bytes after itself; `key` is the wallet id
  * (UTF-8, the reference keys its topic by wallet); `value` is the
  * proto3-marshaled `Deposit` message exactly as the reference's Go
  * producer emits it (wallet.proto:14-17), encoded by
  * [[graft.serde.ProtoWire]] — so a consumer of the reference's topics
  * could replay its archive through this connector byte-for-byte.
  */
object ReplayLog {

  val Extension = ".rlog"

  /** Parsed segment-name metadata (the prune index). */
  final case class SegmentMeta(path: String, baseOffset: Long,
                               lastOffset: Long, minTs: Long, maxTs: Long)

  private val SegName =
    """seg-(\d{20})-(\d{20})-(-?\d+)-(-?\d+)\.rlog""".r

  def segmentName(baseOffset: Long, lastOffset: Long,
                  minTs: Long, maxTs: Long): String =
    f"seg-$baseOffset%020d-$lastOffset%020d-$minTs%d-$maxTs%d$Extension"

  /** The log's MANIFEST: one line per live segment file name, replaced
    * atomically (tmp + POSIX rename) by every commit. It is what makes
    * OVERWRITE crash-safe: readers resolve the live set through the
    * manifest, so a layout swap is a single atomic file replacement —
    * old and new segments can coexist on disk through the commit window
    * without readers ever seeing a mix (the Iceberg/Delta snapshot
    * pattern scaled down to one file). Single-writer per log directory,
    * like a topic partition has a single producer lineage. */
  val ManifestName = "_manifest"

  /** Replace the manifest with `names` plus the streaming-sink epoch
    * ledger as `#epoch:<queryId>=<maxEpoch>` header lines. Keeping the
    * ledger INSIDE the manifest makes "segments published" and "epoch
    * recorded" one atomic rename — a separate sidecar would leave a
    * crash window where a replayed epoch re-publishes its segments
    * (duplication) or an unrecorded epoch's data is lost. One line per
    * query id (epochs per query are monotone, so the max is the whole
    * ledger), so the header stays O(#queries), not O(#batches). */
  private[replay] def writeManifest(dir: String, names: Seq[String],
                                    epochs: Map[String, Long]): Unit = {
    val tmp = File.createTempFile("manifest-", ".inprogress", new File(dir))
    val w = new java.io.OutputStreamWriter(
      new FileOutputStream(tmp), "UTF-8")
    try {
      epochs.toSeq.sortBy(_._1).foreach { case (q, e) =>
        w.write(s"#epoch:$q=$e"); w.write("\n")
      }
      names.foreach { n => w.write(n); w.write("\n") }
    } finally w.close()
    val dest = new File(dir, ManifestName)
    if (!tmp.renameTo(dest)) {
      // POSIX rename replaces atomically; a refused rename on a local FS
      // means something is genuinely wrong — fail the commit loudly.
      tmp.delete()
      throw new IllegalStateException(s"cannot publish manifest in $dir")
    }
  }

  private val EpochHeader = """#epoch:(.+)=(-?\d+)""".r

  /** The streaming sink's committed-epoch ledger: highest epoch id
    * published per streaming query id (empty for batch-only logs). */
  private[replay] def readEpochs(dir: String): Map[String, Long] = {
    val mf = new File(dir, ManifestName)
    if (!mf.isFile) Map.empty
    else {
      val src = scala.io.Source.fromFile(mf, "UTF-8")
      val lines = try src.getLines().toVector finally src.close()
      lines.collect { case EpochHeader(q, e) => q -> e.toLong }.toMap
    }
  }

  /** List a log directory's segments with their name-carried bounds.
    * With a manifest (every connector-written log), the manifest IS the
    * live set: unlisted `.rlog` files are retirees from a superseded
    * layout (ignored), and a listed-but-missing file is a broken log —
    * fail loudly. Manifest-less directories fall back to a raw listing,
    * where an unparseable `.rlog` name fails loudly too (a skipped
    * segment would read as missing data). */
  def segments(dir: String): Seq[SegmentMeta] = {
    def parse(f: File): SegmentMeta = f.getName match {
      case SegName(base, last, minTs, maxTs) =>
        SegmentMeta(f.getPath, base.toLong, last.toLong,
          minTs.toLong, maxTs.toLong)
      case other => throw new IllegalStateException(
        s"replay log $dir: unparseable segment name $other")
    }
    val mf = new File(dir, ManifestName)
    if (mf.isFile) {
      val src = scala.io.Source.fromFile(mf, "UTF-8")
      // `#`-prefixed lines are manifest headers (the epoch ledger), not
      // segment names.
      val names = try src.getLines()
        .filter(l => l.nonEmpty && !l.startsWith("#")).toVector
      finally src.close()
      names.map { n =>
        val f = new File(dir, n)
        if (!f.isFile) throw new IllegalStateException(
          s"replay log $dir: manifest references missing segment $n")
        parse(f)
      }.sortBy(_.baseOffset)
    } else {
      val kids = Option(new File(dir).listFiles()).getOrElse(Array.empty)
      kids.iterator.filter(f => f.isFile && f.getName.endsWith(Extension))
        .map(parse).toSeq.sortBy(_.baseOffset)
    }
  }

  /** Highest offset recorded in the log — read from segment NAMES only
    * (driver-side metadata, no job; the same listing a Kafka admin call
    * answers from the log's index). */
  def maxOffset(dir: String): Long = {
    val segs = segments(dir)
    require(segs.nonEmpty, s"replay log $dir has no segments")
    segs.map(_.lastOffset).max
  }

  /** Write `df` — columns (offset LONG, ts_unix LONG, wallet_id STRING,
    * amount DOUBLE) — as an `nSegments`-file replay log under `dir`,
    * APPENDING to whatever segments exist. Range-partitioned by offset
    * so segment offset ranges are disjoint (maximal pruning power),
    * sorted within each segment (a log is offset-ordered by
    * construction). Delegates to the connector's V2 WRITE path
    * ([[ReplaySource]]): frames stream executor-side into hidden
    * `.inprogress` temps (invisible to readers; deleted on task abort)
    * and become visible only at job commit — all-or-nothing publication
    * with no driver materialization, scaling like any other sink. */
  def writeSegments(df: DataFrame, dir: String, nSegments: Int): Unit =
    df.select(col("offset").cast("long"), col("ts_unix").cast("long"),
        col("wallet_id").cast("string"), col("amount").cast("double"))
      .repartitionByRange(nSegments, col("offset"))
      .sortWithinPartitions(col("offset"))
      .write.format("graft-replay").mode("append").save(dir)

  /** One decoded frame. `wallet`/`amount` come from the proto value —
    * decoding them is skipped by the reader when neither column is
    * required (column pruning reaching past the envelope into the
    * payload). */
  final case class Frame(offset: Long, tsUnix: Long,
                         wallet: Array[Byte], amount: Double)

  /** MAINTENANCE: compact a log's accumulated small segments into
    * `target` larger ones — the small-file problem a continuously-fed
    * log develops, solved with the connector's own two halves: the scan
    * reads the old layout, the V2 OVERWRITE write stages the new
    * segments as hidden temps and swaps them in only inside the job
    * commit (old segments are truncated after every new one is fully
    * staged), so readers observe the old layout or the new one, never a
    * mix, and a crash before commit leaves the old log intact. Offset
    * ranges stay disjoint (range repartition) and offset order is
    * preserved within each segment. Returns (segments before, after). */
  def compactSegments(spark: org.apache.spark.sql.SparkSession, dir: String,
                      target: Int): (Int, Int) = {
    val before = segments(dir).size
    spark.read.format("graft-replay").load(dir)
      .repartitionByRange(target, col("offset"))
      .sortWithinPartitions(col("offset"))
      .write.format("graft-replay").mode("overwrite").save(dir)
    (before, segments(dir).size)
  }

  /** Count a segment's frames via the envelope-only reader — no key
    * copy, no proto decode. This is the executor-side leg of COUNT(*)
    * aggregate pushdown: per-segment counts fold in Spark's final
    * aggregate, so the work distributes with the segments (never a
    * driver-side walk of a 100 TB log). Delegating to [[readSegment]]
    * makes the pushed count agree with the row scan BY CONSTRUCTION on
    * every malformed input: same torn-tail truncation, same loud
    * mid-file corruption failure — a bespoke header walk here once
    * tolerated a corrupt frame the row path rejects, silently
    * misparsing everything after it. */
  def countFrames(segPath: String): Long = {
    val it = readSegment(segPath, decodeValue = false)
    try {
      var n = 0L
      while (it.hasNext) { it.next(); n += 1 }
      n
    } finally it.close()
  }

  /** Frame iterator owning its stream: `close()` is idempotent and safe
    * mid-iteration (a LIMIT that stops a reader early must not leak the
    * file handle). */
  trait FrameIterator extends Iterator[Frame] with java.io.Closeable

  /** Iterate a segment's frames. `decodeValue=false` skips the proto
    * parse and key copy (envelope-only reads). */
  def readSegment(path: String, decodeValue: Boolean): FrameIterator = {
    val in = new DataInputStream(
      new BufferedInputStream(new FileInputStream(path), 1 << 16))
    new FrameIterator {
      private var nextFrame: Frame = _
      private var done = false
      // DataInputStream.skipBytes may skip fewer bytes than asked at a
      // buffer boundary — loop to the full count (EOF inside = torn).
      private def skipFully(n: Int): Unit = {
        var left = n
        while (left > 0) {
          val s = in.skipBytes(left)
          if (s <= 0) throw new EOFException()
          left -= s
        }
      }
      // EOF at a frame BOUNDARY is the clean end of the segment; EOF
      // inside a frame is a torn tail from an interrupted write — the
      // log-recovery rule (Kafka's) is to truncate to the last complete
      // frame, so both stop the iterator.
      private def advance(): Unit = {
        try {
          val len = in.readInt()
          val offset = in.readLong(); val ts = in.readLong()
          val keyLen = in.readUnsignedShort()
          val valueLen = len - 8 - 8 - 2 - keyLen
          if (valueLen < 0) throw new IllegalStateException(
            s"replay segment $path: corrupt frame (len=$len keyLen=$keyLen)")
          if (decodeValue) {
            skipFully(keyLen) // wallet also rides in the proto value
            val value = new Array[Byte](valueLen)
            in.readFully(value)
            val (wallet, amount) =
              graft.serde.ProtoWire.decodeDepositBytes(value)
            nextFrame = Frame(offset, ts, wallet, amount)
          } else {
            skipFully(keyLen + valueLen)
            nextFrame = Frame(offset, ts, null, 0.0)
          }
        } catch {
          case _: EOFException => done = true; close()
        }
      }
      advance()
      override def hasNext: Boolean = !done
      override def next(): Frame = {
        val f = nextFrame; advance(); f
      }
      override def close(): Unit =
        try in.close() catch { case _: java.io.IOException => () }
    }
  }
}
