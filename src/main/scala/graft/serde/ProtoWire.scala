package graft.serde

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

import graft.model._

/** Dependency-free protobuf (proto3) wire codec for the reference's five
  * message types (/root/reference/proto/wallet.proto:14-22,
  * detector.proto:14-17, flagger.proto:15-23), implementing the public
  * wire-format spec (varint, 64-bit fixed, length-delimited) so the
  * streaming topology is wire-compatible with the reference's Go
  * producers/consumers without needing the spark-protobuf connector jar
  * (not shipped in this container).
  *
  * Encoding matches Go `proto.Marshal` canonical output: fields in
  * field-number order, scalar zero values omitted (proto3 implicit
  * presence), repeated message elements always emitted. Decoding is
  * order-independent and skips unknown fields, per spec.
  *
  * Two layers: plain-JVM codecs over the [[graft.model]] case classes for
  * the typed streaming layer, and Catalyst-typed helpers (`UTF8String`,
  * `InternalRow`, `ArrayData`) that the codegen'd expressions in
  * [[ProtoExpressions]] call via this object's static forwarders.
  */
object ProtoWire {

  // ---- wire-format primitives -------------------------------------------

  private final val WireVarint = 0
  private final val WireFixed64 = 1
  private final val WireLen = 2
  private final val WireFixed32 = 5

  private def writeVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7FL) != 0L) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.write((v & 0x7F).toInt)
  }

  private def writeTag(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    writeVarint(out, ((field.toLong << 3) | wire.toLong))

  private def writeFixed64(out: ByteArrayOutputStream, bits: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((bits >>> (8 * i)) & 0xFF).toInt); i += 1 }
  }

  private def writeLenDelim(out: ByteArrayOutputStream, bytes: Array[Byte]): Unit = {
    writeVarint(out, bytes.length.toLong)
    out.write(bytes, 0, bytes.length)
  }

  /** Streaming reader over one message's bytes. */
  private final class Reader(buf: Array[Byte]) {
    private var pos = 0
    def hasMore: Boolean = pos < buf.length
    def readVarint(): Long = {
      var shift = 0
      var result = 0L
      while (shift < 64) {
        require(pos < buf.length, "truncated varint")
        val b = buf(pos); pos += 1
        result |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      throw new IllegalArgumentException("varint too long")
    }
    def readFixed64(): Long = {
      require(pos + 8 <= buf.length, "truncated fixed64")
      var bits = 0L
      var i = 0
      while (i < 8) { bits |= (buf(pos + i) & 0xFFL) << (8 * i); i += 1 }
      pos += 8
      bits
    }
    def readBytes(): Array[Byte] = {
      val n = readVarint().toInt
      require(n >= 0 && pos + n <= buf.length, "truncated length-delimited field")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n
      out
    }
    /** Skip a field of the given wire type (unknown-field tolerance). */
    def skip(wire: Int): Unit = wire match {
      case WireVarint  => readVarint()
      case WireFixed64 => readFixed64()
      case WireLen     => readBytes()
      case WireFixed32 =>
        require(pos + 4 <= buf.length, "truncated fixed32"); pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  private val Empty = Array.empty[Byte]

  // ---- Deposit { string wallet_id = 1; double amount = 2; } -------------

  def encodeDepositBytes(walletUtf8: Array[Byte], amount: Double): Array[Byte] = {
    val out = new ByteArrayOutputStream(2 + walletUtf8.length + 9)
    if (walletUtf8.nonEmpty) { writeTag(out, 1, WireLen); writeLenDelim(out, walletUtf8) }
    if (amount != 0.0) { writeTag(out, 2, WireFixed64); writeFixed64(out, java.lang.Double.doubleToLongBits(amount)) }
    out.toByteArray
  }

  /** Decode → (wallet_id utf8 bytes, amount). */
  def decodeDepositBytes(bytes: Array[Byte]): (Array[Byte], Double) = {
    val r = new Reader(bytes)
    var wallet = Empty
    var amount = 0.0
    while (r.hasMore) {
      val tag = r.readVarint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 0x7).toInt
      (field, wire) match {
        case (1, WireLen)     => wallet = r.readBytes()
        case (2, WireFixed64) => amount = java.lang.Double.longBitsToDouble(r.readFixed64())
        case _                => r.skip(wire)
      }
    }
    (wallet, amount)
  }

  def encode(d: Deposit): Array[Byte] =
    encodeDepositBytes(d.walletId.getBytes("UTF-8"), d.amount)

  def decodeDeposit(bytes: Array[Byte]): Deposit = {
    val (w, a) = decodeDepositBytes(bytes)
    Deposit(new String(w, "UTF-8"), a)
  }

  // ---- DepositHistory { string wallet_id = 1; repeated Deposit deposits = 2; }

  def encode(h: DepositHistory): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val w = h.walletId.getBytes("UTF-8")
    if (w.nonEmpty) { writeTag(out, 1, WireLen); writeLenDelim(out, w) }
    h.deposits.foreach { d =>
      writeTag(out, 2, WireLen); writeLenDelim(out, encode(d))
    }
    out.toByteArray
  }

  def decodeDepositHistory(bytes: Array[Byte]): DepositHistory = {
    val r = new Reader(bytes)
    var wallet = ""
    val deposits = Vector.newBuilder[Deposit]
    while (r.hasMore) {
      val tag = r.readVarint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 0x7).toInt
      (field, wire) match {
        case (1, WireLen) => wallet = new String(r.readBytes(), "UTF-8")
        case (2, WireLen) => deposits += decodeDeposit(r.readBytes())
        case _            => r.skip(wire)
      }
    }
    DepositHistory(wallet, deposits.result())
  }

  // ---- Counter { int64 rolling_period_start_unix = 1; double received = 2; }

  def encode(c: Counter): Array[Byte] = {
    val out = new ByteArrayOutputStream(21)
    if (c.rollingPeriodStartUnix != 0L) { writeTag(out, 1, WireVarint); writeVarint(out, c.rollingPeriodStartUnix) }
    if (c.received != 0.0) { writeTag(out, 2, WireFixed64); writeFixed64(out, java.lang.Double.doubleToLongBits(c.received)) }
    out.toByteArray
  }

  def decodeCounter(bytes: Array[Byte]): Counter = {
    val r = new Reader(bytes)
    var start = 0L
    var received = 0.0
    while (r.hasMore) {
      val tag = r.readVarint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 0x7).toInt
      (field, wire) match {
        case (1, WireVarint)  => start = r.readVarint()
        case (2, WireFixed64) => received = java.lang.Double.longBitsToDouble(r.readFixed64())
        case _                => r.skip(wire)
      }
    }
    Counter(start, received)
  }

  // ---- FlagEvent { bool flag_removed = 1; int64 rolling_period_start_unix = 2; }
  // ---- FlagValue { bool flagged = 1; int64 rolling_period_start_unix = 2; }
  // Identical wire shape (bool @1, int64 @2); shared helpers.

  def encodeBoolInt64(b: Boolean, v: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream(13)
    if (b) { writeTag(out, 1, WireVarint); writeVarint(out, 1L) }
    if (v != 0L) { writeTag(out, 2, WireVarint); writeVarint(out, v) }
    out.toByteArray
  }

  def decodeBoolInt64(bytes: Array[Byte]): (Boolean, Long) = {
    val r = new Reader(bytes)
    var b = false
    var v = 0L
    while (r.hasMore) {
      val tag = r.readVarint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 0x7).toInt
      (field, wire) match {
        case (1, WireVarint) => b = r.readVarint() != 0L
        case (2, WireVarint) => v = r.readVarint()
        case _               => r.skip(wire)
      }
    }
    (b, v)
  }

  def encode(e: FlagEvent): Array[Byte] = encodeBoolInt64(e.flagRemoved, e.rollingPeriodStartUnix)
  def decodeFlagEvent(bytes: Array[Byte]): FlagEvent = {
    val (b, v) = decodeBoolInt64(bytes); FlagEvent(b, v)
  }
  def encode(v: FlagValue): Array[Byte] = encodeBoolInt64(v.flagged, v.rollingPeriodStartUnix)
  def decodeFlagValue(bytes: Array[Byte]): FlagValue = {
    val (b, v2) = decodeBoolInt64(bytes); FlagValue(b, v2)
  }

  // ---- Catalyst-typed helpers (called from codegen via static forwarders)

  def encDeposit(walletId: UTF8String, amount: Double): Array[Byte] =
    encodeDepositBytes(walletId.getBytes, amount)

  def decDepositRow(bytes: Array[Byte]): InternalRow = {
    val (w, a) = decodeDepositBytes(bytes)
    new GenericInternalRow(Array[Any](UTF8String.fromBytes(w), a))
  }

  def encHistory(walletId: UTF8String, deposits: ArrayData): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val w = walletId.getBytes
    if (w.nonEmpty) { writeTag(out, 1, WireLen); writeLenDelim(out, w) }
    var i = 0
    val n = deposits.numElements()
    while (i < n) {
      val row = deposits.getStruct(i, 2)
      writeTag(out, 2, WireLen)
      writeLenDelim(out, encDeposit(row.getUTF8String(0), row.getDouble(1)))
      i += 1
    }
    out.toByteArray
  }

  def decHistoryRow(bytes: Array[Byte]): InternalRow = {
    val h = decodeDepositHistory(bytes)
    val rows: Array[Any] = h.deposits.map { d =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(d.walletId), d.amount))
    }.toArray
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(h.walletId), new GenericArrayData(rows)))
  }

  def encCounter(start: Long, received: Double): Array[Byte] =
    encode(Counter(start, received))

  def decCounterRow(bytes: Array[Byte]): InternalRow = {
    val c = decodeCounter(bytes)
    new GenericInternalRow(Array[Any](c.rollingPeriodStartUnix, c.received))
  }

  def decBoolInt64Row(bytes: Array[Byte]): InternalRow = {
    val (b, v) = decodeBoolInt64(bytes)
    new GenericInternalRow(Array[Any](b, v))
  }
}
