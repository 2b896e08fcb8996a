package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** TFRecord codec — the fourth corpus container beside
  * [[WarcFiles]]/[[TarFiles]]/[[ZipFiles]], and the one training
  * pipelines actually FEED FROM: TensorFlow's record framing (and
  * WebDataset's TF-compatible mode) wraps each example in
  *
  * {{{
  *   uint64  length                 (little-endian)
  *   uint32  masked_crc32c(length)  (of the 8 length bytes)
  *   byte    data[length]
  *   uint32  masked_crc32c(data)
  * }}}
  *
  * with `mask(c) = ((c >>> 15) | (c << 17)) + 0xa282ead8` over
  * CRC-32C (Castagnoli). The payload here is a flat protobuf wire
  * message — field 1 varint doc_id, field 2 length-delimited text,
  * plus (every 7th doc) an EXTRA fixed64 field 3 the schema doesn't
  * know, so the parser's wire-type dispatch must skip unknowns the
  * way real proto readers do.
  *
  * Codec-pair discipline as everywhere in `sources/`: the generator
  * computes CRC-32C with `java.util.zip.CRC32C`; the parser
  * recomputes with a HAND-ROLLED Castagnoli table — two independent
  * implementations proving each other under the driver hash.
  *
  * Triage semantics: a record whose DATA crc mismatches is RECORDED
  * and the walk continues (the length still frames it — one flipped
  * bit costs one example, not the shard); a LENGTH-crc mismatch or a
  * truncated record stops the walk cleanly (untrusted framing is the
  * one thing a reader must not walk past — TensorFlow's reader does
  * the same). The parser never throws on any input.
  */
object TfRecordFiles {

  /** One framed record: decoded doc_id (-1 if the proto walk
    * failed), decoded text byte length, whether the data crc
    * matched, whether the proto wire walk consumed the payload
    * exactly with both known fields present. */
  final case class TfRecord(docId: Long, textLen: Long, crcOk: Boolean,
      protoOk: Boolean)
  /** records walked, unconsumed trailing bytes, whether the walk
    * consumed the whole input with every length crc verified. */
  final case class TfScan(records: Vector[TfRecord], trailing: Int,
      clean: Boolean)

  // ------------------------------------------------------ CRC-32C
  // hand-rolled Castagnoli table (reflected poly 0x82F63B78) — the
  // parser half; deliberately NOT java.util.zip.CRC32C, which the
  // GENERATOR uses, so the two cross-check.
  private val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var n = 0
    while (n < 256) {
      var c = n
      var k = 0
      while (k < 8) {
        c = if ((c & 1) != 0) 0x82f63b78 ^ (c >>> 1) else c >>> 1
        k += 1
      }
      t(n) = c
      n += 1
    }
    t
  }

  private[graft] def crc32c(b: Array[Byte], off: Int, len: Int): Long = {
    var c = 0xffffffff
    var i = off
    val end = off + len
    while (i < end) {
      c = crcTable((c ^ b(i)) & 0xff) ^ (c >>> 8)
      i += 1
    }
    (~c).toLong & 0xffffffffL
  }

  /** TensorFlow's crc mask: rotate right 15, add the magic. */
  private[graft] def mask(crc: Long): Long =
    (((crc >>> 15) | (crc << 17)) + 0xa282ead8L) & 0xffffffffL

  private def jdkMaskedCrc(b: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32C()
    c.update(b)
    mask(c.getValue)
  }

  // ------------------------------------------------- proto encode
  private def varint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Flat proto: `1: varint doc_id, 2: bytes text`, plus an unknown
    * fixed64 field 3 (value = doc_id) on every 7th doc. */
  private[graft] def synthProto(id: Long, text: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(0x08) // field 1, wire 0 (varint)
    varint(out, id)
    out.write(0x12) // field 2, wire 2 (len-delimited)
    varint(out, text.length.toLong)
    out.write(text)
    if (id % 7 == 0) {
      out.write(0x19) // field 3, wire 1 (fixed64) — unknown to the reader
      var v = id
      var i = 0
      while (i < 8) { out.write((v & 0xff).toInt); v >>>= 8; i += 1 }
    }
    out.toByteArray
  }

  /** Deterministic shard: one framed record per doc; every 17th
    * doc's stored DATA crc is off by one bit (synthetic corruption,
    * same stride as the tar/zip codecs). */
  private[graft] def synthTfRecords(docs: Seq[(Long, Array[Byte])])
      : Array[Byte] = {
    val out = new ByteArrayOutputStream()
    docs.foreach { case (id, text) =>
      val data = synthProto(id, text)
      val lenBytes = new Array[Byte](8)
      var v = data.length.toLong
      var i = 0
      while (i < 8) { lenBytes(i) = (v & 0xff).toByte; v >>>= 8; i += 1 }
      out.write(lenBytes)
      var c = jdkMaskedCrc(lenBytes)
      i = 0
      while (i < 4) { out.write((c & 0xff).toInt); c >>>= 8; i += 1 }
      out.write(data)
      c = jdkMaskedCrc(data)
      if (id % 17 == 0) c = c ^ 1L
      i = 0
      while (i < 4) { out.write((c & 0xff).toInt); c >>>= 8; i += 1 }
    }
    out.toByteArray
  }

  // -------------------------------------------------- proto decode
  /** (value, bytesRead) or null on overrun/overflow — flat pair to
    * keep the hot walk allocation-light. */
  private def readVarint(b: Array[Byte], off: Int, end: Int): Long = {
    var v = 0L
    var shift = 0
    var p = off
    while (p < end && shift < 64) {
      val x = b(p) & 0xff
      v |= (x & 0x7fL) << shift
      p += 1
      if ((x & 0x80) == 0) return (p - off).toLong << 48 | (v & 0xffffffffffffL)
      shift += 7
    }
    -1L
  }

  /** Total wire walk: returns (docId, textLen) with protoOk, using
    * wire-type dispatch to skip fields the schema doesn't know. */
  private def parseProto(b: Array[Byte], off: Int, end: Int): TfRecord = {
    var id = -1L
    var textLen = -1L
    var p = off
    var ok = true
    while (ok && p < end) {
      val tag = readVarint(b, p, end)
      if (tag < 0) ok = false
      else {
        p += (tag >>> 48).toInt
        val key = tag & 0xffffffffffffL
        val field = (key >>> 3).toInt
        (key & 7) match {
          case 0 =>
            val v = readVarint(b, p, end)
            if (v < 0) ok = false
            else {
              if (field == 1) id = v & 0xffffffffffffL
              p += (v >>> 48).toInt
            }
          case 1 => if (p + 8 <= end) p += 8 else ok = false
          case 2 =>
            val v = readVarint(b, p, end)
            if (v < 0) ok = false
            else {
              val len = (v & 0xffffffffffffL).toInt
              p += (v >>> 48).toInt
              if (p + len <= end) {
                if (field == 2) textLen = len.toLong
                p += len
              } else ok = false
            }
          case 5 => if (p + 4 <= end) p += 4 else ok = false
          case _ => ok = false // wire types 3/4 (groups): unsupported
        }
      }
    }
    val protoOk = ok && p == end && id >= 0 && textLen >= 0
    TfRecord(if (protoOk) id else -1L, math.max(textLen, 0L),
      crcOk = false, protoOk = protoOk)
  }

  private def u32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xff).toLong | ((b(off + 1) & 0xff).toLong << 8) |
      ((b(off + 2) & 0xff).toLong << 16) |
      ((b(off + 3) & 0xff).toLong << 24)

  /** Total record walk — see the object doc for the triage rules. */
  private[graft] def parseTfRecords(b: Array[Byte]): TfScan = {
    val records = Vector.newBuilder[TfRecord]
    var p = 0
    var stop = false
    var framingOk = true
    while (!stop && p + 12 <= b.length) {
      var len = 0L
      var i = 7
      while (i >= 0) { len = (len << 8) | (b(p + i) & 0xff); i -= 1 }
      val lenCrcOk = mask(crc32c(b, p, 8)) == u32le(b, p + 8)
      if (!lenCrcOk || len < 0 || p + 16 + len > b.length) {
        // untrusted framing or truncated payload: clean stop
        if (!lenCrcOk) framingOk = false
        stop = true
      } else {
        val dataOff = p + 12
        val dataEnd = dataOff + len.toInt
        val crcOk = mask(crc32c(b, dataOff, len.toInt)) == u32le(b, dataEnd)
        records += parseProto(b, dataOff, dataEnd).copy(crcOk = crcOk)
        p = dataEnd + 4
      }
    }
    TfScan(records.result(), b.length - p,
      clean = framingOk && p == b.length)
  }
}
