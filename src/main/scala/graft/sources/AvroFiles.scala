package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Avro Object Container File codec — the fifth corpus container in
  * `sources/` and the one DATA-ENGINEERING pipelines interchange
  * through (Kafka dumps, Sqoop/Hive exports, schema-registry
  * payloads). An OCF is:
  *
  * {{{
  *   magic "Obj\1"
  *   file-metadata map  (avro.schema JSON, avro.codec)   [block map]
  *   16-byte sync marker
  *   repeat: block = zigzag-varint record count
  *                 + zigzag-varint byte size of the serialized records
  *                 + records + the 16-byte sync marker
  * }}}
  *
  * Records here are `{doc_id: long, text: string}` in Avro binary:
  * zigzag-varint long + (zigzag-varint length + UTF-8 bytes). The
  * codec pair is hand-rolled end to end (no Avro jar in the
  * container — and the POINT is that the wire grammar sits under the
  * driver hash, like the other four containers).
  *
  * Triage semantics: Avro has no per-record checksum, so the triage
  * unit is the BLOCK. The generator plants a classic writer bug — a
  * declared record count one HIGHER than the records actually
  * serialized — on every block whose first doc_id is a multiple of
  * 17; the parser decodes the size-bounded slice to exhaustion,
  * flags the count mismatch, keeps the decoded records, and skips to
  * the next block by the size field (the size still frames the
  * block — a wrong count costs trust, not data). A sync-marker
  * mismatch or truncated block stops the walk cleanly: past a bad
  * sync the framing is untrusted, which is exactly why the format
  * has sync markers. The parser never throws on any input.
  */
object AvroFiles {

  /** One walked block: declared count, records actually decoded,
    * whether declared == decoded, sum of decoded doc_ids, total
    * decoded text bytes. */
  final case class AvroBlock(declared: Long, decoded: Long,
      countOk: Boolean, idSum: Long, textBytes: Long)
  /** blocks walked, codec metadata value, whether the walk consumed
    * the whole file with magic + every sync verified. */
  final case class AvroScan(blocks: Vector[AvroBlock], codec: String,
      clean: Boolean)

  private val Magic = Array[Byte]('O', 'b', 'j', 1)
  private[graft] val DocsPerBlock = 10
  /** The record schema, verbatim in the header metadata. */
  private[graft] val SchemaJson =
    """{"type":"record","name":"doc","fields":[""" +
      """{"name":"doc_id","type":"long"},""" +
      """{"name":"text","type":"string"}]}"""

  // --------------------------------------------------------- encode
  private def zigzag(out: ByteArrayOutputStream, v: Long): Unit = {
    var z = (v << 1) ^ (v >> 63)
    while ((z & ~0x7fL) != 0) {
      out.write(((z & 0x7f) | 0x80).toInt)
      z >>>= 7
    }
    out.write(z.toInt)
  }

  private def avroString(out: ByteArrayOutputStream, s: Array[Byte]): Unit = {
    zigzag(out, s.length.toLong)
    out.write(s)
  }

  /** zigzag-varint byte length of a non-negative long — the closed
    * form the oracle mirrors. */
  private[graft] def zlen(v: Long): Int = {
    val z = v << 1
    if (z < 0x80) 1 else if (z < 0x4000) 2 else if (z < 0x200000) 3 else 4
  }

  /** Deterministic 16-byte sync marker per file. */
  private[graft] def sync(fileId: Long): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"graft-avro-sync-$fileId".getBytes(UTF_8))
  }

  /** Deterministic OCF: [[DocsPerBlock]]-record blocks; every block
    * whose first doc_id % 17 == 0 declares count+1 (the planted
    * writer bug the triage path must survive). */
  private[graft] def synthAvro(fileId: Long, docs: Seq[(Long, Array[Byte])])
      : Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Magic)
    // metadata map: one block of 2 entries, then the 0 terminator
    zigzag(out, 2L)
    avroString(out, "avro.codec".getBytes(UTF_8))
    avroString(out, "null".getBytes(UTF_8))
    avroString(out, "avro.schema".getBytes(UTF_8))
    avroString(out, SchemaJson.getBytes(UTF_8))
    zigzag(out, 0L)
    val marker = sync(fileId)
    out.write(marker)
    docs.grouped(DocsPerBlock).foreach { block =>
      val body = new ByteArrayOutputStream()
      block.foreach { case (id, text) =>
        zigzag(body, id)
        avroString(body, text)
      }
      val bug = block.head._1 % 17 == 0
      zigzag(out, block.size.toLong + (if (bug) 1L else 0L))
      zigzag(out, body.size.toLong)
      body.writeTo(out)
      out.write(marker)
    }
    out.toByteArray
  }

  // --------------------------------------------------------- decode
  /** (bytesRead << 48 | zigzag-decoded value masked to 48 bits), or
    * -1 on overrun. 48 bits covers every length/id in scope; the
    * mask keeps the packing total instead of throwing. */
  private def readZigzag(b: Array[Byte], off: Int, end: Int): Long = {
    var z = 0L
    var shift = 0
    var p = off
    while (p < end && shift < 64) {
      val x = b(p) & 0xff
      z |= (x & 0x7fL) << shift
      p += 1
      if ((x & 0x80) == 0) {
        val v = (z >>> 1) ^ -(z & 1)
        return (p - off).toLong << 48 | (v & 0xffffffffffffL)
      }
      shift += 7
    }
    -1L
  }

  /** Total OCF walk — see the object doc for the triage rules. */
  private[graft] def parseAvro(fileId: Long, b: Array[Byte]): AvroScan =
    parseAvroWith(Some(fileId), b)

  /** The header-trusting variant a real OCF reader runs when nothing
    * external pins the expected sync: the 16-byte marker is READ from
    * the header and used to re-align blocks (exactly the spec's
    * semantics; the fileId-pinned overload additionally cross-checks
    * the generator's derivation). Used by the format sniffer. */
  private[graft] def parseAvroSniffed(b: Array[Byte]): AvroScan =
    parseAvroWith(None, b)

  private def parseAvroWith(fileId: Option[Long], b: Array[Byte])
      : AvroScan = {
    val none = AvroScan(Vector.empty, "", clean = false)
    if (b.length < 4 || b(0) != 'O' || b(1) != 'b' || b(2) != 'j' ||
      b(3) != 1) return none
    var p = 4
    // metadata map: block count (negative form carries a byte size),
    // then count string/bytes pairs, until the 0 terminator
    var codec = ""
    var mapOk = true
    var done = false
    while (mapOk && !done) {
      val c = readZigzag(b, p, b.length)
      if (c < 0) { mapOk = false }
      else {
        p += (c >>> 48).toInt
        var n = (c & 0xffffffffffffL).toLong
        if (n == 0) done = true
        else {
          if ((n & 0x800000000000L) != 0) { // negative count form
            n = -((n | ~0xffffffffffffL))
            val sz = readZigzag(b, p, b.length)
            if (sz < 0) mapOk = false else p += (sz >>> 48).toInt
          }
          var i = 0L
          while (mapOk && i < n) {
            val kl = readZigzag(b, p, b.length)
            if (kl < 0) mapOk = false
            else {
              p += (kl >>> 48).toInt
              val klen = (kl & 0xffffffffffffL).toInt
              if (p + klen > b.length) mapOk = false
              else {
                val key = new String(b, p, klen, UTF_8)
                p += klen
                val vl = readZigzag(b, p, b.length)
                if (vl < 0) mapOk = false
                else {
                  p += (vl >>> 48).toInt
                  val vlen = (vl & 0xffffffffffffL).toInt
                  if (p + vlen > b.length) mapOk = false
                  else {
                    if (key == "avro.codec")
                      codec = new String(b, p, vlen, UTF_8)
                    p += vlen
                  }
                }
              }
            }
            i += 1
          }
        }
      }
    }
    if (!mapOk || p + 16 > b.length) return none
    // header sync: trusted as-is in sniffed mode, cross-checked
    // against the fileId derivation when the caller pins one
    val marker = fileId.map(sync).getOrElse(
      java.util.Arrays.copyOfRange(b, p, p + 16))
    var syncOk = true
    var i = 0
    while (i < 16) { if (b(p + i) != marker(i)) syncOk = false; i += 1 }
    p += 16
    if (!syncOk) return none
    // data blocks
    val blocks = Vector.newBuilder[AvroBlock]
    var stop = false
    var clean = true
    while (!stop && p < b.length) {
      val c = readZigzag(b, p, b.length)
      val afterC = if (c < 0) -1 else p + (c >>> 48).toInt
      val s = if (c < 0) -1L else readZigzag(b, afterC, b.length)
      if (c < 0 || s < 0) { clean = false; stop = true }
      else {
        val declared = c & 0xffffffffffffL
        val size = (s & 0xffffffffffffL).toInt
        val bodyOff = afterC + (s >>> 48).toInt
        val bodyEnd = bodyOff + size
        if (bodyEnd + 16 > b.length) { clean = false; stop = true }
        else {
          // decode the size-bounded slice to exhaustion
          var q = bodyOff
          var decoded = 0L
          var idSum = 0L
          var textBytes = 0L
          var recOk = true
          while (recOk && q < bodyEnd) {
            val idv = readZigzag(b, q, bodyEnd)
            if (idv < 0) recOk = false
            else {
              val id = idv & 0xffffffffffffL
              q += (idv >>> 48).toInt
              val tl = readZigzag(b, q, bodyEnd)
              if (tl < 0) recOk = false
              else {
                val tlen = (tl & 0xffffffffffffL).toInt
                q += (tl >>> 48).toInt
                if (q + tlen > bodyEnd) recOk = false
                else {
                  idSum += id
                  textBytes += tlen
                  decoded += 1
                  q += tlen
                }
              }
            }
          }
          // countOk is the TRIAGE channel, not a structural failure:
          // the size field still frames the block, so the walk goes on
          val countOk = recOk && decoded == declared && q == bodyEnd
          blocks += AvroBlock(declared, decoded, countOk, idSum, textBytes)
          var j = 0
          var sOk = true
          while (j < 16) {
            if (b(bodyEnd + j) != marker(j)) sOk = false
            j += 1
          }
          if (!sOk) { clean = false; stop = true } // untrusted framing
          else p = bodyEnd + 16
        }
      }
    }
    AvroScan(blocks.result(), codec, clean = clean && p == b.length)
  }
}
