package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Multi-member gzip codec (RFC 1952) — the container Common Crawl
  * text actually ARRIVES in: a `.warc.wet.gz` is a CONCATENATION of
  * gzip members, one per record, and a reader that stops after the
  * first member silently drops 99.99% of the corpus. The member
  * FRAMING here is hand-rolled grammar (magic, CM, the FLG bit zoo —
  * FEXTRA/FNAME/FCOMMENT/FHCRC — and the CRC32+ISIZE trailer); the
  * DEFLATE payload goes through `java.util.zip.Inflater` in raw
  * mode, which is the honest split: entropy coding is a solved
  * library problem, member framing and triage are the engine's job.
  *
  * Cross-checks: the generator compresses with `Deflater` and stamps
  * trailers with `java.util.zip.CRC32`; the parser recomputes both
  * the FHCRC header checksum and the payload CRC with the
  * hand-rolled table shared with [[ZipFiles]] — so JDK and
  * hand-rolled CRC-32 prove each other again, this time across
  * modules.
  *
  * Triage semantics: a member whose payload CRC mismatches the
  * trailer is RECORDED and the walk continues (inflate already found
  * the member's end — one bad member costs itself, not the shard);
  * a bad magic/CM, a failed FHCRC, a DEFLATE error, or a truncated
  * trailer stops the walk cleanly with the unconsumed byte count.
  * The parser never throws on any input.
  */
object GzipFiles {

  /** One parsed member: FNAME value, inflated byte count, whether
    * the trailer CRC matched the payload recompute, whether ISIZE
    * matched. */
  final case class GzMember(name: String, rawLen: Long, crcOk: Boolean,
      isizeOk: Boolean)
  /** members parsed, unconsumed trailing bytes, whether the walk
    * consumed everything. */
  final case class GzScan(members: Vector[GzMember], trailing: Int,
      clean: Boolean)

  private val FhcrcBit = 0x02
  private val FextraBit = 0x04
  private val FnameBit = 0x08
  private val FcommentBit = 0x10

  /** Deterministic multi-member stream: one member per doc, FNAME
    * always (`doc_<id>.txt`), FEXTRA on every 5th doc, FCOMMENT on
    * every 11th, FHCRC on every 13th; every 17th doc's trailer CRC
    * is off by one bit (the triage stride shared by all five
    * container codecs). */
  private[graft] def synthGzip(docs: Seq[(Long, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    docs.foreach { case (id, body) =>
      val h = new ByteArrayOutputStream()
      var flg = FnameBit
      if (id % 5 == 0) flg |= FextraBit
      if (id % 11 == 0) flg |= FcommentBit
      if (id % 13 == 0) flg |= FhcrcBit
      h.write(0x1f); h.write(0x8b); h.write(8) // magic + CM=deflate
      h.write(flg)
      var m = id // MTIME := doc id (deterministic)
      var i = 0
      while (i < 4) { h.write((m & 0xff).toInt); m >>>= 8; i += 1 }
      h.write(0) // XFL
      h.write(255) // OS = unknown
      if ((flg & FextraBit) != 0) {
        h.write(8); h.write(0) // XLEN = 8
        h.write('g'); h.write('r') // subfield id
        h.write(4); h.write(0) // subfield len = 4
        var v = id
        i = 0
        while (i < 4) { h.write((v & 0xff).toInt); v >>>= 8; i += 1 }
      }
      if ((flg & FnameBit) != 0) {
        h.write(s"doc_$id.txt".getBytes(UTF_8)); h.write(0)
      }
      if ((flg & FcommentBit) != 0) {
        h.write("graft".getBytes(UTF_8)); h.write(0)
      }
      val hb = h.toByteArray
      out.write(hb)
      if ((flg & FhcrcBit) != 0) {
        val c = new java.util.zip.CRC32()
        c.update(hb)
        val v = c.getValue & 0xffff
        out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
      }
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(body)
      d.finish()
      val buf = new Array[Byte](4096)
      while (!d.finished()) {
        val n = d.deflate(buf)
        out.write(buf, 0, n)
      }
      d.end()
      val c = new java.util.zip.CRC32()
      c.update(body)
      var crc = c.getValue
      if (id % 17 == 0) crc ^= 1L
      var j = 0
      while (j < 4) { out.write((crc & 0xff).toInt); crc >>>= 8; j += 1 }
      var isz = body.length.toLong & 0xffffffffL
      j = 0
      while (j < 4) { out.write((isz & 0xff).toInt); isz >>>= 8; j += 1 }
    }
    out.toByteArray
  }

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xff).toLong | ((b(off + 1) & 0xff).toLong << 8) |
      ((b(off + 2) & 0xff).toLong << 16) |
      ((b(off + 3) & 0xff).toLong << 24)

  /** Total member walk — see the object doc for the triage rules. */
  private[graft] def parseGzip(b: Array[Byte]): GzScan = {
    val members = Vector.newBuilder[GzMember]
    var p = 0
    var stop = false
    while (!stop && p < b.length) {
      if (p + 10 > b.length || (b(p) & 0xff) != 0x1f ||
        (b(p + 1) & 0xff) != 0x8b || b(p + 2) != 8) { stop = true }
      else {
        val flg = b(p + 3) & 0xff
        var q = p + 10
        var ok = true
        if ((flg & FextraBit) != 0) {
          if (q + 2 > b.length) ok = false
          else { val xlen = u16(b, q); q += 2 + xlen }
        }
        var name = ""
        if (ok && (flg & FnameBit) != 0) {
          val start = q
          while (q < b.length && b(q) != 0) q += 1
          if (q >= b.length) ok = false
          else { name = new String(b, start, q - start, UTF_8); q += 1 }
        }
        if (ok && (flg & FcommentBit) != 0) {
          while (q < b.length && b(q) != 0) q += 1
          if (q >= b.length) ok = false else q += 1
        }
        if (ok && (flg & FhcrcBit) != 0) {
          // header crc: low 16 bits of CRC-32 over the header bytes
          // BEFORE the FHCRC field — recomputed with the hand-rolled
          // table (the generator used java.util.zip.CRC32)
          if (q + 2 > b.length ||
            (ZipFiles.crc32(b, p, q - p) & 0xffff) != u16(b, q).toLong)
            ok = false
          else q += 2
        }
        if (!ok || q > b.length) stop = true
        else {
          // raw-deflate payload: the Inflater finds the member's end
          val inf = new java.util.zip.Inflater(true)
          inf.setInput(b, q, b.length - q)
          val outBuf = new ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var defOk = true
          try {
            while (!inf.finished() && defOk) {
              val n = inf.inflate(buf)
              if (n > 0) outBuf.write(buf, 0, n)
              else if (inf.needsInput() || inf.needsDictionary())
                defOk = false // truncated / non-self-terminating stream
            }
          } catch {
            case _: java.util.zip.DataFormatException => defOk = false
          }
          val consumed = (b.length - q) - inf.getRemaining
          inf.end()
          val tOff = q + consumed
          if (!defOk || !inf.finished() || tOff + 8 > b.length) stop = true
          else {
            val raw = outBuf.toByteArray
            val crcOk = ZipFiles.crc32(raw, 0, raw.length) == u32(b, tOff)
            val isizeOk =
              (raw.length.toLong & 0xffffffffL) == u32(b, tOff + 4)
            members += GzMember(name, raw.length.toLong, crcOk, isizeOk)
            p = tOff + 8
          }
        }
      }
    }
    GzScan(members.result(), b.length - p, clean = p == b.length)
  }
}
