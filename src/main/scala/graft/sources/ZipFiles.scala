package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal ZIP (PKWARE APPNOTE) codec — the third corpus container
  * beside [[WarcFiles]] (how the web arrives) and [[TarFiles]] (how
  * corpora are shipped): ZIP is how datasets are UPLOADED — Kaggle
  * bundles, data-portal exports, supervised-corpus drops. Same
  * discipline as the other two: a deterministic STORED-method
  * generator and a TOTAL parser built as a pair, so the query layer
  * proves the walk against closed-form ground truth.
  *
  * Layout (all integers little-endian): per member a local file
  * header (sig PK\3\4: method, CRC-32, sizes, name) followed by the
  * raw payload; then the central directory (one PK\1\2 record per
  * member, carrying the local header offset); then the end-of-
  * central-directory record (PK\5\6: entry count, directory size and
  * offset). A reader finds EOCD from the END of the file and walks
  * the directory — the opposite scan direction from tar's forward
  * block walk, which is exactly why both codecs exist here.
  *
  * Triage semantics match tar: a payload whose CRC-32 does not match
  * the directory's stored value is RECORDED and the walk continues
  * (one flipped bit costs one member's trust, not the archive);
  * a missing/malformed EOCD, a bad directory signature, or an
  * out-of-bounds local record stops the walk cleanly. The parser
  * never throws on any input (fuzz-spec pinned on every prefix).
  *
  * The generator computes CRC-32 with `java.util.zip.CRC32`; the
  * parser recomputes it with a HAND-ROLLED table — the two
  * implementations cross-check each other the way `pixelStats`
  * cross-checks the image header parsers against an independent
  * decoder.
  */
object ZipFiles {

  /** One directory entry joined with its local-record validation:
    * name, payload size, whether the stored CRC matched the payload
    * recompute, whether the local header agreed with the directory
    * (signature, name, size, in-bounds payload). */
  final case class ZipEntry(name: String, size: Long, crcOk: Boolean,
      localOk: Boolean)
  /** entries walked from the central directory, the EOCD's declared
    * entry count, and whether the whole structure was consistent:
    * EOCD found, declared == walked, directory exactly spans
    * [cdOffset, eocd), every local record valid. */
  final case class ZipScan(entries: Vector[ZipEntry], declared: Long,
      clean: Boolean)

  private val LocalSig = 0x04034b50
  private val CentralSig = 0x02014b50
  private val EocdSig = 0x06054b50
  private val LocalFixed = 30
  private val CentralFixed = 46
  private val EocdFixed = 22

  private def le16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
  }
  private def le32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
    out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt)
  }

  private def jdkCrc(b: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32()
    c.update(b)
    c.getValue
  }

  /** Deterministic archive: per doc a STORED `docs/doc_<id>.txt`
    * member; every 17th doc's stored CRC is deliberately off by one
    * bit (synthetic corruption for the triage path — same stride as
    * [[TarFiles.synthTar]]'s broken checksums). */
  private[graft] def synthZip(docs: Seq[(Long, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val offsets = new Array[Long](docs.length)
    val names = docs.map { case (id, _) => s"docs/doc_$id.txt" }
    val crcs = docs.map { case (id, body) =>
      val c = jdkCrc(body)
      if (id % 17 == 0) c ^ 1L else c
    }
    docs.zipWithIndex.foreach { case ((_, body), i) =>
      offsets(i) = out.size.toLong
      val nb = names(i).getBytes(UTF_8)
      le32(out, LocalSig)
      le16(out, 20) // version needed: 2.0
      le16(out, 0) // general-purpose flags
      le16(out, 0) // method: STORED
      le16(out, 0); le16(out, 0) // mod time / date
      le32(out, crcs(i))
      le32(out, body.length.toLong) // compressed size (= raw: STORED)
      le32(out, body.length.toLong) // uncompressed size
      le16(out, nb.length)
      le16(out, 0) // extra length
      out.write(nb)
      out.write(body)
    }
    val cdOffset = out.size.toLong
    docs.zipWithIndex.foreach { case ((_, body), i) =>
      val nb = names(i).getBytes(UTF_8)
      le32(out, CentralSig)
      le16(out, 20) // version made by
      le16(out, 20) // version needed
      le16(out, 0) // flags
      le16(out, 0) // method
      le16(out, 0); le16(out, 0) // mod time / date
      le32(out, crcs(i))
      le32(out, body.length.toLong)
      le32(out, body.length.toLong)
      le16(out, nb.length)
      le16(out, 0) // extra length
      le16(out, 0) // comment length
      le16(out, 0) // disk number start
      le16(out, 0) // internal attrs
      le32(out, 0L) // external attrs
      le32(out, offsets(i))
      out.write(nb)
    }
    val cdSize = out.size.toLong - cdOffset
    le32(out, EocdSig)
    le16(out, 0); le16(out, 0) // this disk / cd disk
    le16(out, docs.length); le16(out, docs.length)
    le32(out, cdSize)
    le32(out, cdOffset)
    le16(out, 0) // comment length
    out.toByteArray
  }

  // hand-rolled CRC-32 (reflected poly 0xEDB88320) — deliberately NOT
  // java.util.zip.CRC32, so generator and parser cross-check
  private val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var n = 0
    while (n < 256) {
      var c = n
      var k = 0
      while (k < 8) {
        c = if ((c & 1) != 0) 0xedb88320 ^ (c >>> 1) else c >>> 1
        k += 1
      }
      t(n) = c
      n += 1
    }
    t
  }

  private[graft] def crc32(b: Array[Byte], off: Int, len: Int): Long = {
    var c = 0xffffffff
    var i = off
    val end = off + len
    while (i < end) {
      c = crcTable((c ^ b(i)) & 0xff) ^ (c >>> 8)
      i += 1
    }
    (~c).toLong & 0xffffffffL
  }

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xff).toLong | ((b(off + 1) & 0xff).toLong << 8) |
      ((b(off + 2) & 0xff).toLong << 16) |
      ((b(off + 3) & 0xff).toLong << 24))

  /** EOCD search: backward from the last possible position, accepting
    * a signature only where the declared comment length lands the
    * record exactly at end-of-input (the APPNOTE recovery rule — a
    * PK\5\6 byte pattern inside member data cannot satisfy it). */
  private def findEocd(b: Array[Byte]): Int = {
    var p = b.length - EocdFixed
    val floor = math.max(0, b.length - EocdFixed - 0xffff)
    while (p >= floor) {
      if (u32(b, p) == EocdSig &&
        p + EocdFixed + u16(b, p + 20) == b.length) return p
      p -= 1
    }
    -1
  }

  /** Total central-directory walk. Parses as many COMPLETE directory
    * entries as the bytes hold; never throws. Bad stored CRC ⇒ entry
    * kept, flagged, walk continues; bad signature / truncated name /
    * out-of-bounds local record ⇒ that entry (and the walk) stops,
    * keeping everything before it. */
  private[graft] def parseZip(b: Array[Byte]): ZipScan = {
    val eocd = findEocd(b)
    if (eocd < 0) return ZipScan(Vector.empty, 0L, clean = false)
    val declared = u16(b, eocd + 10).toLong
    val cdSize = u32(b, eocd + 12)
    val cdOffset = u32(b, eocd + 16)
    if (cdOffset + cdSize != eocd.toLong || cdOffset > b.length)
      return ZipScan(Vector.empty, declared, clean = false)
    val entries = Vector.newBuilder[ZipEntry]
    var walked = 0L
    var p = cdOffset.toInt
    var ok = true
    var n = 0L
    while (ok && n < declared && p + CentralFixed <= eocd &&
      u32(b, p) == CentralSig) {
      val crcStored = u32(b, p + 16)
      val size = u32(b, p + 20) // compressed == raw for STORED
      val rawSize = u32(b, p + 24)
      val nameLen = u16(b, p + 28)
      val extraLen = u16(b, p + 30)
      val commentLen = u16(b, p + 32)
      val localOff = u32(b, p + 42)
      val next = p + CentralFixed + nameLen + extraLen + commentLen
      if (next > eocd || size != rawSize) ok = false
      else {
        val name = new String(b, p + CentralFixed, nameLen, UTF_8)
        // validate the local record this entry points at
        val lo = localOff.toInt
        val localOk = localOff + LocalFixed <= b.length &&
          u32(b, lo) == LocalSig && u16(b, lo + 26) == nameLen &&
          u32(b, lo + 18) == size &&
          localOff + LocalFixed + nameLen + u16(b, lo + 28) + size <=
            b.length &&
          new String(b, lo + LocalFixed, nameLen, UTF_8) == name
        val crcOk = localOk && {
          val dataOff = lo + LocalFixed + nameLen + u16(b, lo + 28)
          crc32(b, dataOff, size.toInt) == crcStored
        }
        entries += ZipEntry(name, size, crcOk, localOk)
        if (!localOk) ok = false
        walked = next.toLong - cdOffset
        p = next
        n += 1
      }
    }
    ZipScan(entries.result(), declared,
      clean = ok && n == declared && walked == cdSize)
  }
}
