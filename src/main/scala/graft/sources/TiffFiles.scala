package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

/** TIFF/EXIF IFD codec — the metadata grammar image pipelines must
  * read BEFORE touching pixels: EXIF Orientation decides whether a
  * resize pass rotates, and Width/Length gate the aspect buckets.
  * TIFF is the one mainstream format with BOTH byte orders in the
  * wild (`II` little, `MM` big — Canon writes II, some Nikons MM),
  * and the classic parser bug lives in the 12-byte IFD entry: a
  * SHORT (type 3) value is packed into the 4-byte value field
  * LEFT-JUSTIFIED IN FILE ORDER, so big-endian files carry it in the
  * HIGH bytes — a reader that u32s the field and truncates reads 0.
  * This codec pair puts exactly that gotcha under the driver hash.
  *
  * Grammar: 8-byte header (order mark, magic 42, IFD0 offset); each
  * IFD = u16 entry count + 12-byte entries (tag, type, count,
  * value-or-offset) + u32 next-IFD offset. Values wider than 4 bytes
  * (the ASCII Make tag here) live at an offset.
  *
  * Triage: an entry with an unexpected TYPE for a known tag is
  * RECORDED and the walk continues (one bad entry costs one field);
  * a bad order mark / magic / out-of-bounds IFD stops the parse
  * cleanly (unknown byte order poisons every read after it). The
  * parser never throws on any input.
  */
object TiffFiles {

  final case class TiffMeta(bigEndian: Boolean, width: Long, height: Long,
      orientation: Long, make: String, nEntries: Long, nBadType: Long,
      ok: Boolean)

  private val TagWidth = 0x0100
  private val TagHeight = 0x0101
  private val TagMake = 0x010f
  private val TagOrientation = 0x0112
  private val TypeShort = 3
  private val TypeLong = 4
  private val TypeAscii = 2

  /** Formula ground truth (the oracle restates these). */
  private[graft] def widthOf(id: Long): Long = 320 + (id * 13) % 480
  private[graft] def heightOf(id: Long): Long = 240 + (id * 7) % 360
  private[graft] def orientOf(id: Long): Long = 1 + id % 8
  private[graft] def makeOf(id: Long): String = s"graftcam-${id % 5}"

  private def w16(out: ByteArrayOutputStream, v: Int, be: Boolean): Unit =
    if (be) { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    else { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }

  private def w32(out: ByteArrayOutputStream, v: Long, be: Boolean): Unit =
    if (be) {
      out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
      out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    } else {
      out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
      out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt)
    }

  /** A SHORT packed into the 4-byte value field: left-justified in
    * FILE byte order — the gotcha. */
  private def shortField(out: ByteArrayOutputStream, v: Int,
      be: Boolean): Unit = {
    w16(out, v, be)
    w16(out, 0, be)
  }

  /** One minimal TIFF: header, IFD0 with Width (LONG), Height
    * (SHORT — exercises the packing rule), Make (ASCII at an
    * offset), Orientation (SHORT; every 17th id written with a WRONG
    * type — the triage channel), then the Make bytes. Byte order
    * alternates with id parity. */
  private[graft] def synthTiff(id: Long): Array[Byte] = {
    val be = id % 2 == 1
    val make = makeOf(id).getBytes(US_ASCII) :+ 0.toByte
    val out = new ByteArrayOutputStream()
    if (be) { out.write('M'); out.write('M') }
    else { out.write('I'); out.write('I') }
    w16(out, 42, be)
    w32(out, 8L, be) // IFD0 directly after the header
    val nEntries = 4
    // offset of the out-of-line Make bytes: header(8) + count(2) +
    // entries(4*12) + next-IFD(4)
    val makeOff = 8 + 2 + nEntries * 12 + 4
    w16(out, nEntries, be)
    // entries must be ascending by tag per spec
    w16(out, TagWidth, be); w16(out, TypeLong, be)
    w32(out, 1L, be); w32(out, widthOf(id), be)
    w16(out, TagHeight, be); w16(out, TypeShort, be)
    w32(out, 1L, be); shortField(out, heightOf(id).toInt, be)
    w16(out, TagMake, be); w16(out, TypeAscii, be)
    w32(out, make.length.toLong, be); w32(out, makeOff.toLong, be)
    w16(out, TagOrientation, be)
    w16(out, if (id % 17 == 0) TypeLong + 7 else TypeShort, be) // triage
    w32(out, 1L, be); shortField(out, orientOf(id).toInt, be)
    w32(out, 0L, be) // no next IFD
    out.write(make)
    out.toByteArray
  }

  private def u16(b: Array[Byte], o: Int, be: Boolean): Int =
    if (be) ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    else (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], o: Int, be: Boolean): Long =
    if (be) ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    else (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Total IFD walk — see the object doc for the triage rules. */
  private[graft] def parseTiff(b: Array[Byte]): TiffMeta = {
    val bad = TiffMeta(bigEndian = false, -1, -1, -1, "", 0, 0, ok = false)
    if (b.length < 8) return bad
    val be =
      if (b(0) == 'M' && b(1) == 'M') true
      else if (b(0) == 'I' && b(1) == 'I') false
      else return bad
    if (u16(b, 2, be) != 42) return bad
    val ifd = u32(b, 4, be)
    if (ifd + 2 > b.length) return bad.copy(bigEndian = be)
    var width = -1L
    var height = -1L
    var orient = -1L
    var make = ""
    var nBad = 0L
    val n = u16(b, ifd.toInt, be)
    var i = 0
    var ok = true
    while (ok && i < n) {
      val e = ifd.toInt + 2 + i * 12
      if (e + 12 > b.length) ok = false
      else {
        val tag = u16(b, e, be)
        val typ = u16(b, e + 2, be)
        val cnt = u32(b, e + 4, be)
        // a SHORT rides the value field left-justified in file order;
        // a LONG fills it; ASCII beyond 4 bytes lives at an offset
        def shortVal: Long = u16(b, e + 8, be).toLong
        def longVal: Long = u32(b, e + 8, be)
        tag match {
          case TagWidth =>
            if (typ == TypeLong) width = longVal
            else if (typ == TypeShort) width = shortVal
            else nBad += 1
          case TagHeight =>
            if (typ == TypeLong) height = longVal
            else if (typ == TypeShort) height = shortVal
            else nBad += 1
          case TagOrientation =>
            if (typ == TypeShort) orient = shortVal
            else nBad += 1 // the planted wrong-type channel
          case TagMake =>
            if (typ == TypeAscii && cnt >= 1) {
              val off = if (cnt <= 4) e + 8 else longVal.toInt
              if (off >= 0 && off + cnt <= b.length)
                make = new String(b, off, cnt.toInt - 1, US_ASCII)
              else nBad += 1
            } else nBad += 1
          case _ => () // unknown tags are fine: skip
        }
        i += 1
      }
    }
    TiffMeta(be, width, height, orient, make, n.toLong, nBad, ok)
  }
}
