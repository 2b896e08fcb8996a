package graft.sources

import java.io.ByteArrayOutputStream

/** Zstandard frame codec (RFC 8878) over RAW blocks — the modern
  * corpus compression beside [[GzipFiles]]' RFC 1952 (Common Crawl
  * and most new dataset dumps ship `.zst`). A zstd frame with
  * Raw-type blocks is fully valid zstd and needs no entropy coder,
  * which is exactly what makes the FRAME GRAMMAR — the part an
  * ingest engine owns — writable and walkable by hand:
  *
  * {{{
  *   magic 0xFD2FB528 (LE)
  *   frame header: descriptor byte (FCS size flag, single-segment,
  *                 checksum, dict-id bits) + frame content size
  *   blocks: 3-byte LE header (bit0 last, bits1-2 type, bits3+ size)
  *           + payload   (type 0 = raw bytes)
  * }}}
  *
  * plus SKIPPABLE frames (magic 0x184D2A5x + 4-byte size) that
  * carriers embed for framing metadata and a reader must step over.
  *
  * Triage semantics: a frame whose declared content size (FCS)
  * disagrees with the decoded raw-block total is RECORDED and the
  * walk continues (block headers still frame everything); a bad
  * magic, a reserved block type, or a truncated block stops the walk
  * cleanly. The parser never throws on any input.
  */
object ZstdFiles {

  /** One data frame: declared content size, decoded byte count,
    * whether they agree, block count. */
  final case class ZstdFrame(declared: Long, decoded: Long,
      fcsOk: Boolean, nBlocks: Long)
  /** data frames walked, skippable frames stepped over, unconsumed
    * trailing bytes, whether the walk consumed everything. */
  final case class ZstdScan(frames: Vector[ZstdFrame], skippable: Long,
      trailing: Int, clean: Boolean)

  private val Magic = 0xfd2fb528L
  private val SkippableMagicBase = 0x184d2a50L
  private[graft] val RawBlockMax = 100

  private def le32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
    out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt)
  }

  /** One single-segment data frame over raw blocks; `fcsBias` writes
    * a deliberately wrong content size (the triage channel). */
  private[graft] def dataFrame(body: Array[Byte], fcsBias: Long)
      : Array[Byte] = {
    val out = new ByteArrayOutputStream()
    le32(out, Magic)
    val fcs = body.length.toLong + fcsBias
    if (fcs < 256) {
      out.write(0x20) // single_segment, FCS-flag 0 ⇒ 1-byte FCS
      out.write(fcs.toInt)
    } else {
      out.write(0x60) // single_segment, FCS-flag 1 ⇒ 2-byte (value-256)
      val v = fcs - 256
      out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
    }
    val nBlocks = math.max(1, (body.length + RawBlockMax - 1) / RawBlockMax)
    var i = 0
    while (i < nBlocks) {
      val off = i * RawBlockMax
      val len = math.min(RawBlockMax, body.length - off)
      val last = if (i == nBlocks - 1) 1 else 0
      val hdr = last | (0 << 1) | (len << 3) // type 0 = raw
      out.write(hdr & 0xff); out.write((hdr >>> 8) & 0xff)
      out.write((hdr >>> 16) & 0xff)
      out.write(body, off, len)
      i += 1
    }
    out.toByteArray
  }

  /** Deterministic multi-frame stream: per doc one data frame
    * (FCS off by one on every 17th doc), preceded on every 5th doc
    * by a 4-byte skippable frame (nibble = id % 16). */
  private[graft] def synthZstd(docs: Seq[(Long, Array[Byte])])
      : Array[Byte] = {
    val out = new ByteArrayOutputStream()
    docs.foreach { case (id, body) =>
      if (id % 5 == 0) {
        le32(out, SkippableMagicBase | (id % 16))
        le32(out, 4L)
        le32(out, id & 0xffffffffL) // opaque payload
      }
      out.write(dataFrame(body, if (id % 17 == 0) 1L else 0L))
    }
    out.toByteArray
  }

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xff).toLong | ((b(off + 1) & 0xff).toLong << 8) |
      ((b(off + 2) & 0xff).toLong << 16) |
      ((b(off + 3) & 0xff).toLong << 24)

  /** Total frame walk — see the object doc for the triage rules. */
  private[graft] def parseZstd(b: Array[Byte]): ZstdScan = {
    val frames = Vector.newBuilder[ZstdFrame]
    var skippable = 0L
    var p = 0
    var stop = false
    while (!stop && p + 4 <= b.length) {
      val magic = u32(b, p)
      if ((magic & 0xfffffff0L) == SkippableMagicBase) {
        if (p + 8 > b.length) stop = true
        else {
          val sz = u32(b, p + 4)
          if (p + 8 + sz > b.length) stop = true
          else { skippable += 1; p += 8 + sz.toInt }
        }
      } else if (magic == Magic) {
        if (p + 5 > b.length) stop = true
        else {
          val fhd = b(p + 4) & 0xff
          val single = (fhd & 0x20) != 0
          val fcsFlag = fhd >>> 6
          // this walk owns the single-segment no-dict layout it
          // writes; windowed/dict frames stop the walk (triage to a
          // full decoder, don't misparse)
          if (!single || (fhd & 0x03) != 0 || fcsFlag > 1) stop = true
          else {
            var q = p + 5
            var declared = -1L
            if (fcsFlag == 0) {
              if (q + 1 > b.length) stop = true
              else { declared = b(q) & 0xffL; q += 1 }
            } else {
              if (q + 2 > b.length) stop = true
              else {
                declared = ((b(q) & 0xffL) | ((b(q + 1) & 0xffL) << 8)) + 256
                q += 2
              }
            }
            if (!stop) {
              var decoded = 0L
              var nBlocks = 0L
              var last = false
              var blockOk = true
              while (!last && blockOk) {
                if (q + 3 > b.length) blockOk = false
                else {
                  val hdr = (b(q) & 0xff) | ((b(q + 1) & 0xff) << 8) |
                    ((b(q + 2) & 0xff) << 16)
                  last = (hdr & 1) != 0
                  val btype = (hdr >>> 1) & 3
                  val len = hdr >>> 3
                  // only Raw blocks in this layout; RLE/compressed/
                  // reserved triage to a full decoder
                  if (btype != 0 || q + 3 + len > b.length) blockOk = false
                  else {
                    decoded += len
                    nBlocks += 1
                    q += 3 + len
                  }
                }
              }
              if (!blockOk) stop = true
              else {
                frames += ZstdFrame(declared, decoded,
                  fcsOk = declared == decoded, nBlocks)
                p = q
              }
            }
          }
        }
      } else stop = true // unknown magic: untrusted framing
    }
    ZstdScan(frames.result(), skippable, b.length - p,
      clean = p == b.length)
  }
}
