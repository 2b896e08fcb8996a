package graft.sources

import java.io.File
import java.nio.file.{Files, Paths}
import java.util.zip.{Adler32, CRC32}

import org.apache.spark.sql.SparkSession

/** Deterministic image-file fixture for the multimodal header-decode
  * operator ([[graft.ops.MultimodalOps.imageMeta]]): one REAL image
  * file per id, format cycling by id mod 4 — a complete, spec-valid
  * PNG (signature + IHDR + stored-deflate IDAT + IEND, CRCs and
  * Adler32 included; any viewer opens it as a black truecolor image),
  * a complete 24 bpp `BI_RGB` BMP, a complete GIF89a, or a complete
  * baseline JFIF JPEG — with dimensions derived from the id by fixed
  * integer formulas. Because every byte is specified by construction
  * (stored-mode zlib blocks are hand-emitted, never delegated to a
  * library's block-segmentation heuristics), the DuckDB oracle can
  * recompute not just width/height/format but the exact FILE SIZE
  * from the same formulas — so the binaryFile scan, the glob prune,
  * and the header parse are all verified end-to-end against
  * arithmetic, the `q_binaryfile_scan` pattern
  * (reference context: `dags/mitma/fetch_url_mitma.py:18-63` fetches
  * opaque files; this is the decode-side counterpart the reference
  * never needed because its corpus is tabular).
  *
  * Build-once per SF (marker file), driver-side like the CSV and
  * shapefile fixtures: a pay-once fixture build, not query path.
  */
object ImageFiles {

  private val FixtureVersion = 3
  private[graft] val NImages = 48

  /** Dimension formulas — the oracle's ground truth. */
  private[graft] def widthOf(id: Long): Int = (16 + (id * 7) % 240).toInt
  private[graft] def heightOf(id: Long): Int = (16 + (id * 13) % 180).toInt

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def pngChunk(tag: String, body: Array[Byte]): Array[Byte] = {
    val tagB = tag.getBytes("US-ASCII")
    val crc = new CRC32
    crc.update(tagB)
    crc.update(body)
    be32(body.length.toLong) ++ tagB ++ body ++ be32(crc.getValue)
  }

  /** zlib stream in STORED mode with hand-emitted ≤65535-byte blocks:
    * size = 2 (header) + 5·⌈len/65535⌉ (block headers) + len + 4
    * (Adler32) — the formula the oracle uses. */
  private def zlibStored(data: Array[Byte]): Array[Byte] = {
    val nBlocks = (data.length + 65534) / 65535
    val out = new Array[Byte](2 + 5 * nBlocks + data.length + 4)
    out(0) = 0x78.toByte; out(1) = 0x01.toByte
    var src = 0
    var dst = 2
    while (src < data.length) {
      val len = math.min(65535, data.length - src)
      out(dst) = if (src + len >= data.length) 1 else 0
      out(dst + 1) = (len & 0xff).toByte
      out(dst + 2) = ((len >> 8) & 0xff).toByte
      out(dst + 3) = (~len & 0xff).toByte
      out(dst + 4) = ((~len >> 8) & 0xff).toByte
      System.arraycopy(data, src, out, dst + 5, len)
      src += len
      dst += 5 + len
    }
    val ad = new Adler32
    ad.update(data)
    System.arraycopy(be32(ad.getValue), 0, out, out.length - 4, 4)
    out
  }

  /** Complete truecolor PNG (bit depth 8, color type 2), black pixels,
    * filter byte 0 per row. Size = 8 + 25 + (12 + idat) + 12 with
    * idat = 6 + 5·⌈raw/65535⌉ + raw, raw = h·(1 + 3w). */
  private[graft] def pngBytes(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    val ihdr = be32(w.toLong) ++ be32(h.toLong) ++
      Array[Byte](8, 2, 0, 0, 0) // depth 8, truecolor, deflate, none, none
    val raw = new Array[Byte](h * (1 + 3 * w)) // zero = filter 0 + black
    sig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", zlibStored(raw)) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** Complete bottom-up 24 bpp BI_RGB BMP, black pixels.
    * Size = 54 + h·rowSize, rowSize = ⌈3w/4⌉·4. */
  private[graft] def bmpBytes(w: Int, h: Int): Array[Byte] = {
    val rowSize = ((3 * w + 3) / 4) * 4
    val fileSize = 54 + h * rowSize
    val out = new Array[Byte](fileSize) // pixel area stays zeroed
    val header =
      Array[Byte]('B', 'M') ++ le32(fileSize.toLong) ++ le32(0L) ++
        le32(54L) ++ // pixel-data offset
        le32(40L) ++ le32(w.toLong) ++ le32(h.toLong) ++
        le16(1) ++ le16(24) ++ // planes, bpp
        le32(0L) ++ le32(0L) ++ // BI_RGB, sizeImage (0 valid for BI_RGB)
        le32(0L) ++ le32(0L) ++ le32(0L) ++ le32(0L) // ppm + palette
    System.arraycopy(header, 0, out, 0, 54)
    out
  }

  /** Complete GIF89a: 2-entry global color table, every pixel index 0,
    * and an LZW stream that interleaves a CLEAR code before every pixel
    * code — the clear resets the decoder's table each step, so the code
    * width is pinned at minCodeSize+1 = 3 bits for the whole stream
    * (decoder-valid, maximally naive — the GIF twin of the PNG's
    * stored-mode zlib). LSB-first bit packing per the spec; data bytes
    * wrap in ≤255-byte sub-blocks.
    * Size = 32 + data + ⌈data/255⌉, data = ⌈3·(2wh+1)/8⌉
    * (32 = 6 header + 7 LSD + 6 GCT + 10 image descriptor +
    * 1 minCodeSize + 1 block terminator + 1 trailer). */
  private[graft] def gifBytes(w: Int, h: Int): Array[Byte] = {
    val n = w.toLong * h
    val totalBits = 3L * (2 * n + 1) // (CC, idx0) per pixel + EOI
    val dataLen = ((totalBits + 7) / 8).toInt
    val data = new Array[Byte](dataLen)
    var bit = 0L
    def put3(code: Int): Unit = {
      var i = 0
      while (i < 3) {
        if (((code >> i) & 1) != 0) {
          val at = (bit >> 3).toInt
          data(at) = (data(at) | (1 << (bit & 7).toInt)).toByte
        }
        bit += 1; i += 1
      }
    }
    var p = 0L
    while (p < n) { put3(4); put3(0); p += 1 } // clear, pixel
    put3(5) // end-of-information
    val out = new java.io.ByteArrayOutputStream(dataLen + 64)
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(le16(w)); out.write(le16(h))
    out.write(0x80); out.write(0); out.write(0) // GCT(2 entries), bg, aspect
    out.write(Array[Byte](0, 0, 0, -1, -1, -1)) // palette: black, white
    out.write(0x2c); out.write(le16(0)); out.write(le16(0))
    out.write(le16(w)); out.write(le16(h)); out.write(0) // image descriptor
    out.write(2) // LZW min code size
    var off = 0
    while (off < dataLen) {
      val len = math.min(255, dataLen - off)
      out.write(len)
      out.write(data, off, len)
      off += len
    }
    out.write(0); out.write(0x3b) // block terminator, trailer
    out.toByteArray
  }

  /** Complete baseline-sequential JFIF (ITU T.81), grayscale, flat
    * mid-gray: one 8-bit component with 1×1 sampling, an all-ones
    * quantization table, and MINIMAL custom Huffman tables — one
    * length-1 code each (DC: symbol 0 = "difference category 0"; AC:
    * symbol 0x00 = EOB) — so every 8×8 block encodes as exactly two
    * zero BITS ("0" DC-no-change + "0" EOB) and the entropy stream is
    * closed-form: ⌈2·blocks/8⌉ bytes, zero everywhere except the
    * final byte's 1-bit padding (T.81 F.1.2.3). No byte stuffing can
    * occur (a stuffed 0xFF needs eight 1-bits; the stream has at most
    * the trailing 7). Decoded, DC = 0 ⇒ flat block of 0 + 128 level
    * shift = mid-gray 0x808080 — the ImageIO round-trip spec proves
    * the stream is a real decodable image, the [[gifBytes]]
    * discipline. Size = 158 + ⌈blocks/4⌉ with
    * blocks = ⌈w/8⌉·⌈h/8⌉ (158 = SOI 2 + APP0 18 + DQT 69 + SOF0 13 +
    * 2 DHT · 22 + SOS 10 + EOI 2). */
  private[graft] def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(256)
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) } // JPEG fields are BE
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xe0); u16(16) // APP0/JFIF
    out.write("JFIF".getBytes("US-ASCII")); u8(0)
    u8(1); u8(1) // version 1.1
    u8(0); u16(1); u16(1) // aspect-ratio units, 1:1 density
    u8(0); u8(0) // no thumbnail
    marker(0xdb); u16(67); u8(0x00) // DQT: 8-bit table 0…
    var i = 0
    while (i < 64) { u8(1); i += 1 } // …all ones (identity-ish)
    marker(0xc0); u16(11) // SOF0: baseline DCT
    u8(8); u16(h); u16(w); u8(1) // 8-bit precision, dims, 1 component
    u8(1); u8(0x11); u8(0) // component 1, 1x1 sampling, qtable 0
    def dht(classId: Int): Unit = { // one length-1 code -> symbol 0
      marker(0xc4); u16(20); u8(classId)
      u8(1); (2 to 16).foreach(_ => u8(0)); u8(0)
    }
    dht(0x00) // DC table 0
    dht(0x10) // AC table 0
    marker(0xda); u16(8) // SOS
    u8(1); u8(1); u8(0x00) // 1 component, id 1, DC/AC table 0
    u8(0); u8(63); u8(0) // full spectral range, no approximation
    val blocks = ((w + 7) / 8) * ((h + 7) / 8)
    val totalBits = 2L * blocks
    val nBytes = ((totalBits + 7) / 8).toInt
    val pad = (nBytes * 8 - totalBits).toInt
    i = 0
    while (i < nBytes - 1) { u8(0); i += 1 }
    if (nBytes > 0) u8((1 << pad) - 1) // data bits 0, padding bits 1
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Fixture dir: `img_NNNNN.png`/`.bmp`/`.gif`/`.jpg` per id <
    * [[NImages]] (format = id mod 4) plus a decoy the glob filter must
    * skip. */
  private[graft] def imagesDir(spark: SparkSession, sfDir: String): String = {
    val dir = new File(
      s"${graft.etl.Medallion.warehouseBase}/${new File(sfDir).getName}" +
        s"/fixtures/img_v$FixtureVersion")
    val done = new File(dir, "_FIXTURE_OK")
    if (!done.exists()) {
      dir.mkdirs()
      (0L until NImages.toLong).foreach { id =>
        val (w, h) = (widthOf(id), heightOf(id))
        id % 4 match {
          case 0 => Files.write(
            Paths.get(dir.getPath, f"img_$id%05d.png"), pngBytes(w, h))
          case 1 => Files.write(
            Paths.get(dir.getPath, f"img_$id%05d.bmp"), bmpBytes(w, h))
          case 2 => Files.write(
            Paths.get(dir.getPath, f"img_$id%05d.gif"), gifBytes(w, h))
          case _ => Files.write(
            Paths.get(dir.getPath, f"img_$id%05d.jpg"), jpegBytes(w, h))
        }
      }
      Files.write(Paths.get(dir.getPath, "notes.txt"),
        "decoy: the pathGlobFilter must never read this".getBytes("UTF-8"))
      Files.write(done.toPath, Array.emptyByteArray)
    }
    dir.getAbsolutePath
  }
}
