package graft.sources

import java.io.File
import java.nio.file.{Files, Paths}
import java.util.zip.{Adler32, CRC32}

import org.apache.spark.sql.SparkSession

/** Deterministic image-file fixture for the multimodal header-decode
  * operator ([[graft.ops.MultimodalOps.imageMeta]]): one REAL image
  * file per id — even ids a complete, spec-valid PNG (signature +
  * IHDR + stored-deflate IDAT + IEND, CRCs and Adler32 included; any
  * viewer opens it as a black truecolor image), odd ids a complete
  * 24 bpp `BI_RGB` BMP — with dimensions derived from the id by fixed
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

  private val FixtureVersion = 1
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

  /** Fixture dir: `img_NNNNN.png`/`.bmp` per id < [[NImages]] plus a
    * decoy the glob filter must skip. */
  private[graft] def imagesDir(spark: SparkSession, sfDir: String): String = {
    val dir = new File(
      s"${graft.etl.Medallion.warehouseBase}/${new File(sfDir).getName}" +
        s"/fixtures/img_v$FixtureVersion")
    val done = new File(dir, "_FIXTURE_OK")
    if (!done.exists()) {
      dir.mkdirs()
      (0L until NImages.toLong).foreach { id =>
        val (w, h) = (widthOf(id), heightOf(id))
        if (id % 2 == 0)
          Files.write(Paths.get(dir.getPath, f"img_$id%05d.png"), pngBytes(w, h))
        else
          Files.write(Paths.get(dir.getPath, f"img_$id%05d.bmp"), bmpBytes(w, h))
      }
      Files.write(Paths.get(dir.getPath, "notes.txt"),
        "decoy: the pathGlobFilter must never read this".getBytes("UTF-8"))
      Files.write(done.toPath, Array.emptyByteArray)
    }
    dir.getAbsolutePath
  }
}
