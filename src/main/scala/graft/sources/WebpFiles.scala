package graft.sources

import java.io.ByteArrayOutputStream
import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Deterministic WebP fixture for the multimodal triage family —
  * the FIFTH image codec (PNG/BMP/GIF/JPEG landed earlier; WebP is
  * the dominant *modern* web format a crawl actually serves): one
  * complete spec-valid lossless WebP (VP8L) per id, every other file
  * wrapped in the extended (VP8X) container layout. The VP8L stream
  * exploits the format's single-symbol Huffman codes: a solid-black
  * image needs ZERO bits per pixel (all five prefix codes collapse to
  * one symbol, whose code length is zero), so the whole file is
  * headers — byte-specified by construction, constant size, and any
  * libwebp-based viewer decodes it. Dimensions derive from the id by
  * fixed integer formulas, so the DuckDB oracle recomputes every
  * parsed field AND the exact file size from arithmetic — the
  * generator/parser proof the codec family runs on.
  *
  * Bit layout (VP8L is LSB-first): signature 0x2f; 14-bit (w−1);
  * 14-bit (h−1); 1 alpha bit; 3 version bits; then no transforms (1
  * zero bit), no color cache (1 zero bit), and five simple prefix
  * codes — green/red/blue/distance each `1,0,0,0` (simple, one
  * symbol, 1-bit symbol, symbol 0) and alpha `1,0,1,0xff` (8-bit
  * symbol 255) — after which every pixel costs zero bits.
  */
object WebpFiles {

  private val FixtureVersion = 1
  private[graft] val NWebp = 40

  /** Formula ground truth (the oracle restates these). */
  private[graft] def widthOf(id: Long): Int = (16 + (id * 11) % 1000).toInt
  private[graft] def heightOf(id: Long): Int = (16 + (id * 17) % 800).toInt

  /** Closed-form sizes: the VP8L payload is 9 bytes regardless of
    * dimensions (1 signature + 4 dim/meta bytes + 4 bytes holding the
    * 29 header-code bits), +1 RIFF odd-size pad; the simple file is
    * 30 bytes, the VP8X-wrapped one adds an 18-byte extended chunk. */
  private[graft] val SimpleBytes: Long = 30L
  private[graft] val ExtendedBytes: Long = 48L

  private def le24(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] = le24(v) :+ ((v >> 24) & 0xff).toByte

  /** LSB-first bit writer (the VP8L convention). */
  private final class BitWriter {
    private val out = new ByteArrayOutputStream()
    private var acc = 0
    private var nBits = 0
    def put(v: Int, bits: Int): Unit = {
      var i = 0
      while (i < bits) {
        acc |= ((v >> i) & 1) << nBits
        nBits += 1
        if (nBits == 8) { out.write(acc); acc = 0; nBits = 0 }
        i += 1
      }
    }
    def toBytes: Array[Byte] = {
      if (nBits > 0) { out.write(acc); acc = 0; nBits = 0 }
      out.toByteArray
    }
  }

  /** The 9-byte VP8L stream for a solid-black w×h image. */
  private[graft] def vp8lBytes(w: Int, h: Int): Array[Byte] = {
    val bw = new BitWriter
    bw.put(w - 1, 14); bw.put(h - 1, 14)
    bw.put(0, 1) // alpha_is_used
    bw.put(0, 3) // version
    bw.put(0, 1) // no transforms
    bw.put(0, 1) // no color cache
    // green/length, red, blue: simple code, one 1-bit symbol 0
    for (_ <- 0 until 3) { bw.put(1, 1); bw.put(0, 1); bw.put(0, 1); bw.put(0, 1) }
    // alpha: simple code, one 8-bit symbol 255 (opaque)
    bw.put(1, 1); bw.put(0, 1); bw.put(1, 1); bw.put(0xff, 8)
    // distance: simple code, one 1-bit symbol 0
    bw.put(1, 1); bw.put(0, 1); bw.put(0, 1); bw.put(0, 1)
    // zero bits per pixel follow — nothing to write
    Array(0x2f.toByte) ++ bw.toBytes
  }

  private def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
    val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    tag.getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body ++ pad
  }

  private[graft] def webpBytes(id: Long): Array[Byte] = {
    val (w, h) = (widthOf(id), heightOf(id))
    val vp8l = chunk("VP8L", vp8lBytes(w, h))
    val chunks =
      if (id % 2 == 0) vp8l
      else { // extended container: VP8X canvas header + the VP8L stream
        val vp8x = Array[Byte](0, 0, 0, 0) ++ // flags + reserved
          le24(w - 1L) ++ le24(h - 1L)
        chunk("VP8X", vp8x) ++ vp8l
      }
    val riff = "WEBP".getBytes("US-ASCII") ++ chunks
    "RIFF".getBytes("US-ASCII") ++ le32(riff.length.toLong) ++ riff
  }

  private[graft] def webpDir(spark: SparkSession, sfDir: String): String = {
    val dir = new File(
      s"${graft.etl.Medallion.warehouseBase}/${new File(sfDir).getName}" +
        s"/fixtures/webp_v$FixtureVersion")
    val done = new File(dir, "_FIXTURE_OK")
    if (!done.exists()) {
      dir.mkdirs()
      (0L until NWebp.toLong).foreach { id =>
        val b = webpBytes(id)
        val want = if (id % 2 == 0) SimpleBytes else ExtendedBytes
        require(b.length == want,
          s"fixture size drifted from the closed form for id=$id: ${b.length}")
        Files.write(Paths.get(dir.getPath, f"web_$id%05d.webp"), b)
      }
      Files.write(Paths.get(dir.getPath, "notes.txt"),
        "decoy: the pathGlobFilter must never read this".getBytes("UTF-8"))
      Files.write(done.toPath, Array.emptyByteArray)
    }
    dir.getAbsolutePath
  }
}
