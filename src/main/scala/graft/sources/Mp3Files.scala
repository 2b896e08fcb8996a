package graft.sources

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Deterministic MP3 fixture for the multimodal triage family — the
  * THIRD audio codec (WAV = raw PCM, FLAC = lossless archive, MP3 =
  * the lossy format a web crawl actually serves): one MPEG-1 Layer
  * III stream per id, `3 + id % 5` identical frames whose headers are
  * byte-specified by the public header layout (11-bit sync, version,
  * layer, bitrate index, sample-rate index, padding), every 4th file
  * prefixed by an ID3v2 tag (10-byte header + syncsafe u28 length)
  * the parser must SKIP — the real-world wrinkle that distinguishes a
  * frame WALK from a magic check. Frame payloads are zero bytes
  * (spec-silent audio is irrelevant to triage; the walk never reads
  * them), so every field AND the exact file size derive from the id
  * by integer formulas the DuckDB oracle restates.
  *
  * MPEG-1 Layer III frame length (public formula): 144 · bitrate /
  * sample_rate + padding bytes, bitrate in bit/s — integer
  * floor-division both engines share.
  */
object Mp3Files {

  private val FixtureVersion = 1
  private[graft] val NMp3 = 40

  /** MPEG-1 Layer III bitrate table, kbit/s, index 1-14 (0 = free
    * format, 15 = invalid — both classify unknown in the parser). */
  private[graft] val BitrateKbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sample-rate table, index 0-2 (3 = invalid). */
  private[graft] val SampleRates: Array[Int] = Array(44100, 48000, 32000)

  /** Formula ground truth (the oracle restates these). */
  private[graft] def bitrateIdxOf(id: Long): Int = (1 + id % 14).toInt
  private[graft] def srIdxOf(id: Long): Int = (id % 3).toInt
  private[graft] def framesOf(id: Long): Int = (3 + id % 5).toInt
  private[graft] def hasId3(id: Long): Boolean = id % 4 == 0
  private[graft] def id3LenOf(id: Long): Int = (20 + (id * 3) % 40).toInt

  private[graft] def frameLenOf(id: Long): Int =
    144000 * BitrateKbps(bitrateIdxOf(id)) / SampleRates(srIdxOf(id))

  private[graft] def sizeOf(id: Long): Long =
    (if (hasId3(id)) 10L + id3LenOf(id) else 0L) +
      framesOf(id).toLong * frameLenOf(id)

  private[graft] def mp3Bytes(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (hasId3(id)) {
      val len = id3LenOf(id)
      out.write("ID3".getBytes("US-ASCII"))
      out.write(3); out.write(0) // v2.3
      out.write(0) // flags
      // syncsafe u28: 7 bits per byte, high bit clear
      out.write((len >> 21) & 0x7f); out.write((len >> 14) & 0x7f)
      out.write((len >> 7) & 0x7f); out.write(len & 0x7f)
      out.write(new Array[Byte](len))
    }
    val header = Array[Byte](
      0xff.toByte, 0xfb.toByte, // sync + MPEG1 + Layer III + no CRC
      ((bitrateIdxOf(id) << 4) | (srIdxOf(id) << 2)).toByte, // no padding
      0x00) // stereo, no emphasis
    val frame = new Array[Byte](frameLenOf(id))
    System.arraycopy(header, 0, frame, 0, 4)
    (0 until framesOf(id)).foreach(_ => out.write(frame))
    out.toByteArray
  }

  private[graft] def mp3Dir(spark: SparkSession, sfDir: String): String = {
    val dir = new File(
      s"${graft.etl.Medallion.warehouseBase}/${new File(sfDir).getName}" +
        s"/fixtures/mp3_v$FixtureVersion")
    val done = new File(dir, "_FIXTURE_OK")
    if (!done.exists()) {
      dir.mkdirs()
      (0L until NMp3.toLong).foreach { id =>
        val b = mp3Bytes(id)
        require(b.length == sizeOf(id),
          s"fixture size drifted from the closed form for id=$id: ${b.length}")
        Files.write(Paths.get(dir.getPath, f"song_$id%05d.mp3"), b)
      }
      Files.write(Paths.get(dir.getPath, "notes.txt"),
        "decoy: the pathGlobFilter must never read this".getBytes("UTF-8"))
      Files.write(done.toPath, Array.emptyByteArray)
    }
    dir.getAbsolutePath
  }
}
