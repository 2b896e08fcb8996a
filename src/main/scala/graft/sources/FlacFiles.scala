package graft.sources

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Deterministic FLAC fixture for the multimodal triage family — the
  * SECOND audio codec (WAV landed in round 6; FLAC is the dominant
  * lossless archival format an audio corpus actually stores): one
  * metadata-complete FLAC per id — `fLaC` magic, a STREAMINFO block
  * (the 34-byte bit-packed header every FLAC tool reads first), and
  * for every other id a PADDING block so the metadata WALK (not just
  * a fixed-offset read) is exercised. Frames are elided — the triage
  * contract stops at metadata, exactly as [[graft.ops.MultimodalOps]]
  * stops at the WAV/MP4 headers — so the file is 100% headers and
  * byte-specified by construction. Every parsed field AND the exact
  * file size derive from the id by integer formulas the DuckDB oracle
  * restates — the generator/parser proof the codec family runs on.
  *
  * STREAMINFO layout (all BIG-endian, unlike RIFF): u16 min/max block
  * size, u24 min/max frame size, then ONE 64-bit field packing sample
  * rate (20 bits), channels−1 (3), bits-per-sample−1 (5), total
  * samples (36), then a 16-byte MD5 (zeroed here — unverifiable
  * without frames, and the parser must not interpret it).
  */
object FlacFiles {

  private val FixtureVersion = 1
  private[graft] val NFlac = 40

  /** Formula ground truth (the oracle restates these). */
  private[graft] val Rates = Array(8000, 16000, 22050, 32000, 44100, 48000)
  private[graft] def rateOf(id: Long): Int = Rates((id % 6).toInt)
  private[graft] def channelsOf(id: Long): Int = (1 + id % 4).toInt
  private[graft] def bitsOf(id: Long): Int = (16 + 8 * (id % 2)).toInt
  private[graft] def samplesOf(id: Long): Long = 10000 + (id * 997) % 100000
  private[graft] def minFrameOf(id: Long): Int = (100 + (id * 7) % 900).toInt
  private[graft] def maxFrameOf(id: Long): Int =
    minFrameOf(id) + ((id * 3) % 50).toInt
  private[graft] def padLenOf(id: Long): Int = ((id * 13) % 64).toInt
  private val BlockSize = 4096 // fixed-blocksize stream: min == max

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be24(v: Int): Array[Byte] =
    Array(((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      (v & 0xff).toByte)

  private[graft] def flacBytes(id: Long): Array[Byte] = {
    val packed = // sr(20) | ch-1(3) | bps-1(5) | totalSamples(36)
      (rateOf(id).toLong << 44) | ((channelsOf(id) - 1L) << 41) |
        ((bitsOf(id) - 1L) << 36) | samplesOf(id)
    val packedBytes =
      (0 until 8).map(i => ((packed >>> (56 - 8 * i)) & 0xff).toByte).toArray
    val streaminfo =
      be16(BlockSize) ++ be16(BlockSize) ++
        be24(minFrameOf(id)) ++ be24(maxFrameOf(id)) ++
        packedBytes ++ new Array[Byte](16) // MD5 zeroed (frames elided)
    val hasPad = id % 2 == 1
    val siHeader = // type 0, last unless a PADDING block follows
      Array((if (hasPad) 0x00 else 0x80).toByte) ++ be24(streaminfo.length)
    val pad =
      if (!hasPad) Array.empty[Byte]
      else Array(0x81.toByte) ++ be24(padLenOf(id)) ++ // type 1, last
        new Array[Byte](padLenOf(id))
    "fLaC".getBytes("US-ASCII") ++ siHeader ++ streaminfo ++ pad
  }

  /** Closed-form total size: 4 magic + 4+34 STREAMINFO (+ 4+padLen
    * on odd ids). */
  private[graft] def sizeOf(id: Long): Long =
    42L + (if (id % 2 == 1) 4L + padLenOf(id) else 0L)

  private[graft] def flacDir(spark: SparkSession, sfDir: String): String = {
    val dir = new File(
      s"${graft.etl.Medallion.warehouseBase}/${new File(sfDir).getName}" +
        s"/fixtures/flac_v$FixtureVersion")
    val done = new File(dir, "_FIXTURE_OK")
    if (!done.exists()) {
      dir.mkdirs()
      (0L until NFlac.toLong).foreach { id =>
        val b = flacBytes(id)
        require(b.length == sizeOf(id),
          s"fixture size drifted from the closed form for id=$id: ${b.length}")
        Files.write(Paths.get(dir.getPath, f"track_$id%05d.flac"), b)
      }
      Files.write(Paths.get(dir.getPath, "notes.txt"),
        "decoy: the pathGlobFilter must never read this".getBytes("UTF-8"))
      Files.write(done.toPath, Array.emptyByteArray)
    }
    dir.getAbsolutePath
  }
}
