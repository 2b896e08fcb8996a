package graft.sources

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Deterministic audio-file fixture for the multimodal header-decode
  * family ([[graft.ops.MultimodalOps.audioMeta]] — the audio sibling
  * of [[ImageFiles]]): one complete canonical PCM WAV per id (44-byte
  * RIFF/fmt/data header + silence), with sample rate, channel count
  * and sample count derived from the id by fixed integer formulas, so
  * the DuckDB oracle recomputes every parsed field AND the exact file
  * size from arithmetic. 16-bit PCM only — the canonical layout whose
  * chunk offsets are fixed, which is precisely what makes a
  * header-triage operator oracle-checkable byte-for-byte.
  */
object AudioFiles {

  private val FixtureVersion = 1
  private[graft] val NClips = 40

  /** Formula ground truth (the oracle restates these). */
  private[graft] def sampleRateOf(id: Long): Int = (8000 * (1 + id % 3)).toInt
  private[graft] def channelsOf(id: Long): Int = (1 + id % 2).toInt
  private[graft] def samplesOf(id: Long): Int = (500 + (id * 37) % 2000).toInt
  private val BitsPerSample = 16

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Canonical 44-byte-header PCM WAV, zero (silent) samples.
    * Size = 44 + n_samples·channels·2. */
  private[graft] def wavBytes(sr: Int, ch: Int, nSamples: Int): Array[Byte] = {
    val dataLen = nSamples * ch * (BitsPerSample / 8)
    val out = new Array[Byte](44 + dataLen) // sample area stays zeroed
    val header =
      "RIFF".getBytes("US-ASCII") ++ le32(36L + dataLen) ++
        "WAVE".getBytes("US-ASCII") ++
        "fmt ".getBytes("US-ASCII") ++ le32(16L) ++
        le16(1) ++ le16(ch) ++ le32(sr.toLong) ++ // PCM, channels, rate
        le32(sr.toLong * ch * (BitsPerSample / 8)) ++ // byte rate
        le16(ch * (BitsPerSample / 8)) ++ le16(BitsPerSample) ++
        "data".getBytes("US-ASCII") ++ le32(dataLen.toLong)
    System.arraycopy(header, 0, out, 0, 44)
    out
  }

  // ------------------------------------------------- VAD fixture
  /** Speech-shaped fixture for the voice-activity operator
    * ([[graft.ops.MultimodalOps.vadSegments]]): mono 8 kHz PCM whose
    * SAMPLES carry a planted burst/gap pattern — [[vadCycles]] cycles
    * of [[vadBurstFrames]] 10 ms frames at amplitude [[vadAmp]]
    * (sign-alternating square so the signal has no DC bias) followed
    * by [[vadGapFrames]] frames of silence — all integer formulas of
    * the clip id, so every segment boundary the detector finds is
    * recomputable by the oracle in closed form. Unlike the v1 header
    * fixture above (silent payload), these files exist to prove the
    * SAMPLE decode. */
  private[graft] val VadFrameSamples = 80 // 10 ms at 8 kHz
  private[graft] def vadBurstFrames(id: Long): Int = (2 + id % 4).toInt
  private[graft] def vadGapFrames(id: Long): Int = (1 + id % 3).toInt
  private[graft] def vadCycles(id: Long): Int = (3 + id % 5).toInt
  private[graft] def vadAmp(id: Long): Int = (4000 + 100 * (id % 7)).toInt

  private[graft] def vadWavBytes(id: Long): Array[Byte] = {
    val frames = vadCycles(id) * (vadBurstFrames(id) + vadGapFrames(id))
    val n = frames * VadFrameSamples
    val out = wavBytes(8000, 1, n)
    val amp = vadAmp(id)
    val period = (vadBurstFrames(id) + vadGapFrames(id)) * VadFrameSamples
    val burstLen = vadBurstFrames(id) * VadFrameSamples
    var i = 0
    while (i < n) {
      if (i % period < burstLen) {
        val v = if (i % 2 == 0) amp else -amp
        out(44 + 2 * i) = (v & 0xff).toByte
        out(44 + 2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      i += 1
    }
    out
  }

  private[graft] def vadClipsDir(spark: SparkSession, sfDir: String)
      : String = {
    val dir = new File(
      s"${graft.etl.Medallion.warehouseBase}/${new File(sfDir).getName}" +
        s"/fixtures/wav_vad_v$FixtureVersion")
    val done = new File(dir, "_FIXTURE_OK")
    if (!done.exists()) {
      dir.mkdirs()
      (0L until NClips.toLong).foreach { id =>
        Files.write(Paths.get(dir.getPath, f"clip_$id%05d.wav"),
          vadWavBytes(id))
      }
      Files.write(done.toPath, Array.emptyByteArray)
    }
    dir.getAbsolutePath
  }

  private[graft] def clipsDir(spark: SparkSession, sfDir: String): String = {
    val dir = new File(
      s"${graft.etl.Medallion.warehouseBase}/${new File(sfDir).getName}" +
        s"/fixtures/wav_v$FixtureVersion")
    val done = new File(dir, "_FIXTURE_OK")
    if (!done.exists()) {
      dir.mkdirs()
      (0L until NClips.toLong).foreach { id =>
        Files.write(Paths.get(dir.getPath, f"clip_$id%05d.wav"),
          wavBytes(sampleRateOf(id), channelsOf(id), samplesOf(id)))
      }
      Files.write(Paths.get(dir.getPath, "notes.txt"),
        "decoy: the pathGlobFilter must never read this".getBytes("UTF-8"))
      Files.write(done.toPath, Array.emptyByteArray)
    }
    dir.getAbsolutePath
  }
}
