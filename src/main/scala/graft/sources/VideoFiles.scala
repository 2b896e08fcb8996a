package graft.sources

import java.io.ByteArrayOutputStream
import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Deterministic video-container fixture for the multimodal triage
  * family ([[graft.ops.MultimodalOps.videoMeta]] — the video sibling
  * of [[ImageFiles]]/[[AudioFiles]], completing the image/audio/video
  * modality triple): one complete minimal MP4 (ISO-BMFF) per id —
  * `ftyp` + `moov(mvhd, trak(tkhd, mdia(mdhd, hdlr)))` + `mdat` —
  * with duration, timescale, track dimensions, and mdat payload size
  * derived from the id by fixed integer formulas. ISO-BMFF is a pure
  * length-prefixed box tree (u32 BE size + 4CC type, containers
  * nest), so every byte is specified by construction and the DuckDB
  * oracle recomputes every parsed field AND the exact file size from
  * arithmetic — the same generator/parser proof the image codecs use.
  * (Box layouts follow ISO/IEC 14496-12: mvhd v0 carries
  * timescale/duration at fixed offsets; tkhd v0 carries 16.16
  * fixed-point width/height at its tail; hdlr declares the track
  * handler 4CC.)
  */
object VideoFiles {

  private val FixtureVersion = 1
  private[graft] val NVideos = 40

  /** Formula ground truth (the oracle restates these). */
  private[graft] val Timescale = 600 // the classic ISO-BMFF tick rate
  private[graft] def durationTicksOf(id: Long): Long =
    (5 + id * 3) * Timescale // whole seconds: 5 + 3·id
  private[graft] def widthOf(id: Long): Int = (160 + (id * 8) % 1120).toInt
  private[graft] def heightOf(id: Long): Int = (90 + (id * 6) % 630).toInt
  private[graft] def mdatBytesOf(id: Long): Long = 16 + (id * 37) % 256

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(tag: String, body: Array[Byte]): Array[Byte] =
    be32(8L + body.length) ++ tag.getBytes("US-ASCII") ++ body

  /** The identity transform matrix every *hd box carries. */
  private val UnityMatrix: Array[Byte] =
    be32(0x00010000L) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0x00010000L) ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(0x40000000L)

  /** mvhd version 0: 108 bytes total (100-byte payload). */
  private def mvhd(duration: Long): Array[Byte] = box("mvhd",
    be32(0) ++ // version 0 + flags
      be32(0) ++ be32(0) ++ // creation, modification
      be32(Timescale.toLong) ++ be32(duration) ++
      be32(0x00010000L) ++ // rate 1.0
      be16(0x0100) ++ be16(0) ++ // volume 1.0, reserved
      be32(0) ++ be32(0) ++ // reserved
      UnityMatrix ++
      Array.fill[Byte](24)(0) ++ // pre_defined
      be32(2)) // next_track_ID

  /** tkhd version 0: 92 bytes total; width/height are 16.16 fixed. */
  private def tkhd(trackId: Long, duration: Long,
      w: Int, h: Int): Array[Byte] = box("tkhd",
    be32(7) ++ // version 0, flags: enabled|in_movie|in_preview
      be32(0) ++ be32(0) ++ // creation, modification
      be32(trackId) ++ be32(0) ++ // track_ID, reserved
      be32(duration) ++
      be32(0) ++ be32(0) ++ // reserved
      be16(0) ++ be16(0) ++ be16(0) ++ be16(0) ++ // layer, group, volume, rsvd
      UnityMatrix ++
      be32(w.toLong << 16) ++ be32(h.toLong << 16))

  /** mdhd version 0: 32 bytes total. */
  private def mdhd(duration: Long): Array[Byte] = box("mdhd",
    be32(0) ++ be32(0) ++ be32(0) ++
      be32(Timescale.toLong) ++ be32(duration) ++
      be16(0x55c4) ++ be16(0)) // language 'und', pre_defined

  /** hdlr declaring a video track; name = "vide\0" (5 bytes). */
  private val hdlr: Array[Byte] = box("hdlr",
    be32(0) ++ be32(0) ++ // version/flags, pre_defined
      "vide".getBytes("US-ASCII") ++
      Array.fill[Byte](12)(0) ++ // reserved
      ("vide" + "\u0000").getBytes("US-ASCII"))

  private[graft] def mp4Bytes(id: Long): Array[Byte] = {
    val dur = durationTicksOf(id)
    val out = new ByteArrayOutputStream()
    out.write(box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(0x200L) ++
        "isom".getBytes("US-ASCII") ++ "mp42".getBytes("US-ASCII")))
    out.write(box("moov",
      mvhd(dur) ++
        box("trak",
          tkhd(id + 1, dur, widthOf(id), heightOf(id)) ++
            box("mdia", mdhd(dur) ++ hdlr))))
    // deterministic non-zero payload so a size bug can't hide in zeros
    out.write(box("mdat", Array.tabulate(mdatBytesOf(id).toInt)(i =>
      ((id * 31 + i * 7) & 0xff).toByte)))
    out.toByteArray
  }

  /** Closed-form file size — the oracle's n_bytes ground truth.
    * ftyp 24 + moov 8 + mvhd 108 + trak 8 + tkhd 92 + mdia 8 +
    * mdhd 32 + hdlr 37 + mdat (8 + payload). */
  private[graft] val FixedBytes: Long = 24 + 8 + 108 + 8 + 92 + 8 + 32 + 37 + 8

  private[graft] def videosDir(spark: SparkSession, sfDir: String): String = {
    val dir = new File(
      s"${graft.etl.Medallion.warehouseBase}/${new File(sfDir).getName}" +
        s"/fixtures/mp4_v$FixtureVersion")
    val done = new File(dir, "_FIXTURE_OK")
    if (!done.exists()) {
      dir.mkdirs()
      (0L until NVideos.toLong).foreach { id =>
        val b = mp4Bytes(id)
        require(b.length == FixedBytes + mdatBytesOf(id),
          s"fixture size drifted from the closed form for id=$id")
        Files.write(Paths.get(dir.getPath, f"vid_$id%05d.mp4"), b)
      }
      Files.write(Paths.get(dir.getPath, "notes.txt"),
        "decoy: the pathGlobFilter must never read this".getBytes("UTF-8"))
      Files.write(done.toPath, Array.emptyByteArray)
    }
    dir.getAbsolutePath
  }
}
