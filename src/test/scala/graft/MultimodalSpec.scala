package graft

import org.apache.spark.sql.functions._

import graft.ops.MultimodalOps

/** Semantics checks for the multimodal family's perceptual near-dup
  * (the rest of the family is oracle-checked via the character-math
  * DuckDB recompute; here the invariants that the hash construction
  * must satisfy regardless of corpus):
  *  - identical payloads hash identically, so every injected
  *    cross-source duplicate pair lands at Hamming 0;
  *  - the band join misses nothing at the claimed radius (hamming ≤ 1
  *    counts equal a brute-force all-pairs recount).
  */
class MultimodalSpec extends SparkSpec {

  test("phash: exact duplicates at hamming 0, banding is lossless at r=1") {
    val got = MultimodalOps.phashNearDup(spark, sfTiny).collect()
      .map(r => r.getAs[Long]("hamming") -> r.getAs[Long]("n_pairs")).toMap
    // brute-force witness over the same 27-bin letter-histogram hash
    val texts = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def ahash(t: String): Long = {
      val bins = new Array[Long](32)
      t.getBytes("UTF-8").foreach(b => bins(b & 0x1F) += 1)
      (0 until 27).map(b => if (bins(b) * 27 > t.length) 1L << b else 0L).sum
    }
    val hs = texts.map { case (id, t) => id -> ahash(t) }
    val brute = (for {
      (i1, h1) <- hs; (i2, h2) <- hs if i1 < i2
      d = java.lang.Long.bitCount(h1 ^ h2) if d <= 1
    } yield d.toLong).groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got == brute, s"$got != $brute")
    // identical texts are a subset of the hamming-0 pairs
    val dupPairs = texts.groupBy(_._2).values.map(_.length.toLong)
      .map(n => n * (n - 1) / 2).sum
    assert(got.getOrElse(0L, 0L) >= dupPairs)
  }

  test("image meta: header parse recovers generator dimensions byte-for-byte") {
    import graft.sources.ImageFiles
    val rows = MultimodalOps.imageMeta(spark, sfTiny).collect()
    assert(rows.length == ImageFiles.NImages,
      s"expected ${ImageFiles.NImages} files (decoy must be glob-pruned), " +
        s"got ${rows.length}")
    rows.foreach { r =>
      val id = r.getAs[Long]("img_id")
      val (w, h) = (ImageFiles.widthOf(id), ImageFiles.heightOf(id))
      val fmt = (id % 4) match {
        case 0 => "png"; case 1 => "bmp"; case 2 => "gif"; case _ => "jpeg"
      }
      assert(r.getAs[String]("format") == fmt)
      assert(r.getAs[Int]("width") == w, s"img $id width")
      assert(r.getAs[Int]("height") == h, s"img $id height")
      assert(r.getAs[Int]("bit_depth") ==
        ((id % 4) match { case 0 => 8; case 1 => 24; case 2 => 1; case _ => 8 }))
      // file sizes obey the closed-form construction (PNG stored-zlib
      // block math; BMP 4-byte row padding; GIF constant-width LZW with
      // per-pixel clears; JPEG 2-bit-per-block entropy stream) —
      // proving each fixture is a complete image, not a bare header
      val raw = h * (1 + 3 * w)
      val gifData = (3L * (2L * w * h + 1) + 7) / 8
      val jpgBlocks = ((w + 7) / 8) * ((h + 7) / 8)
      val want = (id % 4) match {
        case 0 => 8L + 25 + 12 + 2 + 5 * ((raw + 65534) / 65535) + raw + 4 + 12
        case 1 => 54L + h.toLong * ((3 * w + 3) / 4 * 4)
        case 2 => 32L + gifData + (gifData + 254) / 255
        case _ => 158L + (jpgBlocks + 3) / 4
      }
      assert(r.getAs[Long]("n_bytes") == want, s"img $id size")
    }
    // the parser is not fixture-bound: a PNG with dims the formulas
    // never produce still parses (regression guard for offset bugs)
    val odd = ImageFiles.pngBytes(1021, 7)
    val ihdrW = ((odd(16) & 0xff) << 24) | ((odd(17) & 0xff) << 16) |
      ((odd(18) & 0xff) << 8) | (odd(19) & 0xff)
    assert(ihdrW == 1021)
  }

  test("generated images decode with the JDK's own ImageIO — external spec-validity proof") {
    import graft.sources.ImageFiles
    import javax.imageio.ImageIO
    import java.io.ByteArrayInputStream
    // dims deliberately outside the fixture formulas; the JPEG cases
    // include non-multiple-of-8 dims (partial edge blocks) and a
    // single-block image
    for ((bytes, w, h, fmt) <- Seq(
        (ImageFiles.pngBytes(33, 21), 33, 21, "png"),
        (ImageFiles.gifBytes(33, 21), 33, 21, "gif"),
        (ImageFiles.gifBytes(300, 2), 300, 2, "gif"),
        (ImageFiles.jpegBytes(33, 21), 33, 21, "jpeg"),
        (ImageFiles.jpegBytes(8, 8), 8, 8, "jpeg"),
        (ImageFiles.jpegBytes(301, 3), 301, 3, "jpeg"))) {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected the generated $fmt")
      assert(img.getWidth == w && img.getHeight == h,
        s"$fmt decoded ${img.getWidth}x${img.getHeight}, want ${w}x$h")
      // every pixel carries the constructed value — black for the
      // palette/truecolor streams, mid-gray sample 128 for the JPEG
      // (DC = 0 plus the T.81 +128 level shift) — so the entropy
      // streams hold real pixel data an independent decoder
      // reproduces. Read raster SAMPLES, not getRGB: ImageIO maps the
      // JPEG's gray colorspace through a gamma curve on the way to
      // sRGB (128 → 0xBC), which would test the color pipeline, not
      // the decode.
      val wantSample = if (fmt == "jpeg") 128 else 0
      for (x <- 0 until w; y <- 0 until h)
        assert(img.getRaster.getSample(x, y, 0) == wantSample,
          s"$fmt sample ($x,$y) = ${img.getRaster.getSample(x, y, 0)}")
    }
  }

  test("pair curation: funnel is monotone and composes the factored gates") {
    val rows = MultimodalOps.pairCuration(spark, sfSmall).collect()
    assert(rows.map(_.getAs[String]("stage_name")).toSeq ==
      Seq("raw", "caption_quality", "image_geometry", "clip_agreement",
        "image_dedup"))
    val counts = rows.map(_.getAs[Long]("n_pairs")).toSeq
    assert(counts.sliding(2).forall { case Seq(a, b) => a >= b },
      s"stage counts must be non-increasing: $counts")
    assert(counts.head ==
      Tables.documents(spark, sfSmall).count(), "raw = all pairs")
    assert(counts.last > 0 && counts.last < counts.head,
      "the funnel must actually drop pairs on this fixture")
    // the CLIP gate has real selectivity: it drops some geometry
    // survivors and keeps some — a vacuous threshold would make the
    // stage decorative
    assert(counts(3) < counts(2) && counts(3) > 0,
      s"clip_agreement must bite: $counts")
    // stage 1 is EXACTLY the text pipeline's quality-stage survivor
    // count — both funnels gate on the one factored predicate
    // (TextOps.qualityKeep), so the counts must agree to the row
    val q = graft.ops.CurationOps.pipelineLedger(spark, sfSmall).collect()
      .find(_.getAs[String]("stage_name") == "quality").get
      .getAs[Long]("n_docs")
    assert(counts(1) == q, s"caption_quality ${counts(1)} != ledger $q")
  }

  test("jpeg marker walk: total and correct on every prefix of a valid file") {
    import graft.sources.ImageFiles
    val full = ImageFiles.jpegBytes(77, 41)
    // the SOF segment's last byte is at a known offset; once the walk
    // can reach it, dims parse — before that, null, never a throw
    val sofEnd = {
      // find FFC0, segment spans marker(2) + len(11)
      val i = full.indices.find(i =>
        (full(i) & 0xff) == 0xff && (full(i + 1) & 0xff) == 0xc0).get
      i + 2 + 11
    }
    for (n <- 0 to full.length) {
      val prefix = java.util.Arrays.copyOf(full, n)
      val res = graft.ops.MultimodalOps.jpegSof(prefix) // must not throw
      if (n >= sofEnd)
        assert(res == ((77, 41, 8)), s"prefix $n parsed $res")
    }
    // corrupt variants: zeroed length fields, truncated marker, junk —
    // all classify as null (unknown), never throw or loop
    val zeroLen = full.clone()
    val dqt = full.indices.find(i =>
      (full(i) & 0xff) == 0xff && (full(i + 1) & 0xff) == 0xdb).get
    zeroLen(dqt + 2) = 0; zeroLen(dqt + 3) = 0
    assert(graft.ops.MultimodalOps.jpegSof(zeroLen) == null,
      "zero-length segment must classify unknown, not loop")
    val junk = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    junk(0) = 0xff.toByte; junk(1) = 0xd8.toByte
    graft.ops.MultimodalOps.jpegSof(junk) // total on junk
  }

  test("mp4 box walk: total and correct on every prefix, v1 layout, corrupt sizes") {
    import graft.sources.VideoFiles
    val full = VideoFiles.mp4Bytes(7L)
    // every prefix parses without a throw; only the COMPLETE file is
    // structurally whole (a truncated box tree classifies unknown —
    // triage must reject damage, not half-parse it)
    // the only whole proper prefixes end exactly at a top-level box
    // boundary past moov: ftyp-only (n=24) lacks a timescale, so it
    // still classifies unknown; ftyp+moov (all headers, no mdat) is
    // legitimately parseable
    val moovEnd = full.length - (8 + VideoFiles.mdatBytesOf(7L).toInt)
    for (n <- 0 to full.length) {
      val prefix = java.util.Arrays.copyOf(full, n)
      val m = MultimodalOps.mp4Meta(prefix) // must not throw
      if (n < full.length && n != moovEnd)
        assert(m._1 == "unknown", s"prefix $n parsed $m")
    }
    val whole = MultimodalOps.mp4Meta(full)
    assert(whole == (("isom", 600L, VideoFiles.durationTicksOf(7L),
      VideoFiles.durationTicksOf(7L) * 1000L / 600L,
      VideoFiles.widthOf(7L), VideoFiles.heightOf(7L), "vide",
      VideoFiles.mdatBytesOf(7L))))
    // corrupt size fields: overrun, zero-size loop bait, backwards box
    val overrun = full.clone(); overrun(0) = 0x7f.toByte
    assert(MultimodalOps.mp4Meta(overrun)._1 == "unknown")
    val zeroFirst = full.clone()
    zeroFirst(0) = 0; zeroFirst(1) = 0; zeroFirst(2) = 0; zeroFirst(3) = 0
    MultimodalOps.mp4Meta(zeroFirst) // size-0 = to-end-of-region: total
    val tiny = full.clone(); tiny(3) = 4 // size 4 < header: backwards
    assert(MultimodalOps.mp4Meta(tiny)._1 == "unknown")
    val junk = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    MultimodalOps.mp4Meta(junk) // total on junk
    // version-1 mvhd (64-bit times): hand-build a minimal tree
    val v1 = {
      def be32(v: Long) = Array(((v >> 24) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      def be64(v: Long) = be32(v >> 32) ++ be32(v & 0xffffffffL)
      def box(t: String, body: Array[Byte]) =
        be32(8L + body.length) ++ t.getBytes("US-ASCII") ++ body
      box("ftyp", "isom".getBytes ++ be32(0) ++ "isom".getBytes) ++
        box("moov", box("mvhd",
          Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
            be32(90000L) ++ be64(123456789L)))
    }
    val mv1 = MultimodalOps.mp4Meta(v1)
    assert(mv1._1 == "isom" && mv1._2 == 90000L && mv1._3 == 123456789L,
      s"v1 mvhd misparsed: $mv1")
  }

  test("video meta: box walk recovers generator fields byte-for-byte") {
    import graft.sources.VideoFiles
    val rows = MultimodalOps.videoMeta(spark, sfTiny).collect()
    assert(rows.length == VideoFiles.NVideos,
      "decoy must be glob-pruned and every video parsed")
    rows.foreach { r =>
      val id = r.getAs[Long]("video_id")
      assert(r.getAs[String]("brand") == "isom")
      assert(r.getAs[Long]("timescale") == 600L)
      assert(r.getAs[Long]("duration_ticks") == VideoFiles.durationTicksOf(id))
      assert(r.getAs[Long]("duration_ms") ==
        VideoFiles.durationTicksOf(id) * 1000L / 600L)
      assert(r.getAs[Int]("width") == VideoFiles.widthOf(id), s"vid $id w")
      assert(r.getAs[Int]("height") == VideoFiles.heightOf(id), s"vid $id h")
      assert(r.getAs[String]("handler") == "vide")
      assert(r.getAs[Long]("mdat_bytes") == VideoFiles.mdatBytesOf(id))
      assert(r.getAs[Long]("n_bytes") ==
        VideoFiles.FixedBytes + VideoFiles.mdatBytesOf(id), s"vid $id size")
    }
  }

  test("webp: VP8L bit parse, VP8X cross-check, lossy VP8 path, prefix totality") {
    import graft.sources.WebpFiles
    // simple and extended fixtures parse to the formula dims
    for (id <- Seq(4L, 7L)) {
      val m = MultimodalOps.webpMeta(WebpFiles.webpBytes(id))
      assert(m._1 == "webp")
      assert(m._2 == (if (id % 2 == 0) "vp8l" else "vp8l_x"))
      assert(m._3 == WebpFiles.widthOf(id) && m._4 == WebpFiles.heightOf(id))
      assert(m._6, s"canvas must match for id=$id")
    }
    // a TAMPERED canvas must be surfaced, not silently preferred
    val ext = WebpFiles.webpBytes(1L)
    val bad = ext.clone()
    bad(12 + 8 + 4) = (bad(12 + 8 + 4) + 1).toByte // VP8X canvas w byte
    val mBad = MultimodalOps.webpMeta(bad)
    assert(mBad._1 == "webp" && !mBad._6,
      "a canvas/stream dim mismatch must clear canvas_match")
    // hand-built LOSSY VP8 header (the generator only emits VP8L, the
    // parser must still triage the lossy family)
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32b(v: Int) = le16(v & 0xffff) ++ le16(v >>> 16)
    val vp8body = Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a) ++
      le16(320) ++ le16(240) ++ Array[Byte](0, 0)
    val lossy = "RIFF".getBytes ++ le32b(4 + 8 + vp8body.length) ++
      "WEBP".getBytes ++ "VP8 ".getBytes ++ le32b(vp8body.length) ++ vp8body
    val mL = MultimodalOps.webpMeta(lossy)
    assert(mL == (("webp", "vp8", 320, 240, 1, true)), s"lossy parsed $mL")
    // prefix totality: every prefix parses without a throw; only
    // chunk-boundary prefixes can be structurally whole
    val full = WebpFiles.webpBytes(3L)
    for (n <- 0 to full.length) {
      MultimodalOps.webpMeta(java.util.Arrays.copyOf(full, n)) // no throw
    }
    // junk after the magic: total, classifies unknown
    val junk = "RIFF".getBytes ++ le32b(100) ++ "WEBP".getBytes ++
      Array.tabulate[Byte](16)(i => (i * 37).toByte)
    MultimodalOps.webpMeta(junk)
    assert(MultimodalOps.webpMeta("notawebpfile".getBytes)._1 == "unknown")
  }

  test("flac: STREAMINFO bit unpack, block walk, prefix totality") {
    import graft.sources.FlacFiles
    // generator fields recovered byte-for-byte on every id
    for (id <- 0L until FlacFiles.NFlac.toLong) {
      val m = MultimodalOps.flacMeta(FlacFiles.flacBytes(id))
      assert(m._1 == "flac", s"id $id")
      assert(m._2 == FlacFiles.channelsOf(id), s"id $id channels")
      assert(m._3 == FlacFiles.rateOf(id).toLong, s"id $id rate")
      assert(m._4 == FlacFiles.bitsOf(id), s"id $id bits")
      assert(m._5 == FlacFiles.samplesOf(id), s"id $id samples")
      assert(m._6 == FlacFiles.samplesOf(id) * 1000 / FlacFiles.rateOf(id))
      assert(m._7 == FlacFiles.minFrameOf(id), s"id $id minFrame")
      assert(m._8 == (1 + id % 2).toInt, s"id $id blocks")
    }
    // totality: every prefix parses without a throw; only complete
    // files (last block present and in-bounds) classify "flac"
    val full = FlacFiles.flacBytes(7L) // has the PADDING second block
    for (n <- 0 to full.length) {
      val m = MultimodalOps.flacMeta(java.util.Arrays.copyOf(full, n))
      if (n < full.length) assert(m._1 == "unknown", s"prefix $n: $m")
    }
    // first block must be STREAMINFO (spec-mandatory)
    val wrongFirst = "fLaC".getBytes ++
      Array[Byte](0x81.toByte, 0, 0, 2) ++ Array[Byte](0, 0)
    assert(MultimodalOps.flacMeta(wrongFirst)._1 == "unknown")
    // a block length overrunning the buffer: unknown, no throw
    val overrun = FlacFiles.flacBytes(1L)
    overrun(6) = 0x7f.toByte // inflate STREAMINFO length
    assert(MultimodalOps.flacMeta(overrun)._1 == "unknown")
    assert(MultimodalOps.flacMeta("notaflacfile".getBytes)._1 == "unknown")
  }

  test("mp3: frame walk, ID3v2 syncsafe skip, strict rejects, prefix totality") {
    import graft.sources.Mp3Files
    for (id <- 0L until Mp3Files.NMp3.toLong) {
      val m = MultimodalOps.mp3Meta(Mp3Files.mp3Bytes(id))
      assert(m._1 == "mp3", s"id $id")
      assert(m._2 == Mp3Files.framesOf(id), s"id $id frames")
      assert(m._4 == Mp3Files.BitrateKbps(Mp3Files.bitrateIdxOf(id)))
      assert(m._5 == Mp3Files.SampleRates(Mp3Files.srIdxOf(id)).toLong)
      assert(m._6 == Mp3Files.hasId3(id), s"id $id id3")
      assert(m._7 == (if (Mp3Files.hasId3(id)) Mp3Files.id3LenOf(id) else -1))
    }
    // prefix totality: no prefix throws; the only proper prefixes
    // that still classify "mp3" are those ending EXACTLY at a frame
    // boundary (a shorter-but-complete stream — frame count tells
    // them apart), everything else is unknown
    val full = Mp3Files.mp3Bytes(4L) // has the ID3v2 tag
    val id3Part = 10 + Mp3Files.id3LenOf(4L)
    val fLen = Mp3Files.frameLenOf(4L)
    for (n <- 0 to full.length) {
      val m = MultimodalOps.mp3Meta(java.util.Arrays.copyOf(full, n))
      val atBoundary = n > id3Part && (n - id3Part) % fLen == 0
      if (atBoundary)
        assert(m._1 == "mp3" && m._2 == (n - id3Part) / fLen,
          s"prefix $n: $m")
      else if (n < full.length) assert(m._1 == "unknown", s"prefix $n: $m")
    }
    def hdr(b2: Int, b1: Int = 0xfb): Array[Byte] = {
      val f = new Array[Byte](144000 * 32 / 44100) // stride for idx1@44100
      f(0) = 0xff.toByte; f(1) = b1.toByte; f(2) = b2.toByte
      f
    }
    // free-format (idx 0) and invalid (15) bitrates, reserved rate 3
    assert(MultimodalOps.mp3Meta(hdr(0x00))._1 == "unknown")
    assert(MultimodalOps.mp3Meta(hdr(0xf0))._1 == "unknown")
    assert(MultimodalOps.mp3Meta(hdr(0x1c))._1 == "unknown")
    // MPEG-2 (version bits 10) and Layer II (bits 10) rejected
    assert(MultimodalOps.mp3Meta(hdr(0x10, b1 = 0xf3))._1 == "unknown")
    assert(MultimodalOps.mp3Meta(hdr(0x10, b1 = 0xfd))._1 == "unknown")
    // trailing garbage after a valid frame: unknown (strict walk)
    assert(MultimodalOps.mp3Meta(hdr(0x10) :+ 0x00.toByte)._1 == "unknown")
    assert(MultimodalOps.mp3Meta("notanmp3".getBytes)._1 == "unknown")
    assert(MultimodalOps.mp3Meta(Array.empty[Byte])._1 == "unknown")
  }

  test("audio meta: RIFF parse recovers generator fields byte-for-byte") {
    import graft.sources.AudioFiles
    val rows = MultimodalOps.audioMeta(spark, sfTiny).collect()
    assert(rows.length == AudioFiles.NClips,
      "decoy must be glob-pruned and every clip parsed")
    rows.foreach { r =>
      val id = r.getAs[Long]("clip_id")
      val (sr, ch, ns) = (AudioFiles.sampleRateOf(id),
        AudioFiles.channelsOf(id), AudioFiles.samplesOf(id))
      assert(r.getAs[String]("codec") == "pcm_wav")
      assert(r.getAs[Int]("n_channels") == ch, s"clip $id channels")
      assert(r.getAs[Long]("sample_rate") == sr.toLong, s"clip $id rate")
      assert(r.getAs[Int]("bits") == 16)
      assert(r.getAs[Long]("n_samples") == ns.toLong, s"clip $id samples")
      assert(r.getAs[Long]("duration_ms") == ns.toLong * 1000 / sr)
      assert(r.getAs[Long]("n_bytes") == 44L + ns.toLong * ch * 2,
        s"clip $id size")
    }
  }

  test("vad: planted waveform decodes sample-exact, segments match formulas") {
    import graft.sources.AudioFiles._
    // sample-level roundtrip on one clip: burst samples alternate ±amp
    // (no DC), gaps are true zeros, boundaries land on frame edges
    val id = 5L
    val b = vadWavBytes(id)
    def s16(o: Int): Int = ((b(o) & 0xff) | (b(o + 1) << 8)).toShort.toInt
    val period = (vadBurstFrames(id) + vadGapFrames(id)) * VadFrameSamples
    val burstLen = vadBurstFrames(id) * VadFrameSamples
    val n = (b.length - 44) / 2
    (0 until n).foreach { i =>
      val want =
        if (i % period < burstLen) {
          if (i % 2 == 0) vadAmp(id) else -vadAmp(id)
        } else 0
      assert(s16(44 + 2 * i) == want, s"sample $i")
    }
    // the query agrees with the closed form for every clip
    val rows = graft.ops.MultimodalOps.vadSegments(spark, sfTiny).collect()
    assert(rows.length == NClips)
    rows.foreach { r =>
      val cid = r.getLong(0)
      val (bf, gf, c) =
        (vadBurstFrames(cid).toLong, vadGapFrames(cid).toLong,
          vadCycles(cid).toLong)
      assert(r.getLong(1) == c * (bf + gf))
      assert(r.getLong(2) == c * bf)
      assert(r.getLong(3) == c, s"clip $cid segments")
    }
  }

  test("tiff codec: both byte orders, packed SHORT, offset ASCII, type triage") {
    import graft.sources.TiffFiles._
    // id 2 = little-endian clean; id 3 = big-endian clean (the packed
    // SHORT sits in the HIGH bytes — a u32-and-truncate reader gets
    // 0); id 17 = the wrong-type orientation channel
    Seq(2L, 3L, 17L).foreach { id =>
      val m = parseTiff(synthTiff(id))
      assert(m.ok && m.bigEndian == (id % 2 == 1), s"id $id order")
      assert(m.width == widthOf(id) && m.height == heightOf(id),
        s"id $id dims ${m.width}x${m.height}")
      assert(m.make == makeOf(id), s"id $id make '${m.make}'")
      if (id % 17 == 0)
        assert(m.orientation == -1 && m.nBadType == 1, s"id $id triage")
      else
        assert(m.orientation == orientOf(id) && m.nBadType == 0)
    }
    // a truncated header or wrong order mark refuses the file
    assert(!parseTiff(Array[Byte]('I', 'I', 42, 0)).ok)
    val junk = synthTiff(2L).clone()
    junk(0) = 'X'
    assert(!parseTiff(junk).ok)
    // prefix totality
    val full = synthTiff(4L)
    (0 to full.length).foreach(n =>
      parseTiff(java.util.Arrays.copyOf(full, n)))
  }

  test("ocr roundtrip: glyphs injective, decode reads pixels not metadata") {
    import graft.ops.MultimodalOps.{glyphPattern, renderPage}
    // the pseudo-font must be injective over printable ASCII
    val pats = (32 to 126).map(c => glyphPattern(c.toChar))
    assert(pats.distinct.size == pats.size, "glyph collision")
    // a rendered page decodes to the right raster via ImageIO
    val s = "hello world this is a page"
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(renderPage(s)))
    assert(img.getWidth == 96 && img.getHeight == 16)
    // ink pixels in the raster == Σ popcount of the glyph patterns
    var ink = 0
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      if ((img.getRGB(x, y) & 0xffffff) == 0) ink += 1
    assert(ink == s.map(c => java.lang.Long.bitCount(glyphPattern(c))).sum)
    // TAMPER: flipping one ink pixel must change the decoded raster —
    // the reader reads pixels, not header metadata
    val bytes = renderPage(s)
    val firstInk = (54 until bytes.length).find(bytes(_) == 0).get
    bytes(firstInk) = 0xff.toByte
    val img2 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var ink2 = 0
    for (y <- 0 until img2.getHeight; x <- 0 until img2.getWidth)
      if ((img2.getRGB(x, y) & 0xffffff) == 0) ink2 += 1
    assert(ink2 == ink - 1, "tampered pixel not observed by the decoder")
  }
}
