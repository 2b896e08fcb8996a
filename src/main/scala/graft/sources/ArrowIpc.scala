package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** Arrow IPC streaming-format codec — the sixth corpus container
  * beside WARC/tar/ZIP/TFRecord/Avro, and the one ANALYTICS tooling
  * interchanges (Arrow Flight dumps, Polars/pandas `.arrows` exports,
  * DuckDB `COPY TO (FORMAT arrow)`): a stream of flatbuffer-framed
  * messages,
  *
  * {{{
  *   uint32  0xFFFFFFFF          (continuation marker)
  *   int32   metadata_size       (flatbuffer Message incl. padding, LE)
  *   byte    metadata[...]       (flatbuffers `Message` table)
  *   byte    body[bodyLength]    (8-aligned column buffers)
  *   ...                         (first a Schema message, then batches)
  *   uint32  0xFFFFFFFF, int32 0 (end-of-stream)
  * }}}
  *
  * per the public Arrow columnar spec (format/Message.fbs,
  * format/Schema.fbs). The schema here is `doc_id: Int64 NOT NULL,
  * text: Utf8 NULLABLE` with a custom_metadata KeyValue the reader
  * must vtable-skip past.
  *
  * Codec-pair discipline as everywhere in `sources/`: the GENERATOR
  * hand-builds flatbuffers with a minimal backward-growing
  * [[FbBuilder]] (vtables, uoffsets, struct vectors — the real wire
  * grammar, not a fixed byte template), and the PARSER walks them with
  * an independent bounds-checked vtable reader — two implementations
  * of the flatbuffers internals format proving each other under the
  * driver hash.
  *
  * Triage semantics: every batch whose first doc_id is a multiple of
  * 17 DECLARES one more text null in its FieldNode than the validity
  * bitmap holds (the planted metadata/body disagreement); the reader
  * recounts the bitmap, flags the mismatch, keeps the data, and walks
  * on. A malformed frame (bad continuation, metadata overrun, body
  * overrun) stops the walk cleanly — framing is the one thing a reader
  * must not guess past. The parser never throws on any input.
  */
object ArrowIpc {

  // ----------------------------------------------------------------
  // Minimal flatbuffers BUILDER (generator half). Grows backward like
  // the reference implementation: `space` is the index of the first
  // used byte; writes prepend. All returned "offsets" are coordinates
  // measured from the buffer END (stable under prepending/growth).
  // ----------------------------------------------------------------
  private[sources] final class FbBuilder {
    private var buf = new Array[Byte](256)
    private var space = buf.length
    private var minalign = 8
    private var vt: Array[Int] = _
    private var objStart = 0

    def used: Int = buf.length - space

    private def ensure(n: Int): Unit = {
      if (space >= n) return
      val u = used
      var nl = math.max(buf.length * 2, 64)
      while (nl - u < n) nl *= 2
      val nb = new Array[Byte](nl)
      System.arraycopy(buf, space, nb, nl - u, u)
      buf = nb
      space = nl - u
    }

    private def pad(n: Int): Unit = {
      ensure(n); var i = 0
      while (i < n) { space -= 1; buf(space) = 0; i += 1 }
    }

    /** Align so that after writing `additional` more bytes the next
      * `size`-byte scalar lands `size`-aligned (from-end coordinates;
      * the finished buffer is padded to 8 so end-alignment == absolute
      * alignment for every power of two ≤ 8). */
    def prep(size: Int, additional: Int): Unit = {
      if (size > minalign) minalign = size
      val alignSize = (~(used + additional) + 1) & (size - 1)
      pad(alignSize)
    }

    private def put8(v: Int): Unit = { ensure(1); space -= 1; buf(space) = v.toByte }
    private def putN(v: Long, n: Int): Unit = {
      ensure(n); space -= n
      var i = 0
      while (i < n) { buf(space + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    }
    def putShortRaw(v: Int): Unit = putN(v.toLong & 0xffff, 2)
    def putIntRaw(v: Int): Unit = putN(v.toLong & 0xffffffffL, 4)
    def putLongRaw(v: Long): Unit = putN(v, 8)

    /** uoffset32 pointing forward to an earlier-built object. */
    def putUoffset(target: Int): Unit = {
      prep(4, 0)
      putIntRaw(used + 4 - target)
    }

    def createString(s: String): Int = {
      val b = s.getBytes(UTF_8)
      prep(4, b.length + 1)
      put8(0)
      ensure(b.length); space -= b.length
      System.arraycopy(b, 0, buf, space, b.length)
      putIntRaw(b.length)
      used
    }

    /** Vector of uoffsets; `targets` in logical order. */
    def createOffsetVector(targets: Seq[Int]): Int = {
      prep(4, targets.length * 4)
      targets.reverse.foreach(putUoffset)
      putIntRaw(targets.length)
      used
    }

    /** Vector of 16-byte (long, long) structs in logical order. */
    def createStructPairVector(pairs: Seq[(Long, Long)]): Int = {
      prep(4, pairs.length * 16)
      prep(8, pairs.length * 16)
      pairs.reverse.foreach { case (a, b) =>
        putLongRaw(b); putLongRaw(a) // prepend: `a` lands at the lower address
      }
      putIntRaw(pairs.length)
      used
    }

    def startTable(numFields: Int): Unit = {
      vt = new Array[Int](numFields)
      objStart = used
    }
    def slotByte(id: Int, v: Int, default: Int): Unit =
      if (v != default) { prep(1, 0); put8(v); vt(id) = used }
    def slotShort(id: Int, v: Int, default: Int): Unit =
      if (v != default) { prep(2, 0); putShortRaw(v); vt(id) = used }
    def slotInt(id: Int, v: Int, default: Int): Unit =
      if (v != default) { prep(4, 0); putIntRaw(v); vt(id) = used }
    def slotLong(id: Int, v: Long, default: Long): Unit =
      if (v != default) { prep(8, 0); putLongRaw(v); vt(id) = used }
    def slotBool(id: Int, v: Boolean): Unit = slotByte(id, if (v) 1 else 0, 0)
    def slotOffset(id: Int, target: Int): Unit =
      if (target != 0) { putUoffset(target); vt(id) = used }

    def endTable(): Int = {
      prep(4, 0)
      putIntRaw(0) // soffset placeholder
      val tablePos = used
      // vtable: [u16 vtable bytes][u16 table bytes][u16 per field]
      val n = vt.length
      var i = n - 1
      while (i >= 0) {
        putShortRaw(if (vt(i) == 0) 0 else tablePos - vt(i)); i -= 1
      }
      putShortRaw(tablePos - objStart)
      putShortRaw((n + 2) * 2)
      val vtPos = used
      // patch the soffset: vtable_addr = table_addr - soffset
      val idx = buf.length - tablePos
      val so = vtPos - tablePos
      var k = 0
      while (k < 4) { buf(idx + k) = ((so >>> (8 * k)) & 0xff).toByte; k += 1 }
      tablePos
    }

    /** Root uoffset + final padding; returns the finished buffer,
      * length a multiple of 8 (keeps from-end == absolute alignment). */
    def finish(root: Int): Array[Byte] = {
      prep(minalign, 4)
      putUoffset(root)
      val rem = used % 8
      if (rem != 0) pad(8 - rem)
      java.util.Arrays.copyOfRange(buf, space, buf.length)
    }
  }

  // ----------------------------------------------------------------
  // Minimal flatbuffers READER (parser half): bounds-checked vtable
  // walk, tolerant of absent fields. All failures return sentinel
  // values; the Arrow walk turns them into a clean stop.
  // ----------------------------------------------------------------
  // all bounds checks in SUBTRACTION form: `p + k > len` overflows Int
  // when a corrupt uoffset drives p near 2^31 — `p > len - k` cannot
  private def u16(b: Array[Byte], p: Int): Int =
    if (p < 0 || p > b.length - 2) -1
    else (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], p: Int): Int =
    if (p < 0 || p > b.length - 4) Int.MinValue
    else (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
  private def i64(b: Array[Byte], p: Int): Long =
    if (p < 0 || p > b.length - 8) Long.MinValue
    else {
      var v = 0L; var i = 7
      while (i >= 0) { v = (v << 8) | (b(p + i) & 0xff); i -= 1 }
      v
    }

  /** Absolute position of field `id` in the table at `tab`, or -1. */
  private def fieldPos(b: Array[Byte], tab: Int, id: Int): Int = {
    if (tab < 0 || tab + 4 > b.length) return -1
    val vt = tab - i32(b, tab)
    val vtLen = u16(b, vt)
    val slot = 4 + id * 2
    if (vtLen < 0 || slot + 2 > vtLen) return -1
    val off = u16(b, vt + slot)
    if (off <= 0) -1 else tab + off
  }
  private def fieldTable(b: Array[Byte], tab: Int, id: Int): Int = {
    val p = fieldPos(b, tab, id)
    if (p < 0) -1
    else {
      val u = i32(b, p)
      if (u <= 0 || p.toLong + u > b.length) -1 else p + u
    }
  }
  private def fieldLong(b: Array[Byte], tab: Int, id: Int, dflt: Long): Long = {
    val p = fieldPos(b, tab, id)
    if (p < 0) dflt else i64(b, p)
  }
  private def fieldShort(b: Array[Byte], tab: Int, id: Int, dflt: Int): Int = {
    val p = fieldPos(b, tab, id)
    if (p < 0) dflt else u16(b, p)
  }
  private def fieldByte(b: Array[Byte], tab: Int, id: Int, dflt: Int): Int = {
    val p = fieldPos(b, tab, id)
    if (p < 0 || p >= b.length) dflt else b(p) & 0xff
  }
  /** (absolute element start, length) of a vector field, or (-1, -1). */
  private def fieldVector(b: Array[Byte], tab: Int, id: Int): (Int, Int) = {
    val v = fieldTable(b, tab, id) // same uoffset indirection
    if (v < 0) (-1, -1)
    else {
      val n = i32(b, v)
      if (n < 0) (-1, -1) else (v + 4, n)
    }
  }
  private def readString(b: Array[Byte], strTab: Int): String = {
    if (strTab < 0) return null
    val n = i32(b, strTab)
    if (n < 0 || strTab + 4 + n > b.length) null
    else new String(b, strTab + 4, n, UTF_8)
  }

  // ---------------------------------------------------- Arrow write
  private val DocsPerBatch = 10

  /** The constant flatbuffers `Message(Schema)` frame (8-byte message
    * prefix NOT included). */
  private[graft] lazy val schemaMessage: Array[Byte] = {
    val fb = new FbBuilder
    // Field "doc_id": Int{bitWidth:64, signed} — children: empty vector
    val idName = fb.createString("doc_id")
    fb.startTable(2) // Int table
    fb.slotBool(1, v = true)
    fb.slotInt(0, 64, 0) // bitWidth is declared `int` — full-width slot
    val intTab = fb.endTable()
    val idChildren = fb.createOffsetVector(Nil)
    fb.startTable(7) // Field
    fb.slotOffset(5, idChildren)
    fb.slotOffset(3, intTab)
    fb.slotByte(2, 2, 0) // Type.Int
    fb.slotOffset(0, idName)
    val idField = fb.endTable()

    val txtName = fb.createString("text")
    fb.startTable(0) // Utf8 {}
    val utf8Tab = fb.endTable()
    val txtChildren = fb.createOffsetVector(Nil)
    fb.startTable(7)
    fb.slotOffset(5, txtChildren)
    fb.slotOffset(3, utf8Tab)
    fb.slotByte(2, 5, 0) // Type.Utf8
    fb.slotBool(1, v = true) // nullable
    fb.slotOffset(0, txtName)
    val txtField = fb.endTable()

    val k = fb.createString("writer")
    val v = fb.createString("graft-arrow-synth")
    fb.startTable(2) // KeyValue
    fb.slotOffset(1, v)
    fb.slotOffset(0, k)
    val kv = fb.endTable()

    val fieldsVec = fb.createOffsetVector(Seq(idField, txtField))
    val kvVec = fb.createOffsetVector(Seq(kv))
    fb.startTable(4) // Schema
    fb.slotOffset(2, kvVec)
    fb.slotOffset(1, fieldsVec)
    val schema = fb.endTable()

    fb.startTable(5) // Message
    fb.slotLong(3, 0L, -1L) // bodyLength 0 — force-write (default is 0;
    // written explicitly so every Message has the same field set)
    fb.slotOffset(2, schema)
    fb.slotByte(1, 1, 0) // MessageHeader.Schema
    fb.slotShort(0, 4, 0) // MetadataVersion.V5
    fb.finish(fb.endTable())
  }

  private def pad8(n: Int): Int = (n + 7) & ~7

  /** Batch → (flatbuffer Message bytes, body bytes). Plants the
    * null_count lie when the first doc_id % 17 == 0. */
  private[graft] def batchMessage(docs: Seq[(Long, String)])
      : (Array[Byte], Array[Byte]) = {
    val n = docs.length
    val texts = docs.map { case (id, t) => if (id % 13 == 0) null else t }
    val nNull = texts.count(_ == null)
    // body buffers: [id validity (empty), id data, text validity,
    //                text offsets, text data], each 8-aligned.
    val idData = new Array[Byte](n * 8)
    docs.zipWithIndex.foreach { case ((id, _), i) =>
      var v = id; var k = 0
      while (k < 8) { idData(i * 8 + k) = ((v >>> (8 * k)) & 0xff).toByte; k += 1 }
    }
    val bitmap = new Array[Byte]((n + 7) / 8)
    texts.zipWithIndex.foreach { case (t, i) =>
      if (t != null) bitmap(i / 8) = (bitmap(i / 8) | (1 << (i % 8))).toByte
    }
    val tbytes = texts.map(t => if (t == null) Array.empty[Byte]
      else t.getBytes(UTF_8))
    val offsets = new Array[Byte]((n + 1) * 4)
    var acc = 0
    (0 to n).foreach { i =>
      var v = acc; var k = 0
      while (k < 4) { offsets(i * 4 + k) = ((v >>> (8 * k)) & 0xff).toByte; k += 1 }
      if (i < n) acc += tbytes(i).length
    }
    val tdata = tbytes.flatten.toArray
    val bufs = Seq(Array.empty[Byte], idData, bitmap, offsets, tdata)
    var off = 0
    val entries = bufs.map { b =>
      val e = (off.toLong, b.length.toLong)
      off = pad8(off + b.length)
      e
    }
    val body = new Array[Byte](off)
    bufs.zip(entries).foreach { case (b, (o, _)) =>
      System.arraycopy(b, 0, body, o.toInt, b.length)
    }
    val lie = if (docs.head._1 % 17 == 0) 1L else 0L
    val fb = new FbBuilder
    val nodes = fb.createStructPairVector(
      Seq((n.toLong, 0L), (n.toLong, nNull + lie)))
    val buffers = fb.createStructPairVector(entries)
    fb.startTable(4) // RecordBatch
    fb.slotOffset(2, buffers)
    fb.slotOffset(1, nodes)
    fb.slotLong(0, n.toLong, 0L)
    val rb = fb.endTable()
    fb.startTable(5) // Message
    fb.slotLong(3, body.length.toLong, 0L)
    fb.slotOffset(2, rb)
    fb.slotByte(1, 3, 0) // MessageHeader.RecordBatch
    fb.slotShort(0, 4, 0) // V5
    (fb.finish(fb.endTable()), body)
  }

  /** Deterministic stream: Schema message, then `DocsPerBatch`-row
    * record batches, then EOS. */
  private[graft] def synthArrowStream(docs: Seq[(Long, String)])
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def frame(meta: Array[Byte], body: Array[Byte]): Unit = {
      var i = 0
      while (i < 4) { out.write(0xff); i += 1 }
      val m = pad8(meta.length)
      i = 0
      while (i < 4) { out.write((m >>> (8 * i)) & 0xff); i += 1 }
      out.write(meta)
      i = meta.length
      while (i < m) { out.write(0); i += 1 }
      out.write(body)
    }
    frame(schemaMessage, Array.empty)
    docs.grouped(DocsPerBatch).foreach { g =>
      val (meta, body) = batchMessage(g)
      frame(meta, body)
    }
    var i = 0
    while (i < 4) { out.write(0xff); i += 1 }
    i = 0
    while (i < 4) { out.write(0); i += 1 }
    out.toByteArray
  }

  // ---------------------------------------------------- Arrow read
  /** One decoded batch: rows, sum of doc_ids, nulls RECOUNTED from the
    * validity bitmap, UTF-8 byte total of non-null texts, and whether
    * the FieldNode null_count disagreed with the bitmap. */
  final case class ArrowBatch(nRows: Long, idSum: Long, nNullText: Long,
      textBytes: Long, nodeMismatch: Boolean)
  /** schemaOk = header message parsed to the expected 2-field schema;
    * clean = schemaOk ∧ EOS seen ∧ every byte consumed. */
  final case class ArrowScan(schemaOk: Boolean, fieldNames: Seq[String],
      batches: Vector[ArrowBatch], eos: Boolean, consumed: Int,
      clean: Boolean)

  private def u32le(b: Array[Byte], p: Int): Long =
    if (p + 4 > b.length) -1L
    else (b(p) & 0xff).toLong | ((b(p + 1) & 0xff).toLong << 8) |
      ((b(p + 2) & 0xff).toLong << 16) | ((b(p + 3) & 0xff).toLong << 24)

  /** Total walk — never throws; malformed framing stops cleanly. */
  private[graft] def parseArrowStream(b: Array[Byte]): ArrowScan = {
    var p = 0
    var schemaOk = false
    var names: Seq[String] = Nil
    val batches = Vector.newBuilder[ArrowBatch]
    var eos = false
    var stop = false
    var first = true
    while (!stop && p + 8 <= b.length) {
      if (u32le(b, p) != 0xffffffffL) stop = true
      else {
        val metaLen = u32le(b, p + 4)
        if (metaLen == 0) { eos = true; p += 8; stop = true }
        else if (metaLen < 0 || metaLen % 8 != 0 ||
          p + 8 + metaLen > b.length) stop = true
        else {
          val meta = java.util.Arrays.copyOfRange(b, p + 8,
            p + 8 + metaLen.toInt)
          val root = i32(meta, 0)
          val msg = if (root <= 0 || root >= meta.length) -1 else root
          if (msg < 0) stop = true
          else {
            val hdrType = fieldByte(meta, msg, 1, 0)
            val hdr = fieldTable(meta, msg, 2)
            val bodyLen = fieldLong(meta, msg, 3, 0L)
            if (bodyLen < 0 ||
              p + 8 + metaLen + bodyLen > b.length) stop = true
            else {
              val bodyOff = p + 8 + metaLen.toInt
              if (hdrType == 1 && first) { // Schema
                val (fv, fn) = fieldVector(meta, hdr, 1)
                if (fv >= 0 && fn >= 0) {
                  def fieldAt(i: Int): Int = {
                    val pos = fv + i * 4
                    val u = i32(meta, pos)
                    if (u <= 0 || pos.toLong + u > meta.length) -1
                    else pos + u
                  }
                  names = (0 until fn).flatMap { i =>
                    Option(readString(meta, fieldTable(meta, fieldAt(i), 0)))
                  }
                  // field names AND the union type tags must both match:
                  // Type.Int (2) for col 0, Type.Utf8 (5) for col 1
                  schemaOk = fn == 2 && names == Seq("doc_id", "text") &&
                    fieldByte(meta, fieldAt(0), 2, 0) == 2 &&
                    fieldByte(meta, fieldAt(1), 2, 0) == 5
                }
              } else if (hdrType == 3) { // RecordBatch
                val nRows = fieldLong(meta, hdr, 0, 0L)
                val (nv, nn) = fieldVector(meta, hdr, 1)
                val (bv, bn) = fieldVector(meta, hdr, 2)
                // nRows ≤ bodyLen/8 also keeps nRows*8 / (nRows+1)*4
                // below overflow for any in-stream bodyLen
                if (nRows >= 0 && nRows <= bodyLen / 8 &&
                  nn == 2 && bn == 5) {
                  def node(i: Int): (Long, Long) =
                    (i64(meta, nv + i * 16), i64(meta, nv + i * 16 + 8))
                  def bufEntry(i: Int): (Long, Long) =
                    (i64(meta, bv + i * 16), i64(meta, bv + i * 16 + 8))
                  val (idOff, idLen) = bufEntry(1)
                  val (vaOff, vaLen) = bufEntry(2)
                  val (ofOff, ofLen) = bufEntry(3)
                  val (tdOff, tdLen) = bufEntry(4)
                  val inBody = Seq(bufEntry(0), bufEntry(1), bufEntry(2),
                    bufEntry(3), bufEntry(4)).forall { case (o, l) =>
                    o >= 0 && l >= 0 && o + l <= bodyLen
                  }
                  if (inBody && idLen == nRows * 8 &&
                    ofLen == (nRows + 1) * 4 &&
                    vaLen >= (nRows + 7) / 8) {
                    var idSum = 0L
                    var i = 0
                    while (i < nRows) {
                      idSum += i64(b, bodyOff + idOff.toInt + i * 8)
                      i += 1
                    }
                    var nulls = 0L
                    i = 0
                    while (i < nRows) {
                      val bit = (b(bodyOff + vaOff.toInt + i / 8) >>
                        (i % 8)) & 1
                      if (bit == 0) nulls += 1
                      i += 1
                    }
                    val tb = u32le(b, bodyOff + ofOff.toInt + nRows.toInt * 4)
                    val declaredNulls = node(1)._2
                    batches += ArrowBatch(nRows, idSum, nulls,
                      if (tb <= tdLen) tb else tdLen,
                      nodeMismatch = declaredNulls != nulls)
                  } else stop = true
                } else stop = true
              }
              if (!stop) {
                first = false
                p = bodyOff + pad8(bodyLen.toInt)
              }
            }
          }
        }
      }
    }
    ArrowScan(schemaOk, names, batches.result(), eos, p,
      clean = schemaOk && eos && p == b.length)
  }

  /** Per-batch framed size in the stream: 8-byte prefix + padded
    * metadata + padded body, exposed so the oracle's closed-form byte
    * census can be built from row counts and text lengths alone. The
    * batch METADATA size is row-count-independent (all lengths are
    * fixed-width ints) — pinned by SourcesSpec. */
  lazy val batchMetaLen: Int =
    pad8(batchMessage(Seq((1L, "x"), (2L, "y")))._1.length)
  lazy val schemaMsgLen: Int = pad8(schemaMessage.length)

  // ================================================================
  // Dictionary encoding — the second Arrow wire feature a real reader
  // must speak: low-cardinality string columns ship ONCE as a
  // DictionaryBatch (a Utf8 array of the distinct values) and each
  // RecordBatch carries int32 INDICES into it. Schema: `doc_id: Int64,
  // source: Utf8 dictionary-encoded (id 0, Int32 indices)`.
  // Planted defect: in every batch whose first doc_id is a multiple
  // of 17, the LAST row's index is out of range (== dict size) — the
  // stale-dictionary failure mode; the reader bounds-checks every
  // index, counts the overrun, and treats that slot as null.
  // ================================================================

  /** Constant flatbuffers Message(Schema) for the dictionary stream. */
  private[graft] lazy val dictSchemaMessage: Array[Byte] = {
    val fb = new FbBuilder
    val idName = fb.createString("doc_id")
    fb.startTable(2) // Int{64, signed}
    fb.slotBool(1, v = true)
    fb.slotInt(0, 64, 0)
    val int64Tab = fb.endTable()
    val idChildren = fb.createOffsetVector(Nil)
    fb.startTable(7) // Field doc_id
    fb.slotOffset(5, idChildren)
    fb.slotOffset(3, int64Tab)
    fb.slotByte(2, 2, 0) // Type.Int
    fb.slotOffset(0, idName)
    val idField = fb.endTable()

    val srcName = fb.createString("source")
    fb.startTable(0) // Utf8 {} — the VALUE type of the dictionary
    val utf8Tab = fb.endTable()
    fb.startTable(2) // Int{32, signed} — the INDEX type
    fb.slotBool(1, v = true)
    fb.slotInt(0, 32, 0)
    val int32Tab = fb.endTable()
    fb.startTable(4) // DictionaryEncoding{id:0, indexType, isOrdered:false}
    fb.slotOffset(1, int32Tab)
    fb.slotLong(0, 0L, -1L) // id 0, force-written
    val dictEnc = fb.endTable()
    val srcChildren = fb.createOffsetVector(Nil)
    fb.startTable(7) // Field source
    fb.slotOffset(5, srcChildren)
    fb.slotOffset(4, dictEnc)
    fb.slotOffset(3, utf8Tab)
    fb.slotByte(2, 5, 0) // Type.Utf8 (the logical value type)
    fb.slotOffset(0, srcName)
    val srcField = fb.endTable()

    val fieldsVec = fb.createOffsetVector(Seq(idField, srcField))
    fb.startTable(4) // Schema
    fb.slotOffset(1, fieldsVec)
    val schema = fb.endTable()
    fb.startTable(5) // Message
    fb.slotLong(3, 0L, -1L)
    fb.slotOffset(2, schema)
    fb.slotByte(1, 1, 0) // Schema
    fb.slotShort(0, 4, 0)
    fb.finish(fb.endTable())
  }

  /** DictionaryBatch message: the sorted distinct values as one Utf8
    * array. Returns (metadata, body). */
  private[graft] def dictionaryMessage(values: Seq[String])
      : (Array[Byte], Array[Byte]) = dictionaryMessage(values, isDelta = false)

  /** As above; `isDelta = true` emits the APPEND form (Arrow's
    * incremental-dictionary wire feature — later batches may index
    * past the initial dictionary's length). */
  private[graft] def dictionaryMessage(values: Seq[String], isDelta: Boolean)
      : (Array[Byte], Array[Byte]) = {
    val k = values.length
    val vbytes = values.map(_.getBytes(UTF_8))
    val offsets = new Array[Byte]((k + 1) * 4)
    var acc = 0
    (0 to k).foreach { i =>
      var v = acc; var j = 0
      while (j < 4) { offsets(i * 4 + j) = ((v >>> (8 * j)) & 0xff).toByte; j += 1 }
      if (i < k) acc += vbytes(i).length
    }
    val data = vbytes.flatten.toArray
    val bufs = Seq(Array.empty[Byte], offsets, data) // no nulls in the dict
    var off = 0
    val entries = bufs.map { b =>
      val e = (off.toLong, b.length.toLong); off = pad8(off + b.length); e
    }
    val body = new Array[Byte](off)
    bufs.zip(entries).foreach { case (b, (o, _)) =>
      System.arraycopy(b, 0, body, o.toInt, b.length)
    }
    val fb = new FbBuilder
    val nodes = fb.createStructPairVector(Seq((k.toLong, 0L)))
    val buffers = fb.createStructPairVector(entries)
    fb.startTable(4) // RecordBatch payload
    fb.slotOffset(2, buffers)
    fb.slotOffset(1, nodes)
    fb.slotLong(0, k.toLong, 0L)
    val rb = fb.endTable()
    fb.startTable(3) // DictionaryBatch{id:0, data, isDelta}
    fb.slotBool(2, isDelta)
    fb.slotOffset(1, rb)
    fb.slotLong(0, 0L, -1L)
    val db = fb.endTable()
    fb.startTable(5) // Message
    fb.slotLong(3, body.length.toLong, 0L)
    fb.slotOffset(2, db)
    fb.slotByte(1, 2, 0) // MessageHeader.DictionaryBatch
    fb.slotShort(0, 4, 0)
    (fb.finish(fb.endTable()), body)
  }

  /** Dictionary-indexed RecordBatch: (metadata, body); buffers
    * [id validity (empty), id data, index validity (empty), int32
    * indices]. Plants the out-of-range index when the first doc_id is
    * a multiple of 17. */
  private[graft] def dictBatchMessage(docs: Seq[(Long, Int)], dictSize: Int)
      : (Array[Byte], Array[Byte]) = {
    val n = docs.length
    val idData = new Array[Byte](n * 8)
    docs.zipWithIndex.foreach { case ((id, _), i) =>
      var v = id; var j = 0
      while (j < 8) { idData(i * 8 + j) = ((v >>> (8 * j)) & 0xff).toByte; j += 1 }
    }
    val oob = docs.head._1 % 17 == 0
    val idx = new Array[Byte](n * 4)
    docs.zipWithIndex.foreach { case ((_, ix0), i) =>
      val ix = if (oob && i == n - 1) dictSize else ix0
      var v = ix; var j = 0
      while (j < 4) { idx(i * 4 + j) = ((v >>> (8 * j)) & 0xff).toByte; j += 1 }
    }
    val bufs = Seq(Array.empty[Byte], idData, Array.empty[Byte], idx)
    var off = 0
    val entries = bufs.map { b =>
      val e = (off.toLong, b.length.toLong); off = pad8(off + b.length); e
    }
    val body = new Array[Byte](off)
    bufs.zip(entries).foreach { case (b, (o, _)) =>
      System.arraycopy(b, 0, body, o.toInt, b.length)
    }
    val fb = new FbBuilder
    val nodes = fb.createStructPairVector(
      Seq((n.toLong, 0L), (n.toLong, 0L)))
    val buffers = fb.createStructPairVector(entries)
    fb.startTable(4)
    fb.slotOffset(2, buffers)
    fb.slotOffset(1, nodes)
    fb.slotLong(0, n.toLong, 0L)
    val rb = fb.endTable()
    fb.startTable(5)
    fb.slotLong(3, body.length.toLong, 0L)
    fb.slotOffset(2, rb)
    fb.slotByte(1, 3, 0) // RecordBatch
    fb.slotShort(0, 4, 0)
    (fb.finish(fb.endTable()), body)
  }

  private def frameInto(out: java.io.ByteArrayOutputStream,
      meta: Array[Byte], body: Array[Byte]): Unit = {
    var i = 0
    while (i < 4) { out.write(0xff); i += 1 }
    val m = pad8(meta.length)
    i = 0
    while (i < 4) { out.write((m >>> (8 * i)) & 0xff); i += 1 }
    out.write(meta)
    i = meta.length
    while (i < m) { out.write(0); i += 1 }
    out.write(body)
  }

  private def eosInto(out: java.io.ByteArrayOutputStream): Unit = {
    var i = 0
    while (i < 4) { out.write(0xff); i += 1 }
    i = 0
    while (i < 4) { out.write(0); i += 1 }
  }

  /** Deterministic dictionary-encoded stream: Schema, ONE
    * DictionaryBatch (sorted distinct sources of this shard), then
    * 10-row index batches, then EOS. */
  private[graft] def synthDictStream(docs: Seq[(Long, String)])
      : Array[Byte] = {
    val dict = docs.map(_._2).distinct.sorted
    val lookup = dict.zipWithIndex.toMap
    val out = new java.io.ByteArrayOutputStream()
    frameInto(out, dictSchemaMessage, Array.empty)
    val (dm, db) = dictionaryMessage(dict)
    frameInto(out, dm, db)
    docs.grouped(DocsPerBatch).foreach { g =>
      val (meta, body) =
        dictBatchMessage(g.map { case (id, s) => (id, lookup(s)) }, dict.length)
      frameInto(out, meta, body)
    }
    eosInto(out)
    out.toByteArray
  }

  /** Delta-dictionary stream (Arrow's incremental form, spec-pinned):
    * the initial dictionary holds only the FIRST batch's values; each
    * later batch that introduces new values is preceded by an
    * `isDelta` APPEND message, so its indices reach past the initial
    * dictionary's length — exactly the wire shape long-running Arrow
    * producers emit. */
  private[graft] def synthDictStreamDelta(docs: Seq[(Long, String)])
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    frameInto(out, dictSchemaMessage, Array.empty)
    var dict = Vector.empty[String]
    docs.grouped(DocsPerBatch).foreach { g =>
      val newVals = g.map(_._2).distinct.sorted.filterNot(dict.contains)
      if (newVals.nonEmpty) {
        val (dm, db) = dictionaryMessage(newVals, isDelta = dict.nonEmpty)
        frameInto(out, dm, db)
        dict = dict ++ newVals
      }
      val lookup = dict.zipWithIndex.toMap
      val (meta, body) = dictBatchMessage(
        g.map { case (id, s) => (id, lookup(s)) }, dict.length)
      frameInto(out, meta, body)
    }
    eosInto(out)
    out.toByteArray
  }

  /** One decoded index batch: rows, id sum, per-dict-value row counts
    * (bounded by dict size), out-of-range index count. */
  final case class ArrowDictBatch(nRows: Long, idSum: Long,
      srcCounts: Map[String, Long], nOob: Long)
  final case class ArrowDictScan(schemaOk: Boolean, dict: Seq[String],
      batches: Vector[ArrowDictBatch], eos: Boolean, consumed: Int,
      clean: Boolean)

  /** Total walk of the dictionary stream — never throws. */
  private[graft] def parseDictStream(b: Array[Byte]): ArrowDictScan = {
    var p = 0
    var schemaOk = false
    var dict: Seq[String] = Nil
    val batches = Vector.newBuilder[ArrowDictBatch]
    var eos = false
    var stop = false
    while (!stop && p + 8 <= b.length) {
      if (u32le(b, p) != 0xffffffffL) stop = true
      else {
        val metaLen = u32le(b, p + 4)
        if (metaLen == 0) { eos = true; p += 8; stop = true }
        else if (metaLen < 0 || metaLen % 8 != 0 ||
          p + 8 + metaLen > b.length) stop = true
        else {
          val meta = java.util.Arrays.copyOfRange(b, p + 8,
            p + 8 + metaLen.toInt)
          val root = i32(meta, 0)
          val msg = if (root <= 0 || root >= meta.length) -1 else root
          if (msg < 0) stop = true
          else {
            val hdrType = fieldByte(meta, msg, 1, 0)
            val hdr = fieldTable(meta, msg, 2)
            val bodyLen = fieldLong(meta, msg, 3, 0L)
            if (bodyLen < 0 ||
              p + 8 + metaLen + bodyLen > b.length) stop = true
            else {
              val bodyOff = p + 8 + metaLen.toInt
              if (hdrType == 1) { // Schema: verify the dictionary spec
                val (fv, fn) = fieldVector(meta, hdr, 1)
                if (fv >= 0 && fn == 2) {
                  def fieldAt(i: Int): Int = {
                    val pos = fv + i * 4
                    val u = i32(meta, pos)
                    if (u <= 0 || pos.toLong + u > meta.length) -1
                    else pos + u
                  }
                  val src = fieldAt(1)
                  val enc = fieldTable(meta, src, 4)
                  val idxType = fieldTable(meta, enc, 1)
                  schemaOk =
                    readString(meta, fieldTable(meta, fieldAt(0), 0)) == "doc_id" &&
                    readString(meta, fieldTable(meta, src, 0)) == "source" &&
                    fieldByte(meta, src, 2, 0) == 5 && // logical Utf8
                    enc >= 0 && fieldLong(meta, enc, 0, -1L) == 0L &&
                    fieldInt(meta, idxType, 0, 0) == 32 // Int32 indices
                }
              } else if (hdrType == 2) { // DictionaryBatch
                // isDelta = true APPENDS to the standing dictionary
                // (Arrow's incremental-dictionary form); isDelta =
                // false REPLACES it (the spec's restart semantics)
                val isDelta = fieldByte(meta, hdr, 2, 0) == 1
                val rb = fieldTable(meta, hdr, 1)
                val k = fieldLong(meta, rb, 0, 0L)
                val (bv, bn) = fieldVector(meta, rb, 2)
                if (rb >= 0 && k >= 0 && bn == 3 && k <= bodyLen / 4) {
                  def bufEntry(i: Int): (Long, Long) =
                    (i64(meta, bv + i * 16), i64(meta, bv + i * 16 + 8))
                  val (ofOff, ofLen) = bufEntry(1)
                  val (tdOff, tdLen) = bufEntry(2)
                  val inBody = Seq(bufEntry(0), bufEntry(1), bufEntry(2))
                    .forall { case (o, l) =>
                      o >= 0 && l >= 0 && o + l <= bodyLen
                    }
                  if (inBody && ofLen == (k + 1) * 4) {
                    val vals = (0 until k.toInt).flatMap { i =>
                      val s = u32le(b, bodyOff + ofOff.toInt + i * 4)
                      val e = u32le(b, bodyOff + ofOff.toInt + (i + 1) * 4)
                      if (s >= 0 && e >= s && e <= tdLen)
                        Some(new String(b, bodyOff + tdOff.toInt + s.toInt,
                          (e - s).toInt, UTF_8))
                      else None
                    }
                    if (vals.length != k.toInt) stop = true
                    else dict = if (isDelta) dict ++ vals else vals
                  } else stop = true
                } else stop = true
              } else if (hdrType == 3) { // index RecordBatch
                val nRows = fieldLong(meta, hdr, 0, 0L)
                val (nv, nn) = fieldVector(meta, hdr, 1)
                val (bv, bn) = fieldVector(meta, hdr, 2)
                if (nRows >= 0 && nRows <= bodyLen / 4 && nn == 2 &&
                  bn == 4 && nv >= 0) {
                  def bufEntry(i: Int): (Long, Long) =
                    (i64(meta, bv + i * 16), i64(meta, bv + i * 16 + 8))
                  val (idOff, idLen) = bufEntry(1)
                  val (ixOff, ixLen) = bufEntry(3)
                  val inBody = (0 until 4).map(bufEntry).forall {
                    case (o, l) => o >= 0 && l >= 0 && o + l <= bodyLen
                  }
                  if (inBody && idLen == nRows * 8 && ixLen == nRows * 4) {
                    var idSum = 0L
                    var nOob = 0L
                    val counts = scala.collection.mutable.Map
                      .empty[String, Long]
                    var i = 0
                    while (i < nRows) {
                      idSum += i64(b, bodyOff + idOff.toInt + i * 8)
                      val ix = i32(b, bodyOff + ixOff.toInt + i * 4)
                      if (ix >= 0 && ix < dict.length) {
                        val s = dict(ix)
                        counts(s) = counts.getOrElse(s, 0L) + 1L
                      } else nOob += 1L
                      i += 1
                    }
                    batches += ArrowDictBatch(nRows, idSum,
                      counts.toMap, nOob)
                  } else stop = true
                } else stop = true
              }
              if (!stop) p = bodyOff + pad8(bodyLen.toInt)
            }
          }
        }
      }
    }
    ArrowDictScan(schemaOk, dict, batches.result(), eos, p,
      clean = schemaOk && dict.nonEmpty && eos && p == b.length)
  }

  /** Int-typed field accessor (4-byte scalar), for the reader. */
  private def fieldInt(b: Array[Byte], tab: Int, id: Int, dflt: Int): Int = {
    val p = fieldPos(b, tab, id)
    if (p < 0) dflt else i32(b, p)
  }

  /** Oracle constants for the dictionary stream's byte census. */
  lazy val dictSchemaMsgLen: Int = pad8(dictSchemaMessage.length)
  lazy val dictMetaLen: Int =
    pad8(dictionaryMessage(Seq("a", "bb"))._1.length)
  lazy val dictBatchMetaLen: Int =
    pad8(dictBatchMessage(Seq((1L, 0), (2L, 1)), 2)._1.length)
}
