package graft.sources

import java.io.ByteArrayOutputStream

/** Minimal MessagePack codec (the public msgpack spec — the wire
  * format of Redis dumps, Fluentd event streams, and a large share of
  * Kafka payloads; after Avro OCF it is the interchange container a
  * training pipeline most often has to slurp): a deterministic
  * generator and a TOTAL object-walk parser, built as a pair so the
  * query layer can prove the decode against ground truth (the
  * `WarcFiles`/`AvroFiles` codec discipline: every grammar rule the
  * engine applies is stated here and spec-pinned, not inherited from
  * a library).
  *
  * A msgpack STREAM (the `.msgpack` dump shape) is a bare
  * concatenation of objects — no file header, no index. This codec
  * speaks the subset a log-dump reader needs: fixmap/map16, fixstr/
  * str8/str16, positive fixint/uint8/uint16/uint32, fixarray, nil,
  * and ext8 (skipped with its declared length — the forward-compat
  * rule that lets old readers cross new fields). The parser walks
  * objects until the bytes end and STOPS CLEANLY at the first
  * malformed or truncated object — never throws, reports trailing
  * unconsumed bytes (the WarcFiles totality contract, fuzz-spec
  * pinned on every prefix).
  */
object MsgPackFiles {

  /** One decoded document record: id, text byte length, tag count,
    * whether the forward-compat ext field was present. */
  final case class MpDoc(id: Long, textBytes: Int, nTags: Int,
      hasExt: Boolean)

  /** objects decoded, unconsumed trailing bytes, clean = walk ended
    * exactly at the buffer end with no malformed residue */
  final case class MpScan(docs: Vector[MpDoc], trailing: Int,
      clean: Boolean)

  // ------------------------------------------------------- generator

  private def wUint(out: ByteArrayOutputStream, v: Long): Unit = {
    // minimal-width unsigned encoding, the spec's recommendation
    if (v < 128) out.write(v.toInt)
    else if (v < 256) { out.write(0xcc); out.write(v.toInt) }
    else if (v < 65536) {
      out.write(0xcd); out.write((v >> 8).toInt & 0xff)
      out.write(v.toInt & 0xff)
    } else {
      out.write(0xce)
      out.write((v >> 24).toInt & 0xff); out.write((v >> 16).toInt & 0xff)
      out.write((v >> 8).toInt & 0xff); out.write(v.toInt & 0xff)
    }
  }

  private def wStr(out: ByteArrayOutputStream, s: Array[Byte]): Unit = {
    if (s.length < 32) out.write(0xa0 | s.length)
    else if (s.length < 256) { out.write(0xd9); out.write(s.length) }
    else {
      out.write(0xda); out.write((s.length >> 8) & 0xff)
      out.write(s.length & 0xff)
    }
    out.write(s, 0, s.length)
  }

  private def key(out: ByteArrayOutputStream, k: String): Unit =
    wStr(out, k.getBytes("UTF-8"))

  /** Deterministic msgpack stream for a batch of (doc_id, text):
    * per doc one map `{id, text, tags[, ext]}` — tags is a
    * (id mod 4)-element fixarray of small ints (exercises array
    * walk), and every 19th doc carries an `ext` field holding an
    * ext8 object (exercises the skip-unknown rule). */
  private[graft] def synthMsgPack(docs: Seq[(Long, Array[Byte])])
      : Array[Byte] = {
    val out = new ByteArrayOutputStream()
    docs.foreach { case (id, text) =>
      val ext = id % 19 == 0
      val nTags = (id % 4).toInt
      out.write(0x80 | (if (ext) 4 else 3)) // fixmap
      key(out, "id"); wUint(out, id)
      key(out, "text"); wStr(out, text)
      key(out, "tags")
      out.write(0x90 | nTags) // fixarray
      (0 until nTags).foreach(i => out.write(((id + i) % 128).toInt))
      if (ext) {
        key(out, "ext")
        out.write(0xc7); out.write(1); out.write(0x2a) // ext8 len=1
        out.write(0x7f) // payload the reader must skip, not decode
      }
    }
    out.toByteArray
  }

  // ---------------------------------------------------------- parser

  /** Decode one object at p; returns (value-or-skip marker, next
    * position), or -1 when the bytes don't hold a complete object.
    * Integers return their value; strings/arrays/ext return a type
    * tag in the high bits — the caller only needs ints, string
    * spans, array arity, and ext presence, so the walk carries
    * (kind, value, next). */
  private final case class Obj(kind: Char, value: Long, next: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  private def decode(b: Array[Byte], p: Int): Option[Obj] = {
    if (p >= b.length) return None
    val t = u8(b, p)
    if (t < 0x80) Some(Obj('i', t.toLong, p + 1)) // positive fixint
    else if ((t & 0xf0) == 0x80) Some(Obj('m', (t & 0x0f).toLong, p + 1))
    else if ((t & 0xf0) == 0x90) Some(Obj('a', (t & 0x0f).toLong, p + 1))
    else if ((t & 0xe0) == 0xa0) { // fixstr
      val l = t & 0x1f
      if (p + 1 + l <= b.length) Some(Obj('s', l.toLong, p + 1 + l))
      else None
    } else t match {
      case 0xc0 => Some(Obj('n', 0L, p + 1)) // nil
      case 0xcc if p + 2 <= b.length =>
        Some(Obj('i', u8(b, p + 1).toLong, p + 2))
      case 0xcd if p + 3 <= b.length =>
        Some(Obj('i', (u8(b, p + 1).toLong << 8) | u8(b, p + 2), p + 3))
      case 0xce if p + 5 <= b.length =>
        Some(Obj('i', (u8(b, p + 1).toLong << 24) |
          (u8(b, p + 2).toLong << 16) | (u8(b, p + 3).toLong << 8) |
          u8(b, p + 4), p + 5))
      case 0xd9 if p + 2 <= b.length => // str8
        val l = u8(b, p + 1)
        if (p + 2 + l <= b.length) Some(Obj('s', l.toLong, p + 2 + l))
        else None
      case 0xda if p + 3 <= b.length => // str16
        val l = (u8(b, p + 1) << 8) | u8(b, p + 2)
        if (p + 3 + l <= b.length) Some(Obj('s', l.toLong, p + 3 + l))
        else None
      case 0xc7 if p + 3 <= b.length => // ext8: len, type, payload
        val l = u8(b, p + 1)
        if (p + 3 + l <= b.length) Some(Obj('x', l.toLong, p + 3 + l))
        else None
      case _ => None // outside the dump subset: malformed here
    }
  }

  /** Total stream walk: decodes as many COMPLETE document maps as the
    * bytes hold; unknown keys are skipped by their declared width
    * (the ext rule), never decoded. */
  private[graft] def parseMsgPack(b: Array[Byte]): MpScan = {
    val docs = Vector.newBuilder[MpDoc]
    var p = 0
    var clean = true
    var stop = false
    while (!stop && p < b.length) {
      val rec: Option[(MpDoc, Int)] = decode(b, p).flatMap {
        case Obj('m', nPairs, q0) =>
          var q = q0
          var id = -1L; var tb = -1; var tags = -1; var ext = false
          var ok = true
          var k = 0L
          while (ok && k < nPairs) {
            // key: a string; read its bytes to dispatch the value
            (decode(b, q) match {
              case Some(Obj('s', kl, kNext)) =>
                decode(b, kNext).flatMap { v =>
                  // arrays span their elements: walk the arity out
                  val after: Option[Int] =
                    if (v.kind == 'a') {
                      var e = v.next; var i = 0L; var aok = true
                      while (aok && i < v.value) {
                        decode(b, e) match {
                          case Some(o) => e = o.next; i += 1
                          case None => aok = false
                        }
                      }
                      if (aok) Some(e) else None
                    } else Some(v.next)
                  after.map { nxt =>
                    new String(b, kNext - kl.toInt, kl.toInt,
                        "UTF-8") match {
                      case "id" if v.kind == 'i' => id = v.value
                      case "text" if v.kind == 's' => tb = v.value.toInt
                      case "tags" if v.kind == 'a' => tags = v.value.toInt
                      case "ext" if v.kind == 'x' => ext = true
                      case _ => () // unknown key: skipped by width
                    }
                    nxt
                  }
                }
              case _ => None
            }) match {
              case Some(nxt) => q = nxt; k += 1
              case None => ok = false
            }
          }
          if (ok && id >= 0 && tb >= 0 && tags >= 0)
            Some((MpDoc(id, tb, tags, ext), q))
          else None
        case _ => None
      }
      rec match {
        case Some((d, q)) => docs += d; p = q
        case None => clean = false; stop = true
      }
    }
    MpScan(docs.result(), b.length - p, clean && p == b.length)
  }
}
