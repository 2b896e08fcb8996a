package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal WARC/1.0 codec (ISO 28500 — the Common Crawl container
  * format, the outermost layer of every web-scale text pipeline): a
  * deterministic generator and a TOTAL record-walk parser, built as a
  * pair so the query layer can prove extraction against ground truth
  * (the `ImageFiles`/`VideoFiles` codec discipline: every rule the
  * engine applies is stated here and spec-pinned, not inherited from a
  * library).
  *
  * A WARC file is a concatenation of records; each record is a block
  * of CRLF-terminated named headers (version line `WARC/1.0`, then
  * `Name: value` fields — `WARC-Type`, `WARC-Target-URI`,
  * `Content-Length` are the ones this codec consumes), a blank line,
  * `Content-Length` payload bytes, and a closing CRLF CRLF. The
  * parser walks that grammar and STOPS CLEANLY at the first
  * incomplete or malformed record (truncated fetch, corrupt length) —
  * it never throws, and reports the unconsumed byte count, so a
  * truncated 1 GB WARC from a flaky crawler degrades to "records
  * parsed so far + trailing bytes", the only behavior that survives
  * dirty crawl data at scale.
  */
object WarcFiles {

  /** offset/recLen are the record's replay coordinates inside its
    * file (offset of the version line; length through the closing
    * CRLF CRLF) — what a CDX index stores so a single record can be
    * range-read back out of a multi-GB WARC without a full scan. */
  final case class WarcRecord(recType: String, targetUri: String,
      body: Array[Byte], offset: Long = 0L, recLen: Long = 0L)
  /** records parsed, unconsumed trailing bytes, whether the walk hit
    * the exact end of input with no malformed residue */
  final case class WarcScan(records: Vector[WarcRecord], trailing: Int,
      clean: Boolean)

  private val CRLF = "\r\n"

  private def bytes(s: String): Array[Byte] = s.getBytes(UTF_8)

  /** One WARC record: version line, headers, blank line, payload,
    * closing CRLF CRLF. */
  private[graft] def record(recType: String, uri: String, id: String,
      block: Array[Byte]): Array[Byte] = {
    val hdr = new StringBuilder
    hdr ++= "WARC/1.0" + CRLF
    hdr ++= s"WARC-Type: $recType" + CRLF
    hdr ++= s"WARC-Record-ID: <urn:graft:$id>" + CRLF
    if (uri.nonEmpty) hdr ++= s"WARC-Target-URI: $uri" + CRLF
    hdr ++= s"Content-Length: ${block.length}" + CRLF + CRLF
    bytes(hdr.toString) ++ block ++ bytes(CRLF + CRLF)
  }

  /** HTTP/1.1 response payload wrapping an HTML body — what a
    * `response` record's block holds in a real crawl. */
  private[graft] def httpResponse(html: Array[Byte]): Array[Byte] =
    bytes("HTTP/1.1 200 OK" + CRLF +
      "Content-Type: text/html; charset=utf-8" + CRLF +
      s"Content-Length: ${html.length}" + CRLF + CRLF) ++ html

  /** Deterministic WARC file for a batch of (doc_id, html): one
    * `warcinfo` header record, then per doc a `request`/`response`
    * pair, plus a `revisit` marker for every 13th doc (the crawl-side
    * dedup record type — exercises type triage beyond the happy
    * path). */
  private[graft] def synthWarc(fileId: Long,
      docs: Seq[(Long, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(record("warcinfo", "", s"info-$fileId",
      bytes(s"software: graft-synth/1.0$CRLF")))
    docs.foreach { case (id, html) =>
      val uri = s"https://example.org/doc/$id"
      out.write(record("request", uri, s"req-$id",
        bytes(s"GET /doc/$id HTTP/1.1${CRLF}Host: example.org$CRLF$CRLF")))
      out.write(record("response", uri, s"resp-$id", httpResponse(html)))
      if (id % 13 == 0)
        out.write(record("revisit", uri, s"rev-$id", Array.emptyByteArray))
    }
    out.toByteArray
  }

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' &&
        b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** Total record walk: parses as many COMPLETE records as the bytes
    * hold; never throws on any input (fuzz-spec pinned on every
    * prefix). */
  private[graft] def parseWarc(b: Array[Byte]): WarcScan = {
    val recs = Vector.newBuilder[WarcRecord]
    var p = 0
    var n = 0
    var clean = true
    var stop = false
    while (!stop && p < b.length) {
      val hdrEnd = indexOfCrlfCrlf(b, p)
      val ok = hdrEnd >= 0 && {
        val hdr = new String(b, p, hdrEnd - p, UTF_8)
        val lines = hdr.split("\r\n", -1)
        if (!lines.headOption.exists(_.startsWith("WARC/"))) false
        else {
          def field(name: String): Option[String] = lines.iterator.drop(1)
            .map(_.split(":", 2))
            .collectFirst { case Array(k, v)
              if k.trim.equalsIgnoreCase(name) => v.trim }
          val len = field("Content-Length").flatMap(_.toIntOption)
            .filter(_ >= 0)
          len match {
            case Some(l) if hdrEnd.toLong + 4 + l + 4 <= b.length &&
                b(hdrEnd + 4 + l) == '\r' && b(hdrEnd + 5 + l) == '\n' &&
                b(hdrEnd + 6 + l) == '\r' && b(hdrEnd + 7 + l) == '\n' =>
              recs += WarcRecord(
                field("WARC-Type").getOrElse(""),
                field("WARC-Target-URI").getOrElse(""),
                java.util.Arrays.copyOfRange(b, hdrEnd + 4, hdrEnd + 4 + l),
                p.toLong, (hdrEnd + 8 + l - p).toLong)
              n += 1
              p = hdrEnd + 8 + l
              true
            case _ => false
          }
        }
      }
      if (!ok) { clean = false; stop = true }
    }
    WarcScan(recs.result(), b.length - p, clean && p == b.length)
  }

  /** Split an HTTP response payload into its HTML body; None unless a
    * complete 200 header block is present. */
  private[graft] def httpBody(b: Array[Byte]): Option[Array[Byte]] = {
    val sep = indexOfCrlfCrlf(b, 0)
    if (sep < 0) None
    else {
      val status = new String(b, 0, math.min(sep, 64), UTF_8)
      if (!status.startsWith("HTTP/1.1 200")) None
      else Some(java.util.Arrays.copyOfRange(b, sep + 4, b.length))
    }
  }
}
