package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** Minimal XML codec — the markup format corpora still arrive in
  * when they are not WARC/tar/ZIP payloads: RSS/Atom feeds, sitemap
  * variants, Wikipedia dumps, TEI corpora. Same generator/parser-pair
  * discipline as the other hand-rolled codecs ([[ZipFiles]],
  * [[TfRecordFiles]]): a deterministic feed generator and a TOTAL
  * stack-based pull parser built together, so the query layer proves
  * the walk against closed-form ground truth (reference formats:
  * dags/mitma/fetch_url_mitma.py:18-63 fetches listing pages the
  * reference treats as opaque; this codec is the structured-markup
  * reader that pipeline would need at scale).
  *
  * Parser surface (strict XML subset): the XML declaration, comments,
  * CDATA sections (no entity decoding inside), elements with quoted
  * attributes, self-closing tags, character data, and entity
  * references — the five named entities plus decimal (&#NN;) and hex
  * (&#xHH;) character references. Well-formedness is tracked, not
  * assumed: tag-balance violations, EOF inside a construct, or a
  * malformed entity mark the scan unclean and the walk continues
  * with what parsed — the parser never throws on ANY byte prefix
  * (fuzz-spec pinned, the [[ZipFiles]] triage discipline).
  *
  * Generator layout (single line, no inter-element whitespace, so
  * character data exists only inside title/body — that is what makes
  * the byte census closed-form):
  * {{{
  * <?xml version="1.0" encoding="UTF-8"?>
  * <feed source="S"><!-- synthetic feed -->
  *   per doc, ordered by id:
  *   <item id="ID" flag="a&amp;b">
  *     <title>doc {each digit of ID as &#NN;}</title>
  *     <body>text</body>      — CDATA-wrapped when id % 5 == 0
  *     <meta name="m"/>       — only when id % 4 == 0
  *     <em><strong>x</strong></em> in body — only when id % 3 == 0
  *   </item>
  * </feed>
  * }}}
  * The title encodes the doc id ENTIRELY as decimal character
  * references, so the decoded-id sum proves the entity decoder
  * digit-by-digit; the flag attribute proves attribute-value
  * decoding; the every-5th CDATA body proves the no-decode rule.
  */
object XmlFiles {

  final case class XmlItem(idAttr: Long, titleId: Long, bodyLen: Long)
  /** Walk result: parsed items, element/attribute/construct censuses,
    * decoded-entity count, max element depth, total decoded character
    * bytes, and whether the document was well-formed. */
  final case class XmlScan(items: Vector[XmlItem], nElem: Long,
      maxDepth: Long, nAttr: Long, nCdata: Long, nSelfClose: Long,
      nEnt: Long, textBytes: Long, clean: Boolean)

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Deterministic single-line feed over (doc_id, text) pairs. */
  def synthXml(source: String, docs: Seq[(Long, String)]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>")
    sb.append(s"""<feed source="${esc(source)}">""")
    sb.append("<!-- synthetic feed -->")
    docs.sortBy(_._1).foreach { case (id, text) =>
      sb.append(s"""<item id="$id" flag="a&amp;b">""")
      sb.append("<title>doc ")
      id.toString.foreach(d => sb.append(s"&#${d.toInt};"))
      sb.append("</title>")
      sb.append("<body>")
      if (id % 5 == 0) sb.append(s"<![CDATA[$text]]>")
      else sb.append(esc(text))
      if (id % 3 == 0) sb.append("<em><strong>x</strong></em>")
      sb.append("</body>")
      if (id % 4 == 0) sb.append("""<meta name="m"/>""")
      sb.append("</item>")
    }
    sb.append("</feed>")
    sb.toString.getBytes(UTF_8)
  }

  /** Total stack-based pull parse of the strict subset. Never throws;
    * structural damage flips `clean` and ends the walk. */
  def parseXml(bytes: Array[Byte]): XmlScan = {
    val s = new String(bytes, UTF_8)
    val n = s.length
    var i = 0
    var clean = true
    var nElem = 0L; var nAttr = 0L; var nCdata = 0L
    var nSelfClose = 0L; var nEnt = 0L; var textBytes = 0L
    var maxDepth = 0L
    val stack = collection.mutable.ArrayBuffer.empty[String]
    val items = Vector.newBuilder[XmlItem]
    // per-open-item state while inside an <item> subtree
    var curIdAttr = -1L; var curTitleId = -1L; var curBodyLen = 0L
    var inItem = false
    val text = new StringBuilder // decoded char data of current element

    def fail(): Unit = { clean = false; i = n }

    def isNameStart(c: Char) =
      c.isLetter || c == '_'
    def isNameChar(c: Char) =
      c.isLetterOrDigit || c == '_' || c == '-' || c == '.'

    def readName(): String = {
      val st = i
      if (i < n && isNameStart(s(i))) {
        i += 1
        while (i < n && isNameChar(s(i))) i += 1
        s.substring(st, i)
      } else { fail(); "" }
    }

    /** Decodes one entity starting AT '&'; appends to sb. */
    def readEntity(sb: StringBuilder): Unit = {
      val semi = s.indexOf(';', i + 1)
      if (semi < 0 || semi - i > 12) { clean = false; sb.append('&'); i += 1 }
      else {
        val body = s.substring(i + 1, semi)
        val decoded: Option[String] = body match {
          case "amp" => Some("&")
          case "lt" => Some("<")
          case "gt" => Some(">")
          case "quot" => Some("\"")
          case "apos" => Some("'")
          case b if b.startsWith("#x") || b.startsWith("#X") =>
            try Some(Integer.parseInt(b.drop(2), 16).toChar.toString)
            catch { case _: Exception => None }
          case b if b.startsWith("#") =>
            try Some(Integer.parseInt(b.drop(1)).toChar.toString)
            catch { case _: Exception => None }
          case _ => None
        }
        decoded match {
          case Some(d) => sb.append(d); nEnt += 1; i = semi + 1
          case None => clean = false; sb.append('&'); i += 1
        }
      }
    }

    def flushText(): Unit = {
      if (text.nonEmpty && stack.nonEmpty) {
        val t = text.toString
        textBytes += t.getBytes(UTF_8).length.toLong
        stack.last match {
          case "title" if t.startsWith("doc ") =>
            curTitleId = try t.drop(4).toLong catch { case _: Exception => -1L }
          case "body" => curBodyLen += t.getBytes(UTF_8).length.toLong
          case _ =>
        }
      }
      text.clear()
    }

    def readAttrs(): Boolean = { // returns selfClosing; false on damage
      var selfClosing = false
      var done = false
      while (!done && i < n) {
        while (i < n && s(i).isWhitespace) i += 1
        if (i >= n) { fail(); done = true }
        else if (s(i) == '>') { i += 1; done = true }
        else if (s(i) == '/') {
          if (i + 1 < n && s(i + 1) == '>') {
            selfClosing = true; i += 2; done = true
          } else { fail(); done = true }
        } else {
          val aname = readName()
          if (!clean) done = true
          else {
            while (i < n && s(i).isWhitespace) i += 1
            if (i < n && s(i) == '=') {
              i += 1
              while (i < n && s(i).isWhitespace) i += 1
              if (i < n && (s(i) == '"' || s(i) == '\'')) {
                val q = s(i); i += 1
                val vb = new StringBuilder
                while (i < n && s(i) != q) {
                  if (s(i) == '&') readEntity(vb)
                  else { vb.append(s(i)); i += 1 }
                }
                if (i < n) { // closing quote
                  i += 1
                  nAttr += 1
                  if (aname == "id" && stack.nonEmpty &&
                      stack.last == "item")
                    curIdAttr =
                      try vb.toString.toLong catch { case _: Exception => -1L }
                } else fail()
              } else fail()
            } else fail()
            done = !clean || done
          }
        }
      }
      selfClosing
    }

    while (i < n) {
      val c = s(i)
      if (c == '<') {
        flushText()
        if (s.startsWith("<?", i)) {
          val e = s.indexOf("?>", i + 2)
          if (e < 0) fail() else i = e + 2
        } else if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4)
          if (e < 0) fail() else i = e + 3
        } else if (s.startsWith("<![CDATA[", i)) {
          val e = s.indexOf("]]>", i + 9)
          if (e < 0) fail()
          else {
            val t = s.substring(i + 9, e)
            nCdata += 1
            textBytes += t.getBytes(UTF_8).length.toLong
            if (stack.nonEmpty && stack.last == "body")
              curBodyLen += t.getBytes(UTF_8).length.toLong
            i = e + 3
          }
        } else if (s.startsWith("</", i)) {
          i += 2
          val name = readName()
          if (clean) {
            while (i < n && s(i).isWhitespace) i += 1
            if (i < n && s(i) == '>') {
              i += 1
              if (stack.nonEmpty && stack.last == name) {
                stack.remove(stack.length - 1)
                if (name == "item" && inItem) {
                  items += XmlItem(curIdAttr, curTitleId, curBodyLen)
                  inItem = false
                }
              } else fail()
            } else fail()
          }
        } else {
          i += 1
          val name = readName()
          if (clean) {
            if (name == "item") {
              inItem = true; curIdAttr = -1L; curTitleId = -1L
              curBodyLen = 0L
            }
            stack += name // attrs may reference stack.last
            val selfClosing = readAttrs()
            if (clean) {
              nElem += 1
              if (stack.length.toLong > maxDepth)
                maxDepth = stack.length.toLong
              if (selfClosing) {
                nSelfClose += 1
                stack.remove(stack.length - 1)
                if (name == "item") inItem = false
              }
            } else if (stack.nonEmpty) stack.remove(stack.length - 1)
          }
        }
      } else if (c == '&') readEntity(text)
      else { text.append(c); i += 1 }
    }
    flushText()
    if (stack.nonEmpty) clean = false
    XmlScan(items.result(), nElem, maxDepth, nAttr, nCdata, nSelfClose,
      nEnt, textBytes, clean)
  }
}
