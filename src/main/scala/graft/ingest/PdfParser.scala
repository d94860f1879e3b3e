package graft.ingest

import java.nio.charset.StandardCharsets
import java.util.zip.Inflater

import scala.collection.mutable

/** Best-effort PDF text extraction, pure JDK — covers the common subset:
  * uncompressed or /FlateDecode content streams with literal-string text
  * operators (Tj, ', ", TJ arrays) in standard 8-bit encodings.
  *
  * Explicit non-goals (the reference's pypdf handles some of these):
  * CID/Type0 composite fonts with ToUnicode CMaps, predictors, encrypted
  * documents, LZW/DCT streams. Out-of-subset PDFs degrade to no extracted
  * text → the pipeline's `no_content` reject, never a crash; corrupt
  * structure degrades to a `parse_error` reason. One document per content
  * stream that yields text (pages are usually one stream each; exact page
  * mapping would need the xref/page tree, which the chunker does not
  * need).
  */
object PdfParser {

  val pdf: IngestPipeline.Parser = bytes => {
    if (bytes.length < 8 || !new String(bytes, 0, 5, StandardCharsets.ISO_8859_1).startsWith("%PDF-"))
      Left("not a PDF (missing %PDF- header)")
    else
      try {
        val docs = streams(bytes).flatMap { case (dict, data) =>
          val content =
            if (dict.contains("/FlateDecode")) inflate(data)
            else Some(data)
          content.map(c => extractText(new String(c, StandardCharsets.ISO_8859_1)))
            .filter(_.nonEmpty)
        }
        Right(docs)
      } catch { case e: Exception => Left(s"pdf error: ${e.getMessage}") }
  }

  /** All (stream dictionary, raw stream bytes) pairs, in file order. The
    * dictionary is kept as raw text — only filter names are needed. */
  private def streams(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val out = mutable.ArrayBuffer.empty[(String, Array[Byte])]
    var from = 0
    while ({
      val i = s.indexOf("stream", from)
      if (i < 0) false
      else if (i > 0 && s.charAt(i - 1).isLetter) { from = i + 6; true } // e.g. "endstream"
      else {
        // keyword must be followed by EOL per spec
        val dataStart =
          if (s.startsWith("stream\r\n", i)) i + 8
          else if (s.startsWith("stream\n", i)) i + 7
          else -1
        if (dataStart < 0) { from = i + 6; true }
        else {
          val end = s.indexOf("endstream", dataStart)
          if (end < 0) false
          else {
            val dictStart = math.max(s.lastIndexOf("<<", i), 0)
            val dict = s.substring(dictStart, i)
            // trim the EOL the writer placed before `endstream`
            var e = end
            if (e > dataStart && s.charAt(e - 1) == '\n') e -= 1
            if (e > dataStart && s.charAt(e - 1) == '\r') e -= 1
            out += ((dict, bytes.slice(dataStart, e)))
            from = end + 9
            true
          }
        }
      }
    }) ()
    out.toSeq
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val inf = new Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
      val buf = new Array[Byte](8192)
      // loop until the deflate stream's final block is seen: a truncated
      // stream ends with inflate()==0 and needsInput/needsDictionary while
      // NOT finished — that must reject the stream, not return the partial
      // bytes already produced
      var ok = true
      while (ok && !inf.finished()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (!inf.finished()) ok = false // truncated or dict-needed
      }
      inf.end()
      if (ok) Some(out.toByteArray) else None
    } catch { case _: Exception => None }

  /** Text shown by Tj / ' / " / TJ operators inside BT..ET blocks, in
    * order; TJ kerning numbers are dropped, strings concatenated. Words
    * are joined with spaces; ' (next-line show) starts a new line. */
  private[ingest] def extractText(content: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = content.length
    var inText = false
    def precededBy(op: String, at: Int): Boolean = {
      // operator follows optional whitespace after the closing delimiter
      var j = at
      while (j < n && (content.charAt(j) == ' ' || content.charAt(j) == '\r' ||
        content.charAt(j) == '\n' || content.charAt(j) == '\t')) j += 1
      content.startsWith(op, j)
    }
    while (i < n) {
      if (!inText) {
        val bt = content.indexOf("BT", i)
        if (bt < 0) i = n
        else { inText = true; i = bt + 2 }
      } else content.charAt(i) match {
        case 'E' if content.startsWith("ET", i) =>
          inText = false; i += 2
        case '(' =>
          val (lit, next) = literal(content, i)
          // include the string for any show operator; ' and " imply newline
          if (precededBy("'", next) || precededBy("\"", next)) sb.append('\n')
          else if (sb.nonEmpty && !sb.last.isWhitespace) sb.append(' ')
          sb.append(lit)
          i = next
        case _ => i += 1
      }
    }
    sb.toString.replaceAll("\\s+", " ").trim
  }

  /** Decode one PDF literal string starting at `start` (which must be
    * '('); returns (decoded, index just past the closing paren). Handles
    * nesting, backslash escapes, and octal codes per the spec. */
  private def literal(s: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var depth = 1
    var i = start + 1
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '(' => sb.append('('); i += 2
            case ')' => sb.append(')'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '\n' => i += 2 // line continuation
            case c if c >= '0' && c <= '7' =>
              var code = 0; var k = i + 1; var cnt = 0
              while (k < s.length && cnt < 3 && s.charAt(k) >= '0' && s.charAt(k) <= '7') {
                code = code * 8 + (s.charAt(k) - '0'); k += 1; cnt += 1
              }
              sb.append(code.toChar); i = k
            case c => sb.append(c); i += 2
          }
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb.append(')')
          i += 1
        case c => sb.append(c); i += 1
      }
    }
    (sb.toString, i)
  }
}
