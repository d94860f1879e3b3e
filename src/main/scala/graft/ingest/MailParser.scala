package graft.ingest

import java.nio.charset.{Charset, StandardCharsets}
import java.util.Base64

/** RFC 822/MIME email parsing (`.eml`) — pure JDK, total (`Either`,
  * never throws), same defensive contract as the other `graft.ingest`
  * parsers. Email archives are a first-class LLM-corpus source (Enron
  * etc.), and the format is pure text plumbing: header unfolding, RFC
  * 2047 encoded-words, base64/quoted-printable transfer encodings, and
  * recursive multipart walking. The reference's loader set stops at
  * office/web formats (/root/reference/helper/multiple_document_upload.py:24-30);
  * this extends the matrix the same way the OOXML/CFB parsers did.
  *
  * Subset: text/plain and text/html parts are extracted (html
  * tag-stripped); other media types (attachments, images) are skipped;
  * multipart nesting is depth-capped. Out-of-subset structure degrades
  * to skipped parts or `Left`, never a crash.
  */
object MailParser {

  private val MaxDepth = 8

  val eml: IngestPipeline.Parser = bytes =>
    try {
      val raw = new String(bytes, StandardCharsets.ISO_8859_1) // byte-transparent
      if (raw.trim.isEmpty) Left("empty message")
      else {
        val (headers, body0) = splitMessage(raw)
        // a colon-less, blank-line-less payload parses as zero headers
        // and no body; surface it as body text rather than dropping it
        val body = if (headers.isEmpty && body0.trim.isEmpty) raw else body0
        val meta = Seq("subject", "from", "to", "date")
          .flatMap(h => headers.get(h).map(v => s"${h.capitalize}: ${decodeWords(v)}"))
        val texts = partTexts(headers, body, MaxDepth)
        val doc = (meta.mkString("\n") +: texts).filter(_.nonEmpty).mkString("\n\n").trim
        if (doc.isEmpty) Right(Seq.empty) else Right(Seq(doc))
      }
    } catch { case e: Exception => Left(s"eml parse: ${e.getMessage}") }

  /** Split a message (or message part) into unfolded lowercase-keyed
    * headers and the raw body. Without the RFC's blank separator line
    * (truncated or hand-assembled input), the header block ends at the
    * first line that is neither `Name: value` nor a folded continuation
    * — everything from there on is body, so message text is never
    * silently discarded. */
  private def splitMessage(raw: String): (Map[String, String], String) = {
    val norm = raw.replace("\r\n", "\n")
    val sep = norm.indexOf("\n\n")
    val (head, body) = if (sep >= 0) (norm.substring(0, sep), norm.substring(sep + 2))
    else {
      val lines = norm.split('\n')
      val headerLike = "^[!-9;-~]+:.*$".r // RFC 5322 field-name chars, then ':'
      var i = 0
      while (i < lines.length &&
        (headerLike.matches(lines(i)) ||
          (i > 0 && lines(i).nonEmpty && (lines(i).head == ' ' || lines(i).head == '\t')))) i += 1
      (lines.take(i).mkString("\n"), lines.drop(i).mkString("\n"))
    }
    val unfolded = head.replaceAll("\n[ \t]+", " ")
    val headers = unfolded.split('\n').iterator
      .map(_.trim).filter(_.nonEmpty)
      .flatMap { line =>
        val c = line.indexOf(':')
        if (c <= 0) None
        else Some(line.substring(0, c).trim.toLowerCase -> line.substring(c + 1).trim)
      }
      .toMap // later duplicates win; fine for the metadata we surface
    (headers, body)
  }

  /** All text content of one part (recursing into multiparts). */
  private def partTexts(headers: Map[String, String], body: String, depth: Int): Seq[String] = {
    if (depth <= 0) return Seq.empty
    val ctype = headers.getOrElse("content-type", "text/plain").toLowerCase
    if (ctype.startsWith("multipart/")) {
      boundaryOf(headers.getOrElse("content-type", "")) match {
        case None => Seq.empty
        case Some(b) =>
          splitMultipart(body, b).flatMap { part =>
            val (ph, pb) = splitMessage(part)
            partTexts(ph, pb, depth - 1)
          }
      }
    } else if (ctype.startsWith("text/plain") || ctype.startsWith("text/html")) {
      val decoded = decodeTransfer(body,
        headers.getOrElse("content-transfer-encoding", "7bit").toLowerCase,
        charsetOf(headers.getOrElse("content-type", "")))
      val text =
        if (ctype.startsWith("text/html"))
          decoded.replaceAll("(?is)<(script|style)[^>]*>.*?</\\1>", " ")
            .replaceAll("<[^>]+>", " ")
        else decoded
      val clean = text.replaceAll("\\s+", " ").trim
      if (clean.isEmpty) Seq.empty else Seq(clean)
    } else Seq.empty // attachments / other media: skipped by design
  }

  /** boundary="..." or boundary=token from a Content-Type value. */
  private[ingest] def boundaryOf(ctype: String): Option[String] = {
    val m = "(?i)boundary\\s*=\\s*(\"([^\"]*)\"|([^;\\s]+))".r.findFirstMatchIn(ctype)
    m.map(g => Option(g.group(2)).getOrElse(g.group(3))).filter(_.nonEmpty)
  }

  /** The parts between --boundary delimiter LINES (preamble/epilogue
    * dropped). RFC 2046 anchors delimiters at line start and allows
    * trailing transport padding — matching the raw substring instead
    * would also cut at prefix-colliding nested boundaries ("AB" vs
    * "AB1") and at boundary text quoted inside a part's body. */
  private[ingest] def splitMultipart(body: String, boundary: String): Seq[String] = {
    val delim = "--" + boundary
    val close = delim + "--"
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inPart = false
    var done = false
    body.replace("\r\n", "\n").split('\n').foreach { line =>
      val t = line.replaceAll("[ \t]+$", "") // transport padding
      if (!done && t == close) {
        if (inPart) parts += cur.toString
        done = true
      } else if (!done && t == delim) {
        if (inPart) parts += cur.toString
        cur.clear()
        inPart = true
      } else if (!done && inPart) {
        if (cur.nonEmpty) cur.append('\n')
        cur.append(line)
      } // preamble (before first delimiter) and epilogue (after close) drop
    }
    if (inPart && !done) parts += cur.toString // unterminated: keep what parsed
    parts.toSeq
  }

  /** Decode a transfer encoding, then bytes → text at the declared
    * charset (unknown charsets fall back to UTF-8). The raw string is
    * ISO-8859-1 (byte-transparent), so round-tripping through it is
    * lossless. */
  private def decodeTransfer(body: String, cte: String, charset: Charset): String =
    cte match {
      case "base64" =>
        val compact = body.filterNot(c => c == '\n' || c == '\r' || c == ' ' || c == '\t')
        // the MIME decoder skips non-alphabet bytes but still throws on a
        // dangling trailing unit — an undecodable part degrades to its
        // raw bytes rather than failing the whole message
        try new String(Base64.getMimeDecoder.decode(
          compact.getBytes(StandardCharsets.ISO_8859_1)), charset)
        catch {
          case _: IllegalArgumentException =>
            new String(body.getBytes(StandardCharsets.ISO_8859_1), charset)
        }
      case "quoted-printable" =>
        new String(decodeQp(body.replace("\r\n", "\n")), charset)
      case _ => // 7bit / 8bit / binary: bytes as-is at the declared charset
        new String(body.getBytes(StandardCharsets.ISO_8859_1), charset)
    }

  private def decodeQp(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=' && i + 1 < s.length && s.charAt(i + 1) == '\n') i += 2 // soft break
      else if (c == '=' && i + 2 < s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else { out.write(c.toInt & 0xff); i += 1 }
    }
    out.toByteArray
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')

  private def charsetOf(ctype: String): Charset = {
    val m = "(?i)charset\\s*=\\s*(\"([^\"]*)\"|([^;\\s]+))".r.findFirstMatchIn(ctype)
    m.map(g => Option(g.group(2)).getOrElse(g.group(3)))
      .flatMap(n => try Some(Charset.forName(n)) catch { case _: Exception => None })
      .getOrElse(StandardCharsets.UTF_8)
  }

  /** RFC 2047 encoded-words in headers: `=?charset?B|Q?text?=`. */
  private[ingest] def decodeWords(v: String): String =
    "=\\?([^?]+)\\?([BbQq])\\?([^?]*)\\?=".r.replaceAllIn(v, { m =>
      val cs = try Charset.forName(m.group(1)) catch { case _: Exception => StandardCharsets.UTF_8 }
      val decoded = m.group(2).toUpperCase match {
        case "B" =>
          try new String(Base64.getMimeDecoder.decode(m.group(3)), cs)
          catch { case _: Exception => m.group(3) }
        case _ => // Q: quoted-printable with '_' as space
          new String(decodeQp(m.group(3).replace("_", " ")), cs)
      }
      java.util.regex.Matcher.quoteReplacement(decoded)
    })
}
