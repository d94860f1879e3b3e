package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.Charset

import scala.collection.mutable

/** Best-effort parsers for the legacy binary office formats (doc/xls/ppt)
  * on top of the [[Cfb]] container reader — the formats the reference
  * feeds to `unstructured` loaders. Pure JVM, honest subsets:
  *
  *  - .doc: Word 97+ piece table (CLX/PlcPcd in the table stream) with
  *    per-piece cp1252/UTF-16 decoding; falls back to the fcMin..fcMac
  *    window for simple single-piece files.
  *  - .xls: BIFF8 shared-string table (SST) strings in order; strings
  *    that span Continue-record boundaries are truncated at the boundary
  *    (typical fixture/test scale fits one record).
  *  - .ppt: TextCharsAtom/TextBytesAtom records walked recursively
  *    through the record containers of the PowerPoint Document stream.
  *
  * Out-of-subset structure degrades to no extracted text (→ the
  * pipeline's no_content reject) or a parse_error reason — never a crash.
  */
object LegacyOfficeParsers {

  private val cp1252 = Charset.forName("windows-1252")
  private val utf16 = Charset.forName("UTF-16LE")

  /** Word control characters → plain text: CR to newline, cell marks
    * (0x07) to tabs, soft returns (0x0B) to newlines, field markers and
    * remaining control chars to spaces. */
  private def cleanWordText(s: String): String =
    s.map {
      case '\r' => '\n'
      case '\u0007' => '\t' // cell mark
      case '\u000B' => '\n' // vertical tab = soft return
      case c if c < ' ' && c != '\n' && c != '\t' => ' '
      case c => c
    }.mkString.replaceAll("[ \\t]+", " ").replaceAll("\\s*\\n\\s*", "\n").trim

  val doc: IngestPipeline.Parser = bytes =>
    Cfb.streams(bytes).flatMap { streams =>
      streams.get("worddocument") match {
        case None => Left("doc: no WordDocument stream")
        case Some(wd) if wd.length < 0x200 => Left("doc: WordDocument stream too short")
        case Some(wd) =>
          val b = ByteBuffer.wrap(wd).order(ByteOrder.LITTLE_ENDIAN)
          if ((b.getShort(0) & 0xFFFF) != 0xA5EC) Left("doc: bad FIB magic")
          else {
            val flags = b.getShort(10).toInt
            val whichTable = if ((flags & 0x0200) != 0) "1table" else "0table"
            val fcMin = b.getInt(24)
            val fcMac = b.getInt(28)
            val pieces = for {
              table <- streams.get(whichTable)
              txt <- pieceTableText(wd, table,
                fcClx = b.getInt(0x01A2), lcbClx = b.getInt(0x01A6))
            } yield txt
            val text = pieces.getOrElse {
              // single-piece fallback: the legacy text window, cp1252
              if (fcMin >= 0 && fcMac > fcMin && fcMac <= wd.length)
                new String(wd, fcMin, fcMac - fcMin, cp1252)
              else ""
            }
            val cleaned = cleanWordText(text)
            Right(if (cleaned.isEmpty) Seq.empty else Seq(cleaned))
          }
      }
    }

  /** Decode the Word97 piece table: CLX at table[fcClx..+lcbClx] = Prc*
    * then Pcdt(0x02, lcb, PlcPcd); PlcPcd = (n+1) CPs + n PCDs; each PCD's
    * fc bit 30 selects cp1252 (fc/2) vs UTF-16 (fc). */
  private def pieceTableText(wd: Array[Byte], table: Array[Byte],
      fcClx: Int, lcbClx: Int): Option[String] = {
    if (fcClx < 0 || lcbClx <= 0 || fcClx + lcbClx > table.length) return None
    try {
      val clx = ByteBuffer.wrap(table, fcClx, lcbClx).order(ByteOrder.LITTLE_ENDIAN)
      var p = fcClx
      val end = fcClx + lcbClx
      // skip Prc entries (0x01 marker + u16 size + grpprl)
      while (p < end && table(p) == 0x01) {
        val cb = clx.getShort(p + 1) & 0xFFFF
        p += 3 + cb
      }
      if (p >= end || table(p) != 0x02) return None
      val lcb = clx.getInt(p + 1)
      val plcStart = p + 5
      if (lcb < 12 + 4 || plcStart + lcb > end + 1) return None
      val n = (lcb - 4) / 12
      if (n <= 0) return None
      val cps = (0 to n).map(i => clx.getInt(plcStart + i * 4))
      val sb = new StringBuilder
      for (i <- 0 until n) {
        val pcdOff = plcStart + (n + 1) * 4 + i * 8
        val fcRaw = clx.getInt(pcdOff + 2)
        val compressed = (fcRaw & 0x40000000) != 0
        val fc = if (compressed) (fcRaw & 0x3FFFFFFF) / 2 else fcRaw & 0x3FFFFFFF
        val nChars = cps(i + 1) - cps(i)
        if (nChars > 0) {
          if (compressed) {
            if (fc >= 0 && fc + nChars <= wd.length)
              sb.append(new String(wd, fc, nChars, cp1252))
          } else {
            if (fc >= 0 && fc + nChars * 2 <= wd.length)
              sb.append(new String(wd, fc, nChars * 2, utf16))
          }
        }
      }
      val s = sb.toString
      if (s.isEmpty) None else Some(s)
    } catch { case _: Exception => None }
  }

  val xls: IngestPipeline.Parser = bytes =>
    Cfb.streams(bytes).flatMap { streams =>
      streams.get("workbook").orElse(streams.get("book")) match {
        case None => Left("xls: no Workbook stream")
        case Some(wb) =>
          val strings = biff8SstStrings(wb)
          Right(if (strings.isEmpty) Seq.empty else Seq(strings.mkString("\n")))
      }
    }

  /** BIFF8 record walk: SST (0x00FC) unique strings, in order. Strings
    * crossing into a Continue record (0x003C) are truncated there. */
  private def biff8SstStrings(wb: Array[Byte]): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val b = ByteBuffer.wrap(wb).order(ByteOrder.LITTLE_ENDIAN)
    var p = 0
    try {
      while (p + 4 <= wb.length) {
        val recType = b.getShort(p) & 0xFFFF
        val recLen = b.getShort(p + 2) & 0xFFFF
        val payloadStart = p + 4
        if (payloadStart + recLen > wb.length) return out.toSeq
        if (recType == 0x00FC && recLen >= 8) {
          val cstUnique = b.getInt(payloadStart + 4)
          var q = payloadStart + 8
          val payloadEnd = payloadStart + recLen
          var k = 0
          var ok = true
          while (ok && k < cstUnique && q + 3 <= payloadEnd) {
            val cch = b.getShort(q) & 0xFFFF
            val grbit = wb(q + 2) & 0xFF
            q += 3
            val fHigh = (grbit & 0x01) != 0
            val fExt = (grbit & 0x04) != 0
            val fRich = (grbit & 0x08) != 0
            var cRun = 0
            var cbExt = 0
            if (fRich) { if (q + 2 > payloadEnd) { ok = false } else { cRun = b.getShort(q) & 0xFFFF; q += 2 } }
            if (ok && fExt) {
              if (q + 4 > payloadEnd) ok = false
              else {
                cbExt = b.getInt(q); q += 4
                // a crafted negative cbExt would move the cursor backward
                // (or hold it still), turning cstUnique into a spin count
                if (cbExt < 0) ok = false
              }
            }
            if (ok) {
              val byteLen = if (fHigh) cch * 2 else cch
              if (q + byteLen > payloadEnd) {
                // string spans a Continue record: take what fits, stop
                val fit = payloadEnd - q
                val chars = if (fHigh) fit / 2 * 2 else fit
                if (chars > 0)
                  out += new String(wb, q, chars, if (fHigh) utf16 else cp1252)
                ok = false
              } else {
                out += new String(wb, q, byteLen, if (fHigh) utf16 else cp1252)
                q += byteLen + cRun * 4 + cbExt
                k += 1
              }
            }
          }
        }
        p = payloadStart + recLen
      }
    } catch { case _: Exception => () }
    out.toSeq.filter(_.nonEmpty)
  }

  val ppt: IngestPipeline.Parser = bytes =>
    Cfb.streams(bytes).flatMap { streams =>
      streams.get("powerpoint document") match {
        case None => Left("ppt: no PowerPoint Document stream")
        case Some(pd) =>
          try {
            val texts = mutable.ArrayBuffer.empty[String]
            walkPptRecords(pd, 0, pd.length, texts, depth = 0)
            val joined = texts.map(_.trim).filter(_.nonEmpty).mkString("\n")
            Right(if (joined.isEmpty) Seq.empty else Seq(joined))
          } catch { case ex: Exception => Left(s"ppt error: ${ex.getMessage}") }
      }
    }

  /** Recursive record walk: containers (recVer 0xF) recurse; TextCharsAtom
    * (0x0FA0, UTF-16) and TextBytesAtom (0x0FA8, cp1252) collect. */
  private def walkPptRecords(pd: Array[Byte], from: Int, to: Int,
      out: mutable.ArrayBuffer[String], depth: Int): Unit = {
    if (depth > 32) return
    val b = ByteBuffer.wrap(pd).order(ByteOrder.LITTLE_ENDIAN)
    var p = from
    while (p + 8 <= to) {
      val verInst = b.getShort(p) & 0xFFFF
      val recType = b.getShort(p + 2) & 0xFFFF
      val recLen = b.getInt(p + 4)
      val body = p + 8
      // recLen > to - body, not body + recLen > to: the latter overflows
      // Int for crafted recLen near Int.MaxValue and skips the guard
      if (recLen < 0 || recLen > to - body) return
      if ((verInst & 0x000F) == 0x000F)
        walkPptRecords(pd, body, body + recLen, out, depth + 1)
      else if (recType == 0x0FA0)
        out += new String(pd, body, recLen / 2 * 2, utf16).replace('\r', '\n')
      else if (recType == 0x0FA8)
        out += new String(pd, body, recLen, cp1252).replace('\r', '\n')
      p = body + recLen
    }
  }
}
