package graft.ingest

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.ZipInputStream

import scala.collection.mutable

/** Real parsers for the OOXML office formats the reference ingests through
  * langchain loaders (docx/xlsx/pptx —
  * /root/reference/helper/multiple_document_upload.py:36-62). OOXML is
  * ZIP + XML, so these need nothing beyond the JDK (java.util.zip +
  * javax.xml.stream): no external decoder, no stub.
  *
  * Document granularity mirrors the reference's loaders: docx → one
  * document (paragraph texts joined by newlines), pptx → one document per
  * slide, xlsx → one document per sheet ("cell cell ..." lines per row).
  * Legacy OLE2 formats (doc/xls/ppt) remain undecodable in this build and
  * reject with parse_error through the same seam.
  *
  * Parsers run inside the ingest UDF on executors; each call allocates
  * only streaming readers (no DOM), so memory stays bounded by the largest
  * single XML part, not the archive.
  */
object OfficeParsers {

  /** Read all ZIP entries whose names match `keep`, preserving archive
    * order. Returns Left on ZIP-level corruption. */
  private def zipEntries(bytes: Array[Byte], keep: String => Boolean): Either[String, Seq[(String, Array[Byte])]] =
    try {
      val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
      val out = mutable.ArrayBuffer.empty[(String, Array[Byte])]
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory && keep(e.getName)) out += ((e.getName, zin.readAllBytes()))
        e = zin.getNextEntry
      }
      if (out.isEmpty) Left("not an OOXML archive (no matching parts)")
      else Right(out.toSeq)
    } catch { case ex: Exception => Left(s"zip error: ${ex.getMessage}") }

  /** Collect the character content of every element with the given local
    * name (namespace-agnostic), in document order. */
  private def textOf(xml: Array[Byte], localName: String): Either[String, Seq[String]] =
    try {
      val f = javax.xml.stream.XMLInputFactory.newInstance()
      f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
      f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
      val r = f.createXMLStreamReader(new ByteArrayInputStream(xml), "UTF-8")
      val out = mutable.ArrayBuffer.empty[String]
      var inTarget = 0
      val sb = new StringBuilder
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            if (r.getLocalName == localName) { inTarget += 1; sb.clear() }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS if inTarget > 0 =>
            sb.append(r.getText)
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            if (r.getLocalName == localName && inTarget > 0) { inTarget -= 1; out += sb.toString }
          case _ => ()
        }
      }
      r.close()
      Right(out.toSeq)
    } catch { case ex: Exception => Left(s"xml error: ${ex.getMessage}") }

  /** docx: word/document.xml — paragraphs (<w:p>) of runs (<w:t>), one
    * document per file with paragraphs joined by '\n'. */
  val docx: IngestPipeline.Parser = bytes =>
    zipEntries(bytes, _ == "word/document.xml").flatMap { parts =>
      paragraphs(parts.head._2, paraLocal = "p", runLocal = "t").map { ps =>
        Seq(ps.filter(_.nonEmpty).mkString("\n"))
      }
    }

  /** pptx: ppt/slides/slideN.xml — one document per slide (numeric order),
    * text runs (<a:t>) joined by '\n'. */
  val pptx: IngestPipeline.Parser = bytes => {
    val slideRe = "ppt/slides/slide(\\d+)\\.xml".r
    zipEntries(bytes, n => slideRe.pattern.matcher(n).matches()).flatMap { parts =>
      val ordered = parts.sortBy { case (name, _) =>
        name match { case slideRe(i) => i.toInt; case _ => Int.MaxValue }
      }
      val docs = ordered.map { case (_, xml) => textOf(xml, "t").map(_.mkString("\n")) }
      docs.collectFirst { case Left(err) => Left(err) }
        .getOrElse(Right(docs.collect { case Right(s) => s }))
    }
  }

  /** xlsx: xl/sharedStrings.xml (string table) + xl/worksheets/sheetN.xml
    * — one document per sheet, one line per row, cells space-joined.
    * Shared-string cells (t="s") resolve through the table; inline
    * numeric/boolean cells pass their <v> text through. */
  val xlsx: IngestPipeline.Parser = bytes => {
    val sheetRe = "xl/worksheets/sheet(\\d+)\\.xml".r
    zipEntries(bytes, n => n == "xl/sharedStrings.xml" || sheetRe.pattern.matcher(n).matches())
      .flatMap { parts =>
        val shared: Either[String, IndexedSeq[String]] =
          parts.find(_._1 == "xl/sharedStrings.xml") match {
            case Some((_, xml)) => textOf(xml, "si").map(_.toIndexedSeq)
            case None => Right(IndexedSeq.empty)
          }
        shared.flatMap { table =>
          val sheets = parts.collect { case (name @ sheetRe(i), xml) => (i.toInt, name, xml) }
            .sortBy(_._1)
          if (sheets.isEmpty) Left("xlsx: no worksheets")
          else {
            val docs = sheets.map { case (_, _, xml) => sheetText(xml, table) }
            docs.collectFirst { case Left(err) => Left(err) }
              .getOrElse(Right(docs.collect { case Right(s) => s }))
          }
        }
      }
  }

  /** Group run texts (`runLocal`) by enclosing paragraph (`paraLocal`). */
  private def paragraphs(xml: Array[Byte], paraLocal: String, runLocal: String): Either[String, Seq[String]] =
    try {
      val f = javax.xml.stream.XMLInputFactory.newInstance()
      f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
      f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
      val r = f.createXMLStreamReader(new ByteArrayInputStream(xml), "UTF-8")
      val out = mutable.ArrayBuffer.empty[String]
      val para = new StringBuilder
      var inPara = false
      var inRun = false
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            if (r.getLocalName == paraLocal) { inPara = true; para.clear() }
            else if (r.getLocalName == runLocal && inPara) inRun = true
          case javax.xml.stream.XMLStreamConstants.CHARACTERS if inRun =>
            para.append(r.getText)
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            if (r.getLocalName == runLocal) inRun = false
            else if (r.getLocalName == paraLocal && inPara) { inPara = false; out += para.toString }
          case _ => ()
        }
      }
      r.close()
      Right(out.toSeq)
    } catch { case ex: Exception => Left(s"xml error: ${ex.getMessage}") }

  /** One line per <row>, cells space-joined. Cell value forms: t="s"
    * resolves <v> through the shared-string table, t="inlineStr" takes
    * the <is><t>…</t></is> runs directly (writers like openpyxl's
    * write-only mode emit no shared-string table at all), every other
    * type passes its <v> text through. */
  private def sheetText(xml: Array[Byte], shared: IndexedSeq[String]): Either[String, String] =
    try {
      val f = javax.xml.stream.XMLInputFactory.newInstance()
      f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
      f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
      val r = f.createXMLStreamReader(new ByteArrayInputStream(xml), "UTF-8")
      val rows = mutable.ArrayBuffer.empty[String]
      val cells = mutable.ArrayBuffer.empty[String]
      val v = new StringBuilder
      var cellIsShared = false
      var cellIsInline = false
      var inV = false
      var inInlineT = false
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => cells.clear()
              case "c" =>
                val t = r.getAttributeValue(null, "t")
                cellIsShared = t == "s"
                cellIsInline = t == "inlineStr"
                v.clear()
              case "v" => inV = true; v.clear()
              case "t" if cellIsInline => inInlineT = true
              case _ => ()
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS if inV || inInlineT =>
            v.append(r.getText)
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" =>
                inV = false
                val raw = v.toString
                cells += (if (cellIsShared)
                  raw.toIntOption.flatMap(shared.lift).getOrElse(raw)
                else raw)
              case "t" => inInlineT = false
              case "c" if cellIsInline =>
                cells += v.toString
                cellIsInline = false
              case "row" => if (cells.nonEmpty) rows += cells.mkString(" ")
              case _ => ()
            }
          case _ => ()
        }
      }
      r.close()
      Right(rows.mkString("\n"))
    } catch { case ex: Exception => Left(s"xml error: ${ex.getMessage}") }
}
