package graft.ingest

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

/** OOXML parser tests against hand-built archives — the same ZIP+XML
  * shapes Word/Excel/PowerPoint write (namespaced parts, shared-string
  * tables, multiple slides/sheets). */
class OfficeParsersSpec extends AnyFunSuite {

  private def zip(entries: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes(StandardCharsets.UTF_8))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  test("docx: paragraphs of runs extract in order, one document per file") {
    val doc = zip(
      "[Content_Types].xml" -> "<Types/>",
      "word/document.xml" ->
        """<?xml version="1.0"?>
          |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
          |<w:body>
          |<w:p><w:r><w:t>Hello </w:t></w:r><w:r><w:t>world</w:t></w:r></w:p>
          |<w:p><w:r><w:t>Second paragraph</w:t></w:r></w:p>
          |<w:p/>
          |</w:body></w:document>""".stripMargin)
    assert(OfficeParsers.docx(doc) == Right(Seq("Hello world\nSecond paragraph")))
  }

  test("pptx: one document per slide, numeric slide order (slide10 after slide2)") {
    val deck = zip(
      "ppt/slides/slide10.xml" ->
        """<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">
          |<a:t>tenth</a:t></p:sld>""".stripMargin,
      "ppt/slides/slide1.xml" ->
        """<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">
          |<a:t>title</a:t><a:t>body</a:t></p:sld>""".stripMargin,
      "ppt/slides/slide2.xml" ->
        """<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">
          |<a:t>second</a:t></p:sld>""".stripMargin)
    assert(OfficeParsers.pptx(deck) == Right(Seq("title\nbody", "second", "tenth")))
  }

  test("xlsx: shared strings resolve, numbers pass through, one doc per sheet") {
    val book = zip(
      "xl/sharedStrings.xml" ->
        """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |<si><t>name</t></si><si><r><t>sco</t></r><r><t>re</t></r></si><si><t>alice</t></si>
          |</sst>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |<sheetData>
          |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
          |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>41.5</v></c></row>
          |</sheetData></worksheet>""".stripMargin,
      "xl/worksheets/sheet2.xml" ->
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |<sheetData><row r="1"><c r="A1"><v>7</v></c></row></sheetData></worksheet>""".stripMargin)
    assert(OfficeParsers.xlsx(book) ==
      Right(Seq("name score\nalice 41.5", "7")))
  }

  test("xlsx: inline-string cells (no shared-string table) extract their text") {
    val book = zip(
      "xl/worksheets/sheet1.xml" ->
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |<sheetData>
          |<row r="1"><c r="A1" t="inlineStr"><is><t>inline</t><t> runs</t></is></c>
          |<c r="B1"><v>3</v></c></row>
          |</sheetData></worksheet>""".stripMargin)
    assert(OfficeParsers.xlsx(book) == Right(Seq("inline runs 3")))
  }

  test("corrupt archives and non-OOXML bytes reject with a reason, not an exception") {
    assert(OfficeParsers.docx("not a zip at all".getBytes).isLeft)
    assert(OfficeParsers.xlsx(Array[Byte](0x50, 0x4b, 0x03, 0x04, 0, 0)).isLeft)
    // a valid zip that is not a docx
    assert(OfficeParsers.docx(zip("other.txt" -> "hi")).isLeft)
    // malformed XML inside a well-formed zip
    assert(OfficeParsers.docx(zip("word/document.xml" -> "<w:document><unclosed")).isLeft)
  }
}
