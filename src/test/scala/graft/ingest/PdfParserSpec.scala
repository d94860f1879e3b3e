package graft.ingest

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

import org.scalatest.funsuite.AnyFunSuite

/** PdfParser tests against hand-built PDFs: uncompressed and
  * Flate-compressed content streams, escape/octal/nesting in literal
  * strings, TJ arrays, and graceful degradation outside the subset. */
class PdfParserSpec extends AnyFunSuite {

  private def deflate(s: String): Array[Byte] = {
    val d = new Deflater()
    d.setInput(s.getBytes(StandardCharsets.ISO_8859_1)); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Assemble a minimal PDF wrapping the given raw stream bodies. */
  private def pdf(streams: (String, Array[Byte])*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("%PDF-1.4\n".getBytes(StandardCharsets.ISO_8859_1))
    streams.zipWithIndex.foreach { case ((filter, data), i) =>
      val dict = s"<< /Length ${data.length} $filter >>"
      out.write(s"${i + 1} 0 obj\n$dict\nstream\n".getBytes(StandardCharsets.ISO_8859_1))
      out.write(data)
      out.write("\nendstream\nendobj\n".getBytes(StandardCharsets.ISO_8859_1))
    }
    out.write("%%EOF\n".getBytes(StandardCharsets.ISO_8859_1))
    out.toByteArray
  }

  test("uncompressed content stream: Tj and TJ text extracts in order") {
    val content = "BT /F1 12 Tf 72 720 Td (Hello) Tj [(wor) -20 (ld)] TJ ET"
    val doc = pdf("" -> content.getBytes(StandardCharsets.ISO_8859_1))
    assert(PdfParser.pdf(doc) == Right(Seq("Hello wor ld")))
  }

  test("FlateDecode content stream inflates and extracts") {
    val content = "BT (Compressed text works) Tj ET"
    val doc = pdf("/Filter /FlateDecode" -> deflate(content))
    assert(PdfParser.pdf(doc) == Right(Seq("Compressed text works")))
  }

  test("literal string escapes: nested parens, octal, backslash escapes") {
    val content = """BT (a \(nested\) \134 pair) Tj (oct\101l) Tj ET"""
    val doc = pdf("" -> content.getBytes(StandardCharsets.ISO_8859_1))
    val Right(Seq(text)) = PdfParser.pdf(doc): @unchecked
    assert(text.contains("a (nested) \\ pair"))
    assert(text.contains("octAl")) // \101 = 'A'
  }

  test("text outside BT/ET is ignored; textless PDFs yield no documents") {
    val content = "(not shown) Tj"
    val doc = pdf("" -> content.getBytes(StandardCharsets.ISO_8859_1))
    assert(PdfParser.pdf(doc) == Right(Seq()))
  }

  test("multiple streams become multiple documents (page-per-stream shape)") {
    val doc = pdf(
      "" -> "BT (page one) Tj ET".getBytes(StandardCharsets.ISO_8859_1),
      "/Filter /FlateDecode" -> deflate("BT (page two) Tj ET"))
    assert(PdfParser.pdf(doc) == Right(Seq("page one", "page two")))
  }

  test("non-PDF bytes and corrupt streams reject or degrade, never throw") {
    assert(PdfParser.pdf("plain text pretending".getBytes).isLeft)
    // valid header, garbage flate data -> stream skipped, no crash
    val bad = pdf("/Filter /FlateDecode" -> Array[Byte](1, 2, 3, 4))
    assert(bad.length > 0)
    assert(PdfParser.pdf(bad) == Right(Seq()))
  }

  test("a truncated Flate stream is skipped entirely, not partially extracted") {
    val full = deflate("BT (visible prefix) Tj (lost suffix) Tj ET")
    // cut the deflate stream mid-way: decodable prefix, missing final block
    val truncated = full.take(full.length / 2)
    val doc = pdf("/Filter /FlateDecode" -> truncated)
    assert(PdfParser.pdf(doc) == Right(Seq()),
      "partial inflate output must not leak into extracted text")
  }

  test("end-to-end: a real Flate PDF uploads ok through the default pipeline") {
    // exercised via IngestPipeline.defaultParsers dispatch in IngestPipelineSpec
    val doc = pdf("/Filter /FlateDecode" -> deflate("BT (ingestable pdf body) Tj ET"))
    assert(IngestPipeline.defaultParsers("pdf")(doc) == Right(Seq("ingestable pdf body")))
  }
}
