package graft.ingest

import java.nio.charset.StandardCharsets
import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite

class MailParserSpec extends AnyFunSuite {

  private def parse(s: String): Either[String, Seq[String]] =
    MailParser.eml(s.getBytes(StandardCharsets.UTF_8))

  private def text(s: String): String = parse(s) match {
    case Right(Seq(doc)) => doc
    case other => fail(s"expected one document, got $other")
  }

  test("plain message: headers surface and body extracts") {
    val doc = text(
      "From: alice@example.com\r\nTo: bob@example.com\r\n" +
        "Subject: quarterly report\r\nDate: Tue, 1 Jul 2025 10:00:00 +0000\r\n" +
        "\r\nThe numbers look good.\r\nSee attached.\r\n")
    assert(doc.contains("Subject: quarterly report"))
    assert(doc.contains("From: alice@example.com"))
    assert(doc.contains("The numbers look good. See attached."))
  }

  test("folded headers unfold before parsing") {
    val doc = text(
      "Subject: a very\r\n  long subject line\r\n\r\nbody here\r\n")
    assert(doc.contains("Subject: a very long subject line"))
  }

  test("base64 body decodes at the declared charset") {
    val payload = Base64.getEncoder.encodeToString("héllo wörld".getBytes("UTF-8"))
    val doc = text(
      "Subject: enc\r\nContent-Type: text/plain; charset=UTF-8\r\n" +
        s"Content-Transfer-Encoding: base64\r\n\r\n$payload\r\n")
    assert(doc.contains("héllo wörld"))
  }

  test("quoted-printable body decodes soft breaks and hex escapes") {
    val doc = text(
      "Subject: qp\r\nContent-Type: text/plain; charset=ISO-8859-1\r\n" +
        "Content-Transfer-Encoding: quoted-printable\r\n\r\n" +
        "caf=E9 au=\r\nlait\r\n")
    assert(doc.contains("café aulait"))
  }

  test("RFC 2047 encoded-words in Subject decode (B and Q forms)") {
    val b64 = Base64.getEncoder.encodeToString("résumé".getBytes("UTF-8"))
    val docB = text(s"Subject: =?UTF-8?B?$b64?=\r\n\r\nx\r\n")
    assert(docB.contains("Subject: résumé"))
    val docQ = text("Subject: =?ISO-8859-1?Q?caf=E9_time?=\r\n\r\nx\r\n")
    assert(docQ.contains("Subject: café time"))
  }

  test("multipart/alternative extracts both text parts, html tag-stripped") {
    val eml =
      "Subject: multi\r\nContent-Type: multipart/alternative; boundary=\"XYZ\"\r\n\r\n" +
        "preamble ignored\r\n" +
        "--XYZ\r\nContent-Type: text/plain\r\n\r\nplain body\r\n" +
        "--XYZ\r\nContent-Type: text/html\r\n\r\n<p>html <b>body</b></p>\r\n" +
        "--XYZ--\r\nepilogue ignored\r\n"
    val doc = text(eml)
    assert(doc.contains("plain body"))
    assert(doc.contains("html body"))
    assert(!doc.contains("preamble") && !doc.contains("epilogue"))
    assert(!doc.contains("<p>"))
  }

  test("nested multipart recurses; binary attachments are skipped") {
    val eml =
      "Subject: nested\r\nContent-Type: multipart/mixed; boundary=OUTER\r\n\r\n" +
        "--OUTER\r\nContent-Type: multipart/alternative; boundary=INNER\r\n\r\n" +
        "--INNER\r\nContent-Type: text/plain\r\n\r\ninner text\r\n" +
        "--INNER--\r\n" +
        "--OUTER\r\nContent-Type: application/pdf\r\nContent-Transfer-Encoding: base64\r\n\r\n" +
        "JVBERi0xLjQ=\r\n" +
        "--OUTER--\r\n"
    val doc = text(eml)
    assert(doc.contains("inner text"))
    assert(!doc.contains("JVBERi"), "attachment payload must not leak into text")
  }

  test("totality: garbage and pathological inputs never throw") {
    assert(parse("").isLeft)
    // headerless body is still readable content
    assert(MailParser.eml("just some text\nno headers".getBytes).isRight)
    // unterminated boundary, bad base64, unknown charset: degrade, not crash
    val weird =
      "Subject: w\r\nContent-Type: multipart/mixed; boundary=B\r\n\r\n--B\r\n" +
        "Content-Type: text/plain; charset=not-a-charset\r\n" +
        "Content-Transfer-Encoding: base64\r\n\r\n!!!not base64!!!\r\n"
    assert(MailParser.eml(weird.getBytes).isRight)
    // depth bomb: 20 nested multiparts stay bounded
    val bomb = (0 until 20).foldLeft("deep text") { (inner, i) =>
      s"Content-Type: multipart/mixed; boundary=B$i\r\n\r\n--B$i\r\n$inner\r\n--B$i--\r\n"
    }
    assert(MailParser.eml(("Subject: bomb\r\n" + bomb).getBytes).isRight)
  }

  test("eml flows through the ingest parser registry") {
    val p = IngestPipeline.defaultParsers("eml")
    val got = p("Subject: hi\r\n\r\nhello world\r\n".getBytes(StandardCharsets.UTF_8))
    assert(got == Right(Seq("Subject: hi\n\nhello world")))
    assert(IngestPipeline.AllowedExts.contains("eml"))
  }
}
