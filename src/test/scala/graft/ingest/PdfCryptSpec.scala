package graft.ingest

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.zip.Deflater

import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

import org.scalatest.funsuite.AnyFunSuite

/** Encrypted-PDF extraction against hand-encrypted fixtures: the standard
  * security handler with an empty user password (permissions-only
  * encryption) across its three eras — RC4 (/V 1), AES-128 crypt filters
  * (/V 4 /AESV2), and AES-256 (/V 5 /R 6 /AESV3). The test encryptors
  * reuse the parser's own primitives for key derivation (fileKeyR234,
  * hash2B, rc4 are symmetric/shared) but drive them from the ENCRYPT
  * side, so a key-schedule bug cannot cancel itself out: AES content is
  * encrypted with javax.crypto directly, and the R6 /U//UE material is
  * constructed from scratch. */
class PdfCryptSpec extends AnyFunSuite {

  private def deflate(s: String): Array[Byte] = {
    val d = new Deflater()
    d.setInput(s.getBytes(StandardCharsets.ISO_8859_1)); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def hex(b: Array[Byte]): String = "<" + b.map("%02X".format(_)).mkString + ">"

  private final class Builder {
    val out = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    def raw(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    def obj(num: Int, body: String): Unit = {
      offsets(num) = out.size()
      raw(s"$num 0 obj\n$body\nendobj\n")
    }
    def streamObj(num: Int, dict: String, data: Array[Byte]): Unit = {
      offsets(num) = out.size()
      raw(s"$num 0 obj\n<< $dict /Length ${data.length} >>\nstream\n")
      out.write(data)
      raw("\nendstream\nendobj\n")
    }
    def bytes: Array[Byte] = out.toByteArray
  }

  /** Per-object key for V < 5 (Algorithm 1): MD5(fileKey ‖ num₃ ‖ gen₂
    * [‖ "sAlT"]), truncated to min(len+5, 16). */
  private def objKey(fileKey: Array[Byte], num: Int, gen: Int, aes: Boolean): Array[Byte] = {
    val md = MessageDigest.getInstance("MD5")
    md.update(fileKey)
    md.update(Array((num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
      ((num >> 16) & 0xff).toByte, (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte))
    if (aes) md.update("sAlT".getBytes(StandardCharsets.ISO_8859_1))
    java.util.Arrays.copyOf(md.digest(), math.min(fileKey.length + 5, 16))
  }

  private def aesEncrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val iv = Array.tabulate(16)(i => (i * 7 + 3).toByte) // fixed: determinism
    val c = Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    iv ++ c.doFinal(data)
  }

  /** Assemble catalog/pages/page/contents + /Encrypt + classic xref. */
  private def encryptedPdf(encDict: String, id0: Array[Byte],
      encryptContent: Array[Byte] => Array[Byte]): Array[Byte] = {
    val b = new Builder
    b.raw("%PDF-1.6\n")
    b.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    b.streamObj(4, "/Filter /FlateDecode",
      encryptContent(deflate("BT (encrypted but readable) Tj ET")))
    b.obj(5, encDict)
    val xref = b.out.size()
    b.raw("xref\n0 6\n0000000000 65535 f \n")
    (1 to 5).foreach(n => b.raw(f"${b.offsets(n)}%010d 00000 n \n"))
    b.raw(s"trailer\n<< /Size 6 /Root 1 0 R /Encrypt 5 0 R " +
      s"/ID [${hex(id0)} ${hex(id0)}] >>\nstartxref\n$xref\n%%EOF\n")
    b.bytes
  }

  private val id0 = Array.tabulate(16)(i => (i * 13 + 1).toByte)
  private val oEntry = Array.tabulate(32)(i => (i * 11 + 5).toByte) // unvalidated for empty-pw reads

  test("RC4 40-bit (/V 1 /R 2) content stream decrypts and extracts") {
    val fileKey = PdfParser.fileKeyR234(oEntry, -44, id0, 5, 2)
    val doc = encryptedPdf(
      s"<< /Filter /Standard /V 1 /R 2 /Length 40 /O ${hex(oEntry)} " +
        s"/U ${hex(new Array[Byte](32))} /P -44 >>",
      id0,
      data => PdfParser.rc4(objKey(fileKey, 4, 0, aes = false), data))
    assert(PdfParser.pdf(doc) == Right(Seq("encrypted but readable")))
  }

  test("RC4 128-bit (/V 2 /R 3) with the 50x key re-hash decrypts") {
    val fileKey = PdfParser.fileKeyR234(oEntry, -3904, id0, 16, 3)
    val doc = encryptedPdf(
      s"<< /Filter /Standard /V 2 /R 3 /Length 128 /O ${hex(oEntry)} " +
        s"/U ${hex(new Array[Byte](32))} /P -3904 >>",
      id0,
      data => PdfParser.rc4(objKey(fileKey, 4, 0, aes = false), data))
    assert(PdfParser.pdf(doc) == Right(Seq("encrypted but readable")))
  }

  test("crypt-filter /Length 40 means 40 BITS (5 bytes), never 40 bytes") {
    // 40 bytes = a 320-bit key no revision defines; a writer emitting
    // /CFM /V2 /Length 40 means a 40-bit RC4 key and must decrypt
    val fileKey = PdfParser.fileKeyR234(oEntry, -3904, id0, 5, 4)
    val doc = encryptedPdf(
      s"<< /Filter /Standard /V 4 /R 4 /Length 40 " +
        s"/CF << /StdCF << /CFM /V2 /Length 40 >> >> /StmF /StdCF /StrF /StdCF " +
        s"/O ${hex(oEntry)} /U ${hex(new Array[Byte](32))} /P -3904 >>",
      id0,
      data => PdfParser.rc4(objKey(fileKey, 4, 0, aes = false), data))
    assert(PdfParser.pdf(doc) == Right(Seq("encrypted but readable")))
  }

  test("AES-128 crypt filter (/V 4 /AESV2) decrypts: IV + CBC + padding") {
    val fileKey = PdfParser.fileKeyR234(oEntry, -3904, id0, 16, 4)
    val doc = encryptedPdf(
      s"<< /Filter /Standard /V 4 /R 4 /Length 128 " +
        s"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF /StrF /StdCF " +
        s"/O ${hex(oEntry)} /U ${hex(new Array[Byte](32))} /P -3904 >>",
      id0,
      data => aesEncrypt(objKey(fileKey, 4, 0, aes = true), data))
    assert(PdfParser.pdf(doc) == Right(Seq("encrypted but readable")))
  }

  test("AES-256 (/V 5 /R 6 /AESV3): /U validates, /UE unwraps the file key") {
    val fileKey = Array.tabulate(32)(i => (i * 29 + 17).toByte)
    val valSalt = Array.tabulate(8)(i => (i + 100).toByte)
    val keySalt = Array.tabulate(8)(i => (i + 200).toByte)
    val uEntry = PdfParser.hash2B(Array.empty, valSalt) ++ valSalt ++ keySalt
    val ueEntry = {
      val c = Cipher.getInstance("AES/CBC/NoPadding")
      c.init(Cipher.ENCRYPT_MODE,
        new SecretKeySpec(PdfParser.hash2B(Array.empty, keySalt), "AES"),
        new IvParameterSpec(new Array[Byte](16)))
      c.doFinal(fileKey)
    }
    val doc = encryptedPdf(
      s"<< /Filter /Standard /V 5 /R 6 /Length 256 " +
        s"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF " +
        s"/O ${hex(new Array[Byte](48))} /OE ${hex(new Array[Byte](32))} " +
        s"/U ${hex(uEntry)} /UE ${hex(ueEntry)} /P -3904 >>",
      id0,
      data => aesEncrypt(fileKey, data))
    assert(PdfParser.pdf(doc) == Right(Seq("encrypted but readable")))
  }

  test("a real (non-empty) password degrades to no text, never mojibake or a crash") {
    // R6 with /U material built from a NON-empty password: the empty-pw
    // validation must fail -> unsupported -> structured None -> fallback
    // scan can't inflate ciphertext -> no documents
    val fileKey = Array.tabulate(32)(i => (i * 31 + 7).toByte)
    val valSalt = Array.tabulate(8)(i => (i + 50).toByte)
    val keySalt = Array.tabulate(8)(i => (i + 60).toByte)
    val pwd = "secret".getBytes(StandardCharsets.ISO_8859_1)
    val uEntry = PdfParser.hash2B(pwd, valSalt) ++ valSalt ++ keySalt
    val doc = encryptedPdf(
      s"<< /Filter /Standard /V 5 /R 6 /Length 256 " +
        s"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF " +
        s"/O ${hex(new Array[Byte](48))} /OE ${hex(new Array[Byte](32))} " +
        s"/U ${hex(uEntry)} /UE ${hex(new Array[Byte](32))} /P -3904 >>",
      id0,
      data => aesEncrypt(fileKey, data))
    assert(PdfParser.pdf(doc) == Right(Seq.empty))
  }

  test("an unknown security handler degrades to no text") {
    // content enciphered under a key the parser cannot derive (the
    // handler is unsupported): structured path refuses, fallback scan
    // can't inflate ciphertext -> no documents
    val doc = encryptedPdf(
      s"<< /Filter /SomeDRM /V 9 /O ${hex(oEntry)} >>", id0,
      data => PdfParser.rc4("not-derivable".getBytes(StandardCharsets.ISO_8859_1), data))
    assert(PdfParser.pdf(doc) == Right(Seq.empty))
  }
}
