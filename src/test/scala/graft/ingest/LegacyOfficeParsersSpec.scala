package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.{Charset, StandardCharsets}

import org.scalatest.funsuite.AnyFunSuite

/** Legacy office parser tests against hand-built CFB archives: a minimal
  * writer (512-byte sectors, one FAT sector, mini-stream cutoff 0 so all
  * streams ride the regular FAT) produces structurally valid OLE2 files
  * holding faithful WordDocument / Workbook / PowerPoint Document
  * streams. */
class LegacyOfficeParsersSpec extends AnyFunSuite {

  private val cp1252 = Charset.forName("windows-1252")

  /** Minimal CFB writer for tests. */
  private def cfb(streams: (String, Array[Byte])*): Array[Byte] = {
    val End = 0xFFFFFFFE
    val Free = 0xFFFFFFFF
    val sectorSize = 512
    val entries = ("Root Entry", Array.emptyByteArray) +: streams
    val dirSectors = math.max(1, (entries.length * 128 + sectorSize - 1) / sectorSize)
    // layout: sector 0 = FAT, 1..dirSectors = directory, then stream data
    val fat = Array.fill[Int](sectorSize / 4)(Free)
    fat(0) = 0xFFFFFFFD // FATSECT
    for (d <- 1 to dirSectors) fat(d) = if (d == dirSectors) End else d + 1
    var next = 1 + dirSectors
    val startSectors = streams.map { case (_, data) =>
      val nSec = math.max(1, (data.length + sectorSize - 1) / sectorSize)
      val start = next
      for (k <- 0 until nSec) fat(start + k) = if (k == nSec - 1) End else start + k + 1
      next += nSec
      start
    }
    val total = next
    val out = ByteBuffer.allocate(sectorSize * (total + 1)).order(ByteOrder.LITTLE_ENDIAN)
    // header
    out.put(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    out.putShort(30, 9.toShort) // sector shift
    out.putShort(32, 6.toShort) // mini shift
    out.putInt(44, 1) // one FAT sector
    out.putInt(48, 1) // first directory sector
    out.putInt(56, 0) // mini cutoff 0: everything on the regular FAT
    out.putInt(60, End) // no miniFAT
    out.putInt(64, 0)
    out.putInt(68, End) // no DIFAT chain
    out.putInt(72, 0)
    out.putInt(76, 0) // DIFAT[0] -> FAT at sector 0
    for (k <- 1 until 109) out.putInt(76 + k * 4, Free)
    // FAT sector
    for (k <- fat.indices) out.putInt(sectorSize + k * 4, fat(k))
    // directory
    entries.zipWithIndex.foreach { case ((name, data), idx) =>
      val base = sectorSize * 2 + idx * 128
      val utf = name.getBytes(StandardCharsets.UTF_16LE)
      out.position(base); out.put(utf, 0, math.min(utf.length, 62))
      out.putShort(base + 64, (math.min(utf.length, 62) + 2).toShort)
      out.put(base + 66, if (idx == 0) 5.toByte else 2.toByte)
      out.putInt(base + 116, if (idx == 0) End else startSectors(idx - 1))
      out.putLong(base + 120, data.length.toLong)
    }
    // stream data
    streams.zipWithIndex.foreach { case ((_, data), i) =>
      out.position(sectorSize * (1 + startSectors(i)))
      out.put(data)
    }
    out.array()
  }

  test("Cfb reader round-trips the test writer's streams") {
    val a = "alpha".getBytes
    val b = Array.fill[Byte](1300)(66) // multi-sector
    val got = Cfb.streams(cfb("StreamA" -> a, "BigB" -> b))
    assert(got.isRight)
    val m = got.toOption.get
    assert(m("streama").sameElements(a))
    assert(m("bigb").sameElements(b))
    assert(Cfb.streams("garbage".getBytes).isLeft)
  }

  test("doc: piece table with cp1252 and UTF-16 pieces extracts in order") {
    val wd = new Array[Byte](0x1000)
    val bb = ByteBuffer.wrap(wd).order(ByteOrder.LITTLE_ENDIAN)
    bb.putShort(0, 0xA5EC.toShort)
    bb.putShort(10, 0.toShort) // 0Table
    val t1 = "Hello from Word. ".getBytes(cp1252)
    val t2 = "Unicode tailé".getBytes(StandardCharsets.UTF_16LE)
    System.arraycopy(t1, 0, wd, 0x800, t1.length)
    System.arraycopy(t2, 0, wd, 0x900, t2.length)
    bb.putInt(0x01A2, 0x10) // fcClx in table stream
    val nPieces = 2
    val lcb = (nPieces + 1) * 4 + nPieces * 8
    bb.putInt(0x01A6, 1 + 4 + lcb) // lcbClx
    val table = new Array[Byte](0x100)
    val tb = ByteBuffer.wrap(table).order(ByteOrder.LITTLE_ENDIAN)
    tb.put(0x10, 0x02.toByte)
    tb.putInt(0x11, lcb)
    val plc = 0x15
    val nChars1 = t1.length
    val nChars2 = t2.length / 2
    tb.putInt(plc, 0); tb.putInt(plc + 4, nChars1); tb.putInt(plc + 8, nChars1 + nChars2)
    // PCD 1: compressed cp1252 at byte 0x800 -> fc = 0x800*2 | bit30
    tb.putInt(plc + 12 + 2, (0x800 * 2) | 0x40000000)
    // PCD 2: UTF-16 at byte 0x900
    tb.putInt(plc + 20 + 2, 0x900)
    val file = cfb("WordDocument" -> wd, "0Table" -> table)
    assert(LegacyOfficeParsers.doc(file) == Right(Seq("Hello from Word. Unicode tailé")))
  }

  test("doc: fcMin..fcMac fallback when the piece table is absent") {
    val wd = new Array[Byte](0x1000)
    val bb = ByteBuffer.wrap(wd).order(ByteOrder.LITTLE_ENDIAN)
    bb.putShort(0, 0xA5EC.toShort)
    val text = "plain fallback text".getBytes(cp1252)
    System.arraycopy(text, 0, wd, 0x600, text.length)
    bb.putInt(24, 0x600) // fcMin
    bb.putInt(28, 0x600 + text.length) // fcMac
    val file = cfb("WordDocument" -> wd) // no table stream at all
    assert(LegacyOfficeParsers.doc(file) == Right(Seq("plain fallback text")))
  }

  test("xls: BIFF8 SST strings extract, compressed and UTF-16 forms") {
    val payload = {
      val strs = Seq(("cell one", false), ("zürich", true))
      val bos = new java.io.ByteArrayOutputStream()
      val hdr = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      hdr.putInt(2); hdr.putInt(2) // cstTotal, cstUnique
      bos.write(hdr.array())
      strs.foreach { case (s, wide) =>
        val chars = s.length
        val h = ByteBuffer.allocate(3).order(ByteOrder.LITTLE_ENDIAN)
        h.putShort(chars.toShort); h.put(if (wide) 1.toByte else 0.toByte)
        bos.write(h.array())
        bos.write(s.getBytes(if (wide) StandardCharsets.UTF_16LE else cp1252))
      }
      bos.toByteArray
    }
    val wb = ByteBuffer.allocate(4 + payload.length + 4).order(ByteOrder.LITTLE_ENDIAN)
    wb.putShort(0x00FC.toShort); wb.putShort(payload.length.toShort); wb.put(payload)
    wb.putShort(0x000A.toShort); wb.putShort(0.toShort) // EOF record
    val file = cfb("Workbook" -> wb.array())
    assert(LegacyOfficeParsers.xls(file) == Right(Seq("cell one\nzürich")))
  }

  test("ppt: text atoms inside containers extract recursively") {
    def atom(recType: Int, body: Array[Byte], verInst: Int = 0): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(verInst.toShort); b.putShort(recType.toShort); b.putInt(body.length)
      b.put(body); b.array()
    }
    val chars = atom(0x0FA0, "Slide title".getBytes(StandardCharsets.UTF_16LE))
    val bytesAtom = atom(0x0FA8, "body text".getBytes(cp1252))
    val container = atom(0x03EE, chars ++ bytesAtom, verInst = 0x000F)
    val file = cfb("PowerPoint Document" -> container)
    assert(LegacyOfficeParsers.ppt(file) == Right(Seq("Slide title\nbody text")))
  }

  test("ppt: a crafted recLen near Int.MaxValue cannot overflow the bounds check") {
    // record header claiming a body of Int.MaxValue - the old body+recLen
    // check wrapped negative and let the String constructor throw
    val evil = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    evil.putShort(0.toShort); evil.putShort(0x0FA8.toShort); evil.putInt(Int.MaxValue)
    evil.put("body".getBytes(cp1252))
    val file = cfb("PowerPoint Document" -> evil.array())
    val r = LegacyOfficeParsers.ppt(file)
    assert(r.isRight || r.isLeft) // total: no exception escapes
    assert(r == Right(Seq.empty) || r.isLeft)
  }

  test("xls: a crafted negative cbExt cannot stall the SST cursor (spin/OOM guard)") {
    val payload = ByteBuffer.allocate(8 + 3 + 4).order(ByteOrder.LITTLE_ENDIAN)
    payload.putInt(Int.MaxValue); payload.putInt(Int.MaxValue) // cstTotal, cstUnique
    payload.putShort(0.toShort) // cch = 0
    payload.put(0x04.toByte) // fExt
    payload.putInt(-7) // cbExt: would rewind the cursor by exactly the header
    val wb = ByteBuffer.allocate(4 + payload.capacity()).order(ByteOrder.LITTLE_ENDIAN)
    wb.putShort(0x00FC.toShort); wb.putShort(payload.capacity().toShort); wb.put(payload.array())
    val file = cfb("Workbook" -> wb.array())
    // must return promptly with no strings, not spin for 2^31 iterations
    assert(LegacyOfficeParsers.xls(file) == Right(Seq.empty))
  }

  test("all three flow end-to-end through the default parser map") {
    assert(IngestPipeline.defaultParsers.contains("doc"))
    assert(IngestPipeline.defaultParsers.contains("xls"))
    assert(IngestPipeline.defaultParsers.contains("ppt"))
    // a corrupt legacy file degrades to parse_error via Left
    assert(IngestPipeline.defaultParsers("doc")("not ole2".getBytes).isLeft)
  }
}
