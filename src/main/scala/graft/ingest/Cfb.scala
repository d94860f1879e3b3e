package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable

/** Minimal Compound File Binary (CFB / OLE2) reader — the container
  * format of the legacy office files (doc/xls/ppt). Pure JVM: header +
  * DIFAT/FAT sector chains, the directory stream, and the mini-stream for
  * sub-cutoff streams. Read-only, defensive: structural damage surfaces
  * as Left(reason), never an uncaught exception or unbounded loop.
  */
object Cfb {

  private val Magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)
  private val EndOfChain = 0xFFFFFFFEL
  private val FreeSect = 0xFFFFFFFFL

  /** All stream entries of the archive: lowercased name → content.
    * Storage hierarchy is flattened (the legacy formats address their
    * streams by unique name: WordDocument, Workbook, PowerPoint Document,
    * 0Table/1Table, ...). */
  def streams(bytes: Array[Byte]): Either[String, Map[String, Array[Byte]]] = {
    if (bytes.length < 512 || !bytes.take(8).sameElements(Magic))
      return Left("not a CFB (OLE2) file")
    try {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val sectorShift = buf.getShort(30).toInt
      if (sectorShift < 7 || sectorShift > 20) return Left(s"bad sector shift $sectorShift")
      val sectorSize = 1 << sectorShift
      val miniShift = buf.getShort(32).toInt
      val miniSize = 1 << miniShift
      val numFat = buf.getInt(44)
      val firstDir = buf.getInt(48).toLong & 0xFFFFFFFFL
      val miniCutoff = buf.getInt(56)
      val firstMiniFat = buf.getInt(60).toLong & 0xFFFFFFFFL
      val numMiniFat = buf.getInt(64)
      val firstDifat = buf.getInt(68).toLong & 0xFFFFFFFFL
      val numDifat = buf.getInt(72)

      val maxSector = (bytes.length / sectorSize) + 1
      def sectorAt(i: Long): Option[Array[Byte]] = {
        val off = (i + 1) * sectorSize
        if (i < 0 || off + sectorSize > bytes.length) None
        else Some(java.util.Arrays.copyOfRange(bytes, off.toInt, (off + sectorSize).toInt))
      }

      // DIFAT: 109 header entries + chained DIFAT sectors
      val fatSectors = mutable.ArrayBuffer.empty[Long]
      var i = 0
      while (i < 109 && fatSectors.length < numFat) {
        val s = buf.getInt(76 + i * 4).toLong & 0xFFFFFFFFL
        if (s != FreeSect && s != EndOfChain) fatSectors += s
        i += 1
      }
      var difat = firstDifat
      var difatSeen = 0
      while (difat != EndOfChain && difat != FreeSect && difatSeen <= numDifat + 1) {
        sectorAt(difat) match {
          case None => return Left("DIFAT sector out of range")
          case Some(sec) =>
            val sb = ByteBuffer.wrap(sec).order(ByteOrder.LITTLE_ENDIAN)
            val per = sectorSize / 4 - 1
            for (k <- 0 until per if fatSectors.length < numFat) {
              val s = sb.getInt(k * 4).toLong & 0xFFFFFFFFL
              if (s != FreeSect && s != EndOfChain) fatSectors += s
            }
            difat = sb.getInt(sectorSize - 4).toLong & 0xFFFFFFFFL
        }
        difatSeen += 1
      }

      // FAT as one flat table
      val fat = mutable.ArrayBuffer.empty[Long]
      fatSectors.foreach { fs =>
        sectorAt(fs) match {
          case None => return Left("FAT sector out of range")
          case Some(sec) =>
            val sb = ByteBuffer.wrap(sec).order(ByteOrder.LITTLE_ENDIAN)
            for (k <- 0 until sectorSize / 4) fat += (sb.getInt(k * 4).toLong & 0xFFFFFFFFL)
        }
      }

      def chain(start: Long): Either[String, Seq[Long]] = {
        val out = mutable.ArrayBuffer.empty[Long]
        var cur = start
        while (cur != EndOfChain && cur != FreeSect) {
          if (cur < 0 || cur >= fat.length || out.length > maxSector)
            return Left("broken FAT chain")
          out += cur
          cur = fat(cur.toInt)
        }
        Right(out.toSeq)
      }

      def readChain(start: Long, size: Long): Either[String, Array[Byte]] =
        chain(start).flatMap { secs =>
          // size hint bounded by the FILE length: a corrupt directory size
          // must never drive a giant eager allocation
          val hint = math.min(math.min(size, bytes.length.toLong), Int.MaxValue.toLong).toInt
          val out = new java.io.ByteArrayOutputStream(math.max(64, hint))
          for (s <- secs) sectorAt(s) match {
            case None => return Left("stream sector out of range")
            case Some(sec) => out.write(sec)
          }
          val all = out.toByteArray
          Right(all.take(math.min(size, all.length.toLong).toInt))
        }

      // directory entries
      val dirBytes = readChain(firstDir, Long.MaxValue) match {
        case Left(e) => return Left(e)
        case Right(b) => b
      }
      case class Entry(name: String, objType: Int, start: Long, size: Long)
      val entries = (0 until dirBytes.length / 128).map { e =>
        val eb = ByteBuffer.wrap(dirBytes, e * 128, 128).order(ByteOrder.LITTLE_ENDIAN)
        val nameLen = eb.getShort(e * 128 + 64).toInt
        val name =
          if (nameLen >= 2 && nameLen <= 64)
            new String(dirBytes, e * 128, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
          else ""
        // v3 files (512-byte sectors): MS-CFB directs readers to ignore
        // the upper 32 size bits — real writers leave garbage there
        val rawSize = eb.getLong(e * 128 + 120)
        Entry(name, dirBytes(e * 128 + 66) & 0xFF,
          eb.getInt(e * 128 + 116).toLong & 0xFFFFFFFFL,
          if (sectorSize == 512) rawSize & 0xFFFFFFFFL else rawSize)
      }

      val root = entries.find(_.objType == 5).getOrElse(return Left("no root entry"))

      // mini FAT + mini stream (root's chain)
      lazy val miniFat: Either[String, IndexedSeq[Long]] =
        if (numMiniFat == 0) Right(IndexedSeq.empty)
        else readChain(firstMiniFat, numMiniFat.toLong * sectorSize).map { mb =>
          val sb = ByteBuffer.wrap(mb).order(ByteOrder.LITTLE_ENDIAN)
          (0 until mb.length / 4).map(k => sb.getInt(k * 4).toLong & 0xFFFFFFFFL)
        }
      lazy val miniStream: Either[String, Array[Byte]] = readChain(root.start, root.size)

      def readMini(start: Long, size: Long): Either[String, Array[Byte]] =
        for {
          mf <- miniFat
          ms <- miniStream
          data <- {
            val out = new java.io.ByteArrayOutputStream(size.toInt.max(64))
            var cur = start
            var steps = 0
            while (cur != EndOfChain && cur != FreeSect) {
              if (cur < 0 || cur >= mf.length || steps > mf.length)
                return Left("broken miniFAT chain")
              val off = cur.toInt * miniSize
              if (off + miniSize > ms.length) return Left("mini sector out of range")
              out.write(ms, off, miniSize)
              cur = mf(cur.toInt)
              steps += 1
            }
            Right(out.toByteArray.take(math.min(size, Int.MaxValue.toLong).toInt))
          }
        } yield data

      val out = mutable.LinkedHashMap.empty[String, Array[Byte]]
      for (e <- entries if e.objType == 2 && e.name.nonEmpty && e.size >= 0) {
        val data =
          if (e.size < miniCutoff) readMini(e.start, e.size)
          else readChain(e.start, e.size)
        data match {
          case Right(d) => out.getOrElseUpdate(e.name.toLowerCase, d)
          case Left(_) => () // skip damaged streams, keep the readable ones
        }
      }
      if (out.isEmpty) Left("CFB: no readable streams") else Right(out.toMap)
    } catch { case ex: Exception => Left(s"CFB error: ${ex.getMessage}") }
  }
}
