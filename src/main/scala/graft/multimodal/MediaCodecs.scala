package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

/** Real pure-JDK media decoders behind the multimodal column surface
  * (SURVEY.md §2.3 X6) — the reference handles uploads as opaque blobs
  * (/root/reference/app.py:362-363); the north star asks for first-class
  * image/audio columns. Images decode through `javax.imageio` (png, jpeg,
  * gif, bmp — the formats the JDK ships readers for), audio through
  * `javax.sound.sampled` (RIFF/WAVE PCM). Video: AVI-MJPEG decodes fully
  * (RIFF walk + JDK JPEG frames, [[decodeAvi]]); MP4 and Matroska/WebM
  * get real STRUCTURAL decodes ([[decodeMp4]]'s ISO-BMFF `moov` box walk,
  * [[decodeMkv]]'s EBML walk with actual per-block frame counting —
  * frame payloads stay opaque, the JDK has no H.264/VP9 codec). No
  * container is stubbed; only frame FEATURES of non-MJPEG video fall to
  * the provenance-marked stub ([[Multimodal.decodeStub]]).
  *
  * Decoded metadata (dimensions, sample counts, pixel/sample sums) is
  * exactly deterministic, which is what makes the `media_meta` declared
  * query DuckDB-oracle-checkable: the query encodes real PNG/WAV payloads
  * from closed-form parameters, decodes them with these codecs, and the
  * oracle recomputes the expected metadata from the same closed forms —
  * a genuine encode→decode round-trip check.
  *
  * All decoders are total (`Either`, never throw) — same defensive
  * contract as the document parsers in graft.ingest.
  */
object MediaCodecs {

  final case class ImageMeta(container: String, width: Int, height: Int,
      bands: Int, bitsPerSample: Int, sampleSum: Long)

  final case class AudioMeta(container: String, sampleRate: Int, channels: Int,
      bitsPerSample: Int, frames: Long, durationUs: Long,
      sampleSum: Long, sampleMin: Int, sampleMax: Int)

  final case class VideoMeta(container: String, codec: String, width: Int, height: Int,
      frames: Long, usPerFrame: Long, durationUs: Long, firstFrameSum: Long)

  /** Container sniff from magic bytes — deterministic, never reads past
    * the header. */
  def sniff(bytes: Array[Byte]): String = {
    def at(i: Int): Int = if (bytes != null && i < bytes.length) bytes(i) & 0xff else -1
    if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "png"
    else if (at(0) == 0xff && at(1) == 0xd8) "jpeg"
    else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8') "gif"
    else if (at(0) == 'B' && at(1) == 'M') "bmp"
    else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
      at(8) == 'W' && at(9) == 'A' && at(10) == 'V' && at(11) == 'E') "wav"
    else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
      at(8) == 'A' && at(9) == 'V' && at(10) == 'I' && at(11) == ' ') "avi"
    else if (at(4) == 'f' && at(5) == 't' && at(6) == 'y' && at(7) == 'p') "mp4"
    else if (at(0) == 0x1A && at(1) == 0x45 && at(2) == 0xDF && at(3) == 0xA3) "ebml"
    else "unknown"
  }

  // ------------------------------------------------------------------ image

  /** Decode an image payload to typed metadata. Raw raster samples (not
    * sRGB-converted ARGB) so an 8-bit gray PNG round-trips its exact byte
    * values — `BufferedImage.getRGB` would gamma-convert gray→sRGB. */
  def decodeImage(bytes: Array[Byte]): Either[String, ImageMeta] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) Left("no JDK reader for this image payload")
      else {
        val r = img.getRaster
        val (w, h, bands) = (img.getWidth, img.getHeight, r.getNumBands)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < bands) { sum += r.getSample(x, y, b); b += 1 }
            x += 1
          }
          y += 1
        }
        Right(ImageMeta(sniff(bytes), w, h, bands,
          img.getColorModel.getComponentSize(0), sum))
      }
    } catch { case e: Exception => Left(s"image decode: ${e.getMessage}") }

  /** Histogram feature vector over raw raster samples (all bands), unit
    * norm — the real replacement for the image arm of the decode stub. */
  def imageFeatures(bytes: Array[Byte], dim: Int): Option[Array[Float]] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val r = img.getRaster
        // per-band sample range: a 16-bit-gray + 8-bit-alpha image has
        // heterogeneous component sizes, so one shared maxVal would mis-bin
        val sizes = img.getColorModel.getComponentSize
        val maxVals = Array.tabulate(r.getNumBands)(b =>
          1L << sizes(math.min(b, sizes.length - 1)))
        val v = new Array[Double](dim)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            var b = 0
            while (b < r.getNumBands) {
              val s = r.getSample(x, y, b)
              v(math.min(s.toLong * dim / maxVals(b), dim - 1L).toInt) += 1.0
              b += 1
            }
            x += 1
          }
          y += 1
        }
        Some(unitNorm(v))
      }
    } catch { case _: Exception => None }

  /** Encode a grayscale image from a pixel function — fixture/test side of
    * the round-trip. `format` is any JDK writer name (png, bmp, gif). */
  def encodeGray(width: Int, height: Int, gray: (Int, Int) => Int,
      format: String = "png"): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { r.setSample(x, y, 0, gray(x, y) & 0xff); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  // ------------------------------------------------------------------ audio

  /** Decode a RIFF/WAVE payload to typed metadata + integer PCM stats.
    * 16-bit samples are read at the container's declared endianness; 8-bit
    * WAV PCM is unsigned by spec. Any other depth (24-bit PCM, 32-bit
    * float — javax.sound accepts both) is rejected rather than silently
    * mis-read byte-wise. */
  def decodeWav(bytes: Array[Byte]): Either[String, AudioMeta] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        val rate = math.round(f.getSampleRate)
        val bits = f.getSampleSizeInBits
        if (rate <= 0) Left(s"non-positive sample rate $rate")
        else if (bits != 16 && bits != 8) Left(s"unsupported bit depth $bits (PCM 8/16 only)")
        else {
          val frames = in.getFrameLength
          val data = in.readAllBytes()
          var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
          def see(s: Int): Unit = { sum += s; if (s < mn) mn = s; if (s > mx) mx = s }
          if (bits == 16) {
            val n = data.length / 2
            var i = 0
            while (i < n) {
              val lo = data(2 * i) & 0xff
              val hi = data(2 * i + 1) & 0xff
              see((if (f.isBigEndian) (lo << 8) | hi else (hi << 8) | lo).toShort.toInt)
              i += 1
            }
          } else {
            var i = 0
            while (i < data.length) { see(data(i) & 0xff); i += 1 }
          }
          Right(AudioMeta(sniff(bytes), rate, f.getChannels, bits, frames,
            frames * 1000000L / rate, sum,
            if (mn == Int.MaxValue) 0 else mn, if (mx == Int.MinValue) 0 else mx))
        }
      } finally in.close()
    } catch { case e: Exception => Left(s"wav decode: ${e.getMessage}") }

  /** Histogram feature vector over 16-bit PCM sample values, unit norm —
    * the real replacement for the audio arm of the decode stub. */
  def audioFeatures(bytes: Array[Byte], dim: Int): Option[Array[Float]] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        val bits = f.getSampleSizeInBits
        if (bits != 16 && bits != 8) None // same depth gate as decodeWav
        else {
          val data = in.readAllBytes()
          val v = new Array[Double](dim)
          if (bits == 16) {
            val n = data.length / 2
            var i = 0
            while (i < n) {
              val lo = data(2 * i) & 0xff
              val hi = data(2 * i + 1) & 0xff
              val s = (if (f.isBigEndian) (lo << 8) | hi else (hi << 8) | lo).toShort.toInt
              v((s + 32768) * dim / 65536) += 1.0
              i += 1
            }
          } else {
            var i = 0
            while (i < data.length) { v((data(i) & 0xff) * dim / 256) += 1.0; i += 1 }
          }
          Some(unitNorm(v))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** 64-bit acoustic fingerprint over DECODED 16-bit PCM — the audio
    * sibling of [[aHash64]]: samples split into `nFrames` fixed-length
    * frames (trailing remainder dropped), per-frame energy E_f = Σ|s|
    * (an exact integer — no FFT, no floating point), and bit f is set
    * iff E_{f+1} > E_f — the energy-delta sign signature (the shape of
    * Chromaprint/Shazam descriptors reduced to its deterministic
    * integer core; gain-SCALING flips no bit since both sides of each
    * comparison scale together). nFrames+1 frames are consumed for
    * nFrames delta bits; returned as 4×16-bit chunks, low first. */
  def audioFingerprint(bytes: Array[Byte], frameLen: Int = 32,
      nBits: Int = 64): Either[String, Array[Int]] =
    try {
      require(nBits == 64, "fingerprint is fixed at 64 delta bits")
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        if (f.getSampleSizeInBits != 16) Left("fingerprint needs 16-bit PCM")
        else {
          val data = in.readAllBytes()
          val n = data.length / 2
          val need = (nBits + 1) * frameLen
          if (n < need) Left(s"fingerprint needs >= $need samples, got $n")
          else {
            val energy = new Array[Long](nBits + 1)
            var i = 0
            while (i < need) {
              val lo = data(2 * i) & 0xff
              val hi = data(2 * i + 1) & 0xff
              val s = (if (f.isBigEndian) (lo << 8) | hi else (hi << 8) | lo).toShort.toInt
              energy(i / frameLen) += math.abs(s)
              i += 1
            }
            val chunks = new Array[Int](4)
            var b = 0
            while (b < nBits) {
              if (energy(b + 1) > energy(b)) chunks(b / 16) |= 1 << (b % 16)
              b += 1
            }
            Right(chunks)
          }
        }
      } finally in.close()
    } catch { case e: Exception => Left(s"audio fingerprint: ${e.getMessage}") }

  /** Assemble a canonical 44-byte-header PCM WAV — fixture/test side of
    * the round-trip. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short], channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort)
      .putInt(sampleRate).putInt(sampleRate * channels * 2)
      .putShort((channels * 2).toShort).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    bb.array()
  }

  // ------------------------------------------------------------------ video

  /** Decode an AVI container with Motion-JPEG frames — REAL pure-JDK
    * video decode: RIFF chunk walking is plain byte parsing and every
    * MJPEG frame is an ordinary JPEG `javax.imageio` reads, so the one
    * video format whose codec the JDK actually ships is no longer a
    * stub. Structural metadata (dimensions, frame count, timing) comes
    * from the container headers — closed-form, which is what lets the
    * `video_meta` declared query be DuckDB-oracle-checked; pixel sums
    * of the DECODED first frame are codec-output (lossy JPEG), pinned
    * by MediaCodecsSpec against the encoded ramp within a JPEG error
    * budget instead. Frame count is counted from the actual movi
    * chunks, cross-checked against the header's dwTotalFrames. Other
    * containers (mp4/h264 etc.) still reject here and fall to the
    * provenance-marked stub — the JDK has no codec for them. */
  def decodeAvi(bytes: Array[Byte]): Either[String, VideoMeta] =
    try {
      if (sniff(bytes) != "avi") Left("not a RIFF/AVI payload")
      else {
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        var usPerFrame = 0L; var hdrFrames = 0L; var w = 0; var h = 0
        val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (offset, len)
        def fourcc(off: Int): String =
          new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
        // walk chunks in [from, until); LISTs recurse into their payload
        def walk(from: Int, until: Int): Unit = {
          var p = from
          while (p + 8 <= until) {
            val id = fourcc(p)
            val len = bb.getInt(p + 4)
            if (len < 0 || p + 8 + len > until) return // torn chunk: stop, keep what parsed
            if (id == "LIST") walk(p + 12, p + 8 + len)
            else if (id == "avih" && len >= 40) {
              usPerFrame = bb.getInt(p + 8).toLong & 0xFFFFFFFFL
              hdrFrames = bb.getInt(p + 8 + 16).toLong & 0xFFFFFFFFL
              w = bb.getInt(p + 8 + 32)
              h = bb.getInt(p + 8 + 36)
            }
            else if (id.endsWith("dc") || id.endsWith("db"))
              frames += ((p + 8, len))
            p += 8 + len + (len & 1) // chunks are word-aligned
          }
        }
        walk(12, math.min(bytes.length, 8 + bb.getInt(4)))
        if (w <= 0 || h <= 0) Left("AVI: no avih header")
        else if (frames.isEmpty) Left("AVI: no frame chunks in movi")
        else if (hdrFrames != frames.length.toLong)
          Left(s"AVI: header declares $hdrFrames frames, movi has ${frames.length}")
        else {
          val (fo, fl) = frames.head
          val img = ImageIO.read(new ByteArrayInputStream(bytes, fo, fl))
          if (img == null) Left("AVI: first frame is not JDK-decodable (not MJPEG?)")
          else if (img.getWidth != w || img.getHeight != h)
            Left(s"AVI: frame ${img.getWidth}x${img.getHeight} != container ${w}x$h")
          else {
            val r = img.getRaster
            var sum = 0L; var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                var b = 0
                while (b < r.getNumBands) { sum += r.getSample(x, y, b); b += 1 }
                x += 1
              }
              y += 1
            }
            Right(VideoMeta("avi", "mjpeg", w, h, frames.length.toLong, usPerFrame,
              usPerFrame * frames.length, sum))
          }
        }
      }
    } catch { case e: Exception => Left(s"avi decode: ${e.getMessage}") }

  /** Mean luma (0–255, integer floor over all raster samples) of EVERY
    * frame of an AVI-MJPEG payload — the per-frame signal behind
    * scene-change detection (where [[decodeAvi]] stops at container
    * metadata + first-frame fingerprint, this decodes the full frame
    * sequence). Same chunk walk; each frame JDK-JPEG-decodes
    * independently, so a torn tail yields the frames that parsed. */
  def aviFrameMeanLumas(bytes: Array[Byte]): Either[String, Seq[Long]] =
    try {
      if (sniff(bytes) != "avi") Left("not a RIFF/AVI payload")
      else {
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        def fourcc(off: Int): String =
          new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
        def walk(from: Int, until: Int): Unit = {
          var p = from
          while (p + 8 <= until) {
            val id = fourcc(p)
            val len = bb.getInt(p + 4)
            if (len < 0 || p + 8 + len > until) return
            if (id == "LIST") walk(p + 12, p + 8 + len)
            else if (id.endsWith("dc") || id.endsWith("db"))
              frames += ((p + 8, len))
            p += 8 + len + (len & 1)
          }
        }
        walk(12, math.min(bytes.length, 8 + bb.getInt(4)))
        if (frames.isEmpty) Left("AVI: no frame chunks in movi")
        else Right(frames.toSeq.map { case (fo, fl) =>
          val img = ImageIO.read(new ByteArrayInputStream(bytes, fo, fl))
          require(img != null, "AVI frame is not JDK-decodable (not MJPEG?)")
          val r = img.getRaster
          var sum = 0L; var cnt = 0L; var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              var b = 0
              while (b < r.getNumBands) {
                sum += r.getSample(x, y, b); cnt += 1; b += 1
              }
              x += 1
            }
            y += 1
          }
          sum / cnt
        })
      }
    } catch { case e: Exception => Left(s"avi luma decode: ${e.getMessage}") }

  /** Histogram features over the decoded raster samples of up to the
    * first 4 frames — the real replacement for the video arm of the
    * decode stub, for payloads [[decodeAvi]] accepts. */
  def videoFeatures(bytes: Array[Byte], dim: Int): Option[Array[Float]] =
    decodeAvi(bytes).toOption.flatMap { _ =>
      try {
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        def fourcc(off: Int): String =
          new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val v = new Array[Double](dim)
        var used = 0
        def walk(from: Int, until: Int): Unit = {
          var p = from
          while (p + 8 <= until && used < 4) {
            val id = fourcc(p)
            val len = bb.getInt(p + 4)
            if (len < 0 || p + 8 + len > until) return
            if (id == "LIST") walk(p + 12, p + 8 + len)
            else if (id.endsWith("dc") || id.endsWith("db")) {
              val img = ImageIO.read(new ByteArrayInputStream(bytes, p + 8, len))
              if (img != null) {
                val r = img.getRaster
                val sizes = img.getColorModel.getComponentSize
                var y = 0
                while (y < img.getHeight) {
                  var x = 0
                  while (x < img.getWidth) {
                    var b = 0
                    while (b < r.getNumBands) {
                      val maxV = 1L << sizes(math.min(b, sizes.length - 1))
                      v(math.min(r.getSample(x, y, b).toLong * dim / maxV, dim - 1L).toInt) += 1.0
                      b += 1
                    }
                    x += 1
                  }
                  y += 1
                }
                used += 1
              }
            }
            p += 8 + len + (len & 1)
          }
        }
        walk(12, math.min(bytes.length, 8 + bb.getInt(4)))
        if (used == 0) None else Some(unitNorm(v))
      } catch { case _: Exception => None }
    }

  // ------------------------------------------------------------------- mp4

  /** MP4 (ISO/IEC 14496-12 BMFF) STRUCTURAL metadata walk — no frame
    * decode (the JDK ships no H.264/AAC codec; sample payloads stay
    * opaque), but the `moov` box tree is plain big-endian integers, so
    * dimensions, codec fourcc, frame count, and timing parse exactly:
    * tkhd carries 16.16-fixed track width/height, mdhd the media
    * timescale/duration, stsd the sample-entry fourcc, stts the sample
    * delta, stsz the sample count. The first `vide`-handler track wins.
    * This shrinks the video-stub surface to mkv/webm (EBML needs a
    * varint parser AND ships no metadata without frame headers);
    * `firstFrameSum` is 0 by contract — sample data is never touched. */
  def decodeMp4(bytes: Array[Byte]): Either[String, VideoMeta] =
    try {
      if (sniff(bytes) != "mp4") Left("not an ISO-BMFF payload")
      else {
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
        def fourcc(off: Int): String =
          new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
        def u32(off: Int): Long = bb.getInt(off).toLong & 0xFFFFFFFFL
        // per-trak parse state; committed on trak close if it is the
        // first video track
        final class Trak {
          var w = 0; var h = 0; var codec = ""
          var timescale = 0L; var duration = 0L
          var frames = 0L; var delta = 0L; var video = false
        }
        var out: Trak = null
        var cur: Trak = null
        val containers = Set("moov", "trak", "mdia", "minf", "stbl")
        def walk(from: Int, until: Int): Unit = {
          var p = from
          while (p + 8 <= until) {
            val sz = u32(p)
            val id = fourcc(p + 4)
            // size 1 (64-bit largesize) and 0 (to-EOF) stay unsupported in
            // the skeleton walk — treat as torn and keep what parsed
            if (sz < 8 || p + sz > until) return
            val end = (p + sz).toInt
            id match {
              case "trak" =>
                cur = new Trak
                walk(p + 8, end)
                if (out == null && cur != null && cur.video && cur.w > 0) out = cur
                cur = null
              case c if containers.contains(c) => walk(p + 8, end)
              case "tkhd" if cur != null && bytes(p + 8) == 0 && sz >= 8 + 84 =>
                cur.w = (u32(p + 8 + 76) >> 16).toInt // 16.16 fixed
                cur.h = (u32(p + 8 + 80) >> 16).toInt
              case "mdhd" if cur != null && bytes(p + 8) == 0 && sz >= 8 + 20 =>
                cur.timescale = u32(p + 8 + 12)
                cur.duration = u32(p + 8 + 16)
              case "hdlr" if cur != null && sz >= 8 + 12 =>
                cur.video = fourcc(p + 8 + 8) == "vide"
              case "stsd" if cur != null && sz >= 8 + 16 =>
                if (u32(p + 8 + 4) >= 1) cur.codec = fourcc(p + 8 + 12)
              case "stts" if cur != null && sz >= 8 + 16 =>
                if (u32(p + 8 + 4) >= 1) cur.delta = u32(p + 8 + 12)
              case "stsz" if cur != null && sz >= 8 + 12 =>
                cur.frames = u32(p + 8 + 8)
              case _ => () // leaf we don't need (ftyp, mdat, stco, ...)
            }
            p = end
          }
        }
        walk(0, bytes.length)
        if (out == null) Left("mp4: no video track with a tkhd size")
        else if (out.timescale <= 0) Left("mp4: video track has no mdhd timescale")
        else if (out.frames <= 0) Left("mp4: stsz declares no samples")
        else Right(VideoMeta("mp4", out.codec, out.w, out.h, out.frames,
          out.delta * 1000000L / out.timescale,
          out.duration * 1000000L / out.timescale, 0L))
      }
    } catch { case e: Exception => Left(s"mp4 decode: ${e.getMessage}") }

  /** 64-bit perceptual average-hash (aHash) over a DECODED raster: the
    * image is partitioned into an 8×8 grid of box cells (pixel (x,y) →
    * cell (x·8 div w, y·8 div h)), and bit (cy·8+cx) is set iff the
    * cell's mean sample strictly exceeds the global mean — compared as
    * the exact integer cross-product `cellSum · W·H·bands >
    * totalSum · cellPixels · bands` so there is NO floating division
    * anywhere: the hash is bit-identical on every JVM and recomputable
    * by an external engine from closed-form pixel values. Brightness
    * invariance falls out of the definition (adding a constant to every
    * pixel shifts both sides of the comparison equally). Multi-band
    * images sum across bands per pixel. Returned as 4×16-bit chunks
    * (low chunk first) so downstream banding/Hamming never touches
    * signed-64-bit edge cases. */
  def aHash64(bytes: Array[Byte]): Either[String, Array[Int]] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) Left("not a JDK-decodable image")
      else {
        val r = img.getRaster
        val w = img.getWidth
        val h = img.getHeight
        val bands = r.getNumBands
        if (w < 8 || h < 8) Left(s"aHash needs >= 8x8, got ${w}x$h")
        else {
          val cellSum = Array.ofDim[Long](8, 8)
          val cellN = Array.ofDim[Long](8, 8)
          var total = 0L
          var y = 0
          while (y < h) {
            val cy = y * 8 / h
            var x = 0
            while (x < w) {
              val cx = x * 8 / w
              var s = 0L
              var b = 0
              while (b < bands) { s += r.getSample(x, y, b); b += 1 }
              cellSum(cy)(cx) += s
              cellN(cy)(cx) += 1
              total += s
              x += 1
            }
            y += 1
          }
          val wh = w.toLong * h
          val chunks = new Array[Int](4)
          var bit = 0
          while (bit < 64) {
            val cy = bit / 8
            val cx = bit % 8
            // exact rational mean comparison (see doc comment)
            if (cellSum(cy)(cx) * wh > total * cellN(cy)(cx))
              chunks(bit / 16) |= 1 << (bit % 16)
            bit += 1
          }
          Right(chunks)
        }
      }
    } catch { case e: Exception => Left(s"ahash: ${e.getMessage}") }

  /** 64-bit difference-hash (dHash) over a DECODED raster — the
    * gradient sibling of [[aHash64]]: the image is partitioned into an
    * 8-row × 9-column grid of box cells (pixel (x,y) → cell
    * (x·9 div w, y·8 div h)), and bit (row·8 + c), c ∈ 0..7, is set
    * iff cell (row, c+1)'s mean strictly exceeds cell (row, c)'s —
    * compared as the exact integer cross-product
    * `sumR · nL > sumL · nR`, so no floating division anywhere and the
    * hash is recomputable by an external engine from closed-form
    * pixels. dHash tracks local GRADIENTS where aHash tracks global
    * contrast: a smooth brightness ramp flips aHash bits but leaves
    * dHash stable, the property that makes it the standard re-encode /
    * resize dedup hash. 4×16-bit chunks, low first. */
  def dHash64(bytes: Array[Byte]): Either[String, Array[Int]] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) Left("not a JDK-decodable image")
      else {
        val r = img.getRaster
        val w = img.getWidth
        val h = img.getHeight
        val bands = r.getNumBands
        if (w < 9 || h < 8) Left(s"dHash needs >= 9x8, got ${w}x$h")
        else {
          val cellSum = Array.ofDim[Long](8, 9)
          val cellN = Array.ofDim[Long](8, 9)
          var y = 0
          while (y < h) {
            val cy = y * 8 / h
            var x = 0
            while (x < w) {
              val cx = x * 9 / w
              var s = 0L
              var b = 0
              while (b < bands) { s += r.getSample(x, y, b); b += 1 }
              cellSum(cy)(cx) += s
              cellN(cy)(cx) += 1
              x += 1
            }
            y += 1
          }
          val chunks = new Array[Int](4)
          var bit = 0
          while (bit < 64) {
            val cy = bit / 8
            val cx = bit % 8
            // exact rational mean comparison (see doc comment)
            if (cellSum(cy)(cx + 1) * cellN(cy)(cx) >
                cellSum(cy)(cx) * cellN(cy)(cx + 1))
              chunks(bit / 16) |= 1 << (bit % 16)
            bit += 1
          }
          Right(chunks)
        }
      }
    } catch { case e: Exception => Left(s"dhash: ${e.getMessage}") }

  /** Silence profile over DECODED 16-bit PCM: fixed `frameLen`-sample
    * frames (trailing remainder dropped), per-frame energy E = Σ|s|
    * (exact integer), a frame is SILENT iff E ≤ threshold. Returns
    * (frames, silent frames, LEADING silent frames) — the
    * trim-the-dead-air statistics an audio-ingest pipeline gates on.
    * No floating point anywhere; an external engine recomputes every
    * count from closed-form samples. */
  def silenceProfile(bytes: Array[Byte], frameLen: Int = 32,
      threshold: Long = 1000L): Either[String, (Long, Long, Long)] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        if (f.getSampleSizeInBits != 16) Left("silence profile needs 16-bit PCM")
        else {
          val data = in.readAllBytes()
          val n = data.length / 2
          val frames = n / frameLen
          var silent = 0L
          var leading = 0L
          var leadingRun = true
          var fi = 0
          while (fi < frames) {
            var e = 0L
            var i = fi * frameLen
            val end = i + frameLen
            while (i < end) {
              val lo = data(2 * i) & 0xff
              val hi = data(2 * i + 1) & 0xff
              val s = (if (f.isBigEndian) (lo << 8) | hi else (hi << 8) | lo)
                .toShort.toInt
              e += math.abs(s)
              i += 1
            }
            if (e <= threshold) {
              silent += 1
              if (leadingRun) leading += 1
            } else leadingRun = false
            fi += 1
          }
          Right((frames.toLong, silent, leading))
        }
      } finally in.close()
    } catch { case e: Exception => Left(s"silence profile: ${e.getMessage}") }

  // ------------------------------------------------------------- mkv/webm

  /** Matroska/WebM STRUCTURAL metadata walk — the EBML sibling of
    * [[decodeMp4]], closing the last video-container stub: element IDs and
    * sizes are length-prefixed varints, so the Segment tree parses
    * exactly without any codec: Info carries TimestampScale/Duration,
    * the first video TrackEntry carries CodecID, PixelWidth/PixelHeight
    * and DefaultDuration (ns per frame), and the frame count is REAL —
    * SimpleBlocks/BlockGroups whose block header names the video track
    * number are counted across all Clusters (block payloads stay opaque;
    * the JDK has no VP9/AV1/H.264 codec). Container is "webm" or "mkv"
    * by DocType. `firstFrameSum` is 0 by contract. */
  def decodeMkv(bytes: Array[Byte]): Either[String, VideoMeta] =
    try {
      if (sniff(bytes) != "ebml") Left("not an EBML payload")
      else {
        // vint reads: (value, bytesConsumed); IDs keep the length-marker
        // bits (matching the registered constants), sizes strip them
        def vint(off: Int, keepMarker: Boolean): (Long, Int) = {
          val b0 = bytes(off) & 0xff
          val len = java.lang.Integer.numberOfLeadingZeros(b0) - 24 + 1
          require(len >= 1 && len <= 8, s"bad vint at $off")
          var v = (if (keepMarker) b0 else b0 & (0xff >>> len)).toLong
          var i = 1
          while (i < len) { v = (v << 8) | (bytes(off + i) & 0xff); i += 1 }
          (v, len)
        }
        var docType = ""
        var timestampScaleNs = 1000000L // EBML default
        var durationTicks = 0.0
        var width = 0; var height = 0; var codec = ""
        var videoTrackNum = -1L
        var defaultDurationNs = 0L
        var frames = 0L
        // per-TrackEntry accumulation, committed on the first video entry
        var teNum = -1L; var teType = -1L; var teCodec = ""
        var teW = 0; var teH = 0; var teDefDur = 0L
        def commitTrack(): Unit =
          if (videoTrackNum < 0 && teType == 1 && teW > 0) {
            videoTrackNum = teNum; codec = teCodec
            width = teW; height = teH; defaultDurationNs = teDefDur
          }
        val masters = Set(0x18538067L, 0x1549A966L, 0x1654AE6BL, 0xAEL,
          0xE0L, 0x1F43B675L, 0xA0L, 0x1A45DFA3L)
        def uintAt(off: Int, len: Int): Long = {
          var v = 0L; var i = 0
          while (i < len) { v = (v << 8) | (bytes(off + i) & 0xff); i += 1 }
          v
        }
        def floatAt(off: Int, len: Int): Double =
          if (len == 4) java.lang.Float.intBitsToFloat(uintAt(off, 4).toInt).toDouble
          else java.lang.Double.longBitsToDouble(uintAt(off, 8))
        def walk(from: Int, until: Int): Unit = {
          var p = from
          while (p < until) {
            val (id, idLen) = vint(p, keepMarker = true)
            val (sz, szLen) = vint(p + idLen, keepMarker = false)
            val body = p + idLen + szLen
            val end = body + sz.toInt
            if (sz < 0 || end > until) return // torn element: keep what parsed
            id match {
              case 0xAEL => // TrackEntry: fresh accumulator, commit on close
                teNum = -1; teType = -1; teCodec = ""; teW = 0; teH = 0; teDefDur = 0
                walk(body, end)
                commitTrack()
              case m if masters.contains(m) => walk(body, end)
              case 0x4282L => docType = new String(bytes, body, sz.toInt, "US-ASCII")
              case 0x2AD7B1L => timestampScaleNs = uintAt(body, sz.toInt)
              case 0x4489L => durationTicks = floatAt(body, sz.toInt)
              case 0xD7L => teNum = uintAt(body, sz.toInt) // TrackNumber
              case 0x83L => teType = uintAt(body, sz.toInt) // TrackType (1 = video)
              case 0x86L => teCodec = new String(bytes, body, sz.toInt, "US-ASCII")
              case 0x23E383L => teDefDur = uintAt(body, sz.toInt) // ns per frame
              case 0xB0L => teW = uintAt(body, sz.toInt).toInt // PixelWidth
              case 0xBAL => teH = uintAt(body, sz.toInt).toInt // PixelHeight
              case 0xA3L | 0xA1L => // SimpleBlock / Block: header names its track
                val (trk, _) = vint(body, keepMarker = false)
                if (videoTrackNum >= 0 && trk == videoTrackNum) frames += 1
              case _ => () // leaf we don't need (SeekHead, Void, CRC, ...)
            }
            p = end
          }
        }
        walk(0, bytes.length)
        if (videoTrackNum < 0) Left("mkv: no video TrackEntry")
        else if (frames == 0) Left("mkv: no blocks for the video track")
        else {
          val container = if (docType == "webm") "webm" else "mkv"
          val durationUs = (durationTicks * timestampScaleNs / 1000.0).round
          Right(VideoMeta(container, codec, width, height, frames,
            defaultDurationNs / 1000L, durationUs, 0L))
        }
      }
    } catch { case e: Exception => Left(s"mkv decode: ${e.getMessage}") }

  /** Assemble a minimal Matroska/WebM skeleton — fixture/test side of the
    * EBML round-trip. Sizes are written as 2-byte vints (0x40xx) so any
    * body ≤ 16383 bytes encodes uniformly. */
  def encodeMkvSkeleton(width: Int, height: Int, nFrames: Int,
      usPerFrame: Long = 40000L, docType: String = "matroska",
      codec: String = "V_VP9"): Array[Byte] = {
    def idBytes(id: Long): Array[Byte] = {
      val n = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
      Array.tabulate(n)(i => ((id >> (8 * (n - 1 - i))) & 0xff).toByte)
    }
    def el(id: Long, body: Array[Byte]): Array[Byte] = {
      require(body.length <= 16383, "skeleton elements stay under 2-byte vint sizes")
      idBytes(id) ++ Array((0x40 | (body.length >> 8)).toByte, (body.length & 0xff).toByte) ++ body
    }
    def uint(v: Long): Array[Byte] = {
      val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
      Array.tabulate(n)(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte)
    }
    val header = el(0x1A45DFA3L,
      el(0x4286L, uint(1)) ++ // EBMLVersion
        el(0x42F7L, uint(1)) ++ el(0x42F2L, uint(4)) ++ el(0x42F3L, uint(8)) ++
        el(0x4282L, docType.getBytes("US-ASCII")) ++
        el(0x4287L, uint(2)) ++ el(0x4285L, uint(2)))
    val durationNs = nFrames.toLong * usPerFrame * 1000L
    val info = el(0x1549A966L,
      el(0x2AD7B1L, uint(1000000L)) ++ // TimestampScale: 1 ms ticks
        el(0x4489L, { // Duration as float64 ticks
          val bb = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
          bb.putDouble(durationNs / 1000000.0)
          bb.array()
        }))
    val video = el(0xE0L, el(0xB0L, uint(width.toLong)) ++ el(0xBAL, uint(height.toLong)))
    val trackEntry = el(0xAEL,
      el(0xD7L, uint(1)) ++ el(0x83L, uint(1)) ++ // TrackNumber 1, TrackType video
        el(0x23E383L, uint(usPerFrame * 1000L)) ++ // DefaultDuration ns
        el(0x86L, codec.getBytes("US-ASCII")) ++ video)
    val tracks = el(0x1654AE6BL, trackEntry)
    val blocks = (0 until nFrames).flatMap { i =>
      // SimpleBlock: track vint (0x81 = track 1), s16 timestamp, flags,
      // then an opaque placeholder payload
      el(0xA3L, Array[Byte](0x81.toByte,
        ((i * 40) >> 8).toByte, (i * 40).toByte, 0x80.toByte) ++
        Array.tabulate(16 + i)(j => (j % 97).toByte))
    }.toArray
    val cluster = el(0x1F43B675L, el(0xE7L, uint(0)) ++ blocks) // Timestamp 0
    val segment = el(0x18538067L, info ++ tracks ++ cluster)
    header ++ segment
  }

  /** Assemble a minimal but spec-shaped MP4 skeleton (ftyp + moov tree +
    * placeholder mdat) — fixture/test side of the metadata round-trip.
    * `timescale` defaults to 1 MHz so per-frame and total timing are
    * exact integers in both the decoder and the closed-form oracle. */
  def encodeMp4Skeleton(width: Int, height: Int, nFrames: Int,
      sampleDeltaUs: Long = 40000L, timescale: Long = 1000000L,
      codec: String = "avc1"): Array[Byte] = {
    def box(id: String, body: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + body.length).order(ByteOrder.BIG_ENDIAN)
      bb.putInt(8 + body.length).put(id.getBytes("US-ASCII")).put(body)
      bb.array()
    }
    def full(id: String, body: Array[Byte]): Array[Byte] =
      box(id, Array[Byte](0, 0, 0, 0) ++ body) // version 0, flags 0
    val duration = nFrames.toLong * sampleDeltaUs
    def be32(vs: Long*): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 * vs.length).order(ByteOrder.BIG_ENDIAN)
      vs.foreach(v => bb.putInt(v.toInt))
      bb.array()
    }
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(0x200) ++ "isommp41".getBytes("US-ASCII"))
    val mvhd = full("mvhd", be32(0, 0, timescale, duration) ++
      be32(0x00010000, 0x01000000) ++ // rate 1.0, volume 1.0 + reserved
      be32(0, 0) ++
      be32(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000) ++ // unity matrix
      be32(0, 0, 0, 0, 0, 0) ++ be32(2)) // predefined, next track id
    val tkhd = full("tkhd", be32(0, 0, 1, 0, duration) ++
      be32(0, 0) ++ be32(0, 0) ++ // reserved, layer/group + volume
      be32(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000) ++
      be32(width.toLong << 16, height.toLong << 16))
    val mdhd = full("mdhd", be32(0, 0, timescale, duration) ++ be32(0x55C40000L))
    val hdlr = full("hdlr", be32(0) ++ "vide".getBytes("US-ASCII") ++
      be32(0, 0, 0) ++ Array[Byte](0))
    val sampleEntry = box(codec, be32(0, 0) ++ // reserved + data ref idx
      be32(0, 0, 0, 0) ++
      Array[Byte]((width >> 8).toByte, width.toByte, (height >> 8).toByte, height.toByte) ++
      be32(0x00480000, 0x00480000, 0, 0x00010000) ++ // dpi, frame count
      new Array[Byte](32) ++ be32(0x00180000) ++ be32(0xFFFFL << 16)) // depth, -1
    val stsd = full("stsd", be32(1) ++ sampleEntry)
    val stts = full("stts", be32(1, nFrames, sampleDeltaUs))
    val frameSizes = Array.tabulate(nFrames)(i => 64L + i)
    val stsz = full("stsz", be32(0L, nFrames.toLong) ++ be32(frameSizes.toSeq: _*))
    val stsc = full("stsc", be32(1, 1, nFrames, 1))
    val stco = full("stco", be32(1, 0))
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    val mdat = box("mdat",
      Array.tabulate(frameSizes.map(_.toInt).sum)(i => (i % 251).toByte))
    ftyp ++ moov ++ mdat
  }

  /** Assemble a minimal AVI-MJPEG container from grayscale frame
    * functions — fixture/test side of the round-trip. Frames JPEG-encode
    * through the JDK writer. */
  def encodeAviMjpeg(width: Int, height: Int, frames: Seq[(Int, Int) => Int],
      usPerFrame: Long = 40000L): Array[Byte] = {
    val jpegs = frames.map { f =>
      val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { r.setSample(x, y, 0, f(x, y) & 0xff); x += 1 }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val bb = ByteBuffer.allocate(8 + body.length + pad).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      bb.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(12 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("LIST".getBytes("US-ASCII")).putInt(4 + body.length)
        .put(kind.getBytes("US-ASCII")).put(body)
      bb.array()
    }
    val avih = {
      val bb = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(usPerFrame.toInt).putInt(0).putInt(0).putInt(0)
        .putInt(jpegs.length).putInt(0).putInt(1).putInt(0)
        .putInt(width).putInt(height)
      bb.array() // trailing reserved dwords stay zero
    }
    val strh = {
      val bb = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
        .putInt(0).putShort(0).putShort(0).putInt(0)
        .putInt(usPerFrame.toInt).putInt(1000000) // fps = rate/scale
        .putInt(0).putInt(jpegs.length).putInt(0).putInt(-1).putInt(0)
        .putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
      bb.array()
    }
    val strf = {
      val bb = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
        .put("MJPG".getBytes("US-ASCII")).putInt(width * height * 3)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      bb.array()
    }
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", jpegs.flatMap(j => chunk("00dc", j)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val out = ByteBuffer.allocate(8 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
    out.array()
  }

  private def unitNorm(v: Array[Double]): Array[Float] = {
    var ss = 0.0; var i = 0
    while (i < v.length) { ss += v(i) * v(i); i += 1 }
    val scale = if (ss == 0.0) 0.0 else 1.0 / math.sqrt(ss)
    v.map(x => (x * scale).toFloat)
  }
}
