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
  * `javax.sound.sampled` (RIFF/WAVE PCM). Only video remains a documented
  * stub ([[Multimodal.decodeStub]]) — no pure-JDK video codec exists.
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

  private def unitNorm(v: Array[Double]): Array[Float] = {
    var ss = 0.0; var i = 0
    while (i < v.length) { ss += v(i) * v(i); i += 1 }
    val scale = if (ss == 0.0) 0.0 else 1.0 / math.sqrt(ss)
    v.map(x => (x * scale).toFloat)
  }
}
