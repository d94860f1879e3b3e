package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class MediaCodecsSpec extends AnyFunSuite {

  private def ramp(base: Int)(x: Int, y: Int): Int = base + x + y

  test("gray PNG encode→decode round-trips exact dimensions and sample sum") {
    val (w, h, base) = (17, 9, 40)
    val bytes = MediaCodecs.encodeGray(w, h, ramp(base))
    val m = MediaCodecs.decodeImage(bytes).toOption.get
    assert(m.container == "png" && m.width == w && m.height == h)
    assert(m.bands == 1 && m.bitsPerSample == 8)
    // closed form: sum of (base + x + y) over the raster
    val want = w.toLong * h * base + h.toLong * (w * (w - 1) / 2) + w.toLong * (h * (h - 1) / 2)
    assert(m.sampleSum == want)
  }

  test("BMP and GIF writers round-trip the same gray raster") {
    for (fmt <- Seq("bmp", "gif")) {
      val bytes = MediaCodecs.encodeGray(12, 7, ramp(10), fmt)
      val m = MediaCodecs.decodeImage(bytes).toOption.get
      assert(m.container == fmt, s"$fmt sniff")
      assert(m.width == 12 && m.height == 7, fmt)
      val want = 12L * 7 * 10 + 7L * (12 * 11 / 2) + 12L * (7 * 6 / 2)
      assert(m.sampleSum == want, s"$fmt sample sum")
    }
  }

  test("JPEG decodes with exact dimensions (lossy samples not asserted)") {
    val img = new java.awt.image.BufferedImage(20, 14, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 14; x <- 0 until 20) img.setRGB(x, y, (x * 12) << 16 | (y * 18) << 8)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", bos)
    val m = MediaCodecs.decodeImage(bos.toByteArray).toOption.get
    assert(m.container == "jpeg" && m.width == 20 && m.height == 14 && m.bands == 3)
  }

  test("WAV PCM16 encode→decode round-trips rate, frames, duration, and stats") {
    val samples = Array.tabulate(1000)(i => ((i * 7) % 2000 - 1000).toShort)
    val bytes = MediaCodecs.encodeWavPcm16(11000, samples)
    val m = MediaCodecs.decodeWav(bytes).toOption.get
    assert(m.container == "wav" && m.sampleRate == 11000 && m.channels == 1)
    assert(m.bitsPerSample == 16 && m.frames == 1000L)
    assert(m.durationUs == 1000L * 1000000L / 11000)
    assert(m.sampleSum == samples.map(_.toLong).sum)
    assert(m.sampleMin == samples.min && m.sampleMax == samples.max)
  }

  test("stereo WAV reports 2 channels and frame count = samples/2") {
    val samples = Array.tabulate(600)(i => (i - 300).toShort) // 300 L/R frames
    val m = MediaCodecs.decodeWav(MediaCodecs.encodeWavPcm16(8000, samples, channels = 2)).toOption.get
    assert(m.channels == 2 && m.frames == 300L)
    assert(m.sampleSum == samples.map(_.toLong).sum) // stats cover both channels
  }

  test("decoders are total: garbage payloads yield Left, never throw") {
    val garbage = Array.tabulate[Byte](256)(i => (i * 37).toByte)
    assert(MediaCodecs.decodeImage(garbage).isLeft)
    assert(MediaCodecs.decodeWav(garbage).isLeft)
    assert(MediaCodecs.decodeImage(Array.empty[Byte]).isLeft)
    assert(MediaCodecs.decodeWav(Array.empty[Byte]).isLeft)
    // truncated WAV header: RIFF magic but nothing else
    assert(MediaCodecs.decodeWav("RIFF".getBytes("US-ASCII")).isLeft)
  }

  test("non-8/16-bit WAV depths are rejected, not byte-misread") {
    // hand-build a 24-bit PCM WAV header (javax.sound accepts the depth;
    // the old byte-wise fallback would have produced silently wrong stats)
    val nFrames = 100
    val dataLen = nFrames * 3
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)
      .putInt(8000).putInt(8000 * 3)
      .putShort(3).putShort(24)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    for (i <- 0 until dataLen) bb.put((i % 251).toByte)
    val res = MediaCodecs.decodeWav(bb.array())
    assert(res == Left("unsupported bit depth 24 (PCM 8/16 only)"), res)
    assert(MediaCodecs.audioFeatures(bb.array(), 64).isEmpty)
  }

  test("sniff identifies every supported container from magic bytes") {
    assert(MediaCodecs.sniff(MediaCodecs.encodeGray(4, 4, ramp(0))) == "png")
    assert(MediaCodecs.sniff(MediaCodecs.encodeGray(4, 4, ramp(0), "bmp")) == "bmp")
    assert(MediaCodecs.sniff(MediaCodecs.encodeGray(4, 4, ramp(0), "gif")) == "gif")
    assert(MediaCodecs.sniff(MediaCodecs.encodeWavPcm16(8000, Array[Short](1, 2))) == "wav")
    assert(MediaCodecs.sniff(Array[Byte](1, 2, 3)) == "unknown")
    assert(MediaCodecs.sniff(null) == "unknown")
  }

  test("AVI-MJPEG encode→decode round-trips container metadata exactly") {
    val avi = MediaCodecs.encodeAviMjpeg(20, 14,
      Seq.tabulate(3)(f => (x: Int, y: Int) => 40 + f + x + y), usPerFrame = 40000L)
    assert(MediaCodecs.sniff(avi) == "avi")
    val m = MediaCodecs.decodeAvi(avi).fold(e => fail(e), identity)
    assert(m.container == "avi" && m.codec == "mjpeg")
    assert(m.width == 20 && m.height == 14)
    assert(m.frames == 3)
    assert(m.usPerFrame == 40000L && m.durationUs == 120000L)
    // JPEG is lossy but near-exact on a smooth ramp: mean |err| per pixel
    // of the DECODED first frame stays inside a small budget
    val ideal = (for (y <- 0 until 14; x <- 0 until 20) yield 40 + x + y).map(_.toLong).sum
    val mae = math.abs(m.firstFrameSum - ideal).toDouble / (20 * 14)
    assert(mae < 3.0, s"mean abs error $mae gray levels vs the encoded ramp")
  }

  test("AVI decode is total and cross-checks header vs movi chunks") {
    assert(MediaCodecs.decodeAvi("RIFFxxxxAVI ".getBytes("US-ASCII")).isLeft)
    assert(MediaCodecs.decodeAvi(Array[Byte](1, 2, 3)).isLeft)
    assert(MediaCodecs.decodeAvi(
      MediaCodecs.encodeWavPcm16(8000, Array[Short](1, 2))).isLeft)
    // header/movi mismatch must be rejected, not silently trusted
    val avi = MediaCodecs.encodeAviMjpeg(8, 8, Seq((x, y) => x + y))
    val truncatedHeader = avi.clone()
    // dwTotalFrames lives at avih body offset 16; avih body starts after
    // RIFF(12) + LIST hdr(12) + 'avih'+len(8) = 32
    truncatedHeader(32 + 16) = 9
    assert(MediaCodecs.decodeAvi(truncatedHeader).isLeft)
  }

  test("video features: real decoded-frame histograms for AVI, none for undecodable") {
    val avi = MediaCodecs.encodeAviMjpeg(16, 16,
      Seq.tabulate(2)(f => (x: Int, y: Int) => if ((x + y) % 2 == 0) 0 else 255))
    val f = MediaCodecs.videoFeatures(avi, 64).get
    assert(math.abs(math.sqrt(f.map(x => x.toDouble * x).sum) - 1.0) < 1e-5)
    // checkerboard mass concentrates at the histogram extremes (JPEG
    // ringing spreads a little around them)
    assert(f(0) + f(1) > 0.5f && f(62) + f(63) > 0.5f)
    assert(MediaCodecs.videoFeatures("not a video".getBytes("US-ASCII"), 64).isEmpty)
  }

  test("mp4 skeleton encode→moov-walk round-trips structural metadata exactly") {
    val mp4 = MediaCodecs.encodeMp4Skeleton(640, 360, nFrames = 7,
      sampleDeltaUs = 33333L)
    assert(MediaCodecs.sniff(mp4) == "mp4")
    val m = MediaCodecs.decodeMp4(mp4).fold(e => fail(e), identity)
    assert(m.container == "mp4" && m.codec == "avc1")
    assert(m.width == 640 && m.height == 360)
    assert(m.frames == 7L)
    assert(m.usPerFrame == 33333L) // 1 MHz timescale ⇒ exact
    assert(m.durationUs == 7L * 33333L)
    assert(m.firstFrameSum == 0L) // metadata walk never touches samples
  }

  test("mp4 walk is total: torn boxes, wrong tracks, garbage all yield Left") {
    assert(MediaCodecs.decodeMp4("nope".getBytes("US-ASCII")).isLeft)
    val good = MediaCodecs.encodeMp4Skeleton(64, 48, nFrames = 3)
    // truncate inside moov: torn box ⇒ no committed video track
    assert(MediaCodecs.decodeMp4(good.take(64)).isLeft)
    // flip the handler fourcc to a sound track: no video track to commit
    val soun = good.clone()
    val idx = {
      // locate 'vide' (hdlr handler_type); unique in the skeleton
      val needle = "vide".getBytes("US-ASCII")
      (0 until soun.length - 4).find(i => needle.indices.forall(j => soun(i + j) == needle(j))).get
    }
    System.arraycopy("soun".getBytes("US-ASCII"), 0, soun, idx, 4)
    assert(MediaCodecs.decodeMp4(soun).isLeft)
  }

  test("aHash: hand-computed bits on an 8x8 one-pixel-per-cell image") {
    // 8x8 image, each cell IS one pixel: bit b set iff pixel > mean.
    // Pixels: 200 where (x + y) even, 100 otherwise -> mean 150; the
    // checkerboard's even-parity cells must be exactly the set bits
    val png = MediaCodecs.encodeGray(8, 8, (x, y) => if ((x + y) % 2 == 0) 200 else 100)
    val c = MediaCodecs.aHash64(png).fold(e => fail(e), identity)
    for (bit <- 0 until 64) {
      val cy = bit / 8; val cx = bit % 8
      val want = (cx + cy) % 2 == 0
      val got = ((c(bit / 16) >> (bit % 16)) & 1) == 1
      assert(got == want, s"bit $bit (cell $cx,$cy): got $got want $want")
    }
    // brightness invariance: +40 on every pixel shifts cell and global
    // means equally -> identical hash
    val brighter = MediaCodecs.encodeGray(8, 8, (x, y) => (if ((x + y) % 2 == 0) 200 else 100) + 40)
    assert(MediaCodecs.aHash64(brighter).toOption.get.toSeq == c.toSeq)
    // flat image: no cell exceeds the mean -> all-zero hash, not noise
    val flat = MediaCodecs.encodeGray(16, 16, (_, _) => 77)
    assert(MediaCodecs.aHash64(flat).toOption.get.toSeq == Seq(0, 0, 0, 0))
    // totality
    assert(MediaCodecs.aHash64("junk".getBytes("US-ASCII")).isLeft)
    assert(MediaCodecs.aHash64(MediaCodecs.encodeGray(4, 4, (_, _) => 1)).isLeft) // < 8x8
  }

  test("dHash: hand-computed gradient bits; ramp invariance aHash lacks") {
    // 9x8 image, each dHash cell IS one pixel: bit (row*8+c) set iff
    // pixel (c+1) > pixel (c) in that row. Pixels ascend with x on even
    // rows, descend on odd -> even rows all-ones, odd rows all-zeros
    val png = MediaCodecs.encodeGray(9, 8,
      (x, y) => if (y % 2 == 0) 10 + x else 100 - x)
    val c = MediaCodecs.dHash64(png).fold(e => fail(e), identity)
    for (bit <- 0 until 64) {
      val want = (bit / 8) % 2 == 0
      val got = ((c(bit / 16) >> (bit % 16)) & 1) == 1
      assert(got == want, s"bit $bit: got $got want $want")
    }
    // brightness invariance: +50 everywhere leaves every comparison
    val brighter = MediaCodecs.encodeGray(9, 8,
      (x, y) => (if (y % 2 == 0) 10 + x else 100 - x) + 50)
    assert(MediaCodecs.dHash64(brighter).toOption.get.toSeq == c.toSeq)
    // THE dHash property: a smooth x-ramp added to a flat image leaves
    // dHash at a constant all-ones (every right cell beats its left) no
    // matter the ramp's base — while aHash flips with global contrast.
    // A flat image has NO gradient: all-zero dHash.
    val flat = MediaCodecs.encodeGray(18, 16, (_, _) => 77)
    assert(MediaCodecs.dHash64(flat).toOption.get.toSeq == Seq(0, 0, 0, 0))
    val ramp = MediaCodecs.encodeGray(18, 16, (x, _) => 40 + x * 5)
    val rc = MediaCodecs.dHash64(ramp).toOption.get
    assert((0 until 64).forall(b => ((rc(b / 16) >> (b % 16)) & 1) == 1),
      "a monotone x-ramp must set every gradient bit")
    // totality
    assert(MediaCodecs.dHash64("junk".getBytes("US-ASCII")).isLeft)
    assert(MediaCodecs.dHash64(MediaCodecs.encodeGray(8, 8, (_, _) => 1)).isLeft) // < 9 wide
  }

  test("silence profile: planted leading zeros count exactly; thresholds bite") {
    // 10 frames of 32 samples: first 3 frames zero, rest amplitude 100
    val samples = Array.tabulate(10 * 32)(t => (if (t < 96) 0 else 100).toShort)
    val (nf, ns, lead) = MediaCodecs
      .silenceProfile(MediaCodecs.encodeWavPcm16(8000, samples),
        frameLen = 32, threshold = 1000L)
      .fold(e => fail(e), identity)
    assert(nf == 10 && ns == 3 && lead == 3, s"($nf, $ns, $lead)")
    // an interior silent frame counts as silent but not leading
    val gap = Array.tabulate(10 * 32)(t =>
      (if (t >= 5 * 32 && t < 6 * 32) 0 else 100).toShort)
    val (_, ns2, lead2) = MediaCodecs
      .silenceProfile(MediaCodecs.encodeWavPcm16(8000, gap),
        frameLen = 32, threshold = 1000L).fold(e => fail(e), identity)
    assert(ns2 == 1 && lead2 == 0, s"($ns2, $lead2)")
    // all-silent: leading == total; threshold 32*100=3200 <= t flips all
    val loudBar = MediaCodecs
      .silenceProfile(MediaCodecs.encodeWavPcm16(8000, gap),
        frameLen = 32, threshold = 3200L).fold(e => fail(e), identity)
    assert(loudBar._2 == 10 && loudBar._3 == 10)
    // totality
    assert(MediaCodecs.silenceProfile("junk".getBytes("US-ASCII")).isLeft)
  }

  test("audio fingerprint: hand-computed energy-delta bits; gain-scaling invariance") {
    // 65 frames of 32 samples: frame f is constant amplitude 100·(f % 2)
    // -> energies alternate 0, 3200, 0, ... so bit f = (f even): E_{f+1} > E_f
    val alt = Array.tabulate(65 * 32)(t => (100 * ((t / 32) % 2)).toShort)
    val c = MediaCodecs.audioFingerprint(MediaCodecs.encodeWavPcm16(8000, alt))
      .fold(e => fail(e), identity)
    for (b <- 0 until 64) {
      val want = b % 2 == 0
      val got = ((c(b / 16) >> (b % 16)) & 1) == 1
      assert(got == want, s"bit $b: got $got want $want")
    }
    // scaling every sample 3x scales both sides of each comparison: same bits
    val scaled = alt.map(s => (s * 3).toShort)
    assert(MediaCodecs.audioFingerprint(MediaCodecs.encodeWavPcm16(8000, scaled))
      .toOption.get.toSeq == c.toSeq)
    // totality: too-short and non-PCM16 payloads reject
    assert(MediaCodecs.audioFingerprint(
      MediaCodecs.encodeWavPcm16(8000, Array.fill(100)(1.toShort))).isLeft)
    assert(MediaCodecs.audioFingerprint("junk".getBytes("US-ASCII")).isLeft)
  }

  test("mkv/webm skeleton encode→EBML-walk round-trips structural metadata exactly") {
    val mkv = MediaCodecs.encodeMkvSkeleton(1280, 720, nFrames = 5,
      usPerFrame = 20000L, docType = "matroska", codec = "V_MPEG4/ISO/AVC")
    assert(MediaCodecs.sniff(mkv) == "ebml")
    val m = MediaCodecs.decodeMkv(mkv).fold(e => fail(e), identity)
    assert(m.container == "mkv" && m.codec == "V_MPEG4/ISO/AVC")
    assert(m.width == 1280 && m.height == 720)
    assert(m.frames == 5L) // counted from actual SimpleBlocks, not headers
    assert(m.usPerFrame == 20000L && m.durationUs == 100000L)
    val webm = MediaCodecs.encodeMkvSkeleton(320, 240, nFrames = 2,
      docType = "webm", codec = "V_VP9")
    val w = MediaCodecs.decodeMkv(webm).fold(e => fail(e), identity)
    assert(w.container == "webm" && w.codec == "V_VP9" && w.frames == 2L)
  }

  test("mkv walk is total and counts only the video track's blocks") {
    assert(MediaCodecs.decodeMkv("junk".getBytes("US-ASCII")).isLeft)
    val good = MediaCodecs.encodeMkvSkeleton(64, 48, nFrames = 3)
    assert(MediaCodecs.decodeMkv(good.take(40)).isLeft) // torn: no track committed
    // retarget every SimpleBlock to track 2 (video is track 1): frame
    // count for the video track must drop to zero -> Left
    val other = good.clone()
    var i = 0
    var patched = 0
    while (i < other.length - 4) {
      if ((other(i) & 0xff) == 0xA3 && (other(i + 1) & 0xff) == 0x40 &&
        (other(i + 3) & 0xff) == 0x81) {
        other(i + 3) = 0x82.toByte; patched += 1
      }
      i += 1
    }
    assert(patched == 3, s"patched $patched blocks")
    assert(MediaCodecs.decodeMkv(other).isLeft)
  }

  test("image features: histogram over decoded samples, unit norm, real not stub") {
    val bytes = MediaCodecs.encodeGray(16, 16, (x, y) => if ((x + y) % 2 == 0) 0 else 255)
    val f = MediaCodecs.imageFeatures(bytes, 64).get
    val norm = math.sqrt(f.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    // a checkerboard concentrates ALL mass in the first and last histogram bins
    assert(f(0) > 0.7f && f(63) > 0.7f)
    assert(f.slice(1, 63).forall(_ == 0.0f))
  }

  test("audio features: histogram over decoded PCM, unit norm") {
    // constant-amplitude square wave: mass in exactly two bins
    val samples = Array.tabulate(2000)(i => (if (i % 2 == 0) 16000 else -16000).toShort)
    val f = MediaCodecs.audioFeatures(MediaCodecs.encodeWavPcm16(8000, samples), 64).get
    assert(math.abs(math.sqrt(f.map(x => x.toDouble * x).sum) - 1.0) < 1e-5)
    assert(f.count(_ > 0.0f) == 2)
  }

  test("aviFrameMeanLumas: per-frame decode; flat-frame JPEG error bounded") {
    // the scene_change contract: flat gray frames round-trip within a
    // few luma levels — far inside the 72-level decision margin around
    // the 128 threshold
    val values = Seq(56, 200, 56, 56, 200, 200, 56)
    val avi = MediaCodecs.encodeAviMjpeg(32, 32,
      values.map(v => (_: Int, _: Int) => v))
    val lumas = MediaCodecs.aviFrameMeanLumas(avi)
      .fold(e => fail(e), identity)
    assert(lumas.length == values.length)
    lumas.zip(values).foreach { case (got, want) =>
      assert(math.abs(got - want) <= 4, s"flat $want decoded as $got")
    }
    // classification is exact under the margin
    assert(lumas.map(_ > 128) == values.map(_ > 128))
    // non-AVI input reports, never throws
    assert(MediaCodecs.aviFrameMeanLumas("nope".getBytes).isLeft)
  }
}
