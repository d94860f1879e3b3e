package graft.multimodal

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Totality fuzz for the container decoders: like the document parsers,
  * they must return Left on ANY input — random garbage, truncations of
  * valid containers, and bit flips inside them — never throw. (The
  * round-trip EXACTNESS lives in MediaCodecsSpec; this pins the "ingest
  * is total" contract across random geometries.) */
object MediaProps extends Properties("MediaCodecs") {

  private val garbage: Gen[Array[Byte]] =
    Gen.chooseNum(0, 512).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray))

  private def total(decode: Array[Byte] => Either[String, _],
      bytes: Array[Byte]): Boolean =
    try { decode(bytes); true } catch { case _: Throwable => false }

  property("decoders never throw on random garbage") = forAll(garbage) { b =>
    total(MediaCodecs.decodeAvi, b) && total(MediaCodecs.decodeMp4, b) &&
      total(MediaCodecs.decodeMkv, b) && total(MediaCodecs.decodeImage, b) &&
      total(MediaCodecs.decodeWav, b)
  }

  private val mp4 = MediaCodecs.encodeMp4Skeleton(64, 48, nFrames = 3)
  private val mkv = MediaCodecs.encodeMkvSkeleton(64, 48, nFrames = 3)
  private val avi = MediaCodecs.encodeAviMjpeg(16, 12, Seq((x, y) => x + y))

  property("truncations of valid containers never throw") =
    forAll(Gen.chooseNum(0, mp4.length - 1)) { n =>
      total(MediaCodecs.decodeMp4, mp4.take(n)) &&
        total(MediaCodecs.decodeMkv, mkv.take(math.min(n, mkv.length))) &&
        total(MediaCodecs.decodeAvi, avi.take(math.min(n, avi.length)))
    }

  property("single-byte corruptions never throw") =
    forAll(Gen.chooseNum(0, mkv.length - 1), Gen.chooseNum(Byte.MinValue, Byte.MaxValue)) { (i, v) =>
      val m = mkv.clone(); m(i) = v
      val p = mp4.clone(); p(i % mp4.length) = v
      total(MediaCodecs.decodeMkv, m) && total(MediaCodecs.decodeMp4, p)
    }
}
