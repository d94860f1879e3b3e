package graft.multimodal

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def asset(id: Long, modality: String, name: String, bytes: Array[Byte]) =
    Multimodal.Asset(id, modality, name, bytes)

  test("feature extraction is deterministic, unit-norm, schema-correct") {
    val assets = Seq(
      asset(1, "image", "a.jpg", Array.fill[Byte](500)(7)),
      asset(2, "audio", "b.wav", Array.fill[Byte](300)(9))).toDS()
    val feats = Multimodal.extractFeatures(assets).collect().sortBy(_.asset_id)
    assert(feats.map(_.modality).toSeq == Seq("image", "audio"))
    // undecodable payloads are marked, not silently stub-featured
    assert(feats.forall(_.feature_source == "stub"))
    assert(feats.forall(_.embedding.length == 64))
    assert(feats.forall(f => f.byte_len > 0 && f.content_hash.matches("[0-9a-f]{64}")))
    val norm = math.sqrt(feats.head.embedding.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    // same bytes, same modality → identical features
    val again = Multimodal.extractFeatures(assets).collect().sortBy(_.asset_id)
    assert(again.head.embedding.toSeq == feats.head.embedding.toSeq)
    // same bytes, different modality → different features (modality-keyed stub)
    val other = Multimodal.extractFeatures(
      Seq(asset(3, "video", "c.mp4", Array.fill[Byte](500)(7))).toDS()).head()
    assert(other.embedding.toSeq != feats.head.embedding.toSeq)
  }

  test("extractFeatures routes decodable image/audio through the real codecs") {
    val png = MediaCodecs.encodeGray(16, 16, (x, y) => (x * 16 + y) % 256)
    val wav = MediaCodecs.encodeWavPcm16(8000,
      Array.tabulate(500)(i => ((i * 31) % 2000 - 1000).toShort))
    val feats = Multimodal.extractFeatures(Seq(
      asset(1, "image", "a.png", png),
      asset(2, "audio", "b.wav", wav)).toDS()).collect().sortBy(_.asset_id)
    // features are the real decoded-sample histograms, not the byte stub
    assert(feats.forall(_.feature_source == "codec"))
    assert(feats(0).embedding.toSeq == MediaCodecs.imageFeatures(png, 64).get.toSeq)
    assert(feats(1).embedding.toSeq == MediaCodecs.audioFeatures(wav, 64).get.toSeq)
    assert(feats(0).embedding.toSeq != Multimodal.decodeStub("image", png, 64).toSeq)
    assert(feats(1).embedding.toSeq != Multimodal.decodeStub("audio", wav, 64).toSeq)
  }

  test("extractFeatures routes AVI-MJPEG video through the real codec; mp4 stays stub") {
    val avi = MediaCodecs.encodeAviMjpeg(16, 12,
      Seq.tabulate(2)(f => (x: Int, y: Int) => 30 + f + x + y))
    val feats = Multimodal.extractFeatures(Seq(
      asset(1, "video", "clip.avi", avi),
      asset(2, "video", "clip.mp4", Array.fill[Byte](400)(5))).toDS())
      .collect().sortBy(_.asset_id)
    assert(feats(0).feature_source == "codec", "AVI-MJPEG must decode for real")
    assert(feats(0).embedding.toSeq == MediaCodecs.videoFeatures(avi, 64).get.toSeq)
    assert(feats(1).feature_source == "stub", "no JDK codec for mp4 — provenance-marked stub")
  }

  test("frame sampling produces one row per stride window") {
    val bytes = Array.tabulate[Byte](4096)(i => (i % 127).toByte)
    val frames = Multimodal.sampleFrames(
      Seq(asset(1, "video", "v.mp4", bytes)).toDS(), frameLen = 256, stride = 1024)
      .orderBy("frame_idx").collect()
    assert(frames.length == 4)
    assert(frames.map(_.getAs[Long]("byte_offset")).toSeq == Seq(0L, 1024L, 2048L, 3072L))
    assert(frames.forall(_.getAs[Long]("frame_len") == 256L))
  }

  test("binaryFile landing zone dispatches modality from extension") {
    val dir = tmpDir("media")
    Files.write(dir.resolve("Photo.JPG"), "img-bytes".getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("song.mp3"), "audio-bytes".getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("clip.mp4"), "video-bytes".getBytes(StandardCharsets.UTF_8))
    val got = Multimodal.fromBinaryFiles(spark, dir.toString)
      .select("name", "modality").as[(String, String)].collect().toMap
    assert(got == Map("photo.jpg" -> "image", "song.mp3" -> "audio", "clip.mp4" -> "video"))
  }
}
