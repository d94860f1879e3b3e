package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Embedder

/** Multimodal column handling (SURVEY.md §2.3 X6): image/audio/video
  * payloads as opaque `binary` columns with typed metadata, flowing through
  * the same chunk-store/embedding machinery as text.
  *
  * Image, audio, AND AVI-MJPEG video decode are REAL pure-JDK codecs
  * ([[MediaCodecs]]: javax.imageio for png/jpeg/gif/bmp and MJPEG frames,
  * javax.sound.sampled for WAV PCM, hand-rolled RIFF walking for the AVI
  * container) — features are histograms over actual decoded raster/PCM
  * samples, and the `media_meta`/`video_meta` declared queries
  * oracle-check the encode→decode round-trips. MP4 and Matroska/WebM get
  * real STRUCTURAL decodes ([[MediaCodecs.decodeMp4]]'s moov box walk,
  * [[MediaCodecs.decodeMkv]]'s EBML walk — dims/codec/frame-count/timing
  * without frame decode; the JDK ships no H.264/VP9 codec, so their
  * frame FEATURES fall back to the clearly-marked deterministic STUB
  * (`decodeStub`), as does any payload the JDK cannot decode — ingest
  * must be total, not throw on a corrupt blob). The
  * partition-level batch shape (one decoder instance per partition — how
  * an ONNX/ffmpeg handle is amortized on executors) and the downstream
  * embedding column contract (`array<float>`, same as text chunks) apply
  * to all modalities.
  */
object Multimodal {

  val Modalities = Seq("image", "audio", "video")

  case class Asset(asset_id: Long, modality: String, name: String, content: Array[Byte])
  case class AssetFeatures(asset_id: Long, modality: String, name: String,
      byte_len: Long, content_hash: String, feature_source: String,
      embedding: Array[Float])

  /** Load a landing directory of media files as assets —
    * `spark.read.format("binaryFile")` gives (path, modificationTime,
    * length, content). Modality is dispatched on extension. */
  def fromBinaryFiles(spark: SparkSession, dir: String): DataFrame = {
    val ext = element_at(split(lower(col("path")), "\\."), -1)
    val modality = when(ext.isin("jpg", "jpeg", "png", "gif", "bmp"), "image")
      .when(ext.isin("wav", "mp3", "flac", "ogg"), "audio")
      .when(ext.isin("mp4", "avi", "mkv", "webm"), "video")
      .otherwise("unknown")
    spark.read.format("binaryFile").load(dir)
      .select(
        xxhash64(col("path")).as("asset_id"),
        modality.as("modality"),
        lower(element_at(split(col("path"), "/"), -1)).as("name"),
        col("content"))
  }

  /** STUB ━ stands in for a real FRAME decoder on containers whose codecs
    * the JDK lacks (mp4/h264, mkv/webm VP9 — structural metadata parses
    * for real via [[MediaCodecs.decodeMp4]]/[[MediaCodecs.decodeMkv]];
    * AVI-MJPEG frames decode fully via [[MediaCodecs.videoFeatures]]),
    * and is the total-ingest fallback for payloads the JDK codecs
    * reject. Deterministic: hashes
    * 64-byte windows of the payload into a unit-norm feature vector, so
    * tests can pin exact outputs. Image and audio use the REAL decoders
    * in [[MediaCodecs]]. */
  def decodeStub(modality: String, content: Array[Byte], dim: Int): Array[Float] = {
    val v = new Array[Double](dim)
    var i = 0
    while (i < content.length) {
      val until = math.min(i + 64, content.length)
      var h = 0xcbf29ce484222325L ^ modality.hashCode.toLong
      var j = i
      while (j < until) { h ^= content(j) & 0xffL; h *= 0x100000001b3L; j += 1 }
      v(java.lang.Long.remainderUnsigned(h, dim.toLong).toInt) += (if ((h & 1L) == 0L) 1.0 else -1.0)
      i = until
    }
    var ss = 0.0; var j = 0
    while (j < dim) { ss += v(j) * v(j); j += 1 }
    val scale = if (ss == 0.0) 0.0 else 1.0 / math.sqrt(ss)
    v.map(x => (x * scale).toFloat)
  }

  /** Decode + featurize every asset. mapPartitions so a real decoder
    * session is created once per partition, processing assets in batch —
    * the Scala analogue of a pandas-UDF-over-mapInPandas batch shape.
    * Image/audio go through the real [[MediaCodecs]] decoders; video and
    * undecodable payloads fall back to [[decodeStub]] (ingest is total). */
  def extractFeatures(assets: Dataset[Asset], dim: Int = Embedder.DefaultDim): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // real impl: open decoder/model handle here, close at iterator end
      it.map { a =>
        val decoded = a.modality match {
          case "image" => MediaCodecs.imageFeatures(a.content, dim)
          case "audio" => MediaCodecs.audioFeatures(a.content, dim)
          case "video" => MediaCodecs.videoFeatures(a.content, dim) // real for AVI-MJPEG
          case _       => None
        }
        // feature_source makes the stub fallback identifiable downstream —
        // a corrupt image must not be indistinguishable from a decoded one
        AssetFeatures(a.asset_id, a.modality, a.name,
          a.content.length.toLong, sha256Hex(a.content),
          if (decoded.isDefined) "codec" else "stub",
          decoded.getOrElse(decodeStub(a.modality, a.content, dim)))
      }
    }
  }

  /** Fixed-size "frame" sampling for video-like payloads: every `stride`-th
    * window of `frameLen` bytes — the generator shape of real frame
    * extraction (1 asset → N frames), STUB content. */
  def sampleFrames(assets: Dataset[Asset], frameLen: Int = 256, stride: Int = 1024): DataFrame = {
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      Iterator.range(0, math.max(a.content.length, 1), stride).zipWithIndex.map {
        case (off, idx) =>
          val frame = a.content.slice(off, math.min(off + frameLen, a.content.length))
          (a.asset_id, idx, off.toLong, frame.length.toLong, sha256Hex(frame))
      }
    }.toDF("asset_id", "frame_idx", "byte_offset", "frame_len", "frame_hash")
  }

  private def sha256Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
    d.map(b => f"$b%02x").mkString
  }
}
