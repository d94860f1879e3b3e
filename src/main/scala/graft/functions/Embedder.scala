package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The T6 model seam (SURVEY.md §2.1): `load` is called ONCE per partition
  * — the place a real deployment pays its expensive init (read ONNX
  * weights from a broadcast/local file, create the inference session) —
  * and the returned function once per row. Implementations ship to
  * executors, so they must be Serializable and hold a PATH or broadcast
  * handle to weights, never the loaded session itself. */
trait TextModelLoader extends Serializable {
  def load(dim: Int): String => Array[Float]
}

/** Deterministic feature-hashing embedder — the offline stand-in for the
  * reference's sentence-transformer (all-MiniLM-L6-v2, bound at
  * /root/reference/app.py:46-48). No model weights are available offline
  * and a neural embedder could never be oracle-reproduced (SURVEY.md §7.4
  * risk 1), so declared queries never depend on it; the ingest pipeline
  * uses it through the same `String => Array[Float]` seam a broadcast ONNX
  * model would occupy in production.
  *
  * Algorithm: signed feature hashing (HashingTF-style) — each whitespace
  * token FNV-1a-hashes to a bucket and a ±1 sign; the bucket histogram is
  * L2-normalized. Deterministic across JVMs (no object hashCode), cheap
  * (O(bytes)), and dimension-agnostic.
  */
object Embedder extends Serializable {

  val DefaultDim = 64 // matches the fixture embeddings (FIXTURES.md)

  def embed(text: String, dim: Int = DefaultDim): Array[Float] = {
    val v = new Array[Double](dim)
    if (text != null) {
      var start = 0
      val n = text.length
      var i = 0
      while (i <= n) {
        if (i == n || Character.isWhitespace(text.charAt(i))) {
          if (i > start) {
            val h = fnv1a64(text, start, i)
            val idx = java.lang.Long.remainderUnsigned(h, dim.toLong).toInt
            v(idx) += (if (((h >>> 32) & 1L) == 0L) 1.0 else -1.0)
          }
          start = i + 1
        }
        i += 1
      }
    }
    var ss = 0.0
    var j = 0
    while (j < dim) { ss += v(j) * v(j); j += 1 }
    val scale = if (ss == 0.0) 0.0 else 1.0 / math.sqrt(ss)
    val out = new Array[Float](dim)
    j = 0
    while (j < dim) { out(j) = (v(j) * scale).toFloat; j += 1 }
    out
  }

  /** The stand-in behind the seam: "loading" is free, but the call shape
    * is the one a weight-file loader occupies (EmbedderSpec proves the
    * seam with a real load-from-fixture linear model). */
  object StandIn extends TextModelLoader {
    def load(dim: Int): String => Array[Float] = t => embed(t, dim)
  }

  /** Partition-mapped embedding of (id, text) rows — the batch form of
    * the T6 seam, shared by the ingest pipeline and the CDC re-embed
    * path: ONE model instantiation per partition (never per row — a
    * per-row UDF would re-create a real model's session thousands of
    * times), rows streamed through it. Returns (vec_id, embedding). */
  def embedFrame(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", dim: Int = DefaultDim,
      loader: TextModelLoader = StandIn): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val d = dim
    val ld = loader
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val model = ld.load(d) // once per partition: the expensive init
        it.map { case (id, t) => (id, model(t)) }
      }
      .toDF("vec_id", "embedding")
  }

  /** FNV-1a over UTF-16 code units of text[from, until). */
  private[graft] def fnv1a64(s: CharSequence, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def fnv1a64(s: String): Long = fnv1a64(s, 0, s.length)
}
