package graft.functions

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
