package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** A REAL neural sentence encoder behind the T6 model seam — the
  * capability the reference binds as all-MiniLM-L6-v2
  * (/root/reference/app.py:46-48), reimplemented as a complete pure-JVM
  * transformer encoder because this environment ships no ONNX runtime and
  * no network egress: token + learned positional embeddings, `nLayers`
  * pre-LN blocks of multi-head scaled-dot-product self-attention and a
  * GELU feed-forward, mean pooling over positions, L2 normalization —
  * the MiniLM inference graph, executed from a weights FILE loaded once
  * per partition through [[TextModelLoader]].
  *
  * What is and isn't real, stated plainly: the ARCHITECTURE and the
  * load-weights-from-file inference path are real (swap in trained
  * weights and this serves them — TransformerSpec pins a closed-form
  * forward pass, determinism across JVMs, and the one-load-per-partition
  * contract); the shipped WEIGHTS are deterministic pseudo-random
  * ([[TinyTransformer.writeRandomWeights]]) because no trained tensors
  * exist offline. Declared queries therefore treat its output as
  * rows-only (no SQL oracle can run a transformer), exactly as
  * BASELINE.md prescribes for the neural seam.
  *
  * Tokenization is hashing-based (whitespace token → FNV-1a bucket in
  * [0, vocab)): a trained checkpoint would bring its own WordPiece vocab
  * file through the same loader.
  *
  * 100 TB shape: the weights file rides executor-local disk (or a Spark
  * broadcast), ONE session per partition amortizes the init, rows stream
  * through `mapPartitions` ([[Embedder.embedFrame]]) — never a per-row
  * UDF re-instantiating the model.
  */
object TinyTransformer {

  final case class Config(vocab: Int, dModel: Int, nHeads: Int, nLayers: Int,
      dFf: Int, maxLen: Int) {
    require(dModel % nHeads == 0, s"dModel $dModel not divisible by nHeads $nHeads")
    /** Floats per layer: Wq,Wk,Wv,Wo (d·d each) + 4 biases (d) + ln1(2d)
      * + W1 (d·ff) + b1 (ff) + W2 (ff·d) + b2 (d) + ln2 (2d). */
    def layerFloats: Int = 4 * dModel * dModel + 4 * dModel + 2 * dModel +
      dModel * dFf + dFf + dFf * dModel + dModel + 2 * dModel
    /** Total floats: token emb + positional emb + layers + final ln. */
    def totalFloats: Int =
      vocab * dModel + maxLen * dModel + nLayers * layerFloats + 2 * dModel
  }

  val Magic = 0x47544E54 // "GTNT"

  /** The serialized format: magic, 6 config ints, then `totalFloats`
    * little-endian float32s — the shape of a stripped ONNX initializer
    * dump. */
  def writeWeights(path: String, cfg: Config, weights: Array[Float]): Unit = {
    require(weights.length == cfg.totalFloats,
      s"expected ${cfg.totalFloats} floats, got ${weights.length}")
    val bb = ByteBuffer.allocate(4 * 7 + 4 * weights.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(Magic).putInt(cfg.vocab).putInt(cfg.dModel).putInt(cfg.nHeads)
      .putInt(cfg.nLayers).putInt(cfg.dFf).putInt(cfg.maxLen)
    weights.foreach(bb.putFloat)
    Files.write(Paths.get(path), bb.array())
  }

  /** Deterministic pseudo-random weights (splitmix64 → uniform in
    * ±1/sqrt(dModel), the usual init scale) — the offline stand-in for a
    * trained checkpoint; same seed ⇒ bit-identical file on any JVM. */
  def writeRandomWeights(path: String, cfg: Config, seed: Long = 42L): Unit = {
    var z = seed
    def next(): Float = {
      z += 0x9E3779B97F4A7C15L
      var x = z
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x = x ^ (x >>> 31)
      // 53-bit mantissa to uniform [0,1), scaled to ±1/sqrt(d)
      val u = (x >>> 11).toDouble / (1L << 53).toDouble
      ((2.0 * u - 1.0) / math.sqrt(cfg.dModel.toDouble)).toFloat
    }
    writeWeights(path, cfg, Array.fill(cfg.totalFloats)(next()))
  }

  def readWeights(path: String): (Config, Array[Float]) = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.getInt() == Magic, s"$path is not a graft transformer weights file")
    val cfg = Config(bb.getInt(), bb.getInt(), bb.getInt(), bb.getInt(),
      bb.getInt(), bb.getInt())
    val w = new Array[Float](cfg.totalFloats)
    var i = 0
    while (i < w.length) { w(i) = bb.getFloat(); i += 1 }
    (cfg, w)
  }

  /** One in-memory inference session over a loaded weight buffer —
    * allocated once per partition, applied once per row. Arithmetic is
    * double-accumulated fixed-order, so outputs are bit-identical across
    * JVMs and partitionings. */
  final class Session(val cfg: Config, w: Array[Float]) {
    private val d = cfg.dModel
    private val dh = d / cfg.nHeads
    // offsets into the flat buffer, in writeWeights order
    private val embOff = 0
    private val posOff = embOff + cfg.vocab * d
    private val layerOff = posOff + cfg.maxLen * d
    private val finalLnOff = layerOff + cfg.nLayers * cfg.layerFloats

    private def gelu(x: Double): Double = // tanh approximation (BERT's)
      0.5 * x * (1.0 + math.tanh(0.7978845608028654 * (x + 0.044715 * x * x * x)))

    private def layerNorm(x: Array[Double], gOff: Int, bOff: Int): Unit = {
      var mean = 0.0; var i = 0
      while (i < d) { mean += x(i); i += 1 }
      mean /= d
      var va = 0.0; i = 0
      while (i < d) { val t = x(i) - mean; va += t * t; i += 1 }
      val inv = 1.0 / math.sqrt(va / d + 1e-12)
      i = 0
      while (i < d) { x(i) = (x(i) - mean) * inv * w(gOff + i) + w(bOff + i); i += 1 }
    }

    /** y[j] = Σ_i x[i] · W[i·cols + j] + b[j] (row-major input-major). */
    private def matmul(x: Array[Double], wOff: Int, bOff: Int, cols: Int): Array[Double] = {
      val y = new Array[Double](cols)
      var j = 0
      while (j < cols) { y(j) = w(bOff + j); j += 1 }
      var i = 0
      while (i < x.length) {
        val xi = x(i)
        if (xi != 0.0) {
          val row = wOff + i * cols
          j = 0
          while (j < cols) { y(j) += xi * w(row + j); j += 1 }
        }
        i += 1
      }
      y
    }

    /** Hashing tokenizer: whitespace tokens → FNV-1a buckets. */
    private[functions] def tokenize(text: String): Array[Int] = {
      val ids = scala.collection.mutable.ArrayBuffer.empty[Int]
      if (text != null) {
        var start = 0
        val n = text.length
        var i = 0
        while (i <= n && ids.length < cfg.maxLen) {
          if (i == n || Character.isWhitespace(text.charAt(i))) {
            if (i > start) {
              val h = Embedder.fnv1a64(text, start, i)
              ids += java.lang.Long.remainderUnsigned(h, cfg.vocab.toLong).toInt
            }
            start = i + 1
          }
          i += 1
        }
      }
      if (ids.isEmpty) ids += 0 // CLS-like fallback: empty text still encodes
      ids.toArray
    }

    def encode(text: String): Array[Float] = {
      val toks = tokenize(text)
      val n = toks.length
      // hidden states: token embedding + positional embedding
      val hs = Array.tabulate(n) { p =>
        val x = new Array[Double](d)
        val te = embOff + toks(p) * d
        val pe = posOff + p * d
        var i = 0
        while (i < d) { x(i) = w(te + i).toDouble + w(pe + i); i += 1 }
        x
      }
      var off = layerOff
      var l = 0
      while (l < cfg.nLayers) {
        val wq = off; val wk = wq + d * d; val wv = wk + d * d; val wo = wv + d * d
        val bq = wo + d * d; val bk = bq + d; val bv = bk + d; val bo = bv + d
        val ln1g = bo + d; val ln1b = ln1g + d
        val w1 = ln1b + d; val b1 = w1 + d * cfg.dFf
        val w2 = b1 + cfg.dFf; val b2 = w2 + cfg.dFf * d
        val ln2g = b2 + d; val ln2b = ln2g + d
        // pre-LN attention block
        val normed = hs.map { x => val c = x.clone(); layerNorm(c, ln1g, ln1b); c }
        val q = normed.map(matmul(_, wq, bq, d))
        val k = normed.map(matmul(_, wk, bk, d))
        val v = normed.map(matmul(_, wv, bv, d))
        val ctx = Array.fill(n)(new Array[Double](d))
        val scale = 1.0 / math.sqrt(dh.toDouble)
        var h = 0
        while (h < cfg.nHeads) {
          val base = h * dh
          var p = 0
          while (p < n) {
            // scores over all positions (bidirectional encoder)
            val sc = new Array[Double](n)
            var mx = Double.NegativeInfinity
            var t = 0
            while (t < n) {
              var s = 0.0; var i = 0
              while (i < dh) { s += q(p)(base + i) * k(t)(base + i); i += 1 }
              s *= scale
              sc(t) = s
              if (s > mx) mx = s
              t += 1
            }
            var z = 0.0
            t = 0
            while (t < n) { sc(t) = math.exp(sc(t) - mx); z += sc(t); t += 1 }
            t = 0
            while (t < n) {
              val a = sc(t) / z
              var i = 0
              while (i < dh) { ctx(p)(base + i) += a * v(t)(base + i); i += 1 }
              t += 1
            }
            p += 1
          }
          h += 1
        }
        var p = 0
        while (p < n) {
          val attnOut = matmul(ctx(p), wo, bo, d)
          var i = 0
          while (i < d) { hs(p)(i) += attnOut(i); i += 1 } // residual
          val c = hs(p).clone()
          layerNorm(c, ln2g, ln2b)
          val ff1 = matmul(c, w1, b1, cfg.dFf)
          var j = 0
          while (j < cfg.dFf) { ff1(j) = gelu(ff1(j)); j += 1 }
          val ff2 = matmul(ff1, w2, b2, d)
          i = 0
          while (i < d) { hs(p)(i) += ff2(i); i += 1 } // residual
          p += 1
        }
        off += cfg.layerFloats
        l += 1
      }
      // final LN, mean pooling, L2 normalize — the sentence-transformers head
      val pooled = new Array[Double](d)
      hs.foreach { x =>
        val c = x.clone()
        layerNorm(c, finalLnOff, finalLnOff + d)
        var i = 0
        while (i < d) { pooled(i) += c(i); i += 1 }
      }
      var ss = 0.0
      var i = 0
      while (i < d) { pooled(i) /= hs.length; ss += pooled(i) * pooled(i); i += 1 }
      val inv = if (ss == 0.0) 0.0 else 1.0 / math.sqrt(ss)
      val out = new Array[Float](d)
      i = 0
      while (i < d) { out(i) = (pooled(i) * inv).toFloat; i += 1 }
      out
    }
  }

  /** The seam loader: holds the weights PATH (ships to executors; the
    * session materializes on them, once per partition). `dim` must match
    * the checkpoint's dModel — a dimension mismatch fails fast instead of
    * silently truncating. */
  final class Loader(weightsPath: String) extends TextModelLoader {
    def load(dim: Int): String => Array[Float] = {
      val (cfg, w) = readWeights(weightsPath)
      require(cfg.dModel == dim,
        s"checkpoint dModel ${cfg.dModel} != requested dim $dim")
      val session = new Session(cfg, w)
      t => session.encode(t)
    }
  }
}
