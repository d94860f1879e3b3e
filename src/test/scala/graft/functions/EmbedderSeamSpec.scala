package graft.functions

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** Proves the T6 model seam really accepts a MODEL — weights loaded from a
  * fixture file at `load` time, applied per row — not just the free
  * stand-in: the seam's contract is one expensive init per PARTITION and
  * cheap per-row calls, which is what makes an ONNX session affordable
  * behind it (reference binds all-MiniLM-L6-v2 at app.py:46-48; weights
  * aren't available offline, so declared queries keep the stand-in). */
object EmbedderSeamSpec {
  // local-mode tasks share the JVM, so a static counter observes every
  // load() across all partitions of a job
  val loads = new AtomicInteger(0)

  /** A real load-from-file linear model: a per-dimension weight vector is
    * read from `weightsPath` when (and only when) `load` runs; each row
    * then pays one cheap apply — y_i = w_i · standin_i, a diagonal linear
    * layer over the stand-in features. Holds the PATH, not the weights
    * (the loader ships to executors; the weights load on them). Top-level
    * in the companion so the closure doesn't capture the suite. */
  class FixtureLinearModel(weightsPath: String) extends TextModelLoader {
    def load(dim: Int): String => Array[Float] = {
      EmbedderSeamSpec.loads.incrementAndGet()
      val w = new String(Files.readAllBytes(java.nio.file.Paths.get(weightsPath)))
        .trim.split(",").map(_.toFloat)
      require(w.length == dim, s"weights file has ${w.length} entries, dim is $dim")
      t => {
        val x = Embedder.embed(t, dim)
        val y = new Array[Float](dim)
        var i = 0
        while (i < dim) { y(i) = w(i) * x(i); i += 1 }
        y
      }
    }
  }
}

class EmbedderSeamSpec extends SparkSpec {
  import spark.implicits._
  import EmbedderSeamSpec.FixtureLinearModel

  test("a weights-file model runs through the seam: one load per partition, per-row apply") {
    val dim = Embedder.DefaultDim
    val weights = Array.tabulate(dim)(i => 1.0f + (i % 3) * 0.5f)
    val path = tmpDir("weights").resolve("w.csv")
    Files.write(path, weights.mkString(",").getBytes)

    val docs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), col("text"))
      .repartition(4)
    val nRows = docs.count()
    assert(nRows > 4, "need more rows than partitions to tell per-row from per-partition")

    EmbedderSeamSpec.loads.set(0)
    val got = Embedder.embedFrame(docs, loader = new FixtureLinearModel(path.toString))
      .as[(Long, Array[Float])].collect().toMap
    assert(EmbedderSeamSpec.loads.get() == 4,
      s"expected one model load per partition (4), saw ${EmbedderSeamSpec.loads.get()}")

    // the loaded weights were actually applied, row by row
    val texts = docs.as[(Long, String)].collect().toMap
    assert(got.keySet == texts.keySet)
    texts.foreach { case (id, t) =>
      val want = Embedder.embed(t, dim).zip(weights).map { case (x, w) => w * x }
      assert(got(id).toSeq == want.toSeq, s"doc $id: seam output != loaded-weights model")
    }
  }

  test("MiniLM-shape checkpoint (6 layers x 384 dims x 12 heads) serves through the seam") {
    val cfg = TinyTransformer.MiniLmShape
    // the geometry claim this spec pins: the reference's actual width
    // (app.py:46-48 — all-MiniLM-L6-v2), not the fixture's 64
    assert(cfg.dModel == 384 && cfg.nLayers == 6 && cfg.nHeads == 12 &&
      cfg.dFf == 4 * 384)
    val path = tmpDir("minilm384").resolve("w.bin").toString
    TinyTransformer.writeRandomWeights(path, cfg)
    val docs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 24).select(col("doc_id"), col("text"))
    def run(parts: Int): Map[Long, Array[Float]] =
      Embedder.embedFrame(docs.repartition(parts), dim = 384,
          loader = new TransformerSpec.CountingLoader(path))
        .as[(Long, Array[Float])].collect().toMap
    TransformerSpec.loads.set(0)
    val a = run(3)
    assert(TransformerSpec.loads.get() == 3,
      s"expected one 384-dim session load per partition (3), saw ${TransformerSpec.loads.get()}")
    val b = run(7)
    assert(a.keySet == b.keySet && a.size == 24)
    // bit-determinism across partitionings at the real width
    a.foreach { case (id, v) =>
      assert(v.length == 384, s"doc $id: width ${v.length}")
      assert(v.forall(f => !f.isNaN && !f.isInfinite), s"doc $id: non-finite output")
      assert(v.toSeq == b(id).toSeq, s"doc $id drifted across partitionings")
    }
    // and against a driver-side session, bit for bit
    val (c2, w2) = TinyTransformer.readWeights(path)
    val local = new TinyTransformer.Session(c2, w2)
    docs.as[(Long, String)].collect().take(3).foreach { case (id, t) =>
      assert(a(id).toSeq == local.encode(t).toSeq, s"doc $id != driver session")
    }
  }

  test("the default stand-in through embedFrame matches direct embed calls") {
    val docs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), col("text"))
    val got = Embedder.embedFrame(docs)
      .as[(Long, Array[Float])].collect().toMap
    docs.as[(Long, String)].collect().foreach { case (id, t) =>
      assert(got(id).toSeq == Embedder.embed(t).toSeq)
    }
  }
}
