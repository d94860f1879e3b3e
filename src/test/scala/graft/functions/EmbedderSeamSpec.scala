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
