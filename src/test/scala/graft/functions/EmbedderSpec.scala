package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class EmbedderSpec extends AnyFunSuite {

  test("embedding is deterministic and dimension-correct") {
    val a = Embedder.embed("the quick brown fox", 64)
    val b = Embedder.embed("the quick brown fox", 64)
    assert(a.length == 64)
    assert(a.toSeq == b.toSeq)
  }

  test("non-empty text yields a unit-norm vector") {
    val v = Embedder.embed("alpha beta gamma delta", 64)
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("empty/whitespace text yields the zero vector") {
    assert(Embedder.embed("", 64).forall(_ == 0f))
    assert(Embedder.embed("   \n ", 64).forall(_ == 0f))
  }

  test("different texts produce different vectors") {
    val a = Embedder.embed("table scan merge join", 64)
    val b = Embedder.embed("window sort group agg", 64)
    assert(a.toSeq != b.toSeq)
  }

  test("similar texts are closer than dissimilar ones (cosine)") {
    def cos(x: Array[Float], y: Array[Float]): Double =
      x.zip(y).map { case (a, b) => a.toDouble * b }.sum
    val base = Embedder.embed("the fast key order sort table scan merge", 64)
    val near = Embedder.embed("the fast key order sort table scan", 64)
    val far = Embedder.embed("zebra quantum violet harmonica", 64)
    assert(cos(base, near) > cos(base, far))
  }

  test("dimension-agnostic (reference would use 384)") {
    assert(Embedder.embed("hello world", 384).length == 384)
  }
}
