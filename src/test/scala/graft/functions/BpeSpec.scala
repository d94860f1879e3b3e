package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {

  private val vocab = Seq("aaab" -> 3L, "aab" -> 2L)

  test("train learns the hand-derived merge sequence (counts, ties, early stop)") {
    // round 1: (a,a) count 6+2=8 (overlapping adjacents both count),
    //          (a,b) 3+2=5                      → merge (a,a)
    // round 2: (aa,a)=3, (a,b)=3, (aa,b)=2 — tie broken lexicographically:
    //          ("a","b") < ("aa","a")           → merge (a,b)
    // round 3: (aa,ab)=3, (aa,b)=2              → merge (aa,ab)
    // round 4: (aa,b)=2                         → merge (aa,b)
    // round 5: no pairs remain                  → early stop at 4 merges
    assert(Bpe.train(vocab, 10) ===
      Vector("a" -> "a", "a" -> "b", "aa" -> "ab", "aa" -> "b"))
    assert(Bpe.train(vocab, 2) === Vector("a" -> "a", "a" -> "b"))
  }

  test("encode reproduces the training-final segmentation of every vocab word") {
    val ranks = Bpe.train(vocab, 10).zipWithIndex.toMap
    assert(Bpe.encode("aaab", ranks) === Vector("aaab"))
    assert(Bpe.encode("aab", ranks) === Vector("aab"))
  }

  test("encode applies merges in rank order, not greedily by length") {
    val ranks = Bpe.train(vocab, 2).zipWithIndex.toMap // (a,a) then (a,b)
    assert(Bpe.encode("aaab", ranks) === Vector("aa", "ab"))
    assert(Bpe.encode("ab", ranks) === Vector("ab"))
  }

  test("unknown symbols pass through untouched") {
    val ranks = Bpe.train(vocab, 10).zipWithIndex.toMap
    assert(Bpe.encode("ba", ranks) === Vector("b", "a"))
    assert(Bpe.encode("xyz", ranks) === Vector("x", "y", "z"))
    assert(Bpe.encode("", ranks) === Vector.empty)
  }

  test("tokens always tile the word exactly, and more merges never add tokens") {
    val rng = new scala.util.Random(7)
    val words = Vector.fill(200)(
      (0 until (1 + rng.nextInt(12))).map(_ => ('a' + rng.nextInt(3)).toChar).mkString)
    val trainVocab = words.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toSeq
    val allMerges = Bpe.train(trainVocab, 40)
    for (w <- words; k <- Seq(0, 5, 15, allMerges.length)) {
      val toks = Bpe.encode(w, allMerges.take(k).zipWithIndex.toMap)
      assert(toks.mkString === w, s"tiling broke for $w at $k merges")
      if (k > 0) {
        val fewer = Bpe.encode(w, allMerges.take(k - 1).zipWithIndex.toMap)
        assert(toks.length <= fewer.length, s"merge $k grew token count for $w")
      }
    }
  }

  test("training is deterministic across runs and input order") {
    assert(Bpe.train(vocab, 10) === Bpe.train(vocab.reverse, 10))
  }
}
