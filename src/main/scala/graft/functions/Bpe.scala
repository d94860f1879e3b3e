package graft.functions

import scala.collection.mutable

/** Byte-pair-encoding tokenizer training + encoding — the GPT-2-family
  * subword tokenizer a training-data pipeline runs over the corpus before
  * packing (SURVEY §2.3 training-ops family; the reference tokenizes
  * implicitly inside sentence-transformers, helper cited at
  * functions/Embedder.scala).
  *
  * The corpus-scale part of BPE training is the WORD COUNT, not the merge
  * loop: merges operate on the (word → count) vocabulary, which is
  * Heaps'-law bounded and capped by the caller, so production trains
  * exactly like this — one distributed aggregation, then an in-memory
  * merge loop over the vocab table (this is how the original GPT-2/
  * sentencepiece trainers consume corpora too). Encoding is then a pure
  * per-word function distributed back as a broadcast (word → tokens)
  * table — see PipelineQueries.bpeTokenize for the join shape.
  *
  * Determinism: the best pair is the highest total count, ties broken by
  * the lexicographically smallest (left, right) — no hash-order
  * dependence, so retraining on the same vocab is bit-identical.
  */
object Bpe {

  /** Merge every non-overlapping, left-to-right occurrence of `pair`. */
  private[functions] def mergePair(
      syms: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Train up to `nMerges` merges from a (word → count) vocabulary.
    * Words start as single-character symbols; each round merges the
    * globally most frequent adjacent pair. Stops early when no pair
    * remains (every word fully merged). */
  def train(vocab: Seq[(String, Long)], nMerges: Int): Vector[(String, String)] = {
    var segs: Vector[(Vector[String], Long)] =
      vocab.toVector.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val counts = mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- segs; i <- 0 until syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        counts(p) = counts.getOrElse(p, 0L) + c
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        segs = segs.map { case (syms, c) => (mergePair(syms, best), c) }
        round += 1
      }
    }
    merges.result()
  }

  /** Encode one word with ranked merges: repeatedly apply the
    * lowest-ranked (earliest-learned) adjacent pair present, merging all
    * its occurrences, until no learned pair remains. Tokens always tile
    * the word exactly (merges only concatenate adjacent symbols). */
  def encode(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) done = true
      else {
        syms = mergePair(syms, best)
        if (syms.length < 2) done = true
      }
    }
    syms
  }
}
