package graft.ingest

import scala.collection.mutable.ArrayBuffer

/** Recursive character chunker — reproduces the splitting contract the
  * reference delegates to `RecursiveCharacterTextSplitter(chunk_size=1000,
  * chunk_overlap=200)` (/root/reference/helper/multiple_document_upload.py:121-126):
  * split on the coarsest separator present (paragraph → line → word → char),
  * recursively re-split oversized pieces with the finer separators, then
  * greedily merge adjacent pieces into chunks of at most `chunkSize` chars
  * carrying ~`chunkOverlap` chars of trailing context into the next chunk.
  *
  * Pure JVM logic with no Spark dependency: the ingest pipeline applies it
  * once per document inside a codegen boundary (array-returning function +
  * `explode`), so at 100 TB it parallelizes per-document with no shuffle.
  */
final class Chunker(
    val chunkSize: Int = 1000,
    val chunkOverlap: Int = 200,
    val separators: List[String] = List("\n\n", "\n", " ", "")) extends Serializable {
  require(chunkSize > 0, "chunkSize must be positive")
  require(chunkOverlap < chunkSize, "overlap must be smaller than chunk size")

  /** Split `text` into chunks. Whitespace-only output pieces are dropped
    * (the caller additionally filters blanks, mirroring the reference's
    * `page_content.strip()` gate at multiple_document_upload.py:127). */
  def split(text: String): Seq[String] =
    if (text == null || text.isEmpty) Seq.empty
    else splitRec(text, separators)

  private def splitRec(text: String, seps: List[String]): Seq[String] = {
    // coarsest separator that actually occurs; "" (char-split) always matches
    val (sep, rest) = seps.indexWhere(s => s.isEmpty || text.contains(s)) match {
      case -1 => ("", Nil)
      case i  => (seps(i), seps.drop(i + 1))
    }
    // split keeping the separator attached to the front of the next piece,
    // so concatenating pieces reconstructs the original text exactly
    val pieces: Seq[String] =
      if (sep.isEmpty) text.map(_.toString)
      else {
        val out = ArrayBuffer.empty[String]
        var idx = text.indexOf(sep)
        out += (if (idx >= 0) text.substring(0, idx) else text)
        while (idx >= 0) {
          val next = text.indexOf(sep, idx + sep.length)
          val end = if (next >= 0) next else text.length
          out += sep + text.substring(idx + sep.length, end)
          idx = next
        }
        out.filter(_.nonEmpty).toSeq
      }

    val finalChunks = ArrayBuffer.empty[String]
    val good = ArrayBuffer.empty[String]
    for (p <- pieces) {
      if (p.length < chunkSize) good += p
      else {
        if (good.nonEmpty) { finalChunks ++= merge(good.toSeq); good.clear() }
        if (rest.isEmpty) finalChunks += p
        else finalChunks ++= splitRec(p, rest)
      }
    }
    if (good.nonEmpty) finalChunks ++= merge(good.toSeq)
    finalChunks.toSeq
  }

  /** Greedy merge of small pieces into ≤chunkSize chunks with trailing
    * overlap: when a chunk closes, pieces are re-used from its tail until
    * the carried length drops to ≤chunkOverlap. */
  private def merge(pieces: Seq[String]): Seq[String] = {
    val docs = ArrayBuffer.empty[String]
    var current = Vector.empty[String]
    var total = 0
    for (p <- pieces) {
      val len = p.length
      if (total + len > chunkSize && current.nonEmpty) {
        emit(current, docs)
        while (total > chunkOverlap || (total + len > chunkSize && total > 0)) {
          total -= current.head.length
          current = current.tail
        }
      }
      current = current :+ p
      total += len
    }
    emit(current, docs)
    docs.toSeq
  }

  private def emit(current: Vector[String], docs: ArrayBuffer[String]): Unit = {
    val doc = current.mkString.trim
    if (doc.nonEmpty) docs += doc
  }
}

object Chunker {
  /** The reference's production configuration (1000 chars, 200 overlap). */
  val reference: Chunker = new Chunker(1000, 200)
}
