package graft.ingest

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

class ChunkerSpec extends AnyFunSuite {

  val small = new Chunker(chunkSize = 50, chunkOverlap = 10)

  test("empty and null input produce no chunks") {
    assert(small.split("") == Seq.empty)
    assert(small.split(null) == Seq.empty)
  }

  test("short text is a single trimmed chunk") {
    assert(small.split("hello world") == Seq("hello world"))
    assert(small.split("  hello world  ") == Seq("hello world"))
  }

  test("whitespace-only text produces no chunks") {
    assert(small.split("   \n\n   ") == Seq.empty)
  }

  test("long single-paragraph text splits on word boundaries with overlap") {
    val words = (1 to 40).map(i => f"w$i%02d")
    val text = words.mkString(" ")
    val chunks = small.split(text)
    assert(chunks.length > 1)
    assert(chunks.forall(_.length <= 50))
    // no word is lost
    words.foreach(w => assert(chunks.exists(_.contains(w)), s"lost $w"))
    // consecutive chunks overlap: trailing words of chunk i reappear in i+1
    chunks.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a.split(" ").takeRight(2).exists(b.contains),
          s"no overlap between [$a] and [$b]")
      case _ =>
    }
  }

  test("paragraph separator is preferred over word splits") {
    val p1 = "alpha beta gamma"
    val p2 = "delta epsilon zeta"
    val text = s"$p1\n\n$p2"
    // both paragraphs fit a chunk: splitter must not cut inside one
    val chunks = new Chunker(20, 5).split(text)
    assert(chunks == Seq(p1, p2))
  }

  test("reference config (1000/200) bounds every chunk at 1000 chars") {
    val text = (1 to 600).map(i => s"word$i").mkString(" ") +
      "\n\n" + (1 to 600).map(i => s"tail$i").mkString(" ")
    val chunks = Chunker.reference.split(text)
    assert(chunks.nonEmpty)
    assert(chunks.forall(c => c.length <= 1000 && c.trim.nonEmpty))
  }

  test("unsplittable run falls back to character-level splitting, still bounded") {
    val text = "x" * 500 // no separators at all
    val chunks = small.split(text)
    assert(chunks.forall(_.length <= 50))
    assert(chunks.map(_.length).sum >= 500 - 50) // covers the text (overlap can exceed)
  }

  test("property: chunks are bounded, trimmed, non-empty for random word text") {
    val rnd = new Random(42)
    for (_ <- 1 to 200) {
      val nWords = rnd.nextInt(120)
      val text = (0 until nWords)
        .map(_ => Random.alphanumeric.take(1 + rnd.nextInt(12)).mkString)
        .mkString(" ")
      val chunks = small.split(text)
      assert(chunks.forall(c => c.length <= 50 && c.trim == c && c.nonEmpty), s"bad chunks for [$text]")
      if (text.trim.nonEmpty) assert(chunks.nonEmpty)
    }
  }

  test("property: splitting is deterministic and loses no word") {
    val rnd = new Random(7)
    for (_ <- 1 to 100) {
      val words = (0 until 1 + rnd.nextInt(80)).map(i => s"tok${rnd.nextInt(1000)}x$i")
      val seps = Seq(" ", "\n", "\n\n")
      val text = words.zipWithIndex
        .map { case (w, i) => w + seps(rnd.nextInt(3)) }.mkString.trim
      val a = small.split(text)
      assert(a == small.split(text))
      words.foreach(w => assert(a.exists(_.contains(w)), s"lost $w in [$text]"))
    }
  }
}
