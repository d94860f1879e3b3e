package graft.props

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.{ArrayType, FloatType}

import graft.auth.Jwt
import graft.core.{FloatVecCosineSim, FloatVecDot, FloatVecSquaredL2}
import graft.ingest.Chunker

/** Property tests (SURVEY.md §5): chunker invariants, distance-kernel
  * algebra against a straight-line reference fold, and JWT round-trips.
  * Kernel properties evaluate the interpreted `eval` path on literal
  * arrays (the codegen path is pinned separately in VectorOpsSpec/PlanSpec
  * — both must match the same reference fold). */
object ChunkerProps extends Properties("Chunker") {

  private val word = Gen.chooseNum(1, 12).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))
  private val sep = Gen.frequency(8 -> " ", 2 -> "\n", 1 -> "\n\n")
  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 120)
    ws <- Gen.listOfN(n, word)
    ss <- Gen.listOfN(n, sep)
  } yield ws.zip(ss).map { case (w, s) => w + s }.mkString

  private val configGen: Gen[(Int, Int)] = for {
    size <- Gen.chooseNum(10, 200)
    overlap <- Gen.chooseNum(0, size - 1)
  } yield (size, overlap)

  private def isSubsequence(needle: String, hay: String): Boolean = {
    var i = 0; var j = 0
    while (i < needle.length && j < hay.length) {
      if (needle.charAt(i) == hay.charAt(j)) i += 1
      j += 1
    }
    i == needle.length
  }

  property("chunks respect the size bound") = forAll(textGen, configGen) { (t, cfg) =>
    val (size, overlap) = cfg
    new Chunker(size, overlap).split(t).forall(_.length <= size)
  }

  property("every chunk is a contiguous substring of the source") =
    forAll(textGen, configGen) { (t, cfg) =>
      val (size, overlap) = cfg
      new Chunker(size, overlap).split(t).forall(c => t.contains(c))
    }

  property("chunks advance monotonically through the source") =
    forAll(textGen, configGen) { (t, cfg) =>
      val (size, overlap) = cfg
      val chunks = new Chunker(size, overlap).split(t)
      val starts = chunks.foldLeft((List.empty[Int], 0)) { case ((acc, from), c) =>
        val i = t.indexOf(c, from)
        if (i < 0) (acc :+ -1, from) else (acc :+ i, i)
      }._1
      starts.forall(_ >= 0) && starts == starts.sorted
    }

  property("no non-whitespace content is lost (subsequence modulo overlap dup)") =
    forAll(textGen, configGen) { (t, cfg) =>
      val (size, overlap) = cfg
      val chunks = new Chunker(size, overlap).split(t)
      val noWs = t.filterNot(_.isWhitespace)
      isSubsequence(noWs, chunks.mkString.filterNot(_.isWhitespace))
    }

  property("no empty or untrimmed chunks") = forAll(textGen, configGen) { (t, cfg) =>
    val (size, overlap) = cfg
    new Chunker(size, overlap).split(t).forall(c => c.nonEmpty && c.trim == c)
  }
}

object KernelProps extends Properties("VectorKernels") {

  private val vecPair: Gen[(Array[Float], Array[Float])] = for {
    n <- Gen.chooseNum(1, 96)
    a <- Gen.listOfN(n, Gen.chooseNum(-100f, 100f))
    b <- Gen.listOfN(n, Gen.chooseNum(-100f, 100f))
  } yield (a.toArray, b.toArray)

  private def ev(mk: (Expression, Expression) => Expression,
      a: Array[Float], b: Array[Float]): Double =
    mk(Literal.create(a, ArrayType(FloatType, containsNull = false)),
      Literal.create(b, ArrayType(FloatType, containsNull = false)))
      .eval(null).asInstanceOf[Double]

  // the numeric contract: strict left-to-right double fold
  private def refL2(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
      val d = x.toDouble - y.toDouble; acc + d * d
    }
  private def refDot(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }

  property("squaredL2 equals the reference fold bit-for-bit") = forAll(vecPair) {
    case (a, b) =>
      java.lang.Double.doubleToLongBits(ev(FloatVecSquaredL2.apply, a, b)) ==
        java.lang.Double.doubleToLongBits(refL2(a, b))
  }

  property("dot equals the reference fold bit-for-bit") = forAll(vecPair) {
    case (a, b) =>
      java.lang.Double.doubleToLongBits(ev(FloatVecDot.apply, a, b)) ==
        java.lang.Double.doubleToLongBits(refDot(a, b))
  }

  property("d(x,x) = 0 and symmetry is exact") = forAll(vecPair) { case (a, b) =>
    ev(FloatVecSquaredL2.apply, a, a) == 0.0 &&
      ev(FloatVecSquaredL2.apply, a, b) == ev(FloatVecSquaredL2.apply, b, a) &&
      ev(FloatVecDot.apply, a, b) == ev(FloatVecDot.apply, b, a)
  }

  property("cosineSim(x,x) ~ 1 for non-zero x; range [-1,1] with slack") =
    forAll(vecPair) { case (a, b) =>
      val nonZero = a.exists(_ != 0f) && b.exists(_ != 0f)
      !nonZero || {
        val self = ev(FloatVecCosineSim.apply, a, a)
        val cross = ev(FloatVecCosineSim.apply, a, b)
        math.abs(self - 1.0) < 1e-9 && cross >= -1.0 - 1e-9 && cross <= 1.0 + 1e-9
      }
    }
}

object ParserRobustnessProps extends Properties("Parsers") {

  // arbitrary bytes, plus adversarial prefixes that enter each parser's
  // happy path before the structure goes bad
  private val bytesGen: Gen[Array[Byte]] = for {
    n <- Gen.chooseNum(0, 4096)
    body <- Gen.containerOfN[Array, Byte](n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    prefix <- Gen.oneOf(
      Array.emptyByteArray,
      "%PDF-1.4\n".getBytes,
      Array(0x50, 0x4B, 0x03, 0x04).map(_.toByte), // ZIP magic
      Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)) // CFB magic
  } yield prefix ++ body

  private val allParsers = graft.ingest.IngestPipeline.defaultParsers

  property("every format parser is total: Either out, never an exception") =
    forAll(bytesGen) { bytes =>
      Seq("txt", "md", "csv", "html", "docx", "xlsx", "pptx", "doc", "xls", "ppt", "pdf", "eml")
        .forall { ext =>
          allParsers(ext)(bytes) match {
            case Right(docs) => docs != null
            case Left(reason) => reason != null && reason.nonEmpty
          }
        }
    }
}

object JwtProps extends Properties("Jwt") {

  private val emailGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 40)
    s <- Gen.stringOfN(n, Gen.asciiPrintableChar)
  } yield s

  property("issue/verify round-trips any printable-ASCII identity") =
    forAll(emailGen, Gen.chooseNum(0L, 4102444800L)) { (email, now) =>
      Jwt.verify(Jwt.issue(email, "s3cret", now), "s3cret", now + 1) == Right(email)
    }

  property("any tampered payload byte invalidates the token") =
    forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { email =>
      val t = Jwt.issue(email, "s3cret", 1000L)
      val parts = t.split('.')
      val forged = java.util.Base64.getUrlEncoder.withoutPadding().encodeToString(
        s"""{"email":"${email}x","exp":2000}""".getBytes)
      Jwt.verify(s"${parts(0)}.$forged.${parts(2)}", "s3cret", 1001L) == Left(Jwt.Invalid)
    }
}

/** KMV sketch algebra — pure Aggregator-level laws (the Spark wiring and
  * error envelope are pinned in KmvSketchSpec). */
object KmvProps extends Properties("KmvDistinct") {

  import graft.core.KmvDistinct

  private val k = 32
  private val agg = new KmvDistinct(k)
  private val xs = Gen.listOf(Gen.chooseNum(-100000L, 100000L))
  private def sketch(l: List[Long]) = l.foldLeft(agg.zero)(agg.reduce)

  property("exact below k for any input multiset") = forAll(xs) { l =>
    val d = l.distinct.size
    d >= k || agg.finish(sketch(l)) == d.toLong
  }

  property("merge is commutative") = forAll(xs, xs) { (a, b) =>
    agg.merge(sketch(a), sketch(b)) == agg.merge(sketch(b), sketch(a))
  }

  property("merge is associative") = forAll(xs, xs, xs) { (a, b, c) =>
    agg.merge(agg.merge(sketch(a), sketch(b)), sketch(c)) ==
      agg.merge(sketch(a), agg.merge(sketch(b), sketch(c)))
  }

  // the working buffer may carry an unsorted append tail (amortized
  // append-and-compact form); merge/finish restore canonical bottom-k,
  // so the algebra laws quantify over CANONICAL forms
  private def canon(b: Seq[Long]) = agg.merge(b, agg.zero)

  property("merge equals the sketch of the concatenation") = forAll(xs, xs) { (a, b) =>
    agg.merge(sketch(a), sketch(b)) == canon(sketch(a ++ b))
  }

  property("bulk sketchOf equals the per-row fold, canonicalized") = forAll(xs) { l =>
    agg.sketchOf(l) == canon(sketch(l))
  }

  property("canonical form is unsigned-sorted, distinct, capped; raw tail bounded") = forAll(xs) { l =>
    val raw = sketch(l)
    val b = canon(raw)
    raw.size < 2 * k && b.size <= k &&
      b.sliding(2).forall {
        case Seq(x, y) => java.lang.Long.compareUnsigned(x, y) < 0
        case _ => true
      }
  }
}
