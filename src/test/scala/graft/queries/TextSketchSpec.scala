package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class TextSketchSpec extends SparkSpec {
  import spark.implicits._

  test("html_strip's closed-form oracle precondition holds on the fixture") {
    // the oracle fingerprints `text || ' & tail'` WITHOUT running the
    // strip chain — valid only while the fixture text contains no markup
    // characters and no whitespace the \s+ normalizer would alter. This
    // enforces that precondition in-repo so a regenerated fixture that
    // breaks it fails HERE with a clear message, not as an opaque driver
    // hash mismatch.
    val bad = graft.Tables.documents(spark, sfDir)
      .filter(col("text").rlike("[<>&]|  |\\t|\\r|\\n|^ | $"))
      .count()
    assert(bad == 0, s"$bad fixture docs violate the html_strip oracle precondition")
  }

  test("freq_spectrum slope matches a local log-log OLS and reads as decay") {
    val spec = graft.scale.ShingleStore.docShingles(spark, sfDir)
      .groupBy(col("sh")).agg(count(lit(1)).as("f"))
      .groupBy(col("f")).agg(count(lit(1)).as("nf"))
      .as[(Long, Long)].collect()
    val pts = spec.map { case (f, nf) =>
      (math.round(math.log(f.toDouble) * 1e6), math.round(math.log(nf.toDouble) * 1e6))
    }
    val n = BigInt(pts.length)
    val sx = BigInt(pts.map(_._1).sum); val sy = BigInt(pts.map(_._2).sum)
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val num = n * sxy - sx * sy; val den = n * sxx - sx * sx
    val slope = if (num >= 0) (num * 1000000 / den).toLong
      else -((-num) * 1000000 / den).toLong
    val Array((gotN, gotSlope)) = TextQueries.freqSpectrum(spark, sfDir)
      .as[(Long, Long)].collect()
    assert(gotN == pts.length && gotSlope == slope)
    assert(gotSlope < -1000000, "a recurring-gram spectrum must decay")
  }

  test("phrase search matches an independent sliding-token scan") {
    // index-join side (the declared plan) vs a plain local scan that
    // slides a 3-token window over each doc — different mechanics, same
    // start-position counting semantics
    val got = TextQueries.phraseSearch(spark, sfDir)
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty, "fixture should contain at least one phrase hit")
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val phrases = got.map(_._1).distinct
    val expect = (for {
      ph <- phrases
      pw = ph.split(" ")
      (id, text) <- docs
      toks = text.split(" ")
      starts = toks.indices.dropRight(pw.length - 1)
        .filter(s => pw.indices.forall(k => toks(s + k) == pw(k)))
      if starts.nonEmpty
    } yield (ph, id) -> (starts.length.toLong, starts.min.toLong)).toMap
    assert(got.length == expect.size)
    for ((ph, id, n, first) <- got)
      assert(expect((ph, id)) == ((n, first)), s"$ph in doc $id")
  }

  test("phrase search counts overlapping/adjacent occurrences by start position") {
    // "a b a b a" holds "a b a" at starts 0 AND 2 (overlapping) — a
    // replace()-based counter would find only one; adjacency "x y z x y z"
    // similarly shares no separator to consume
    val docs = Seq((1L, "a b a b a"), (2L, "x y z x y z"), (3L, "a b c")).toDF("doc_id", "text")
    val r = TextQueries.phraseOccurrences(spark, docs, Seq("a b a", "x y z"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(r == Set(("a b a", 1L, 2L, 0L), ("x y z", 2L, 2L, 0L)))
  }

  test("sketch stats are within tolerance of exact answers") {
    val got = TextQueries.sketchStats(spark, sfDir)
      .select("lang", "approx_vocab", "p50_chars", "p95_chars")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap

    val toks = Tables.documents(spark, sfDir)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"), col("n_chars"))
    val exact = toks.groupBy(col("lang"))
      .agg(countDistinct(col("tok")).as("vocab"),
        expr("percentile(n_chars, 0.5)").as("p50"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap

    assert(got.keySet == exact.keySet)
    for ((lang, (_, approxVocab, p50, p95)) <- got) {
      val (_, vocab, exactP50) = exact(lang)
      val relErr = math.abs(approxVocab - vocab).toDouble / vocab
      assert(relErr < 0.1, s"$lang: approx vocab $approxVocab vs $vocab")
      // percentile_approx returns an observed value near the true quantile
      assert(math.abs(p50 - exactP50) <= exactP50 * 0.25, s"$lang: p50 $p50 vs $exactP50")
      assert(p95 >= p50)
    }
  }
}
