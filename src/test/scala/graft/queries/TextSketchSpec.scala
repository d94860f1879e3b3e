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

  test("heaps_law: exact local decile replay; exponent in the sublinear band") {
    val sh = graft.scale.ShingleStore.docShingles(spark, sfDir)
      .as[(Long, String)].collect()
    val n = sh.map(_._1).max + 1
    def dec(doc: Long) = (doc * 10 / n + 1).toInt
    val tok = sh.groupBy(p => dec(p._1)).view.mapValues(_.length.toLong).toMap
    val fresh = sh.groupBy(_._2).values.map(v => dec(v.map(_._1).min))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pts = (1 to 10).map { d =>
      val nd = (1 to d).map(i => tok.getOrElse(i, 0L)).sum
      val vd = (1 to d).map(i => fresh.getOrElse(i, 0L)).sum
      (math.round(math.log(nd.toDouble) * 1e6), math.round(math.log(vd.toDouble) * 1e6))
    }
    val np = pts.length.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val num = BigInt(np) * sxy - BigInt(sx) * sy
    val den = BigInt(np) * sxx - BigInt(sx) * sx
    val beta = if (num >= 0) num * 1000000 / den else -((-num) * 1000000 / den)
    val r = TextQueries.heapsLaw(spark, sfDir).collect().head
    assert(r.getLong(0) == np && r.getLong(1) == beta.toLong)
    // sublinear vocabulary growth: 0 < beta < 1 on shingle vocab
    assert(r.getLong(1) > 0L && r.getLong(1) < 1000000L, s"beta=${r.getLong(1)}")
  }

  test("word_pmi: returned rows satisfy the PMI identity; planted collocation tops") {
    val got = TextQueries.wordPmi(spark, sfDir).collect()
    assert(got.length == 15)
    // identity per returned row against locally recomputed doc frequencies
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 1000)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val byDoc = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSet }.toMap
    val nd = docs.length.toLong
    for (r <- got) {
      val (w1, w2) = (r.getString(0), r.getString(1))
      val dfxy = byDoc.values.count(s => s(w1) && s(w2)).toLong
      val df1 = byDoc.values.count(_(w1)).toLong
      val df2 = byDoc.values.count(_(w2)).toLong
      assert(r.getLong(2) == dfxy && r.getLong(3) == df1 && r.getLong(4) == df2)
      assert(r.getLong(5) ==
        math.round(math.log(nd.toDouble * dfxy / (df1.toDouble * df2)) * 1e6))
    }
    // planted: 'alpha beta' co-occur in every doc of a synthetic corpus
    // where each also appears alone sometimes -> top pair by PMI
    val planted = (0L until 40L).map { i =>
      val t = if (i < 20) "alpha beta filler" + i
              else if (i < 30) "alpha lone" + i else "beta solo" + i
      (i, t)
    }.toDF("doc_id", "text")
    val p = TextQueries.wordPmiOf(planted).collect()
    assert(p.head.getString(0) == "alpha" && p.head.getString(1) == "beta")
    // PMI(alpha,beta) = ln(40*20/(30*30)) > 0
    assert(p.head.getLong(5) ==
      math.round(math.log(40.0 * 20 / (30.0 * 30)) * 1e6))
  }

  test("textrank_keywords: exact local replay of both damped integer rounds") {
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 1000)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val sets = docs.map(_._2.split(" ").filter(_.nonEmpty).toSet)
    val vocab = sets.flatten.distinct.sorted
    val wt = (for {
      a <- vocab; b <- vocab if a < b
      c = sets.count(s => s(a) && s(b)) if c > 0
    } yield ((a, b), c.toLong)).toMap
    def neighbors(x: String) = wt.collect {
      case ((a, b), c) if a == x => (b, c)
      case ((a, b), c) if b == x => (a, c)
    }
    val ws = vocab.map(v => v -> neighbors(v).map(_._2).sum).toMap
    var r = vocab.filter(ws(_) > 0).map(_ -> 1000000L).toMap
    for (_ <- 1 to 2) {
      r = r.keys.map { i =>
        val s = neighbors(i).collect {
          case (j, c) if r.contains(j) => c * r(j) / ws(j)
        }.sum
        i -> (150000L + 17L * s / 20L)
      }.toMap
    }
    val expect = r.toSeq.sortBy(t => (-t._2, t._1)).take(10)
    val got = TextQueries.textrankKeywords(spark, sfDir)
      .as[(String, Long)].collect().toSeq
    assert(got == expect)
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

  test("flesch_readability: hand-counted syllables; harder text scores lower") {
    // "table" -> a+e = 2 runs; "key" -> e+y?? 'ey' is ONE run; "a" -> 1;
    // "query" -> ue+y = 2; "stream" -> ea = 1
    val docs = Seq(
      (0L, "a a a a"),                 // 4 words, 4 syllables
      (1L, "table query table query")  // 4 words, 8 syllables
    ).toDF("doc_id", "text")
    val got = TextQueries.fleschReadabilityOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // flesch_e3 = 206835 - 1015*W - (84600*Y) div W
    assert(got.toSeq == Seq(
      (0L, 4L, 4L, 206835L - 1015 * 4 - 84600 * 4 / 4),
      (1L, 4L, 8L, 206835L - 1015 * 4 - 84600 * 8 / 4)))
    // more syllables per word = lower ease, as the formula demands
    assert(got(1)._4 < got(0)._4)
  }

  test("naive_bayes_source: planted class vocabulary classifies test docs exactly") {
    import spark.implicits._
    // three classes with disjoint signature words over shared filler;
    // even ids train, odd ids test — every test doc must come back right
    val docs = (0 until 60).map { i =>
      val cls = s"c${i % 3}"
      val word = Seq("alpha", "beta", "gamma")(i % 3)
      (i.toLong, cls, s"$word $word the quick filler")
    }.toDF("doc_id", "source", "text")
    val got = graft.queries.TextQueries.naiveBayesSourceOf(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 3 && got.map(_._2).sum == 30, got.mkString(","))
    assert(got.forall(g => g._2 == g._3),
      s"misclassified despite disjoint vocab: ${got.mkString(",")}")
    // and a class-free (all identical text) corpus cannot beat the
    // prior tie-break — every prediction collapses to ONE class
    val flat = (0 until 30).map(i =>
      (i.toLong, s"c${i % 3}", "same words every time"))
      .toDF("doc_id", "source", "text")
    val preds = graft.queries.TextQueries.naiveBayesSourceOf(flat).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // only the tie-break winner class scores hits
    assert(preds.map(_._3).count(_ > 0) <= 1, preds.mkString(","))
  }
}
