package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators over the `documents` table — the training-data
  * pipeline extensions mandated by the north star (SURVEY.md §2.3 X4):
  * token counting, per-language corpus stats, quality scoring, document
  * fingerprinting. All arithmetic is integer (counts) or a single final
  * double division, so the DuckDB oracle matches exactly.
  *
  * Scale notes: every query here is a single scan + map-side work; the only
  * shuffles are tiny groupBys on low-cardinality keys (lang). Token
  * operations stay inside Catalyst higher-order functions — no UDFs — so
  * they whole-stage-codegen and scale linearly with input bytes.
  */
object TextQueries {

  private def words(c: org.apache.spark.sql.Column) = split(c, " ")

  /** Whitespace token counting + distinct-token (vocabulary) counting. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(words(col("text"))).as("n_tokens"),
        size(array_distinct(words(col("text")))).as("n_distinct"),
        length(col("text")).as("n_chars_calc"))
      .orderBy(col("doc_id"))

  /** Corpus stats by language: doc count, char-length min/max/mean, distinct
    * sources. */
  def langStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy(col("lang"))

  /** Per-document quality signals: stopword ratio, mean token length, vowel
    * density — the length/punct/stopword heuristics of corpus filtering,
    * emitted as exact integers plus e4-scaled ratios. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val ws = words(col("text"))
    val nTokens = size(ws)
    val nStop = size(filter(ws, w => w === "the" || w === "a"))
    val sumTokLen = aggregate(transform(ws, w => length(w)), lit(0), (acc, x) => acc + x)
    val nVowels = length(col("text")) - length(regexp_replace(col("text"), "[aeiou]", ""))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        nTokens.as("n_tokens"),
        nStop.as("n_stop"),
        round(nStop.cast("double") * 10000 / nTokens).cast("long").as("stop_ratio_e4"),
        round(sumTokLen.cast("double") * 10000 / nTokens).cast("long").as("avg_tok_len_e4"),
        nVowels.as("n_vowels"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprint: SHA-256 over case/whitespace-normalized text (the
    * content-hash dedup key of the reference, T4 —
    * /root/reference/helper/multiple_document_upload.py:15-18 — applied to
    * normalized text instead of raw file bytes). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        substring(sha2(regexp_replace(lower(col("text")), "\\s+", " "), 256), 1, 16).as("fp"))
      .orderBy(col("doc_id"))

  /** Unicode canonicalization before fingerprinting
    * ([[graft.core.NfcNormalize]], the codegen'd NFC expression): a
    * corpus carrying composed (U+00E9) and decomposed (U+0065 U+0301)
    * spellings of the same text holds byte-distinct duplicates every
    * digest-based dedup pass misses — the fixture is ASCII, so the
    * confusable pair is planted deterministically (every doc_id%7==3
    * document gains one composed and one decomposed variant row) and
    * the row counts the fold: per language, distinct raw digests vs
    * distinct NFC digests — the NFC column must merge exactly the
    * planted pairs or the hash breaks. Map-side expression work inside
    * whole-stage codegen; both distinct-counts partial-aggregate. */
  def unicodeFold(spark: SparkSession, dir: String): DataFrame = {
    graft.core.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    val base = docs.select(col("lang"), col("text").as("t"))
    val planted = docs.filter(col("doc_id") % 7 === 3)
    val dec = planted.select(col("lang"),
      concat(lit("e\u0301 "), col("text")).as("t")) // decomposed: e + combining acute
    val comp = planted.select(col("lang"),
      concat(lit("\u00e9 "), col("text")).as("t")) // composed e-acute
    base.unionByName(dec).unionByName(comp)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(md5(col("t").cast("binary"))).as("n_raw"),
        countDistinct(md5(expr("CAST(nfc_normalize(t) AS BINARY)"))).as("n_nfc"))
      .orderBy(col("lang"))
  }

  /** Sketch-based corpus profiling — the 100 TB form of X4's stats:
    * approx_count_distinct is a HyperLogLog++ (fixed-size sketch, one pass,
    * mergeable across partitions) and percentile_approx a KLL-style
    * quantile sketch. Approximate ⇒ no SQL oracle (driver rows-only);
    * TextSketchSpec pins them within tolerance of exact answers, and
    * [[sketchStatsPrecision]] is the hash-checkable companion that runs
    * the same profile through the repo's own sketches at their lossless
    * parameterizations. */
  def sketchStats(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"), col("n_chars"))
    toks.groupBy(col("lang"))
      .agg(
        approx_count_distinct(col("tok"), 0.02).as("approx_vocab"),
        percentile_approx(col("n_chars"), lit(0.5), lit(1000)).as("p50_chars"),
        percentile_approx(col("n_chars"), lit(0.95), lit(1000)).as("p95_chars"),
        count(lit(1)).as("n_tokens"))
      .orderBy(col("lang"))
  }

  /** The exact-regime companion to [[sketchStats]] — the same per-lang
    * corpus profile re-expressed over the REPO'S OWN mergeable sketches
    * at their lossless parameterizations, so the row is hash-checkable
    * instead of tolerance-spec'd: vocabulary through the KMV bottom-k
    * sketch (k=1024 ≥ every fixture vocabulary ⇒ `finish` returns the
    * exact distinct count — graft.core.KmvDistinct's below-k regime) over
    * xxhash64'd tokens, and per-document length quantiles through the
    * KLL buffer (k=4096 ≥ docs-per-lang at every fixture SF ⇒ the buffer
    * never compacts and `finish` is the exact quantile_cont
    * interpolation). A fixture that outgrows either parameterization
    * surfaces as a driver-gate hash mismatch, not silent drift. At
    * 100 TB the same one-pass partial-aggregated plan runs with k ≪ n;
    * KmvSketchSpec/QuantileSketchSpec pin that regime's error
    * envelopes. */
  def sketchStatsPrecision(spark: SparkSession, dir: String): DataFrame = {
    val kmv = udaf(new graft.core.KmvDistinct(1024),
      org.apache.spark.sql.Encoders.scalaLong)
    val kll = udaf(new graft.core.KllQuantile(4096, Seq(0.5, 0.95)),
      org.apache.spark.sql.Encoders.scalaDouble)
    val docs = Tables.documents(spark, dir)
    val vocab = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("lang"))
      .agg(kmv(xxhash64(col("tok"))).as("vocab"), count(lit(1)).as("n_tokens"))
    val lens = docs.groupBy(col("lang"))
      .agg(kll(col("n_chars").cast("double")).as("ps"), count(lit(1)).as("n_docs"))
    vocab.join(lens, "lang")
      .select(col("lang"), col("vocab"),
        round(element_at(col("ps"), 1) * 10).cast("long").as("p50_chars_e1"),
        round(element_at(col("ps"), 2) * 10).cast("long").as("p95_chars_e1"),
        col("n_tokens"), col("n_docs"))
      .orderBy(col("lang"))
  }

  /** Marker words per language for the lang-id heuristic (shared by the
    * Spark query and, verbatim, the DuckDB oracle). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "y", "es", "una"),
    "fr" -> Seq("le", "les", "et", "est", "une"))

  /** Language identification by stopword-marker profile + CJK character
    * ratio — the classic cheap n-gram/marker heuristic for corpus routing.
    * Pure integer scoring with a fixed tie-break order, so the DuckDB
    * oracle reproduces it exactly. (The fixture corpus is English word
    * salad under every `lang` label, so predictions are 'en'/'zh' there;
    * LangIdSpec exercises real sentences per language.) */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val ws = split(lower(col("text")), " ")
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(ws, w => markers.map(m => w === m).reduce(_ || _)))
    }
    val cjk = length(col("text")) - length(regexp_replace(col("text"), "[一-鿿]", ""))
    // argmax with fixed preference order en > de > es > fr; CJK presence wins
    val predicted = {
      val Seq(en, de, es, fr) = scores.map(_._2)
      when(cjk > 0, "zh")
        .when(de > en && de >= es && de >= fr, "de")
        .when(es > en && es > de && es >= fr, "es")
        .when(fr > en && fr > de && fr > es, "fr")
        .otherwise("en")
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        scores(0)._2.as("s_en"), scores(1)._2.as("s_de"),
        scores(2)._2.as("s_es"), scores(3)._2.as("s_fr"),
        cjk.as("n_cjk"), predicted.as("predicted"))
      .orderBy(col("doc_id"))
  }

  /** Regex (BPE-ish) tokenization: letter runs, digit runs, and single
    * punctuation marks each count as a token — the pre-tokenizer shape of
    * byte-pair encoders, vs the whitespace count in [[tokenCount]]. */
  def tokenRegex(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
          .as("n_bpe_tokens"),
        size(split(col("text"), " ")).as("n_ws_tokens"))
      .orderBy(col("doc_id"))

  /** Polynomial rolling-hash fingerprint (base 31 mod 1e9+7) over the
    * character stream — the order-sensitive cousin of the SHA fingerprint
    * (content hashing where streaming/incremental computation matters).
    * Strict left-to-right integer fold, so the oracle matches exactly. */
  def rollingFp(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"),
        aggregate(
          transform(split(col("text"), ""), c => ascii(c).cast("long")),
          lit(0L),
          (acc, x) => (acc * 31 + x) % 1000000007L).as("rfp"))
      .orderBy(col("doc_id"))

  /** Per-source distribution drift: KL(source ‖ corpus) over unigram
    * word distributions — the monitoring signal that flags a crawl
    * source whose content shifted (spam flood, template change, language
    * flip) before it pollutes the mix. Determinism follows the DSIR
    * recipe: each word's probability ratio is an exact rational in one
    * fixed double op chain, ln is e6-quantized PER (source, word), the
    * per-source sum is then INTEGER Σ c·lr_e6 with the single division
    * by the source token count at the boundary. Plan: one explode into
    * (source, word) counts, word-marginal re-aggregation of that frame,
    * broadcast of the vocab-sized corpus table, per-source rollup —
    * never more than one pass over the token stream. */
  def sourceKl(spark: SparkSession, dir: String): DataFrame = {
    val sw = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      // persist, consciously — shared by three readers inside one
      // returned plan; released by the harness clearCache() between
      // queries (see dsirWeights for the localCheckpoint trade-off)
      .persist()
    val corpus = sw.groupBy(col("w")).agg(sum(col("c")).as("cw"))
    val totals = sw.groupBy(col("source")).agg(sum(col("c")).as("ns"))
    val grand = corpus.agg(sum(col("cw")).as("n"), count(lit(1)).as("v"))
    // Laplace-smoothed p_s(w) = (c+1)/(ns+v), p(w) = (cw+1)/(n+v);
    // ratio evaluated exactly as in the oracle, ln e6-fixed per term
    val lr = round(log(
      ((col("c") + 1).cast("double") * (col("n") + col("v")).cast("double")) /
        ((col("cw") + 1).cast("double") * (col("ns") + col("v")).cast("double"))) *
      1000000.0).cast("long")
    sw.join(broadcast(corpus), "w")
      .join(broadcast(totals), "source")
      .crossJoin(broadcast(grand))
      .withColumn("t", col("c") * lr)
      .groupBy(col("source"))
      .agg(max(col("ns")).as("n_tokens"), sum(col("t")).as("s"))
      .withColumn("kl_e6",
        round(col("s").cast("double") / col("n_tokens").cast("double"))
          .cast("long"))
      .select(col("source"), col("n_tokens"), col("kl_e6"))
      .orderBy(col("source"))
  }

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, the MOSS
    * algorithm): per position take the MINIMUM k-gram hash over a window
    * of w=4 consecutive word-3-gram hashes; the distinct selected hashes
    * are the document's fingerprint set, guaranteeing any shared run of
    * ≥ w+2 words yields a shared fingerprint while storing a ~1/w
    * fraction of the hashes — the local fingerprinting layer under
    * substring-level dedup. The hash is the md5 hex prefix (lexicographic
    * min — a total order both engines share bit for bit). Plan: position
    * explode (map-side), ONE window partitioned by doc_id (partition
    * count grows with the corpus, never an enum), distinct + rollup. */
  def winnowFp(spark: SparkSession, dir: String): DataFrame = {
    // materialize the split ONCE per row before the gram lambda: an
    // element_at(split(...)) inside transform() re-tokenizes the document
    // for every gram element (O(words²) per doc — measured 5.8 s → 0.5 s
    // at sf0.1 for the gram stage)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
    val grams = docs
      .select(col("doc_id"), (size(col("ws")) - 2).cast("long").as("n_grams"),
        posexplode(transform(
          sequence(lit(0), size(col("ws")) - 3),
          i => substring(md5(concat_ws(" ",
            element_at(col("ws"), i + 1), element_at(col("ws"), i + 2),
            element_at(col("ws"), i + 3))), 1, 16))).as(Seq("pos", "h")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos")).rowsBetween(0, 3)
    // two-level distinct: (doc, wmin) first, then counts — every agg
    // buffer is a long, so both levels stay HashAggregate (a direct
    // countDistinct/min over the string hashes planned as a 4-deep
    // SortAggregate chain, 4+ s at sf0.1)
    grams
      .withColumn("wmin", min(col("h")).over(w))
      .filter(col("pos") <= col("n_grams") - 4) // full windows only
      .groupBy(col("doc_id"), col("wmin"))
      .agg(max(col("n_grams")).as("ng"))
      .groupBy(col("doc_id"))
      .agg(max(col("ng")).as("n_grams"), count(lit(1)).as("n_fp"))
      .orderBy(col("doc_id"))
  }

  /** BM25 top-10 for a 3-term query — the lexical half of hybrid
    * retrieval (rrf_fusion's keyword ranker upgraded to the standard
    * ranking function). Okapi parameters k1=1.2, b=0.75; the idf is the
    * RATIONAL (N-df+0.5)/(df+0.5)+1 — the ln() of textbook BM25 is
    * omitted (monotone transform of a positive argument ⇒ identical
    * per-term ranking) so the score's IEEE op chain is bit-identical
    * across engines; per-term contributions are e4-rounded BEFORE the
    * per-doc sum, so the sum is integer arithmetic — order-free under any
    * partitioning.
    *
    * Scale shape: docs NOT containing any query term are dropped by
    * arrays_overlap before the explode, so the only shuffle (per-doc
    * term counts) carries query-term rows only; df and the corpus stats
    * are broadcast; the final top-10 is TakeOrderedAndProject. */
  def bm25Topk(spark: SparkSession, dir: String): DataFrame = {
    val terms = Seq("join", "scan", "merge")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), words(col("text")).as("toks"))
      .withColumn("len", size(col("toks")))
    val stats = docs.agg(
      count(lit(1)).as("n_docs"), sum(col("len")).cast("long").as("total_len"))
    val tf = docs
      .filter(arrays_overlap(col("toks"), lit(terms.toArray)))
      .select(col("doc_id"), col("len"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("len"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    tf
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0))
      .withColumn("contrib",
        col("idf") * (col("tf").cast("double") * lit(2.2)) /
          (col("tf").cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) *
            (col("len").cast("double") /
              (col("total_len").cast("double") / col("n_docs").cast("double"))))))
      .withColumn("contrib_e4", round(col("contrib") * 10000).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib_e4")).as("score_e4"), count(lit(1)).as("n_terms"))
      .orderBy(col("score_e4").desc, col("doc_id").asc)
      .limit(10)
  }

  /** Heavy hitters via the Space-Saving UDAF ([[graft.core.SpaceSaving]]):
    * bounded m-entry summaries merged through partial aggregation — at
    * most m pairs per partition cross the shuffle, vs an exact groupBy
    * shuffling every distinct term. Declared at m=64 ≥ the fixture
    * vocabulary (31 distinct terms at every SF), where no eviction can
    * occur and the summary is provably exact — DuckDB recomputes it as a
    * plain GROUP BY (the same full-recall-parameterization pattern as
    * minhash_precision). SpaceSavingSpec pins the small-m approximation
    * contract the 100 TB configuration relies on. */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val terms = Tables.documents(spark, dir)
      .select(explode(words(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .as[String]
    terms.select(new graft.core.SpaceSaving(64).toColumn).toDF("hh")
      .select(explode(col("hh")).as("h"))
      .select(col("h.term").as("term"), col("h.count").as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
  }

  /** The corpus quality GATE: per-document keep/reject verdict with the
    * first failing rule as the reason — the composition step a
    * pre-training pipeline actually runs over the quality signals
    * (Gopher-style): minimum length, duplicate-word fraction,
    * single-word dominance. Every signal is a ratio of integer counts
    * (engine-identical e4), the verdict a deterministic CASE cascade,
    * so the whole filter is oracle-checkable; downstream keeps
    * `verdict = 'ok'` rows. One word-count shuffle + per-doc rollup,
    * map-only after that — the same scale shape as repetition_stats. */
  def corpusFilter(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val wc = docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("n"))
    val sig = wc.groupBy(col("doc_id"))
      .agg(sum(col("n")).cast("long").as("n_words"),
        count(lit(1)).as("n_distinct"),
        max(col("n")).cast("long").as("top_n"))
    // LEFT join from the corpus: a zero-token document has no wc rows,
    // and an inner aggregation would silently PASS it through the gate
    // by omission — the most degenerate doc must still get its verdict
    docs.select(col("doc_id")).join(sig, Seq("doc_id"), "left")
      .withColumn("n_words", coalesce(col("n_words"), lit(0L)))
      .withColumn("dup_e4",
        when(col("n_words") === 0, lit(0L))
          .otherwise(round((col("n_words") - col("n_distinct")).cast("double") /
            col("n_words") * 10000).cast("long")))
      .withColumn("top_e4",
        when(col("n_words") === 0, lit(0L))
          .otherwise(round(col("top_n").cast("double") / col("n_words") * 10000)
            .cast("long")))
      .select(col("doc_id"), col("n_words"), col("dup_e4"), col("top_e4"),
        when(col("n_words") < 20, "too_short")
          .when(col("dup_e4") > 4000, "repetitive")
          .when(col("top_e4") > 2000, "degenerate")
          .otherwise("ok").as("verdict"))
      .orderBy(col("doc_id"))
  }

  /** Per-language top-10 frequent terms through the SAME Space-Saving
    * summary, now as a GROUPED typed UDAF — one bounded m-entry state
    * per language crosses the shuffle (the per-group sketch shape a
    * 100 TB vocabulary pass needs; an exact groupBy would shuffle every
    * distinct (lang, term)). m = 4096 ≥ any fixture language's
    * vocabulary, so the summary is exact and the row oracle-checks
    * against plain counts; the top-10 trim is WindowGroupLimit. */
  def heavyHittersByLang(spark: SparkSession, dir: String): DataFrame = {
    val ss = org.apache.spark.sql.functions.udaf(
      new graft.core.SpaceSaving(4096), org.apache.spark.sql.Encoders.STRING)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("cnt").desc, col("term"))
    Tables.documents(spark, dir)
      .select(col("lang"), explode(words(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("lang"))
      .agg(ss(col("term")).as("hh"))
      .select(col("lang"), explode(col("hh")).as("h"))
      .select(col("lang"), col("h.term").as("term"), col("h.count").as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .orderBy(col("lang"), col("rn"))
  }

  /** HTML strip round-trip: wrap each document in deterministic markup
    * (tags + an entity), strip tags, decode entities, normalize
    * whitespace — the CommonCrawl-shaped cleanup step of a web-text
    * pipeline. The oracle does NOT re-run the chain: it fingerprints the
    * closed-form expected output (`text & tail`) straight from the source
    * column, so a cleanup bug can't cancel out by corrupting both sides
    * identically. (Valid because the fixture text is markup-free and
    * single-spaced — driver-verified 0 rows containing <, >, & or double
    * spaces.) Map-only: regex chains inside whole-stage codegen, no
    * shuffle before the final ordering. */
  def htmlStrip(spark: SparkSession, dir: String): DataFrame = {
    val html = concat(lit("<html><body><p class=\"doc\">"), col("text"),
      lit("</p> &amp; <br/>tail</body></html>"))
    val stripped = regexp_replace(html, "<[^>]+>", " ")
    val decoded = regexp_replace(
      regexp_replace(regexp_replace(stripped, "&amp;", "&"), "&lt;", "<"), "&gt;", ">")
    val norm = trim(regexp_replace(decoded, "\\s+", " "))
    Tables.documents(spark, dir)
      .select(col("doc_id"), length(norm).as("n_clean"),
        substring(md5(norm.cast("binary")), 1, 16).as("fp"))
      .orderBy(col("doc_id"))
  }

  /** URL parsing + per-host rollup: synthesize a deterministic URL per
    * document, extract host/path with `parse_url` (codegen'd), aggregate
    * per host — the domain-level quality/volume triage of a web corpus. */
  def domainStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("url", concat(lit("https://www."), col("source"),
        lit(".example.com/docs/"), col("doc_id"), lit("?ref=ingest")))
      .select(expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"), col("doc_id"), col("n_chars"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        min(col("path")).as("first_path"))
      .orderBy(col("host"))

  /** Top word bigrams over the corpus — the n-gram LM count table's first
    * rows: zip each token array with its tail, explode, count, top-20 via
    * TakeOrderedAndProject with a total-order tie-break. */
  def topBigrams(spark: SparkSession, dir: String): DataFrame = {
    // materialize the split ONCE in a prior projection (the winnowFp
    // pattern above): `words(text)` referenced from three expressions of
    // one select re-tokenizes the document per reference when
    // subexpression elimination doesn't collapse them
    val docs = Tables.documents(spark, dir)
      .select(words(col("text")).as("ws"))
      .select(col("ws"),
        // equal-length slices (all n-1 leading tokens × all n-1 trailing) —
        // no magic cap, no null padding, single-token docs yield no bigrams
        greatest(size(col("ws")) - 1, lit(0)).as("len"))
    docs
      .select(explode(zip_with(
        slice(col("ws"), lit(1), col("len")), slice(col("ws"), lit(2), col("len")),
        (a, b) => concat_ws(" ", a, b))).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(20)
  }

  /** CCNet-style n-gram language-model quality score per document: train
    * a bigram model ON THE CORPUS ITSELF (conditional frequencies
    * P(w2|w1) = c(w1 w2) / c(w1·), where c(w1·) counts w1 as a bigram
    * LEFT context so the conditionals sum to 1 per context), then score
    * each document by the per-bigram conditional probabilities — the
    * in-domain-fluency filter the CCNet/RedPajama pipelines run with a
    * KenLM model; here the model is the corpus's own MLE bigram table,
    * which keeps the whole operator inside the engine and the oracle.
    * Each conditional is e4-fixed BEFORE the per-doc sum, so the document
    * aggregate is an integer sum — engine-identical, like the Gopher
    * signals below. Plan shape: one (w1,w2) count and one (w1) count over
    * the corpus, one explode-join, one per-doc rollup; the unigram
    * context table is vocab-bounded and broadcast, the bigram table is
    * not (it joins unhinted — broadcast at fixture scale via AQE, a
    * key-partitioned shuffle join at corpus scale); the corpus is never
    * joined to itself. */
  def lmDocScore(spark: SparkSession, dir: String): DataFrame =
    lmScores(spark, dir).orderBy(col("doc_id"))

  /** Unordered per-doc LM fluency frame shared by [[lmDocScore]] and
    * [[perplexityBuckets]]. */
  private def lmScores(spark: SparkSession, dir: String): DataFrame = {
    // split materialized once (topBigrams/winnowFp pattern)
    val bi = Tables.documents(spark, dir)
      .select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"), col("ws"),
        greatest(size(col("ws")) - 1, lit(0)).as("len"))
      .select(col("doc_id"), explode(zip_with(
        slice(col("ws"), lit(1), col("len")), slice(col("ws"), lit(2), col("len")),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    // the (w1,w2) table is NOT vocab-bounded (it grows with distinct
    // bigrams, not Heaps-law vocab), so no broadcast hint: at fixture
    // scale AQE broadcasts it anyway, at corpus scale it degrades to a
    // key-partitioned shuffle join instead of an OOM. ctxCounts IS
    // vocab-bounded and keeps the hint.
    val biCounts = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val ctxCounts = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    bi.join(biCounts, Seq("w1", "w2"))
      .join(broadcast(ctxCounts), Seq("w1"))
      .withColumn("p_e4",
        round(lit(10000.0) * col("c12") / col("c1")).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_e4")).as("score_sum_e4"))
      .withColumn("avg_e4",
        floor(col("score_sum_e4") / col("n_bigrams")).cast("long"))
  }

  /** CCNet head/middle/tail bucketing: per-language terciles of the
    * bigram-LM fluency score — the split CCNet/RedPajama cut their crawl
    * into before sampling mostly from the fluent "head". Terciles are
    * boundaries-then-assign (X38's NtileBoundaries: per-lang boundary
    * keys from one partial-aggregated sketch pass, broadcast back,
    * buckets assigned map-side) — NEVER `ntile() OVER (PARTITION BY
    * lang)`, whose per-language reducer sort grows linearly with the
    * corpus. Exact ntile semantics below the 8192-docs-per-lang sketch
    * cap (the oracle regime; KLL envelope beyond). The sort key packs
    * (avg_e4, doc_id) into one long — avg_e4 ≤ 1e4 and doc_id < 2^36
    * keep it inside the aggregator's 2^53 exactness bound. Tercile 3
    * (most fluent) is the head. */
  def perplexityBuckets(spark: SparkSession, dir: String): DataFrame = {
    val scored = lmScores(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("lang")),
        "doc_id")
      .withColumn("okey", col("avg_e4") * lit(1L << 36) + col("doc_id"))
    val bounds = udaf(new graft.core.NtileBoundaries(3, 8192),
      org.apache.spark.sql.Encoders.scalaLong)
    val bs = scored.groupBy(col("lang")).agg(bounds(col("okey")).as("bs"))
    scored.join(broadcast(bs), "lang")
      .withColumn("tercile",
        size(filter(col("bs"), b => b < col("okey"))) + lit(1))
      .groupBy(col("lang"), col("tercile"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bigrams")).cast("long").as("total_bigrams"),
        min(col("avg_e4")).as("min_avg_e4"),
        max(col("avg_e4")).as("max_avg_e4"))
      .withColumn("bucket",
        when(col("tercile") === 3, "head")
          .when(col("tercile") === 2, "middle").otherwise("tail"))
      .select(col("lang"), col("tercile"), col("bucket"), col("n_docs"),
        col("total_bigrams"), col("min_avg_e4"), col("max_avg_e4"))
      .orderBy(col("lang"), col("tercile"))
  }

  /** Character-level Shannon entropy per document — the gibberish/binary-
    * junk quality signal (low entropy = degenerate repetition, near-max
    * entropy for the alphabet = random noise; natural text sits in a
    * band). Exact across engines without trusting transcendental
    * aggregation: ln(k) is e6-quantized PER INTEGER COUNT, so
    * H·N = N·L(N) − Σ c·L(c) is an order-free integer expression and the
    * single double division happens once at the boundary. Plan: char
    * explode → (doc, char) count (alphabet-bounded per doc) → per-doc
    * integer rollup; map-side partials all the way. */
  def charEntropy(spark: SparkSession, dir: String): DataFrame = {
    def lnE6(k: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      round(log(k.cast("double")) * 1000000.0).cast("long")
    val cc = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
    cc.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("distinct_chars"),
        sum(col("c")).cast("long").as("n_chars_counted"),
        sum(col("c") * lnE6(col("c"))).cast("long").as("s_cln"))
      .withColumn("entropy_e6",
        round((col("n_chars_counted").cast("double") *
          lnE6(col("n_chars_counted")).cast("double") -
          col("s_cln").cast("double")) /
          col("n_chars_counted").cast("double")).cast("long"))
      .select(col("doc_id"), col("distinct_chars"), col("n_chars_counted"),
        col("entropy_e6"))
      .orderBy(col("doc_id"))
  }

  /** Gopher/MassiveText-style repetition quality signals per document:
    * duplicate-word fraction (1 - distinct/total), top-word dominance
    * (most frequent word's share), and duplicate-3-gram fraction —
    * the standard pre-training filters for boilerplate and degenerate
    * repetition. Every metric is a ratio of integer counts, so the e4
    * roundings are engine-identical; the only shuffles are the
    * (doc, word) count and the per-doc rollup (word-count partials
    * combine map-side). Total shingles is closed-form (n_words - 2) —
    * no second explode for the denominator. */
  def repetitionStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 300)
    val ws = split(col("text"), " ")
    val words = docs.select(col("doc_id"), explode(ws).as("w"))
      .filter(col("w") =!= "")
    val wc = words.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("n"))
    val wordAgg = wc.groupBy(col("doc_id"))
      .agg(sum(col("n")).cast("long").as("n_words"),
        count(lit(1)).as("n_distinct_words"),
        max(col("n")).cast("long").as("top_word_n"))
    // split materialized once per row (see winnowFp: the inlined form
    // re-tokenizes per gram element)
    val sh = docs
      .select(col("doc_id"), ws.as("__ws"))
      .filter(size(col("__ws")) >= 3)
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(0), size(col("__ws")) - 3),
          i => concat_ws(" ", element_at(col("__ws"), i + 1),
            element_at(col("__ws"), i + 2), element_at(col("__ws"), i + 3))))
          .as("sh"))
    val shAgg = sh.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        count_distinct(col("sh")).as("n_distinct_shingles"))
    def fracE4(num: org.apache.spark.sql.Column,
        den: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(den === 0, lit(0L))
        .otherwise(round(num.cast("double") / den.cast("double") * 10000).cast("long"))
    wordAgg.join(shAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("n_distinct_words"), col("top_word_n"),
        fracE4(col("n_words") - col("n_distinct_words"), col("n_words")).as("dup_word_e4"),
        fracE4(col("top_word_n"), col("n_words")).as("top_word_e4"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        fracE4(coalesce(col("n_shingles"), lit(0L)) - coalesce(col("n_distinct_shingles"), lit(0L)),
          coalesce(col("n_shingles"), lit(0L))).as("dup_shingle_e4"))
      .orderBy(col("doc_id"))
  }

  /** Vocabulary growth curve (Heaps'-law diagnostic): distinct words a
    * crawl has introduced by each corpus decile — the marginal-vocabulary
    * signal that says when a source stops teaching the tokenizer new
    * words (flat tail ⇒ diminishing lexical returns; a late spike ⇒ a
    * distribution shift worth triaging with X83's KL drift). A word's
    * introduction point is min(doc_id); deciles cut at fd·10 div N
    * (N = max id + 1, one broadcast scalar row — same formula in the
    * oracle). The cumulative stack is the filter_funnel pattern: ten
    * conditional counts in ONE aggregate row, exploded with prefix sums
    * as plain column arithmetic — no unpartitioned window anywhere.
    * Shuffle is the (word → min id) aggregation: vocabulary-sized,
    * Heaps-bounded at any corpus size. */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nRow = docs.agg((max(col("doc_id")) + 1).as("n"))
    val fw = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(min(col("doc_id")).as("fd"))
    val b = fw.crossJoin(broadcast(nRow))
      .select((expr("fd * 10 div n") + 1).cast("int").as("d"))
    val one = b.agg(
      count(when(col("d") === 1, lit(1))).as("c1"),
      (2 to 10).map(d => count(when(col("d") === d, lit(1))).as(s"c$d")): _*)
    one.select(explode(array((1 to 10).map(d =>
        struct(lit(d).as("decile"),
          col(s"c$d").as("new_words"),
          (1 to d).map(i => col(s"c$i")).reduce(_ + _).as("vocab_size"))): _*)).as("r"))
      .select(col("r.decile"), col("r.new_words"), col("r.vocab_size"))
      .orderBy(col("decile"))
  }

  /** Inverted-index build: per-term posting lists over the stored
    * 3-gram shingle frame — term → (document frequency, ascending doc-id
    * posting list), restricted to the 4 ≤ df ≤ 7 mid-band (high-df terms
    * go to a stop list, df-1 terms carry no join value; both caps are
    * how production index builds bound posting length). One
    * vocabulary-keyed groupBy IS the distributed index build: postings
    * combine map-side, each term's list is bounded by the df cap, and at
    * 100 TB the output partitions by term hash — the layout term-at-a-
    * time retrieval (our bm25_topk) wants. The posting list is exported
    * as a comma-joined ascending string so the row is hash-exact. */
  def postingsList(spark: SparkSession, dir: String): DataFrame = {
    graft.scale.ShingleStore.docShingles(spark, dir)
      .groupBy(col("sh"))
      .agg(count(lit(1)).as("df"),
        concat_ws(",",
          transform(sort_array(collect_list(col("doc_id"))),
            d => d.cast("string"))).as("postings"))
      .filter(col("df").between(4, 7))
      .orderBy(col("sh"))
  }

  /** Encoding-hygiene audit — the screen that runs BEFORE tokenization
    * on any web-scale corpus: (1) mojibake (UTF-8 bytes re-decoded as
    * Latin-1 — the `Ã©` signature class), (2) U+FFFD replacement chars
    * (lossy transcoding already happened), (3) C0 control chars
    * (binary bleed). Defects are INJECTED on disjoint deterministic
    * doc slices (the piiScan planted-defect regime — the fixture text
    * is clean ASCII, so real positives AND negatives need planting);
    * each class reports docs flagged and the residual after the repair
    * chain (mojibake back-mapped to its UTF-8 original, U+FFFD and
    * controls stripped) — a nonzero residual means the repair missed
    * its own detector's pattern. ONE aggregate pass computes all six
    * counters (a scan per class is the 100 TB mistake). */
  def encodingAudit(spark: SparkSession, dir: String): DataFrame = {
    val injected = Tables.documents(spark, dir)
      .select(concat(col("text"),
        when(col("doc_id") % 11 === 3, lit(" cafÃ© rÃ©sumÃ©"))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 5, lit(" data�loss")).otherwise(lit("")),
        when(col("doc_id") % 11 === 7, lit(" bell\u0007ring\u001B")).otherwise(lit("")))
        .as("text"))
    val pats = Seq(
      ("mojibake", "Ã[\\x{A0}-\\x{BF}]"),
      ("replacement", "�"),
      ("control", "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"))
    val repaired = regexp_replace(regexp_replace(regexp_replace(col("text"),
      "Ã©", "é"),
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", ""),
      "�", "")
    val counts = pats.flatMap { case (name, p) =>
      Seq(sum(when(col("text").rlike(p), 1L).otherwise(0L)).as(s"d_$name"),
        sum(when(repaired.rlike(p), 1L).otherwise(0L)).as(s"r_$name"))
    }
    injected.agg(counts.head, counts.tail: _*)
      .selectExpr("stack(3, " +
        "'control', d_control, r_control, " +
        "'mojibake', d_mojibake, r_mojibake, " +
        "'replacement', d_replacement, r_replacement) " +
        "AS (issue_class, n_docs, n_after_repair)")
      .orderBy(col("issue_class"))
  }

  /** Frequency-spectrum (Zipf-regime) slope — the lexical-statistics
    * audit of a corpus: the number of grams occurring in exactly f
    * documents follows a power law on natural text (nf ∝ f^s, s ≈ −2
    * for Zipfian sources), and the LOG-LOG SLOPE of that spectrum is the
    * single number dedup/quality pipelines watch for template explosions
    * (slope flattens) or over-deduplication (tail vanishes). The
    * spectrum aggregates to a FREQUENCY-BOUNDED frame (≤ max-df rows —
    * 7 on the fixture, a few hundred at any corpus size), so no ranking
    * window is ever needed (a rank-based Zipf fit would want an
    * unpartitioned row_number over the whole vocabulary — the shape the
    * PlanSpec guard forbids); the OLS slope then runs the five-sums
    * identity with each ln fixed to e6 integers per point (the
    * source_kl determinism regime), products in DECIMAL(38,0)/HUGEINT,
    * sign-factored truncating division. Fixture reads −2.17 — a
    * surprisingly Zipf-like decay (9428, 4542, 1660, 464, 122, 25, 4). */
  def freqSpectrum(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val pts = graft.scale.ShingleStore.docShingles(spark, dir)
      .groupBy(col("sh")).agg(count(lit(1)).as("f"))
      .groupBy(col("f")).agg(count(lit(1)).as("nf"))
      .select(
        round(log(col("f").cast("double")) * 1e6).cast("long").as("x"),
        round(log(col("nf").cast("double")) * 1e6).cast("long").as("y"))
    pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("n"),
        expr(s"CAST(n AS $d38) * sxy - CAST(sx AS $d38) * sy").as("num"),
        expr(s"CAST(n AS $d38) * sxx - CAST(sx AS $d38) * sx").as("den"))
      .select(col("n").as("n_points"),
        when(col("num") >= 0, expr("CAST((num * 1000000) div den AS BIGINT)"))
          .otherwise(-expr("CAST(((-num) * 1000000) div den AS BIGINT)"))
          .as("slope_e6"))
  }

  /** Heaps'-law growth exponent (X234) — the companion fit to
    * [[freqSpectrum]]'s Zipf slope: vocabulary grows as V ∝ N^β
    * (β ≈ 0.5 on natural text), and the fitted β over the corpus-decile
    * growth curve is the number that predicts how much NEW vocabulary
    * the next 10× of crawl will introduce (tokenizer sizing, OOV-rate
    * forecasting). Where [[vocabGrowth]] reports the raw curve over the
    * 31-word WORD vocab (which saturates in decile 1), the fit runs on
    * the 3-GRAM shingle vocabulary (16k types — real Heaps behavior).
    * Ten (ln N_d, ln V_d) points, each ln quantized to e6 per point
    * (the freq_spectrum regime), exact integer five-sums OLS,
    * sign-factored truncating export. Cumulative stacks are the
    * filter_funnel conditional-count trick — one aggregate row, no
    * window; shuffle is vocabulary-bounded. */
  def heapsLaw(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val sh = graft.scale.ShingleStore.docShingles(spark, dir)
    val nRow = sh.agg((max(col("doc_id")) + 1).as("n"))
    val decd = sh.crossJoin(broadcast(nRow))
      .select((expr("doc_id * 10 div n") + 1).cast("int").as("d"), col("sh"))
    val tok = decd.agg(
      count(when(col("d") === 1, lit(1))).as("t1"),
      (2 to 10).map(d => count(when(col("d") === d, lit(1))).as(s"t$d")): _*)
    val fresh = decd.groupBy(col("sh")).agg(min(col("d")).as("fd"))
      .agg(count(when(col("fd") === 1, lit(1))).as("v1"),
        (2 to 10).map(d => count(when(col("fd") === d, lit(1))).as(s"v$d")): _*)
    val pts = tok.crossJoin(fresh)
      .select(explode(array((1 to 10).map(d =>
        struct(col(s"t$d").as("td"),
          (1 to d).map(i => col(s"t$i")).reduce(_ + _).as("nd"),
          (1 to d).map(i => col(s"v$i")).reduce(_ + _).as("vd"))): _*)).as("r"))
      // a decile with ZERO shingles (doc_id gap / block of <3-word docs)
      // would duplicate the previous cumulative point; the oracle's cum
      // CTE has no row for it, so drop it here too (ADVICE r11)
      .filter(col("r.td") > 0)
      .select(
        round(log(col("r.nd").cast("double")) * 1e6).cast("long").as("x"),
        round(log(col("r.vd").cast("double")) * 1e6).cast("long").as("y"))
    pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("n"),
        expr(s"CAST(n AS $d38) * sxy - CAST(sx AS $d38) * sy").as("num"),
        expr(s"CAST(n AS $d38) * sxx - CAST(sx AS $d38) * sx").as("den"))
      .select(col("n").as("n_points"),
        when(col("num") >= 0, expr("CAST((num * 1000000) div den AS BIGINT)"))
          .otherwise(-expr("CAST(((-num) * 1000000) div den AS BIGINT)"))
          .as("beta_e6"))
  }

  /** Word-pair PMI screen (X235) — pointwise mutual information of
    * doc-level word co-occurrence: which word pairs appear together FAR
    * more than independence predicts (collocation mining / multi-word-
    * expression discovery; Church & Hanks 1990). Pairs generate through
    * the per-document self-join of the DISTINCT (doc, word) incidence —
    * bounded by the 31-word vocabulary (≤ C(31,2) cells however large
    * the corpus; a real corpus caps the vocabulary by document frequency
    * first, exactly like postings_list's stop list). PMI = ln of an
    * EXACT integer ratio (n·c_xy / (c_x·c_y), products ≤ 10¹⁰ — exact
    * doubles), quantized once per pair at e6 (the mutual_info recipe).
    * The fixture's iid 31-word generator puts PMI ≈ 0 everywhere — the
    * honest no-collocation readout (the spec plants a real collocation
    * and watches it surface). Top-15 by (pmi desc, pair). */
  /** Zipf rank-frequency fit (X297 — the log-log slope of the word
    * frequency distribution, heaps_law's sibling: natural text slopes
    * ≈ −1, so a corpus slice that doesn't is machine-generated,
    * boilerplate-heavy, or mis-parsed — a corpus-quality screen before
    * training). Top-500 (freq desc, word) ranks; each point's ln(rank)
    * / ln(freq) is ONE e6 integer (the ln-points recipe — never a
    * float sum across rows), the OLS slope/intercept fold
    * DECIMAL(38,0)-exact sums, and the two closed forms are
    * fixed-order double chains. The word histogram is the only
    * data-sized pass; the regression frame is 500 rows at any corpus
    * size. */
  def zipfSlope(spark: SparkSession, dir: String): DataFrame = {
    val freq = Tables.documents(spark, dir)
      .select(explode(words(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w")).limit(500)
    val d38 = "decimal(38,0)"
    val pts = freq
      .withColumn("r", row_number().over(org.apache.spark.sql.expressions
        .Window.orderBy(col("f").desc, col("w"))))
      .select(
        expr("CAST(round(ln(CAST(r AS DOUBLE)) * 1000000) AS BIGINT)").as("x"),
        expr("CAST(round(ln(CAST(f AS DOUBLE)) * 1000000) AS BIGINT)").as("y"))
    pts.agg(count(lit(1)).as("n"),
        sum(expr(s"CAST(x AS $d38)")).as("sx"),
        sum(expr(s"CAST(y AS $d38)")).as("sy"),
        sum(expr(s"CAST(x AS $d38) * CAST(y AS $d38)")).as("sxy"),
        sum(expr(s"CAST(x AS $d38) * CAST(x AS $d38)")).as("sxx"))
      .select(col("n"),
        expr(
          """CAST(round(
            |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            |  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            |  * 1000000) AS BIGINT)""".stripMargin).as("slope_e6"),
        expr(
          """CAST(round(
            |  (CAST(sy AS DOUBLE)
            |   - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            |     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            |     * CAST(sx AS DOUBLE))
            |  / CAST(n AS DOUBLE) / 1000000.0 * 10000) AS BIGINT)""".stripMargin)
          .as("intercept_ln_e4"))
  }

  /** Yule's K lexical-richness constant + hapax profile (X303 — Yule
    * 1944; the vocabulary-concentration measure that, unlike raw
    * type-token ratio, is length-invariant — the repetitiveness screen
    * for generated/boilerplate text next to [[zipfSlope]]'s slope):
    * K = 10⁴·(S₂ − S₁)/S₁² with S₁ = token count, S₂ = Σ f² over the
    * word-frequency histogram — ALL exact integers, exported as the
    * exact e2 quotient 10⁶(S₂−S₁) div S₁² (positive operands, both
    * engines floor). Hapax count and the e6 TTR ride along. One
    * data-sized histogram pass; everything after is a single-row
    * aggregate. */
  def yuleK(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    Tables.documents(spark, dir)
      .select(explode(words(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .agg(sum(col("f")).as("s1"),
        count(lit(1)).as("vocab"),
        sum(expr(s"CAST(f AS $d38) * CAST(f AS $d38)")).as("s2"),
        sum(when(col("f") === 1L, 1L).otherwise(0L)).as("hapax"))
      .select(col("s1").as("n_tokens"), col("vocab"), col("hapax"),
        expr("CAST((vocab * 1000000) div s1 AS BIGINT)").as("ttr_e6"),
        expr(s"CAST((CAST(s2 - s1 AS $d38) * 1000000) div " +
          s"(CAST(s1 AS $d38) * CAST(s1 AS $d38)) AS BIGINT)").as("yule_k_e2"))
  }

  def wordPmi(spark: SparkSession, dir: String): DataFrame =
    wordPmiOf(Tables.documents(spark, dir)
      .filter(col("doc_id") < 1000))

  def wordPmiOf(docs: DataFrame): DataFrame = {
    val w = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
    val dfw = w.groupBy(col("w")).agg(count(lit(1)).as("dfx"))
    val nDocs = docs.agg(countDistinct(col("doc_id")).as("nd"))
    val pairs = w.as("a").join(w.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.w") < col("b.w"))
      .select(col("a.w").as("w1"), col("b.w").as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("dfxy"))
      .filter(col("dfxy") >= 5)
    pairs
      .join(broadcast(dfw.select(col("w").as("w1"), col("dfx").as("df1"))), "w1")
      .join(broadcast(dfw.select(col("w").as("w2"), col("dfx").as("df2"))), "w2")
      .crossJoin(broadcast(nDocs))
      .select(col("w1"), col("w2"), col("dfxy"), col("df1"), col("df2"),
        expr("""CAST(round(ln(CAST(nd AS DOUBLE) * CAST(dfxy AS DOUBLE)
          |/ (CAST(df1 AS DOUBLE) * CAST(df2 AS DOUBLE))) * 1000000)
          |AS BIGINT)""".stripMargin.replace("\n", " ")).as("pmi_e6"))
      .orderBy(col("pmi_e6").desc, col("w1"), col("w2"))
      .limit(15)
  }

  /** TextRank keyword extraction (X244 — Mihalcea & Tarau 2004): ranked
    * keywords as the stationary importance of the word CO-OCCURRENCE
    * graph — the unsupervised keyword extractor that beats raw frequency
    * because a word matters when IMPORTANT words co-occur with it (the
    * PageRank insight applied to text; composes [[wordPmi]]'s pair frame
    * with [[graft.queries.RelationalQueries.hitsScores]]'s unrolled
    * integer power iteration). Edges: doc-level co-occurrence counts
    * over the vocabulary-bounded pair grid (df-capped at web scale, the
    * postings stop-list pattern); two damped iterations with d = 17/20
    * as INTEGER floor arithmetic — contribution_j = (w_ji·r_j) div W_j
    * per edge, r'_i = 150000 + (17·ΣS) div 20 — both engines replay
    * digit-exactly (the pagerank unrolled-oracle regime). The ≤31-node
    * word graph is built from ONE corpus scan and localCheckpointed;
    * iterations are metadata-cheap joins. Top-10 by (rank desc, word). */
  def textrankKeywords(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 1000)
    val w = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
    val pairs = w.as("a").join(w.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.w") < col("b.w"))
      .groupBy(col("a.w").as("w1"), col("b.w").as("w2"))
      .agg(count(lit(1)).as("wt"))
    val edges = pairs.select(col("w1").as("src"), col("w2").as("dst"), col("wt"))
      .unionByName(pairs.select(col("w2").as("src"), col("w1").as("dst"),
        col("wt")))
      .localCheckpoint(false) // lazy: the final action materializes (r17)
    val strength = edges.groupBy(col("src")).agg(sum(col("wt")).as("ws"))
    var r = strength.select(col("src").as("node"), lit(1000000L).as("r"))
    for (_ <- 1 to 2) {
      val contrib = edges
        .join(strength, "src")
        .join(r.select(col("node").as("src"), col("r")), "src")
        .select(col("dst").as("node"), expr("(wt * r) div ws").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      r = contrib.select(col("node"),
        expr("150000 + (17 * s) div 20").as("r")).localCheckpoint(false)
    }
    r.orderBy(col("r").desc, col("node")).limit(10)
      .select(col("node").as("keyword"), col("r").as("rank_e6"))
  }

  /** The fixed phrase workload for [[phraseSearch]] — all 3-word phrases
    * (df 6–7 at sf0.01, probed), so one HAVING bound covers the set. */
  private val PhrasePatterns = Seq(
    "big data merge", "column merge fast", "part filter scan",
    "row column sort", "stream table hash")

  /** Positional phrase search over a positional inverted index — the
    * retrieval primitive the doc-level postings ([[postingsList]]) cannot
    * answer: WHICH documents contain an exact multi-word phrase, where,
    * and how often (Chroma-style `where_document={"$contains": ...}`
    * lifted to token-exact phrase semantics). Classic term-at-a-time
    * positional intersection (Manning/IR ch. 2) as ONE declarative plan:
    * the index is `posexplode` over the token array (map-side, no
    * shuffle), the phrase table `(phrase, k, term)` broadcasts, and an
    * occurrence at start position `s` exists iff all `len` phrase terms
    * match at `s + k` — i.e. the candidate groupBy (phrase, doc, start)
    * counts matched offsets; `(doc,pos)` rows are unique so COUNT(*)
    * equals the distinct-offset count with no DISTINCT expand.
    *
    * Scale shape: candidate fanout is Σ_w tf(w) over PHRASE terms only
    * (the broadcast join prunes every other token before the shuffle);
    * the two aggregations partial-combine on (phrase, doc_id[, start]).
    * Overlap-safe by construction (counts start positions, not
    * non-overlapping string replaces — TextSketchSpec pins an adjacent
    * self-repeat). At 100 TB this is the standard phrase-query plan over
    * a term-hash-partitioned index; intersection order by ascending tf —
    * the classic optimization — falls out of AQE's smallest-side-first
    * join reordering rather than hand scheduling. */
  def phraseSearch(spark: SparkSession, dir: String): DataFrame =
    phraseOccurrences(spark, Tables.documents(spark, dir), PhrasePatterns)

  /** The reusable core of [[phraseSearch]] over any `(doc_id, text)`
    * frame — all phrases must share one word count (`len`). */
  def phraseOccurrences(spark: SparkSession, docs: DataFrame,
      phrases: Seq[String]): DataFrame = {
    import spark.implicits._
    val lens = phrases.map(_.split(" ").length).distinct
    require(lens.size == 1, s"phrases must share one length, got $lens")
    val idx = docs
      .select(col("doc_id"), posexplode(words(col("text"))).as(Seq("pos", "term")))
    val ph = phrases.toDF("phrase")
      .select(col("phrase"), posexplode(split(col("phrase"), " ")).as(Seq("k", "term")))
    idx.join(broadcast(ph), "term")
      .select(col("phrase"), col("doc_id"), (col("pos") - col("k")).as("st"))
      .groupBy(col("phrase"), col("doc_id"), col("st"))
      .agg(count(lit(1)).as("nk"))
      .filter(col("nk") === lens.head)
      .groupBy(col("phrase"), col("doc_id"))
      .agg(count(lit(1)).as("n_occ"), min(col("st")).cast("long").as("first_pos"))
      .orderBy(col("phrase"), col("doc_id"))
  }

  /** Collocation mining by LIFT: phrase (3-gram) pairs that recur
    * together across documents more than independence predicts —
    * lift(a,b) = N·df(a,b)/(df(a)·df(b)), the integer-exact core of PMI
    * (PMI's log is monotone in lift, so ranking and thresholds agree;
    * no transcendental crosses the gate). Surviving pairs here are
    * exactly the co-traveling boilerplate/template spans — the signal
    * behind phrase-table induction and templated-content detection.
    *
    * Shape: the stored shingle frame is pre-filtered to RECURRING grams
    * (df ≥ 3 — a df-1/2 gram cannot reach df_ab ≥ 3, so the filter is
    * lossless for the declared output and it is what bounds the doc_id-
    * blocked self-join: cost Σ m_d² over per-doc RECURRING-gram counts,
    * not raw text length); pair support df_ab ≥ 3 and lift ≥ 2 are
    * integer compares, lift exported e4 via bigint floor division
    * (identical `div`/`//` on positive operands). */
  def collocationLift(spark: SparkSession, dir: String): DataFrame = {
    val sh = graft.scale.ShingleStore.docShingles(spark, dir)
    val dfreq = graft.scale.ShingleStore.gramStats(spark, dir)
      .select(col("sh"), col("df"))
    val mid = sh.join(dfreq.filter(col("df") >= 3), "sh")
    val n = Tables.documents(spark, dir)
      .select(countDistinct(col("doc_id")).as("n_docs"))
    mid.as("a")
      .join(mid.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.sh") < col("b.sh"))
      .groupBy(col("a.sh").as("sa"), col("b.sh").as("sb"))
      .agg(count(lit(1)).as("df_ab"),
        first(col("a.df")).as("df_a"), first(col("b.df")).as("df_b"))
      .filter(col("df_ab") >= 3)
      .crossJoin(broadcast(n))
      .filter(col("df_ab") * col("n_docs") >= col("df_a") * col("df_b") * 2)
      .select(col("sa"), col("sb"), col("df_ab"),
        expr("(df_ab * n_docs * 10000) div (df_a * df_b)").as("lift_e4"))
      .orderBy(col("sa"), col("sb"))
  }

  /** Cross-source vocabulary overlap by SKETCH ALGEBRA: one pass builds
    * a KMV bottom-k sketch per source ([[graft.core.KmvSketchBuffer]]);
    * every pairwise union then comes from merging two k-sized summaries
    * and every intersection from inclusion-exclusion — C(s,2) = 190
    * pair answers from s = 20 one-pass summaries, where the direct form
    * costs a corpus pass per pair. The content-provenance triage
    * ("which crawl sources duplicate each other's material?") that
    * prioritizes the pairwise dedup passes.
    *
    * At this parameterization the sketches stay below k (lossless
    * regime ⇒ the algebra is EXACT and the row hash-checks against
    * plain COUNT DISTINCT); at corpus scale the same one-pass/merge
    * shape runs with k ≪ n under KMV's estimation envelope. The
    * driver-side pairwise merge is bounded by |sources| (20 sketches ×
    * k longs), never by data size. */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 4096
    val sh = graft.scale.ShingleStore.docShingles(spark, dir)
      .filter(col("doc_id") < 200)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("source")), "doc_id")
      .select(col("source"), xxhash64(col("sh")).as("tok"))
    val sketches = sh.groupBy(col("source"))
      .agg(udaf(new graft.core.KmvSketchBuffer(k),
        implicitly[org.apache.spark.sql.Encoder[Long]])(col("tok")).as("sk"))
      .as[(String, Seq[Long])].collect().sortBy(_._1)
    val est = new graft.core.KmvDistinct(k)
    val out = for {
      i <- sketches.indices
      j <- (i + 1) until sketches.length
    } yield {
      val (sa, ska) = sketches(i)
      val (sb, skb) = sketches(j)
      val na = est.finish(ska)
      val nb = est.finish(skb)
      val un = est.finish(est.merge(ska, skb))
      (sa, sb, na, nb, un, na + nb - un)
    }
    out.toDF("src_a", "src_b", "n_a", "n_b", "n_union", "n_inter")
      .orderBy(col("src_a"), col("src_b"))
  }

  /** PII detection + redaction audit — the scrub pass every shared
    * training corpus needs before release: regex detectors for emails,
    * IPv4 addresses, and phone-shaped strings run over the corpus, then
    * the SAME detectors run again over the `regexp_replace`-redacted
    * text, and the declared row carries both counts per class — redaction
    * is proven by `n_after_redaction = 0` under the oracle, not claimed.
    * The fixture vocabulary contains no PII (31 plain words), so
    * deterministic markers are INJECTED first (one class per doc_id
    * residue — the same planted-defect regime as dq_audit/entity_match);
    * the detectors then have real positives AND real negatives (7/10 of
    * docs carry nothing). One aggregate pass computes all six counters
    * (detect × redact × 3 classes), stacked to rows — scanning the
    * corpus once per class would be the 100 TB mistake. */
  def piiScan(spark: SparkSession, dir: String): DataFrame = {
    val injected = Tables.documents(spark, dir)
      .select(concat(col("text"),
        when(col("doc_id") % 10 === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 10 === 1,
          concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit(".7")))
          .otherwise(lit("")),
        when(col("doc_id") % 10 === 2,
          concat(lit(" call 555-01"), lpad((col("doc_id") % 100).cast("string"), 2, "0")))
          .otherwise(lit(""))).as("text"))
    val pats = Seq(
      ("email", "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"),
      ("ipv4", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"),
      ("phone", "555-[0-9]{4}"))
    // redact ALL classes, then re-detect per class: a residual hit in any
    // class fails its row
    val redacted = pats.foldLeft(col("text")) { case (c, (_, p)) =>
      regexp_replace(c, p, "[PII]")
    }
    val counts = pats.flatMap { case (name, p) =>
      Seq(sum(when(col("text").rlike(p), 1L).otherwise(0L)).as(s"d_$name"),
        sum(when(redacted.rlike(p), 1L).otherwise(0L)).as(s"r_$name"))
    }
    injected.agg(counts.head, counts.tail: _*)
      .selectExpr("stack(3, " +
        "'email', d_email, r_email, " +
        "'ipv4', d_ipv4, r_ipv4, " +
        "'phone', d_phone, r_phone) AS (pii_class, n_docs, n_after_redaction)")
      .orderBy(col("pii_class"))
  }

  /** Flesch reading-ease scoring (X263) — the classic readability gate
    * (Flesch 1948; Kincaid's military-manual recalibration made it the
    * standard document-quality filter, and LLM data pipelines use it to
    * band corpora by difficulty): 206.835 − 1.015·(W/S) − 84.6·(Y/W),
    * with syllables Y approximated by VOWEL-RUN counting (≥1 per word —
    * the standard heuristic; both engines run the same `[aeiouy]+`
    * regex, a class primitive with identical semantics). The fixture's
    * documents carry no sentence punctuation, so S = 1 and the whole
    * score is one exact integer chain at e3 (the only division
    * truncates toward zero on both engines). First 50 docs, one row
    * each — per-doc scoring is embarrassingly parallel at any corpus
    * size. */
  def fleschReadability(spark: SparkSession, dir: String): DataFrame =
    fleschReadabilityOf(Tables.documents(spark, dir)
      .filter(col("doc_id") < 50))

  def fleschReadabilityOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(col("doc_id"), greatest(lit(1),
        size(expr("regexp_extract_all(w, '[aeiouy]+', 0)"))).cast("long")
        .as("syl"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("syl")).as("n_syllables"))
      .select(col("doc_id"), col("n_words"), col("n_syllables"),
        (lit(206835L) - lit(1015L) * col("n_words") -
          expr("(84600 * n_syllables) div n_words")).as("flesch_e3"))
      .orderBy(col("doc_id"))

  /** Gunning fog index (X316 — Gunning 1952, the complex-word
    * readability gate that bands corpora by the fraction of 3+-syllable
    * words, the standard sibling of [[fleschReadability]] with a
    * DIFFERENT signal: fog punishes long words specifically, Flesch
    * punishes syllable density overall): 0.4·(W/S + 100·C/W) with S = 1
    * (fixture documents carry no sentence punctuation — the flesch pin)
    * and C = words with ≥ 3 vowel runs. Everything is one exact integer
    * chain at e3: fog_e3 = 400·W + (40000·C) div W (positive operands —
    * Spark `div` == DuckDB `//`). */
  def fogIndex(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).filter(col("doc_id") < 50)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(col("doc_id"),
        (size(expr("regexp_extract_all(w, '[aeiouy]+', 0)")) >= 3)
          .cast("long").as("cx"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("cx")).as("n_complex"))
      .select(col("doc_id"), col("n_words"), col("n_complex"),
        (lit(400L) * col("n_words") +
          expr("(40000 * n_complex) div n_words")).as("fog_e3"))
      .orderBy(col("doc_id"))

  /** Lexical-richness profile (X317 — the vocabulary-structure trio a
    * corpus-quality pipeline reads alongside Yule's K: type-token ratio
    * (generation diversity), Sichel's S = V₂/V (dis-legomena share —
    * stable in N where raw TTR is not, Sichel 1975), and Honoré's
    * R = 100·ln N / (1 − V₁/V) (hapax-weighted richness, Honoré 1979)):
    * ONE token pass → word histogram (Heaps-bounded), then frequency-
    * spectrum counts V, V₁, V₂. TTR/Sichel export as exact integer
    * quotients; Honoré is one fixed-order double chain over exact
    * counts (ln of an integer — correctly rounded on both engines). */
  def lexicalRichness(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables.documents(spark, dir).filter(col("doc_id") < 500)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    hist.agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("v"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("v1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("v2"))
      .select(col("n_tokens"), col("v"), col("v1"), col("v2"),
        expr("(v * 1000000) div n_tokens").as("ttr_e6"),
        expr("(v2 * 1000000) div v").as("sichel_e6"),
        expr(
          """CAST(round(
            |  CAST(100 AS DOUBLE) * ln(CAST(n_tokens AS DOUBLE))
            |  / (CAST(1 AS DOUBLE) - CAST(v1 AS DOUBLE) / CAST(v AS DOUBLE))
            |  * 1000) AS BIGINT)""".stripMargin).as("honore_e3"))
  }

  /** RAKE keyword extraction (X326 — Rose et al. 2010's Rapid Automatic
    * Keyword Extraction, the unsupervised phrase-keyword baseline
    * TextRank is usually benchmarked against: candidate phrases are the
    * maximal stopword-free word runs, a word's score is its phrase-
    * cooccurrence degree over its frequency, a phrase's score the sum
    * of its words'): stopwords are the fixture's five most frequent
    * words (a real RAKE ships a language stoplist; the mechanics are
    * identical). Phrase segmentation is a running stopword count per
    * document (a doc_id-partitioned window — high-cardinality key, no
    * global sort); degree/freq are one bounded join + rollup; scores
    * export as ORDER-FREE integer sums of per-word e6 points, so the
    * top-10 (score desc, phrase) is deterministic on both engines. */
  def rakeKeywords(spark: SparkSession, dir: String): DataFrame = {
    val stop = Seq("join", "hash", "row", "batch", "scan")
    val w = Tables.documents(spark, dir).filter(col("doc_id") < 200)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "w")
      .filter(col("w") =!= "")
      .withColumn("st", col("w").isInCollection(stop).cast("long"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val pw = w.withColumn("pid", sum(col("st")).over(win))
      .filter(col("st") === 0L)
      .select(col("doc_id"), col("pid"), col("i"), col("w"))
      .localCheckpoint(false) // three consumers below (plen, degree, phrases)
    val plen = pw.groupBy(col("doc_id"), col("pid")).agg(count(lit(1)).as("plen"))
    val ws = pw.join(plen, Seq("doc_id", "pid"))
      .groupBy(col("w")).agg(sum(col("plen")).as("deg"), count(lit(1)).as("freq"))
      .select(col("w"), expr("(deg * 1000000) div freq").as("ws"))
    val ph = pw.join(ws, "w")
      .groupBy(col("doc_id"), col("pid"))
      .agg(expr("array_join(transform(array_sort(collect_list(struct(i, w))), x -> x.w), ' ')")
          .as("phrase"),
        sum(col("ws")).as("score"), count(lit(1)).as("nw"))
    ph.groupBy(col("phrase"))
      .agg(max(col("nw")).as("n_words"), count(lit(1)).as("n_occurrences"),
        max(col("score")).as("score_e6"))
      .orderBy(col("score_e6").desc, col("phrase"))
      .limit(10)
  }

  /** Multinomial naive Bayes text classifier (X282 — the
    * bag-of-words/Laplace form, McCallum-Nigam 1998): train on even
    * doc_ids, predict each odd doc's SOURCE from its tokens, report
    * per-source test counts and hits — the cheap strong baseline every
    * text-labeling pipeline should beat before paying for a trained
    * model (complements quality_classifier's logistic stumps and
    * lm_doc_score's fluency LM). All likelihoods are e6-FLOORED log
    * integers (`round(ln(p)·10⁶)` per distinct (token, class) — one IEEE
    * call each, mirrored by the oracle), so per-doc scores are
    * ORDER-FREE integer sums and the argmax is exact on both engines
    * (ties break on class name). Scale shape: the only frames that
    * grow with data are token rollups (partial-agg shuffles); the
    * class-cross multiplier is bounded by LABEL CARDINALITY, the class
    * stats ride broadcasts, and the per-doc argmax is a doc-partitioned
    * rank window. */
  def naiveBayesSource(spark: SparkSession, dir: String): DataFrame =
    naiveBayesSourceOf(Tables.documents(spark, dir))

  def naiveBayesSourceOf(docs0: DataFrame): DataFrame = {
    val docs = docs0.select(col("doc_id"), col("source"), col("text"))
    val toks = docs
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val train = toks.filter(col("doc_id") % 2 === 0)
    val test = toks.filter(col("doc_id") % 2 =!= 0)
    val vocabN = train.select(col("w")).distinct().agg(count(lit(1)).as("v"))
    val classTotals = train.groupBy(col("source").as("cls"))
      .agg(count(lit(1)).as("tot"))
    val counts = train.groupBy(col("source").as("cls"), col("w"))
      .agg(count(lit(1)).as("cnt"))
    val trainDocs = docs.filter(col("doc_id") % 2 === 0)
    val prior = trainDocs.groupBy(col("source").as("cls"))
      .agg(count(lit(1)).as("dc"))
      .crossJoin(broadcast(trainDocs.agg(count(lit(1)).as("dt"))))
      .select(col("cls"),
        expr("CAST(round(ln(CAST(dc AS DOUBLE) / CAST(dt AS DOUBLE)) " +
          "* 1000000) AS BIGINT)").as("prior_e6"))
    val docToks = test.groupBy(col("doc_id"), col("source"), col("w"))
      .agg(count(lit(1)).as("m"))
    val classes = classTotals.crossJoin(broadcast(vocabN))
    // unseen (token, class) pairs take the pure-smoothing likelihood via
    // the LEFT join's coalesce — skipping them would silently favor
    // classes with small vocabularies
    val contrib = docToks
      .crossJoin(broadcast(classes))
      .join(counts, Seq("cls", "w"), "left")
      .select(col("doc_id"), col("source"), col("cls"), col("m"),
        expr("CAST(round(ln((CAST(coalesce(cnt, 0) AS DOUBLE) + 1.0) " +
          "/ (CAST(tot AS DOUBLE) + CAST(v AS DOUBLE))) * 1000000) " +
          "AS BIGINT)").as("l_e6"))
    val scores = contrib
      .groupBy(col("doc_id"), col("source"), col("cls"))
      .agg(sum(col("m") * col("l_e6")).as("tok_e6"))
      .join(broadcast(prior), "cls")
      .select(col("doc_id"), col("source"), col("cls"),
        (col("tok_e6") + col("prior_e6")).as("score_e6"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score_e6").desc, col("cls").asc)
    scores.withColumn("rn", row_number().over(byDoc))
      .filter(col("rn") === 1)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("cls") === col("source"), 1L).otherwise(0L)).as("n_correct"))
      .orderBy(col("source"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "naive_bayes_source" -> (naiveBayesSource _),
    "flesch_readability" -> (fleschReadability _),
    "fog_index" -> (fogIndex _),
    "rake_keywords" -> (rakeKeywords _),
    "lexical_richness" -> (lexicalRichness _),
    "pii_scan" -> (piiScan _),
    "source_overlap" -> (sourceOverlap _),
    "collocation_lift" -> (collocationLift _),
    "postings_list" -> (postingsList _),
    "phrase_search" -> (phraseSearch _),
    "freq_spectrum" -> (freqSpectrum _),
    "heaps_law" -> (heapsLaw _),
    "word_pmi" -> (wordPmi _),
    "textrank_keywords" -> (textrankKeywords _),
    "encoding_audit" -> (encodingAudit _),
    "vocab_growth" -> (vocabGrowth _),
    "repetition_stats" -> (repetitionStats _),
    "html_strip" -> (htmlStrip _),
    "domain_stats" -> (domainStats _),
    "top_bigrams" -> (topBigrams _),
    "zipf_slope" -> (zipfSlope _),
    "yule_k" -> (yuleK _),
    "lm_doc_score" -> (lmDocScore _),
    "perplexity_buckets" -> (perplexityBuckets _),
    "char_entropy" -> (charEntropy _),
    "winnow_fp" -> (winnowFp _),
    "source_kl" -> (sourceKl _),
    "bm25_topk" -> (bm25Topk _),
    "heavy_hitters" -> (heavyHitters _),
    "heavy_hitters_by_lang" -> (heavyHittersByLang _),
    "corpus_filter" -> (corpusFilter _),
    "rolling_fp" -> (rollingFp _),
    "sketch_stats" -> (sketchStats _),
    "sketch_stats_precision" -> (sketchStatsPrecision _),
    "lang_id" -> (langId _),
    "token_regex" -> (tokenRegex _),
    "token_count" -> (tokenCount _),
    "lang_stats" -> (langStats _),
    "quality_score" -> (qualityScore _),
    "unicode_fold" -> (unicodeFold _),
    "fingerprint" -> (fingerprint _)
  )

  private def markerSql(markers: Seq[String]): String =
    s"CAST(len(list_filter(ws, w -> w IN (${markers.map(m => s"'$m'").mkString(", ")}))) AS INT)"

  val oracles: Map[String, String] = Map(
    // exact S1/S2 integers; K and TTR as exact positive quotients
    "yule_k" ->
      """WITH f AS (
        |  SELECT w, COUNT(*) AS f
        |  FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w <> '' GROUP BY w),
        |a AS (
        |  SELECT CAST(SUM(f) AS HUGEINT) AS s1,
        |    CAST(COUNT(*) AS BIGINT) AS vocab,
        |    SUM(CAST(f AS HUGEINT) * f) AS s2,
        |    CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
        |  FROM f)
        |SELECT CAST(s1 AS BIGINT) AS n_tokens, vocab, hapax,
        |  CAST((vocab * 1000000) // s1 AS BIGINT) AS ttr_e6,
        |  CAST(((s2 - s1) * 1000000) // (s1 * s1) AS BIGINT) AS yule_k_e2
        |FROM a""".stripMargin,
    // same top-500 rank points, e6 ln integers, exact OLS sums, ordered
    // double chains
    "zipf_slope" ->
      """WITH freq AS (
        |  SELECT w, COUNT(*) AS f
        |  FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w <> '' GROUP BY w
        |  ORDER BY f DESC, w LIMIT 500),
        |pts AS (
        |  SELECT CAST(round(ln(CAST(row_number() OVER (ORDER BY f DESC, w)
        |           AS DOUBLE)) * 1000000) AS BIGINT) AS x,
        |    CAST(round(ln(CAST(f AS DOUBLE)) * 1000000) AS BIGINT) AS y
        |  FROM freq),
        |a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM pts)
        |SELECT n,
        |  CAST(round(
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    * 1000000) AS BIGINT) AS slope_e6,
        |  CAST(round(
        |    (CAST(sy AS DOUBLE)
        |     - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |       * CAST(sx AS DOUBLE))
        |    / CAST(n AS DOUBLE) / 1000000.0 * 10000) AS BIGINT) AS intercept_ln_e4
        |FROM a""".stripMargin,
    // identical chain: train/test split, Laplace e6 log-likelihood per
    // (token, class), order-free integer doc scores, rank-1 argmax
    "naive_bayes_source" ->
      """WITH tk AS (
        |  SELECT doc_id, source, w FROM (
        |    SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        |    FROM documents) WHERE w <> ''),
        |train AS (SELECT * FROM tk WHERE doc_id % 2 = 0),
        |test AS (SELECT * FROM tk WHERE doc_id % 2 <> 0),
        |v AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM train),
        |ct AS (SELECT source AS cls, CAST(COUNT(*) AS BIGINT) AS tot
        |       FROM train GROUP BY 1),
        |cnts AS (SELECT source AS cls, w, CAST(COUNT(*) AS BIGINT) AS cnt
        |         FROM train GROUP BY 1, 2),
        |tdocs AS (SELECT doc_id, source FROM documents WHERE doc_id % 2 = 0),
        |prior AS (
        |  SELECT source AS cls,
        |    CAST(round(ln(CAST(COUNT(*) AS DOUBLE)
        |      / CAST((SELECT COUNT(*) FROM tdocs) AS DOUBLE)) * 1000000)
        |      AS BIGINT) AS prior_e6
        |  FROM tdocs GROUP BY 1),
        |dt AS (SELECT doc_id, source, w, CAST(COUNT(*) AS BIGINT) AS m
        |       FROM test GROUP BY 1, 2, 3),
        |contrib AS (
        |  SELECT d.doc_id, d.source, c.cls, d.m,
        |    CAST(round(ln((CAST(COALESCE(x.cnt, 0) AS DOUBLE) + 1.0)
        |      / (CAST(c.tot AS DOUBLE) + CAST(v.v AS DOUBLE))) * 1000000)
        |      AS BIGINT) AS l_e6
        |  FROM dt d CROSS JOIN ct c CROSS JOIN v
        |  LEFT JOIN cnts x ON x.cls = c.cls AND x.w = d.w),
        |scores AS (
        |  SELECT s.doc_id, s.source, s.cls, s.tok + p.prior_e6 AS score
        |  FROM (SELECT doc_id, source, cls, CAST(SUM(m * l_e6) AS BIGINT) AS tok
        |        FROM contrib GROUP BY 1, 2, 3) s
        |  JOIN prior p ON p.cls = s.cls),
        |pred AS (
        |  SELECT doc_id, source, cls,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cls) AS rn
        |  FROM scores)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_test,
        |  CAST(SUM(CASE WHEN cls = source THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        |FROM pred WHERE rn = 1 GROUP BY source ORDER BY source""".stripMargin,
    // identical injection + detectors; redaction must zero every class
    "pii_scan" ->
      """WITH injected AS (
        |  SELECT text
        |    || CASE WHEN doc_id % 10 = 0
        |         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |         ELSE '' END
        |    || CASE WHEN doc_id % 10 = 1
        |         THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
        |         ELSE '' END
        |    || CASE WHEN doc_id % 10 = 2
        |         THEN ' call 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
        |         ELSE '' END AS text
        |  FROM documents),
        |red AS (
        |  SELECT text,
        |    regexp_replace(regexp_replace(regexp_replace(text,
        |      '[a-z0-9]+@[a-z0-9]+\.[a-z]+', '[PII]', 'g'),
        |      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '[PII]', 'g'),
        |      '555-[0-9]{4}', '[PII]', 'g') AS rtext
        |  FROM injected)
        |SELECT 'email' AS pii_class,
        |  CAST(SUM(CASE WHEN regexp_matches(text, '[a-z0-9]+@[a-z0-9]+\.[a-z]+') THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN regexp_matches(rtext, '[a-z0-9]+@[a-z0-9]+\.[a-z]+') THEN 1 ELSE 0 END) AS BIGINT) AS n_after_redaction
        |FROM red
        |UNION ALL
        |SELECT 'ipv4',
        |  CAST(SUM(CASE WHEN regexp_matches(text, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}') THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(SUM(CASE WHEN regexp_matches(rtext, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}') THEN 1 ELSE 0 END) AS BIGINT)
        |FROM red
        |UNION ALL
        |SELECT 'phone',
        |  CAST(SUM(CASE WHEN regexp_matches(text, '555-[0-9]{4}') THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(SUM(CASE WHEN regexp_matches(rtext, '555-[0-9]{4}') THEN 1 ELSE 0 END) AS BIGINT)
        |FROM red
        |ORDER BY pii_class""".stripMargin,
    // plain COUNT DISTINCT per source / per pair — matching proves the
    // sketch algebra exact in the lossless regime (stored-shingle
    // bounds, doc_id < 200 slice)
    "source_overlap" ->
      """WITH w AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
        |  WHERE doc_id < 200 AND len(string_split(text, ' ')) >= 3),
        |s AS (
        |  SELECT DISTINCT source, sh FROM (
        |    SELECT source, unnest(list_transform(generate_series(1, len(ws) - 2),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
        |    FROM w)),
        |src AS (SELECT DISTINCT source FROM s),
        |p AS (
        |  SELECT a.source AS src_a, b.source AS src_b
        |  FROM src a JOIN src b ON a.source < b.source)
        |SELECT p.src_a, p.src_b,
        |  (SELECT COUNT(*) FROM s WHERE source = p.src_a) AS n_a,
        |  (SELECT COUNT(*) FROM s WHERE source = p.src_b) AS n_b,
        |  (SELECT COUNT(DISTINCT sh) FROM s
        |   WHERE source IN (p.src_a, p.src_b)) AS n_union,
        |  (SELECT COUNT(*) FROM s WHERE source = p.src_a)
        |    + (SELECT COUNT(*) FROM s WHERE source = p.src_b)
        |    - (SELECT COUNT(DISTINCT sh) FROM s
        |       WHERE source IN (p.src_a, p.src_b)) AS n_inter
        |FROM p ORDER BY p.src_a, p.src_b""".stripMargin,
    // lift threshold and export both in integer arithmetic (`//` floor
    // division on positive operands == Spark's `div`); stored-shingle
    // bounds mirrored as in the dedup-family oracles
    "collocation_lift" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |  WHERE doc_id < 1000 AND len(string_split(text, ' ')) >= 3),
        |sh AS (
        |  SELECT DISTINCT doc_id, sh FROM (
        |    SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 2),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
        |    FROM w)),
        |dfreq AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh),
        |mid AS (
        |  SELECT s.doc_id, s.sh, d.df FROM sh s JOIN dfreq d USING (sh)
        |  WHERE d.df >= 3),
        |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
        |pairs AS (
        |  SELECT a.sh AS sa, b.sh AS sb, COUNT(*) AS df_ab,
        |    MIN(a.df) AS df_a, MIN(b.df) AS df_b
        |  FROM mid a JOIN mid b ON a.doc_id = b.doc_id AND a.sh < b.sh
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
        |SELECT p.sa, p.sb, p.df_ab,
        |  (p.df_ab * n.n_docs * 10000) // (p.df_a * p.df_b) AS lift_e4
        |FROM pairs p CROSS JOIN n
        |WHERE p.df_ab * n.n_docs >= p.df_a * p.df_b * 2
        |ORDER BY p.sa, p.sb""".stripMargin,
    // same stored-shingle bounds as the dedup family (doc_id < 1000,
    // >= 3 words, DISTINCT grams); string_agg ORDER BY = sorted postings
    "postings_list" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |  WHERE doc_id < 1000 AND len(string_split(text, ' ')) >= 3),
        |sh AS (
        |  SELECT DISTINCT doc_id, sh FROM (
        |    SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 2),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
        |    FROM w))
        |SELECT sh, COUNT(*) AS df,
        |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        |FROM sh GROUP BY sh HAVING COUNT(*) BETWEEN 4 AND 7
        |ORDER BY sh""".stripMargin,
    // chr() builds the control bytes so the oracle JSON stays clean
    // ASCII; RE2 reads the same \x{..} classes as Java regex
    "encoding_audit" ->
      """WITH inj AS (
        |  SELECT text ||
        |    CASE WHEN doc_id % 11 = 3 THEN ' cafÃ© rÃ©sumÃ©' ELSE '' END ||
        |    CASE WHEN doc_id % 11 = 5 THEN ' data' || chr(65533) || 'loss' ELSE '' END ||
        |    CASE WHEN doc_id % 11 = 7 THEN ' bell' || chr(7) || 'ring' || chr(27) ELSE '' END AS t
        |  FROM documents),
        |rep AS (
        |  SELECT t, regexp_replace(regexp_replace(regexp_replace(t,
        |    'Ã©', 'é', 'g'),
        |    '[\x00-\x08\x0B\x0C\x0E-\x1F]', '', 'g'),
        |    chr(65533), '', 'g') AS r
        |  FROM inj),
        |c AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN regexp_matches(t, '[\x00-\x08\x0B\x0C\x0E-\x1F]') THEN 1 ELSE 0 END) AS BIGINT) AS d_control,
        |    CAST(SUM(CASE WHEN regexp_matches(r, '[\x00-\x08\x0B\x0C\x0E-\x1F]') THEN 1 ELSE 0 END) AS BIGINT) AS r_control,
        |    CAST(SUM(CASE WHEN regexp_matches(t, 'Ã[\x{A0}-\x{BF}]') THEN 1 ELSE 0 END) AS BIGINT) AS d_moji,
        |    CAST(SUM(CASE WHEN regexp_matches(r, 'Ã[\x{A0}-\x{BF}]') THEN 1 ELSE 0 END) AS BIGINT) AS r_moji,
        |    CAST(SUM(CASE WHEN regexp_matches(t, chr(65533)) THEN 1 ELSE 0 END) AS BIGINT) AS d_repl,
        |    CAST(SUM(CASE WHEN regexp_matches(r, chr(65533)) THEN 1 ELSE 0 END) AS BIGINT) AS r_repl
        |  FROM rep)
        |SELECT 'control' AS issue_class, d_control AS n_docs, r_control AS n_after_repair FROM c
        |UNION ALL SELECT 'mojibake', d_moji, r_moji FROM c
        |UNION ALL SELECT 'replacement', d_repl, r_repl FROM c
        |ORDER BY issue_class""".stripMargin,
    // same shingle slice; decile cumulative stacks then the identical
    // quantized-ln five-sums OLS
    // same vowel-run syllable heuristic, same e3 integer chain
    "rake_keywords" ->
      """WITH docs AS (
        |  SELECT doc_id, string_split(text, ' ') AS arr
        |  FROM documents WHERE doc_id < 200),
        |w0 AS (
        |  SELECT doc_id, i, arr[i] AS w
        |  FROM docs, UNNEST(generate_series(1, len(arr))) AS t(i)
        |  WHERE arr[i] <> ''),
        |g AS (SELECT doc_id, i, w,
        |  CASE WHEN w IN ('join', 'hash', 'row', 'batch', 'scan')
        |    THEN 1 ELSE 0 END AS st FROM w0),
        |p AS (SELECT doc_id, i, w, st,
        |  SUM(st) OVER (PARTITION BY doc_id ORDER BY i) AS pid FROM g),
        |pw AS (SELECT doc_id, pid, i, w FROM p WHERE st = 0),
        |plen AS (SELECT doc_id, pid, COUNT(*) AS plen FROM pw GROUP BY 1, 2),
        |wd AS (SELECT w, CAST(SUM(plen) AS BIGINT) AS deg,
        |  CAST(COUNT(*) AS BIGINT) AS freq
        |  FROM pw JOIN plen USING (doc_id, pid) GROUP BY w),
        |ws AS (SELECT w, (deg * 1000000) // freq AS ws FROM wd),
        |ph AS (SELECT doc_id, pid,
        |  string_agg(w, ' ' ORDER BY i) AS phrase,
        |  CAST(SUM(ws) AS BIGINT) AS score, COUNT(*) AS nw
        |  FROM pw JOIN ws USING (w) GROUP BY 1, 2)
        |SELECT phrase, CAST(MAX(nw) AS BIGINT) AS n_words,
        |  CAST(COUNT(*) AS BIGINT) AS n_occurrences,
        |  CAST(MAX(score) AS BIGINT) AS score_e6
        |FROM ph GROUP BY phrase
        |ORDER BY score_e6 DESC, phrase LIMIT 10""".stripMargin,
    "fog_index" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents WHERE doc_id < 50),
        |s AS (
        |  SELECT doc_id,
        |    CASE WHEN len(regexp_extract_all(w, '[aeiouy]+')) >= 3
        |      THEN 1 ELSE 0 END AS cx
        |  FROM w WHERE w <> ''),
        |d AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
        |    CAST(SUM(cx) AS BIGINT) AS n_complex
        |  FROM s GROUP BY doc_id)
        |SELECT doc_id, n_words, n_complex,
        |  CAST(400 * n_words + (40000 * n_complex) // n_words AS BIGINT) AS fog_e3
        |FROM d ORDER BY doc_id""".stripMargin,
    "lexical_richness" ->
      """WITH w AS (
        |  SELECT unnest(string_split(text, ' ')) AS w
        |  FROM documents WHERE doc_id < 500),
        |h AS (SELECT w, COUNT(*) AS c FROM w WHERE w <> '' GROUP BY w),
        |m AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS v,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
        |  CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS v2
        |  FROM h)
        |SELECT n_tokens, v, v1, v2,
        |  CAST((v * 1000000) // n_tokens AS BIGINT) AS ttr_e6,
        |  CAST((v2 * 1000000) // v AS BIGINT) AS sichel_e6,
        |  CAST(round(
        |    CAST(100 AS DOUBLE) * ln(CAST(n_tokens AS DOUBLE))
        |    / (CAST(1 AS DOUBLE) - CAST(v1 AS DOUBLE) / CAST(v AS DOUBLE))
        |    * 1000) AS BIGINT) AS honore_e3
        |FROM m""".stripMargin,
    "flesch_readability" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents WHERE doc_id < 50),
        |s AS (
        |  SELECT doc_id,
        |    greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))) AS syl
        |  FROM w WHERE w <> ''),
        |d AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
        |    CAST(SUM(syl) AS BIGINT) AS n_syllables
        |  FROM s GROUP BY doc_id)
        |SELECT doc_id, n_words, n_syllables,
        |  CAST(206835 - 1015 * n_words
        |    - (84600 * n_syllables) // n_words AS BIGINT) AS flesch_e3
        |FROM d ORDER BY doc_id""".stripMargin,
    "heaps_law" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |  WHERE doc_id < 1000 AND len(string_split(text, ' ')) >= 3),
        |sh AS (
        |  SELECT DISTINCT doc_id, sh FROM (
        |    SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 2),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
        |    FROM w)),
        |nn AS (SELECT MAX(doc_id) + 1 AS n FROM sh),
        |decd AS (
        |  SELECT (doc_id * 10 // (SELECT n FROM nn)) + 1 AS d, sh FROM sh),
        |tok AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS t FROM decd GROUP BY d),
        |fresh AS (
        |  SELECT fd AS d, CAST(COUNT(*) AS BIGINT) AS v FROM (
        |    SELECT sh, MIN(d) AS fd FROM decd GROUP BY sh) GROUP BY fd),
        |cum AS (
        |  SELECT t.d,
        |    CAST(SUM(t.t) OVER (ORDER BY t.d ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nd,
        |    CAST(SUM(COALESCE(f.v, 0)) OVER (ORDER BY t.d ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vd
        |  FROM tok t LEFT JOIN fresh f ON f.d = t.d),
        |pts AS (SELECT CAST(round(ln(CAST(nd AS DOUBLE)) * 1000000) AS BIGINT) AS x,
        |               CAST(round(ln(CAST(vd AS DOUBLE)) * 1000000) AS BIGINT) AS y FROM cum),
        |c AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
        |        CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x*y) AS BIGINT) AS sxy,
        |        CAST(SUM(x*x) AS BIGINT) AS sxx FROM pts),
        |dd AS (SELECT n, CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
        |        CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den FROM c)
        |SELECT n AS n_points,
        |  CASE WHEN num >= 0 THEN CAST(num * 1000000 // den AS BIGINT)
        |       ELSE -CAST((-num) * 1000000 // den AS BIGINT) END AS beta_e6
        |FROM dd""".stripMargin,
    // two unrolled damped iterations in integer floor arithmetic over
    // the materialized co-occurrence graph
    "textrank_keywords" ->
      """WITH d AS MATERIALIZED (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 1000),
        |w AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM d)
        |  WHERE w <> ''),
        |p AS MATERIALIZED (
        |  SELECT a.w AS w1, b.w AS w2, CAST(COUNT(*) AS BIGINT) AS wt
        |  FROM w a JOIN w b ON a.doc_id = b.doc_id AND a.w < b.w
        |  GROUP BY a.w, b.w),
        |e AS MATERIALIZED (
        |  SELECT w1 AS src, w2 AS dst, wt FROM p
        |  UNION ALL SELECT w2, w1, wt FROM p),
        |st AS MATERIALIZED (
        |  SELECT src, CAST(SUM(wt) AS BIGINT) AS ws FROM e GROUP BY src),
        |r0 AS MATERIALIZED (
        |  SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM st),
        |r1 AS MATERIALIZED (
        |  SELECT e.dst AS node,
        |    150000 + (17 * SUM((e.wt * r0.r) // st.ws)) // 20 AS r
        |  FROM e JOIN st ON st.src = e.src JOIN r0 ON r0.node = e.src
        |  GROUP BY e.dst),
        |r2 AS MATERIALIZED (
        |  SELECT e.dst AS node,
        |    150000 + (17 * SUM((e.wt * r1.r) // st.ws)) // 20 AS r
        |  FROM e JOIN st ON st.src = e.src JOIN r1 ON r1.node = e.src
        |  GROUP BY e.dst)
        |SELECT node AS keyword, CAST(r AS BIGINT) AS rank_e6
        |FROM r2 ORDER BY r DESC, node LIMIT 10""".stripMargin,
    // PMI = ln of an exact integer ratio, quantized once per pair
    "word_pmi" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 1000),
        |w AS (
        |  SELECT DISTINCT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM d)
        |  WHERE w <> ''),
        |dfw AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS dfx FROM w GROUP BY w),
        |nn AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd FROM d),
        |pairs AS (
        |  SELECT a.w AS w1, b.w AS w2, CAST(COUNT(*) AS BIGINT) AS dfxy
        |  FROM w a JOIN w b ON a.doc_id = b.doc_id AND a.w < b.w
        |  GROUP BY a.w, b.w HAVING COUNT(*) >= 5)
        |SELECT w1, w2, dfxy, f1.dfx AS df1, f2.dfx AS df2,
        |  CAST(round(ln(CAST(nn.nd AS DOUBLE) * CAST(dfxy AS DOUBLE)
        |    / (CAST(f1.dfx AS DOUBLE) * CAST(f2.dfx AS DOUBLE))) * 1000000)
        |    AS BIGINT) AS pmi_e6
        |FROM pairs
        |JOIN dfw f1 ON f1.w = pairs.w1
        |JOIN dfw f2 ON f2.w = pairs.w2, nn
        |ORDER BY pmi_e6 DESC, w1, w2 LIMIT 15""".stripMargin,
    // same stored-shingle bounds as postings_list; per-point e6 ln then
    // integer five-sums (HUGEINT keeps `//` a true integer quotient)
    "freq_spectrum" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |  WHERE doc_id < 1000 AND len(string_split(text, ' ')) >= 3),
        |sh AS (
        |  SELECT DISTINCT doc_id, sh FROM (
        |    SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 2),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
        |    FROM w)),
        |fq AS (SELECT sh, COUNT(*) AS f FROM sh GROUP BY sh),
        |spec AS (SELECT f, COUNT(*) AS nf FROM fq GROUP BY f),
        |pts AS (SELECT CAST(round(ln(f) * 1000000) AS BIGINT) AS x,
        |               CAST(round(ln(nf) * 1000000) AS BIGINT) AS y FROM spec),
        |c AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
        |        CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x*y) AS BIGINT) AS sxy,
        |        CAST(SUM(x*x) AS BIGINT) AS sxx FROM pts),
        |d AS (SELECT n, CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
        |        CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den FROM c)
        |SELECT n AS n_points,
        |  CASE WHEN num >= 0 THEN CAST(num * 1000000 // den AS BIGINT)
        |       ELSE -CAST((-num) * 1000000 // den AS BIGINT) END AS slope_e6
        |FROM d""".stripMargin,
    // independent mechanics: DuckDB scans each row's token list per
    // phrase offset (array side) vs Spark's index-join side; both count
    // start positions, so overlap/adjacency semantics agree by math,
    // not by shared code
    "phrase_search" ->
      """WITH ph(phrase) AS (VALUES ('big data merge'), ('column merge fast'),
        |  ('part filter scan'), ('row column sort'), ('stream table hash')),
        |tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |idx AS (SELECT doc_id, u.i - 1 AS pos, w[u.i] AS term
        |        FROM tok, unnest(generate_series(1, len(w))) u(i)),
        |pw AS (SELECT phrase, k.i - 1 AS k, string_split(phrase, ' ')[k.i] AS term
        |       FROM ph, unnest(generate_series(1, 3)) k(i)),
        |occ AS (
        |  SELECT pw.phrase, idx.doc_id, idx.pos - pw.k AS st
        |  FROM idx JOIN pw ON idx.term = pw.term
        |  GROUP BY 1, 2, 3 HAVING COUNT(*) = 3)
        |SELECT phrase, doc_id, CAST(COUNT(*) AS BIGINT) AS n_occ,
        |  CAST(MIN(st) AS BIGINT) AS first_pos
        |FROM occ GROUP BY phrase, doc_id
        |ORDER BY phrase, doc_id""".stripMargin,
    // COUNT/SUM widen to HUGEINT in DuckDB — cast back to BIGINT
    "vocab_growth" ->
      """WITH n AS (SELECT MAX(doc_id) + 1 AS n FROM documents),
        |fw AS (
        |  SELECT w, MIN(doc_id) AS fd FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w <> '' GROUP BY w),
        |b AS (SELECT CAST(fd * 10 // (SELECT n FROM n) AS INT) + 1 AS d FROM fw),
        |c AS (SELECT d, COUNT(*) AS nw FROM b GROUP BY d),
        |g AS (SELECT unnest(generate_series(1, 10)) AS d)
        |SELECT CAST(g.d AS INT) AS decile,
        |  CAST(COALESCE(c.nw, 0) AS BIGINT) AS new_words,
        |  CAST((SELECT COALESCE(SUM(c2.nw), 0) FROM c c2 WHERE c2.d <= g.d) AS BIGINT) AS vocab_size
        |FROM g LEFT JOIN c ON c.d = g.d
        |ORDER BY decile""".stripMargin,
    // exact-regime sketch companion: COUNT(DISTINCT) == KMV below-k,
    // quantile_cont == the KLL lossless interpolation (same formula)
    "sketch_stats_precision" ->
      """WITH toks AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        |t AS (
        |  SELECT lang, CAST(COUNT(DISTINCT tok) AS BIGINT) AS vocab,
        |    CAST(COUNT(*) AS BIGINT) AS n_tokens
        |  FROM toks WHERE tok <> '' GROUP BY lang),
        |l AS (
        |  SELECT lang,
        |    CAST(round(quantile_cont(CAST(n_chars AS DOUBLE), 0.5) * 10) AS BIGINT) AS p50_chars_e1,
        |    CAST(round(quantile_cont(CAST(n_chars AS DOUBLE), 0.95) * 10) AS BIGINT) AS p95_chars_e1,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY lang)
        |SELECT t.lang, t.vocab, l.p50_chars_e1, l.p95_chars_e1,
        |  t.n_tokens, l.n_docs
        |FROM t JOIN l ON t.lang = l.lang
        |ORDER BY t.lang""".stripMargin,
    "repetition_stats" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents WHERE doc_id < 300),
        |w AS (SELECT doc_id, unnest(ws) AS w FROM d),
        |wc AS (SELECT doc_id, w, COUNT(*) AS n FROM w WHERE w <> '' GROUP BY doc_id, w),
        |wa AS (
        |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_words,
        |    COUNT(*) AS n_distinct_words, CAST(MAX(n) AS BIGINT) AS top_word_n
        |  FROM wc GROUP BY doc_id),
        |sh AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
        |  FROM d WHERE len(ws) >= 3),
        |sa AS (
        |  SELECT doc_id, COUNT(*) AS n_shingles,
        |    COUNT(DISTINCT sh) AS n_distinct_shingles
        |  FROM sh GROUP BY doc_id)
        |SELECT wa.doc_id, n_words, n_distinct_words, top_word_n,
        |  CASE WHEN n_words = 0 THEN 0 ELSE CAST(round(CAST(n_words - n_distinct_words AS DOUBLE) / CAST(n_words AS DOUBLE) * 10000) AS BIGINT) END AS dup_word_e4,
        |  CASE WHEN n_words = 0 THEN 0 ELSE CAST(round(CAST(top_word_n AS DOUBLE) / CAST(n_words AS DOUBLE) * 10000) AS BIGINT) END AS top_word_e4,
        |  COALESCE(n_shingles, 0) AS n_shingles,
        |  CASE WHEN COALESCE(n_shingles, 0) = 0 THEN 0 ELSE CAST(round(CAST(n_shingles - n_distinct_shingles AS DOUBLE) / CAST(n_shingles AS DOUBLE) * 10000) AS BIGINT) END AS dup_shingle_e4
        |FROM wa LEFT JOIN sa ON wa.doc_id = sa.doc_id
        |ORDER BY wa.doc_id""".stripMargin,
    "top_bigrams" ->
      """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
        |b AS (
        |  SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
        |    i -> ws[i] || ' ' || ws[i+1])) AS bigram
        |  FROM w WHERE len(ws) >= 2)
        |SELECT bigram, COUNT(*) AS n FROM b
        |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin,
    "lm_doc_score" ->
      """WITH b AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
        |    i -> ws[i] || ' ' || ws[i+1])) AS bigram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |  WHERE len(ws) >= 2),
        |bb AS (
        |  SELECT doc_id, string_split(bigram, ' ')[1] AS w1,
        |         string_split(bigram, ' ')[2] AS w2
        |  FROM b),
        |bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bb GROUP BY w1, w2),
        |cc AS (SELECT w1, COUNT(*) AS c1 FROM bb GROUP BY w1),
        |ds AS (
        |  SELECT bb.doc_id, COUNT(*) AS n_bigrams,
        |    CAST(SUM(CAST(ROUND(10000.0 * bc.c12 / cc.c1) AS BIGINT)) AS BIGINT) AS score_sum_e4
        |  FROM bb JOIN bc USING (w1, w2) JOIN cc USING (w1)
        |  GROUP BY bb.doc_id)
        |SELECT doc_id, n_bigrams, score_sum_e4,
        |  CAST(FLOOR(score_sum_e4 / n_bigrams) AS BIGINT) AS avg_e4
        |FROM ds ORDER BY doc_id""".stripMargin,
    // DSIR-recipe determinism: ratio in one fixed double chain, ln
    // e6-fixed per (source, word), integer weighted sum, one division
    "source_kl" ->
      """WITH sw AS (
        |  SELECT source, w, COUNT(*) AS c FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w <> '' GROUP BY source, w),
        |corpus AS (SELECT w, SUM(c) AS cw FROM sw GROUP BY w),
        |totals AS (SELECT source, SUM(c) AS ns FROM sw GROUP BY source),
        |grand AS (SELECT SUM(cw) AS n, COUNT(*) AS v FROM corpus),
        |terms AS (
        |  SELECT sw.source, sw.c * CAST(ROUND(ln(
        |      (CAST(sw.c + 1 AS DOUBLE) * CAST(n + v AS DOUBLE)) /
        |      (CAST(cw + 1 AS DOUBLE) * CAST(ns + v AS DOUBLE))) * 1000000.0)
        |    AS BIGINT) AS t, ns
        |  FROM sw JOIN corpus USING (w) JOIN totals USING (source), grand)
        |SELECT source, CAST(MAX(ns) AS BIGINT) AS n_tokens,
        |  CAST(ROUND(CAST(SUM(t) AS DOUBLE) / CAST(MAX(ns) AS DOUBLE)) AS BIGINT) AS kl_e6
        |FROM terms GROUP BY source ORDER BY source""".stripMargin,
    // aligned unnests give (pos, hash); 1-based positions here vs 0-based
    // in Spark, so full-window filter is pos <= n-3 vs pos <= n-4 — the
    // same window set; md5-prefix min is a shared total order
    "winnow_fp" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |g AS (
        |  SELECT doc_id, len(ws) - 2 AS n_grams,
        |    unnest(generate_series(1, len(ws) - 2)) AS pos,
        |    unnest(list_transform(generate_series(1, len(ws) - 2),
        |      i -> substring(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]), 1, 16))) AS h
        |  FROM w),
        |s AS (
        |  SELECT doc_id, n_grams, pos,
        |    MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
        |  FROM g)
        |SELECT doc_id, CAST(MAX(n_grams) AS BIGINT) AS n_grams,
        |  CAST(COUNT(DISTINCT wmin) AS BIGINT) AS n_fp
        |FROM s WHERE pos <= n_grams - 3
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // ln(k) e6-quantized per integer count in BOTH engines, so the
    // entropy numerator is an exact integer; one double division at the end
    "char_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
        |cc AS (
        |  SELECT doc_id, ch, COUNT(*) AS c FROM ch WHERE ch <> '' GROUP BY 1, 2),
        |d AS (
        |  SELECT doc_id, COUNT(*) AS distinct_chars,
        |    CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(SUM(c * CAST(ROUND(ln(c) * 1000000.0) AS BIGINT)) AS BIGINT) AS s_cln
        |  FROM cc GROUP BY doc_id)
        |SELECT doc_id, distinct_chars, n AS n_chars_counted,
        |  CAST(ROUND((CAST(n AS DOUBLE) * CAST(CAST(ROUND(ln(n) * 1000000.0) AS BIGINT) AS DOUBLE)
        |    - CAST(s_cln AS DOUBLE)) / CAST(n AS DOUBLE)) AS BIGINT) AS entropy_e6
        |FROM d ORDER BY doc_id""".stripMargin,
    // the lm_doc_score frame + window-ntile terciles per language — the
    // boundaries-then-assign engine plan reproduces exact ntile semantics
    // below the sketch cap, so the window form is a valid oracle
    "perplexity_buckets" ->
      """WITH b AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
        |    i -> ws[i] || ' ' || ws[i+1])) AS bigram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |  WHERE len(ws) >= 2),
        |bb AS (
        |  SELECT doc_id, string_split(bigram, ' ')[1] AS w1,
        |         string_split(bigram, ' ')[2] AS w2
        |  FROM b),
        |bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bb GROUP BY w1, w2),
        |cc AS (SELECT w1, COUNT(*) AS c1 FROM bb GROUP BY w1),
        |ds AS (
        |  SELECT bb.doc_id, COUNT(*) AS n_bigrams,
        |    CAST(SUM(CAST(ROUND(10000.0 * bc.c12 / cc.c1) AS BIGINT)) AS BIGINT) AS score_sum_e4
        |  FROM bb JOIN bc USING (w1, w2) JOIN cc USING (w1)
        |  GROUP BY bb.doc_id),
        |sc AS (
        |  SELECT d.doc_id, l.lang, d.n_bigrams,
        |    CAST(FLOOR(score_sum_e4 / n_bigrams) AS BIGINT) AS avg_e4
        |  FROM ds d JOIN documents l ON d.doc_id = l.doc_id),
        |q AS (
        |  SELECT lang, n_bigrams, avg_e4,
        |    ntile(3) OVER (PARTITION BY lang ORDER BY avg_e4, doc_id) AS tercile
        |  FROM sc)
        |SELECT lang, CAST(tercile AS INT) AS tercile,
        |  CASE WHEN tercile = 3 THEN 'head' WHEN tercile = 2 THEN 'middle'
        |       ELSE 'tail' END AS bucket,
        |  COUNT(*) AS n_docs, CAST(SUM(n_bigrams) AS BIGINT) AS total_bigrams,
        |  MIN(avg_e4) AS min_avg_e4, MAX(avg_e4) AS max_avg_e4
        |FROM q GROUP BY lang, tercile ORDER BY lang, tercile""".stripMargin,
    // closed-form expectation, NOT a rerun of the strip chain: on the
    // markup-free single-spaced fixture the cleaned text must be exactly
    // `text || ' & tail'`
    "html_strip" ->
      """SELECT doc_id, CAST(len(text || ' & tail') AS INT) AS n_clean,
        |  substring(md5(text || ' & tail'), 1, 16) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "domain_stats" ->
      """WITH u AS (
        |  SELECT 'www.' || source || '.example.com' AS host,
        |    '/docs/' || CAST(doc_id AS VARCHAR) AS path, n_chars
        |  FROM documents)
        |SELECT host, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  MIN(path) AS first_path
        |FROM u GROUP BY host ORDER BY host""".stripMargin,
    "bm25_topk" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    len(string_split(text, ' ')) AS len
        |  FROM documents),
        |st AS (SELECT COUNT(*) AS n_docs, SUM(len) AS total_len FROM d),
        |tf AS (
        |  SELECT doc_id, len, term, COUNT(*) AS tf FROM (
        |    SELECT doc_id, len, unnest(toks) AS term FROM d) u
        |  WHERE term IN ('join', 'scan', 'merge') GROUP BY doc_id, len, term),
        |dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
        |sc AS (
        |  SELECT tf.doc_id,
        |    CAST(round(
        |      ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0)
        |      * (CAST(tf AS DOUBLE) * 2.2)
        |      / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
        |          (CAST(len AS DOUBLE) / (CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
        |      * 10000) AS BIGINT) AS contrib_e4
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN st)
        |SELECT doc_id, CAST(SUM(contrib_e4) AS BIGINT) AS score_e4, COUNT(*) AS n_terms
        |FROM sc GROUP BY doc_id ORDER BY score_e4 DESC, doc_id LIMIT 10""".stripMargin,
    "heavy_hitters" ->
      """SELECT term, COUNT(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents) u
        |WHERE term <> '' GROUP BY term ORDER BY cnt DESC, term""".stripMargin,
    "corpus_filter" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |wc AS (
        |  SELECT doc_id, w, COUNT(*) AS n FROM w WHERE w <> '' GROUP BY doc_id, w),
        |sig AS (
        |  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_words,
        |    COUNT(*) AS n_distinct, CAST(MAX(n) AS BIGINT) AS top_n
        |  FROM wc GROUP BY doc_id),
        |e AS (
        |  SELECT d.doc_id, COALESCE(n_words, 0) AS n_words,
        |    CASE WHEN COALESCE(n_words, 0) = 0 THEN 0
        |      ELSE CAST(round(CAST(n_words - n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) * 10000) AS BIGINT) END AS dup_e4,
        |    CASE WHEN COALESCE(n_words, 0) = 0 THEN 0
        |      ELSE CAST(round(CAST(top_n AS DOUBLE) / CAST(n_words AS DOUBLE) * 10000) AS BIGINT) END AS top_e4
        |  FROM documents d LEFT JOIN sig ON d.doc_id = sig.doc_id)
        |SELECT doc_id, n_words, dup_e4, top_e4,
        |  CASE WHEN n_words < 20 THEN 'too_short'
        |       WHEN dup_e4 > 4000 THEN 'repetitive'
        |       WHEN top_e4 > 2000 THEN 'degenerate'
        |       ELSE 'ok' END AS verdict
        |FROM e ORDER BY doc_id""".stripMargin,
    "heavy_hitters_by_lang" ->
      """WITH t AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents),
        |c AS (
        |  SELECT lang, term, COUNT(*) AS cnt FROM t WHERE term <> ''
        |  GROUP BY lang, term),
        |r AS (
        |  SELECT lang, term, cnt,
        |    row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, term) AS rn
        |  FROM c)
        |SELECT lang, term, cnt, CAST(rn AS INT) AS rn
        |FROM r WHERE rn <= 10 ORDER BY lang, rn""".stripMargin,
    "rolling_fp" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS rfp
        |FROM documents WHERE length(text) > 0 ORDER BY doc_id""".stripMargin,
    "lang_id" ->
      s"""WITH t AS (
         |  SELECT doc_id, text, string_split(lower(text), ' ') AS ws,
         |    CAST(length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g')) AS INT) AS n_cjk
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, n_cjk,
         |    ${markerSql(LangMarkers(0)._2)} AS s_en,
         |    ${markerSql(LangMarkers(1)._2)} AS s_de,
         |    ${markerSql(LangMarkers(2)._2)} AS s_es,
         |    ${markerSql(LangMarkers(3)._2)} AS s_fr
         |  FROM t)
         |SELECT doc_id, s_en, s_de, s_es, s_fr, n_cjk,
         |  CASE WHEN n_cjk > 0 THEN 'zh'
         |       WHEN s_de > s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
         |       WHEN s_es > s_en AND s_es > s_de AND s_es >= s_fr THEN 'es'
         |       WHEN s_fr > s_en AND s_fr > s_de AND s_fr > s_es THEN 'fr'
         |       ELSE 'en' END AS predicted
         |FROM s ORDER BY doc_id""".stripMargin,
    "token_regex" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS n_bpe_tokens,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
        |  CAST(length(text) AS INT) AS n_chars_calc
        |FROM documents ORDER BY doc_id""".stripMargin,
    "lang_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
        |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
        |  COUNT(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "quality_score" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)
        |SELECT doc_id,
        |  CAST(len(ws) AS INT) AS n_tokens,
        |  CAST(len(list_filter(ws, w -> w = 'the' OR w = 'a')) AS INT) AS n_stop,
        |  CAST(round(CAST(len(list_filter(ws, w -> w = 'the' OR w = 'a')) AS DOUBLE) * 10000 / len(ws)) AS BIGINT) AS stop_ratio_e4,
        |  CAST(round(CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE) * 10000 / len(ws)) AS BIGINT) AS avg_tok_len_e4,
        |  CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS INT) AS n_vowels
        |FROM t ORDER BY doc_id""".stripMargin,
    "unicode_fold" ->
      """WITH base AS (SELECT lang, text AS t FROM documents),
        |v1 AS (SELECT lang, 'e' || chr(769) || ' ' || text AS t FROM documents WHERE doc_id % 7 = 3),
        |v2 AS (SELECT lang, chr(233) || ' ' || text AS t FROM documents WHERE doc_id % 7 = 3),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM v1 UNION ALL SELECT * FROM v2)
        |SELECT lang, COUNT(*) AS n_rows,
        |  COUNT(DISTINCT md5(t)) AS n_raw,
        |  COUNT(DISTINCT md5(nfc_normalize(t))) AS n_nfc
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    "fingerprint" ->
      """SELECT doc_id,
        |  substring(sha256(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 16) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
