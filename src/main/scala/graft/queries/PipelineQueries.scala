package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-data-pipeline operators beyond dedup/similarity (north star:
  * "the operations a large-scale training-data pipeline would need"):
  * reproducible hash-based dataset splits and TF-IDF term scoring. Both
  * exact and oracle-checked.
  */
object PipelineQueries {

  /** Deterministic train/val/test split: the split of a document is a pure
    * function of its id (first two hex chars of a salted md5), so any
    * worker on any cluster at any time assigns identically — the property
    * a 100 TB pipeline needs to keep splits stable across reruns and
    * engine versions (no RNG, no sampleBy). Reported stratified by
    * language: split skew per stratum is what a training pipeline
    * monitors. ~10% test, ~10% val by hex-range width. */
  def deterministicSplit(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("split", SplitRule.of(col("doc_id")))
      .groupBy(col("lang"), col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"))
      .orderBy(col("lang"), col("split"))
  }

  /** TF-IDF top-3 terms per document (bounded to doc_id < 200). The idf is
    * the rational (N+1)/(df+1) — no transcendental functions, so the
    * score's IEEE op chain (mul, div, mul) is bit-identical across
    * engines; ranking uses the e4 fixed-point score with a term
    * tie-break. Shape at scale: one shuffle for per-(doc, term) counts,
    * one for document frequencies (term-keyed, partial-aggregated), a
    * broadcast of the scalar N, and a per-doc window for top-k. */
  def tfidfTopterms(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 200)
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    val scored = tf
      .join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score_e4",
        round(col("tf").cast("double") * (col("n_docs") + lit(1)) / (col("df") + lit(1)) * 10000)
          .cast("long"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_e4").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("term"), col("score_e4"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** PII scrub — the standard pre-training redaction pass: emails and
    * long digit runs replaced with typed placeholders, with per-document
    * redaction counts for monitoring. PII is planted deterministically on
    * every 7th document (the fixture corpus itself is synthetic and
    * clean, so the query must demonstrate actual hits). Narrow map-only
    * pass at any scale; regex evaluation is codegen'd. */
  def redactPii(spark: SparkSession, dir: String): DataFrame = {
    val emailRe = "[a-z0-9._]+@[a-z0-9.]+\\.[a-z]{2,}"
    val digitsRe = "[0-9]{6,}"
    val planted = when(col("doc_id") % 7 === 0,
      concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or call 55512345"), col("doc_id").cast("string")))
      .otherwise(col("text"))
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 300)
      .select(col("doc_id"), planted.as("t"))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("t"), lit(emailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("t"), lit(digitsRe), lit(0))).as("n_digit_runs"),
        substring(sha2(
          regexp_replace(regexp_replace(col("t"), emailRe, "<EMAIL>"), digitsRe, "<NUM>")
            .cast("binary"), 256), 1, 16).as("redacted_fp"))
      .orderBy(col("doc_id"))
  }

  /** Weighted data mixing — the source-level downsampling every
    * large-scale training mix needs (web dumps at 10%, curated sources at
    * 100%). Inclusion is a pure function of the document id (salted-md5
    * hex range, same mechanism as [[deterministicSplit]]) so the mix is
    * reproducible across reruns, engines, and cluster layouts — no RNG,
    * no sampleBy. Source tiers (source number mod 4) map to keep-rates
    * 100%/~50%/~25%/~10%; emitted per source: totals, kept counts, and a
    * kept-id checksum so the oracle verifies WHICH rows were kept, not
    * just how many. Map-only pass — filter and hash are codegen'd, the
    * only shuffle is the low-cardinality per-source rollup. */
  def dataMix(spark: SparkSession, dir: String): DataFrame = {
    val tier = regexp_replace(col("source"), "[^0-9]", "").cast("int") % 4
    val h2 = substring(md5(concat(lit("mix:"), col("doc_id").cast("string")).cast("binary")), 1, 2)
    val keep = when(tier === 0, lit(true))
      .when(tier === 1, h2 < "80")
      .when(tier === 2, h2 < "40")
      .otherwise(h2 < "1a")
    Tables.documents(spark, dir)
      .withColumn("keep", keep)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("doc_id")).otherwise(0L)).as("id_checksum"))
      .orderBy(col("source"))
  }

  /** Stratified EXACT-k sampling: exactly 20 documents per language,
    * chosen by md5 rank — the eval-set curation op (rate-based sampling
    * can't promise per-class counts). Deterministic: any rerun anywhere
    * picks the same 20. Scale shape: the rank-≤-k filter compiles to
    * WindowGroupLimit, so each map task pre-trims to its local top-k
    * before the single per-stratum shuffle — never a global sort. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("h",
        md5(concat(lit("strat:"), col("doc_id").cast("string")).cast("binary")))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= 20)
      .select(col("lang"), col("sample_rank"), col("doc_id"),
        substring(col("h"), 1, 8).as("hash8"))
      .orderBy(col("lang"), col("sample_rank"))
  }

  /** Weighted sampling without replacement — Duffield-Lund-Thorup
    * priority sampling (JACM 2007): every doc draws priority
    * q = u/w (u uniform from a salted md5, w = n_chars), the k SMALLEST
    * priorities are the sample — inclusion probability rises with
    * weight, no replacement by construction, and (with the threshold
    * τ = (k+1)-th priority) the scheme yields unbiased Horvitz-Thompson
    * subset-sum estimates. The length-weighted curation pick ("sample
    * long documents preferentially") stratified_sample's uniform ranks
    * cannot express.
    *
    * Cross-engine exactness without a single libm call (the A-ES
    * exponential-key form needs ln(u), whose e12 quantization would
    * flip ~0.7% of rows between fdlibm and glibc): u stays the RAW
    * 52-bit integer h folded from 13 md5 nibbles (the instr polynomial,
    * generated identically for both dialects), and the sort key is the
    * plain division CAST(h)/CAST(w) — one exactly-rounded IEEE op on
    * identical integers ⇒ bit-identical doubles ⇒ identical order;
    * doc_id tie-break covers rational collisions. Top-k via
    * orderBy+limit (TakeOrderedAndProject — map-side partial top-k, no
    * window, no global sort); output columns all integer. */
  def prioritySample(spark: SparkSession, dir: String): DataFrame = {
    val hExpr = PipelineQueries.hexFoldSql("md5(concat('wsamp:', CAST(doc_id AS STRING)))")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars").cast("long").as("w"),
        expr(hExpr).as("h"))
      .orderBy(col("h").cast("double") / col("w").cast("double"), col("doc_id"))
      .limit(20)
  }

  /** 13-nibble hex→integer fold as an instr polynomial — the same text
    * parses on Spark and DuckDB (conv() exists only on one, unhex-to-int
    * on neither). */
  def hexFoldSql(md5Expr: String): String =
    (1 to 13).map { i =>
      val p = (1 to (13 - i)).map(_ => "16").foldLeft("CAST(1 AS BIGINT)")(_ + " * " + _)
      s"(instr('0123456789abcdef', substring($md5Expr, $i, 1)) - 1) * $p"
    }.mkString("(", "\n + ", ")")

  /** Sequence packing for training batches: per language, documents (in
    * doc_id order) are packed into ~2048-token batches by bucketing each
    * doc's EXCLUSIVE token prefix-sum — the streaming-pack rule (a doc
    * straddling a boundary stays with the batch it started in).
    *
    * The prefix sum is two-level, NOT one window per language: `lang`
    * has 5 values, so a per-lang running-sum window would drag the whole
    * corpus through 5 reducers' sorts. Instead doc_ids are blocked into
    * fixed 256-id ranges; per-(lang, range) token subtotals (a partial-
    * aggregated groupBy) feed a tiny per-lang offset window over RANGES
    * (corpus/256 rows — at true 100 TB scale, widen the block or add a
    * third level), and the within-range window partitions on
    * (lang, range), bounding every sort at 256 rows whatever the table
    * size. cum = range offset + within-range prefix is EXACTLY the
    * one-window value, so the oracle is unchanged. */
  def tokenPacking(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("n_toks", size(split(col("text"), " ")))
      .withColumn("rng", floor(col("doc_id") / 256).cast("long"))
    val offsetW = Window.partitionBy(col("lang")).orderBy(col("rng"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = docs.groupBy(col("lang"), col("rng"))
      .agg(sum(col("n_toks")).as("rng_toks"))
      .withColumn("rng_off", coalesce(sum(col("rng_toks")).over(offsetW), lit(0L)))
      .select(col("lang"), col("rng"), col("rng_off"))
    val withinW = Window.partitionBy(col("lang"), col("rng")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // no broadcast hint: offsets is corpus/256 rows — tiny here and AQE
    // auto-broadcasts it, but at extreme scale it must stay a shuffle
    // join on the well-distributed (lang, rng) key
    docs.join(offsets, Seq("lang", "rng"))
      .withColumn("cum",
        col("rng_off") + coalesce(sum(col("n_toks")).over(withinW), lit(0L)))
      .withColumn("batch_id", floor(col("cum") / 2048).cast("long"))
      .groupBy(col("lang"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).cast("long").as("batch_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang"), col("batch_id"))
  }

  /** Train/eval contamination check (decontamination): test-split
    * documents sharing ≥ 5 word-3-gram shingles with any train-split
    * document — the leakage scan every LLM data pipeline runs before
    * training. Splits come from the SAME md5 ranges as
    * deterministicSplit, shingles/candidates from the NearDup machinery.
    *
    * 100 TB shape: the exact shingle equi-join's cost is co-shingle
    * candidate pairs, which a web-scale corpus has far too many of
    * (every moderately common 3-gram contributes df²/2 pairs). So the
    * declared path first narrows to MinHash banded candidates — 1-row
    * bands (bands = k) so a pair survives if ANY of the k=64 minhashes
    * agree, miss probability (1-J)^64 — and only then runs the exact
    * ≥5-shared-shingle verify, jaccardOnPairs-style, on the candidate
    * pairs. The verify counts FULL shingle sets, so every surfaced pair
    * is exact. Honest recall limit: banding recalls by JACCARD while the
    * qualifying threshold is an ABSOLUTE count, so a containment pair —
    * a small doc embedded in a huge one, ≥5 shared shingles at tiny J —
    * can slip the bands ((1-J)^64 is only small when J isn't);
    * DedupQueries.containmentScreen is the companion operator for that
    * regime (bottom-k sketches, oracle-checked). The fixture
    * has no such pair: ScaleSpec pins prefiltered == unfiltered, keeping
    * the oracle row identical to the direct equi-join formulation. The
    * fixture's planted near-identical pairs surface whenever the hash
    * split separates them (doc_id < 1000 keeps the result non-vacuous
    * at every fixture scale). */
  def splitContamination(spark: SparkSession, dir: String): DataFrame =
    splitContaminationImpl(spark, dir, banded = true)

  /** The direct shingle equi-join form (no candidate prefilter) — ground
    * truth for ScaleSpec's superset check; same answer by construction
    * when banding loses no qualifying pair. */
  private[graft] def splitContaminationExact(spark: SparkSession, dir: String): DataFrame =
    splitContaminationImpl(spark, dir, banded = false)

  private def splitContaminationImpl(spark: SparkSession, dir: String,
      banded: Boolean): DataFrame = {
    import graft.scale.NearDup
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 1000)
      .withColumn("split", SplitRule.of(col("doc_id")))
    val splits = docs.select(col("doc_id"), col("split"))
    // stored frame (ShingleStore): computed once per session+dir and read
    // here with the split filter re-derived from doc_id — the banded path
    // reads it three times (signatures, then both sides of the exact
    // verify), each a plain parquet scan that survives the runner's
    // clearCache between declared queries
    val sh = graft.scale.ShingleStore.docShingles(spark, dir)
      .join(splits, "doc_id")
      .filter(col("split").isin("test", "train"))
    val pairs =
      if (!banded) {
        // all co-shingle cross-split pairs, straight from the equi-join
        sh.filter(col("split") === "test").as("t")
          .join(sh.filter(col("split") === "train").as("r"), col("t.sh") === col("r.sh"))
          .select(col("t.doc_id").as("test_doc"), col("r.doc_id").as("train_doc"))
          .distinct()
      } else {
        // banded candidates first; orient unordered (a,b) pairs into
        // (test_doc, train_doc) and keep only cross-split ones
        val sig = NearDup.minhashSignatures(sh.select(col("doc_id"), col("sh")), k = 64)
        val cands = NearDup.bandedCandidates(sig, k = 64, bands = 64)
        cands.select(col("a_id").as("x"), col("b_id").as("y"))
          .unionAll(cands.select(col("b_id").as("x"), col("a_id").as("y")))
          .join(splits.as("sx"), col("x") === col("sx.doc_id") && col("sx.split") === "test")
          .join(splits.as("sy"), col("y") === col("sy.doc_id") && col("sy.split") === "train")
          .select(col("x").as("test_doc"), col("y").as("train_doc"))
      }
    // exact verify over full shingle sets, candidate pairs only
    pairs
      .join(sh.as("t"), col("test_doc") === col("t.doc_id"))
      .join(sh.as("r"), col("train_doc") === col("r.doc_id") && col("t.sh") === col("r.sh"))
      .groupBy(col("test_doc"), col("train_doc"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 5)
      .orderBy(col("test_doc"), col("train_doc"))
  }

  /** Per-document BPE stats (`doc_id`, `n_tokens`, `token_chars`) at 50
    * merges trained on the corpus itself. The distributed part of BPE
    * training is the word count (one aggregation); merges then run on the
    * driver over the count-capped vocabulary — the Heaps'-law-bounded
    * table real tokenizer trainers consume (see [[graft.functions.Bpe]]).
    * Encoding distributes back as a broadcast (word → token stats) table
    * joined under an explode — zero per-row UDFs, and OOV words (beyond
    * the vocab cap) fall back to character segmentation, which the
    * coalesce reproduces exactly. */
  private def bpeDocStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val vocab = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(10000) // vocab cap: bounds the driver at ANY corpus size
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val ranks = graft.functions.Bpe.train(vocab, nMerges = 50).zipWithIndex.toMap
    val tokTable = vocab.map { case (w, _) =>
      val toks = graft.functions.Bpe.encode(w, ranks)
      (w, toks.length.toLong, toks.map(_.length).sum.toLong)
    }
    val spark2 = spark; import spark2.implicits._
    val tt = tokTable.toDF("w", "n_tok", "tok_chars")
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .join(broadcast(tt), Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(
        sum(coalesce(col("n_tok"), length(col("w")).cast("long"))).as("n_tokens"),
        sum(coalesce(col("tok_chars"), length(col("w")).cast("long"))).as("token_chars"))
      .orderBy(col("doc_id"))
  }

  /** Subword token counts per document — rows-only headline (the learned
    * merge table is not SQL-expressible); BpeSpec pins the trainer against
    * hand-derived merges and [[bpeSegments]] is the oracle companion. */
  def bpeTokenize(spark: SparkSession, dir: String): DataFrame =
    bpeDocStats(spark, dir).select(col("doc_id"), col("n_tokens"))

  /** Oracle companion to [[bpeTokenize]]: the BPE tokens of every word
    * must tile it exactly, so the summed token characters per document
    * equal its space-free character count — checked against an engine
    * that never saw the merge table. A lost or duplicated symbol in the
    * merge/encode loop breaks this immediately. */
  def bpeSegments(spark: SparkSession, dir: String): DataFrame =
    bpeDocStats(spark, dir).select(col("doc_id"), col("token_chars"))

  /** DSIR-style importance weights for domain matching (Xie et al.: data
    * selection via importance resampling, the RedPajama-v2/DoReMi-era
    * alternative to a trained classifier): per-document log-importance
    * log(p_target/p_raw) under unigram bag-of-words models of the target
    * domain (the English subcorpus — the same curated proxy the quality
    * classifier trains on) vs the raw corpus, Laplace-smoothed over the
    * raw vocabulary. The paper hashes n-grams into buckets; with the
    * fixture's closed vocabulary the exact unigram table IS the bucketed
    * model (documented, not hidden).
    *
    * Determinism: each word's smoothed ratio is an exact rational
    * evaluated in one fixed double op chain, its log is e6-quantized at
    * the WORD level, and the document score is then an INTEGER sum of
    * count×lr_e6 — order-free, so partial aggregation cannot perturb it.
    * Plan shape: ONE explode pass into per-(doc, word) counts (cached —
    * raw/target model tables and the corpus totals all re-aggregate that
    * frame, which is shuffle-partial-combined and orders of magnitude
    * smaller than the token stream), two vocab-sized model tables + a
    * 1-row scalar frame (broadcast), one per-doc integer rollup — the
    * corpus never self-joins, exactly the lm_doc_score template. */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("doc_id"), col("lang"), col("w"))
      .agg(count(lit(1)).as("c"))
      // persist, consciously: the frame is read by the model tables AND
      // the final rollup inside one returned plan, so there is no point
      // after which this function could unpersist it. An eager
      // localCheckpoint would bound the lifetime (ContextCleaner) but
      // executes via toRdd WITHOUT adaptive execution — measured 2× on
      // the driver bench. The cache lives until the harness's
      // clearCache() between queries (Verify/Bench both call it) or
      // session end; it is one (doc, lang, word) count frame.
      .persist()
    val raw = perDoc.groupBy(col("w")).agg(sum(col("c")).as("cr"))
    val tgt = perDoc.filter(col("lang") === "en")
      .groupBy(col("w")).agg(sum(col("c")).as("ct"))
    val tot = raw.agg(sum(col("cr")).as("nr"), count(lit(1)).as("v"))
      .crossJoin(tgt.agg(coalesce(sum(col("ct")), lit(0L)).as("nt")))
    val model = raw
      .join(tgt, Seq("w"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("lr_e6",
        round(log(
          ((coalesce(col("ct"), lit(0L)) + 1).cast("double") *
            (col("nr") + col("v")).cast("double")) /
          ((col("cr") + 1).cast("double") *
            (col("nt") + col("v")).cast("double"))) * 1000000.0)
          .cast("long"))
      .select(col("w"), col("lr_e6"))
    perDoc.join(broadcast(model), "w")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("long").as("n_tokens"),
        sum(col("c") * col("lr_e6")).cast("long").as("dsir_e6"))
      .orderBy(col("doc_id"))
  }

  /** The filtering-funnel report every pipeline paper publishes: run the
    * quality battery as ORDERED stages (length → lexical diversity →
    * stopword fluency → character entropy) and report, per stage, how
    * many documents entered, survived, and were killed — the table that
    * tells you which filter is doing the work and which is dead weight.
    * Signals are the engine's own: integer-e4 ratios from one map pass
    * plus the X80 entropy frame joined by doc_id; the funnel itself is
    * one aggregation row stacked into 4 stage rows, so the whole report
    * costs one corpus pass + the entropy aggregation at any scale. */
  def filterFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ws = split(col("text"), " ")
    val stop = array(lrStopwords.map(lit): _*)
    val sig = Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(ws).as("n_words"),
        round(size(array_distinct(ws)) * lit(10000.0) / size(ws))
          .cast("long").as("uniq_e4"),
        round(size(filter(ws, w => array_contains(stop, w))) * lit(10000.0) /
          size(ws)).cast("long").as("stop_e4"))
      // LEFT join + coalesce-to-0: a document with no countable characters
      // (empty/whitespace-only) has no entropy row but must still ENTER
      // the funnel — it counts in n0 and dies at the stage its signals
      // fail, rather than vanishing from the report
      .join(TextQueries.charEntropy(spark, dir)
        .select(col("doc_id"), col("entropy_e6")), Seq("doc_id"), "left")
      .withColumn("entropy_e6", coalesce(col("entropy_e6"), lit(0L)))
    val staged = sig
      .withColumn("p1", col("n_words") >= 25)
      .withColumn("p2", col("p1") && (col("uniq_e4") >= 3500))
      .withColumn("p3", col("p2") && (col("stop_e4") >= 200))
      .withColumn("p4", col("p3") && (col("entropy_e6") >= 2750000L))
    staged
      .agg(
        count(lit(1)).as("n0"),
        sum(when(col("p1"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("p2"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("p3"), 1L).otherwise(0L)).as("n3"),
        sum(when(col("p4"), 1L).otherwise(0L)).as("n4"))
      .selectExpr(
        """stack(4,
          |  1, 'length',    n0, n1,
          |  2, 'diversity', n1, n2,
          |  3, 'stopwords', n2, n3,
          |  4, 'entropy',   n3, n4) AS (stage_no, stage, n_in, n_out)""".stripMargin)
      .withColumn("n_killed", col("n_in") - col("n_out"))
      .orderBy(col("stage_no"))
  }

  /** English-stopword list for the classifier's fluency feature — tiny on
    * purpose (the feature, not the list, is the point). */
  private val lrStopwords =
    Seq("the", "of", "and", "to", "a", "in", "is", "it", "that", "for")

  /** Per-document feature row for the quality classifier: bias, scaled
    * word count, lexical diversity (distinct/total), English-stopword
    * ratio; label y = (lang = 'en'). Every feature is a ratio/scale of
    * integer counts, so both engines start from bit-identical doubles. */
  private def lrFeatures(spark: SparkSession, dir: String): DataFrame = {
    val ws = split(col("text"), " ")
    val stop = array(lrStopwords.map(lit): _*)
    Tables.documents(spark, dir).select(
      col("doc_id"),
      lit(1.0).as("x0"),
      (size(ws) / lit(100.0)).as("x1"),
      (size(array_distinct(ws)).cast("double") / size(ws)).as("x2"),
      (size(filter(ws, w => array_contains(stop, w))).cast("double") / size(ws)).as("x3"),
      when(col("lang") === "en", lit(1.0)).otherwise(lit(0.0)).as("y"))
  }

  /** Trained classifier scores, stored once per (session, corpus): a
    * logistic-regression quality filter (the GPT-3/CCNet-style "curated
    * vs raw" classifier) trained INSIDE the engine by 5 full-batch
    * gradient-descent steps at lr=1. Each step is ONE aggregation over
    * the feature frame (gradient components partial-aggregate map-side;
    * only 4 doubles reach the driver), so training cost is 5 scans no
    * matter the corpus size — the model is tiny, the data never moves.
    *
    * Determinism across engines: each gradient component is e9-quantized
    * (`round(avg·1e9)` → integer) before the weight update, so Spark and
    * the oracle carry BIT-IDENTICAL weight doubles into every iteration —
    * float summation-order noise (~1e-15) is crushed against the e9 grid
    * each step instead of compounding. The final sigmoid is one exp per
    * row, e6-fixed at the boundary. */
  private def lrScores(spark: SparkSession, dir: String): DataFrame = {
    // the build block trains eagerly and stored() writes the result to
    // parquet before returning, so the training cache can (and must) be
    // released once stored() hands back the parquet-reading frame
    var feats: DataFrame = null
    val out = graft.scale.ShingleStore.stored(spark, dir, "lr-scores") {
      // cached for the 5 training scans; the frame is (doc_id, 4 doubles,
      // label) — far smaller than the corpus at any scale
      feats = lrFeatures(spark, dir).persist()
      val w = Array(0.0, 0.0, 0.0, 0.0)
      def z = lit(w(0)) * col("x0") + lit(w(1)) * col("x1") +
        lit(w(2)) * col("x2") + lit(w(3)) * col("x3")
      for (_ <- 1 to 5) {
        val p = lit(1.0) / (lit(1.0) + exp(-z))
        val g = feats.select(
          (0 to 3).map(j =>
            round(avg((col("y") - p) * col(s"x$j")) * lit(1000000000.0))
              .cast("long").as(s"g$j")): _*).head()
        for (j <- 0 to 3) w(j) += g.getLong(j) / 1.0e9
      }
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      feats.select(
        col("doc_id"),
        col("y").cast("long").as("label"),
        round(p * lit(1000000.0)).cast("long").as("score_e6"))
    }
    if (feats != null) feats.unpersist()
    out
  }

  /** Per-document quality score from the corpus-trained logistic
    * regression — the filter a pre-training pipeline thresholds on. */
  def qualityClassifier(spark: SparkSession, dir: String): DataFrame =
    lrScores(spark, dir).orderBy(col("doc_id"))

  /** ROC-AUC of the trained classifier (Mann-Whitney U with the standard
    * half-credit tie handling). Scale shape: scores aggregate per
    * `score_e6` FIRST — the e6 grid bounds the distinct domain at ~1e6
    * values no matter the corpus size — then the cumulative negative
    * count is a TWO-LEVEL prefix sum so no single reducer ever sees the
    * whole histogram: a window PARTITIONED by a width-100 score bucket
    * (≤100 histogram rows each — the e6 grid holds 100 distinct scores
    * per bucket) plus per-bucket prior offsets whose count is
    * hard-bounded at 10001 by the e6 grid itself — that bound (not the
    * data) is what licenses the one driver-side prefix scan. All inputs
    * are integers (and exact .5 halves), so U is exact in both engines.
    * byScore is deliberately NOT cached: both of its readers scan the
    * stored lr-scores parquet, and an un-unpersisted cache would outlive
    * the query. */
  def classifierAuc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byScore = lrScores(spark, dir)
      .groupBy(col("score_e6"))
      .agg(sum(col("label")).as("np"), sum(lit(1) - col("label")).as("nn"))
      .withColumn("bucket", expr("score_e6 DIV 100"))
    val totals = byScore.groupBy(col("bucket")).agg(sum(col("nn")).as("bnn"))
      .orderBy(col("bucket")).collect() // ≤ 10001 rows by the e6 grid
    var acc = 0L
    val priors = totals.map { r =>
      val p = acc; acc += r.getLong(1); (r.getLong(0), p)
    }.toSeq.toDF("bucket", "prior_nn")
    val within = Window.partitionBy(col("bucket")).orderBy(col("score_e6"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val contrib = byScore
      .join(broadcast(priors), "bucket")
      .withColumn(
        "cum_nn",
        col("prior_nn") + coalesce(sum(col("nn")).over(within), lit(0L)))
      .select(
        col("np"), col("nn"),
        (col("np") * (col("cum_nn") + col("nn") / lit(2.0))).as("u"))
    contrib.agg(
      sum(col("np")).cast("long").as("n_pos"),
      sum(col("nn")).cast("long").as("n_neg"),
      round(sum(col("u")) / (sum(col("np")) * sum(col("nn"))) * lit(1000000.0))
        .cast("long").as("auc_e6"))
  }

  /** Shared WITH-prefix for the classifier oracles: features + the same
    * 5 e9-quantized gradient steps unrolled as CTE pairs (g_i, w_i) —
    * arithmetic matches [[lrScores]] op for op. */
  private def lrStep(prev: String, g: String, cur: String): String = {
    def dot(w: String) = s"$w.w0*x0 + $w.w1*x1 + $w.w2*x2 + $w.w3*x3"
    val comps = (0 to 3).map(j =>
      s"CAST(ROUND(AVG((y - 1.0/(1.0 + EXP(-(${dot("w")}))))*x$j)*1000000000.0) AS BIGINT) AS g$j")
      .mkString(",\n    ")
    s"""$g AS (
       |  SELECT $comps
       |  FROM f, $prev w),
       |$cur AS (
       |  SELECT w.w0 + g.g0/1000000000.0 AS w0, w.w1 + g.g1/1000000000.0 AS w1,
       |         w.w2 + g.g2/1000000000.0 AS w2, w.w3 + g.g3/1000000000.0 AS w3
       |  FROM $prev w, $g g)""".stripMargin
  }

  private val lrSqlPrefix: String = {
    val stopList = lrStopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH f AS (
       |  SELECT doc_id,
       |    1.0 AS x0,
       |    len(string_split(text, ' ')) / 100.0 AS x1,
       |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS x2,
       |    CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS x3,
       |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
       |  FROM documents),
       |w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
       |${(1 to 5).map(i => lrStep(s"w${i - 1}", s"g$i", s"w$i")).mkString(",\n")},
       |s AS (
       |  SELECT doc_id, CAST(y AS BIGINT) AS label,
       |    CAST(ROUND(1.0/(1.0 + EXP(-(w.w0*x0 + w.w1*x1 + w.w2*x2 + w.w3*x3)))*1000000.0) AS BIGINT) AS score_e6
       |  FROM f, w5 w)""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_classifier" -> (qualityClassifier _),
    "classifier_auc" -> (classifierAuc _),
    "dsir_weights" -> (dsirWeights _),
    "filter_funnel" -> (filterFunnel _),
    "bpe_tokenize" -> (bpeTokenize _),
    "bpe_segments" -> (bpeSegments _),
    "deterministic_split" -> (deterministicSplit _),
    "tfidf_topterms" -> (tfidfTopterms _),
    "redact_pii" -> (redactPii _),
    "data_mix" -> (dataMix _),
    "stratified_sample" -> (stratifiedSample _),
    "priority_sample" -> (prioritySample _),
    "token_packing" -> (tokenPacking _),
    "split_contamination" -> (splitContamination _)
  )

  val oracles: Map[String, String] = Map(
    "priority_sample" -> (
      "WITH s AS (\n" +
      "  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,\n  " +
      hexFoldSql("md5('wsamp:' || CAST(doc_id AS STRING))") + " AS h\n" +
      "  FROM documents)\n" +
      "SELECT doc_id, w, h FROM s\n" +
      "ORDER BY CAST(h AS DOUBLE) / CAST(w AS DOUBLE), doc_id LIMIT 20"),
    "quality_classifier" ->
      s"""$lrSqlPrefix
         |SELECT doc_id, label, score_e6 FROM s ORDER BY doc_id""".stripMargin,
    // rank formulation of the same U statistic the engine computes via the
    // bounded score histogram: avg rank = min rank + (ties-1)/2; both are
    // exact integer/half arithmetic, so the two forms agree exactly
    "classifier_auc" ->
      s"""$lrSqlPrefix,
         |r AS (
         |  SELECT label,
         |    RANK() OVER (ORDER BY score_e6)
         |      + (COUNT(*) OVER (PARTITION BY score_e6) - 1) / 2.0 AS ar
         |  FROM s),
         |a AS (
         |  SELECT SUM(CASE WHEN label = 1 THEN ar END) AS rsum,
         |         SUM(label) AS n1, SUM(1 - label) AS n0
         |  FROM r)
         |SELECT CAST(n1 AS BIGINT) AS n_pos, CAST(n0 AS BIGINT) AS n_neg,
         |  CAST(ROUND((rsum - n1*(n1 + 1)/2.0) / (n1*n0) * 1000000.0) AS BIGINT) AS auc_e6
         |FROM a""".stripMargin,
    // signals recomputed from scratch (entropy chain inlined from the
    // char_entropy oracle); stages are ordered conjunctions; funnel rows
    // stacked from one aggregate row
    "filter_funnel" -> {
      val stopList = lrStopwords.map(s => s"'$s'").mkString(", ")
      s"""WITH ch AS (
         |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
         |cc AS (
         |  SELECT doc_id, ch, COUNT(*) AS c FROM ch WHERE ch <> '' GROUP BY 1, 2),
         |ent AS (
         |  SELECT doc_id,
         |    CAST(ROUND((CAST(SUM(c) AS DOUBLE)
         |        * CAST(CAST(ROUND(ln(SUM(c)) * 1000000.0) AS BIGINT) AS DOUBLE)
         |      - CAST(SUM(c * CAST(ROUND(ln(c) * 1000000.0) AS BIGINT)) AS DOUBLE))
         |      / CAST(SUM(c) AS DOUBLE)) AS BIGINT) AS entropy_e6
         |  FROM cc GROUP BY doc_id),
         |sg AS (
         |  SELECT d.doc_id, len(ws) AS n_words,
         |    CAST(round(len(list_distinct(ws)) * 10000.0 / len(ws)) AS BIGINT) AS uniq_e4,
         |    CAST(round(len(list_filter(ws, w -> w IN ($stopList))) * 10000.0 / len(ws)) AS BIGINT) AS stop_e4,
         |    COALESCE(e.entropy_e6, 0) AS entropy_e6
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) d
         |  LEFT JOIN ent e USING (doc_id)),
         |st AS (
         |  SELECT (n_words >= 25) AS p1,
         |    (n_words >= 25 AND uniq_e4 >= 3500) AS p2,
         |    (n_words >= 25 AND uniq_e4 >= 3500 AND stop_e4 >= 200) AS p3,
         |    (n_words >= 25 AND uniq_e4 >= 3500 AND stop_e4 >= 200
         |      AND entropy_e6 >= 2750000) AS p4
         |  FROM sg),
         |a AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n0,
         |    CAST(SUM(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(SUM(CASE WHEN p2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         |    CAST(SUM(CASE WHEN p3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
         |    CAST(SUM(CASE WHEN p4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
         |  FROM st)
         |SELECT CAST(1 AS INT) AS stage_no, 'length' AS stage, n0 AS n_in, n1 AS n_out, n0 - n1 AS n_killed FROM a
         |UNION ALL SELECT 2, 'diversity', n1, n2, n1 - n2 FROM a
         |UNION ALL SELECT 3, 'stopwords', n2, n3, n2 - n3 FROM a
         |UNION ALL SELECT 4, 'entropy', n3, n4, n3 - n4 FROM a
         |ORDER BY stage_no""".stripMargin
    },
    // ratio evaluated in the same fixed double op chain, ln e6-quantized
    // per WORD, then an integer count×lr_e6 sum per document
    "dsir_weights" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |t2 AS (SELECT * FROM toks WHERE w <> ''),
        |perdoc AS (SELECT doc_id, w, COUNT(*) AS c FROM t2 GROUP BY 1, 2),
        |raw AS (SELECT w, COUNT(*) AS cr FROM t2 GROUP BY 1),
        |tgt AS (SELECT w, COUNT(*) AS ct FROM t2 WHERE lang = 'en' GROUP BY 1),
        |tot AS (
        |  SELECT SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS nt,
        |    COUNT(*) AS nr, COUNT(DISTINCT w) AS v
        |  FROM t2),
        |model AS (
        |  SELECT r.w, CAST(ROUND(ln(
        |      (CAST(COALESCE(ct, 0) + 1 AS DOUBLE) * CAST(nr + v AS DOUBLE)) /
        |      (CAST(cr + 1 AS DOUBLE) * CAST(nt + v AS DOUBLE))) * 1000000.0)
        |    AS BIGINT) AS lr_e6
        |  FROM raw r LEFT JOIN tgt USING (w), tot)
        |SELECT p.doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  CAST(SUM(c * lr_e6) AS BIGINT) AS dsir_e6
        |FROM perdoc p JOIN model m USING (w)
        |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin,
    "bpe_segments" ->
      """SELECT doc_id, CAST(length(replace(text, ' ', '')) AS BIGINT) AS token_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "data_mix" ->
      """WITH s AS (
        |  SELECT source, doc_id,
        |    TRY_CAST(regexp_replace(source, '[^0-9]', '', 'g') AS INT) % 4 AS tier,
        |    substring(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 2) AS h2
        |  FROM documents),
        |k AS (
        |  SELECT source, doc_id,
        |    CASE WHEN tier = 0 THEN TRUE
        |         WHEN tier = 1 THEN h2 < '80'
        |         WHEN tier = 2 THEN h2 < '40'
        |         ELSE h2 < '1a' END AS keep
        |  FROM s)
        |SELECT source, COUNT(*) AS n_total,
        |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN keep THEN doc_id ELSE 0 END) AS BIGINT) AS id_checksum
        |FROM k GROUP BY source ORDER BY source""".stripMargin,
    "deterministic_split" ->
      s"""WITH s AS (
        |  SELECT lang, n_chars, ${SplitRule.sql("doc_id")} AS split
        |  FROM documents)
        |SELECT lang, split, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM s GROUP BY lang, split ORDER BY lang, split""".stripMargin,
    "tfidf_topterms" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents WHERE doc_id < 200),
        |tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM toks
        |  WHERE term <> '' GROUP BY doc_id, term),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents WHERE doc_id < 200),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |    CAST(round(CAST(tf.tf AS DOUBLE) * (n.n_docs + 1) / (dfreq.df + 1) * 10000) AS BIGINT) AS score_e4
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, score_e4,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score_e4 DESC, term) AS rank
        |  FROM scored)
        |SELECT doc_id, rank, term, score_e4 FROM ranked
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "redact_pii" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |           '@example.com or call 55512345' || CAST(doc_id AS VARCHAR)
        |      ELSE text END AS t
        |  FROM documents WHERE doc_id < 300)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[a-z0-9._]+@[a-z0-9.]+\.[a-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '[0-9]{6,}')) AS INT) AS n_digit_runs,
        |  substring(sha256(
        |    regexp_replace(regexp_replace(t, '[a-z0-9._]+@[a-z0-9.]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |      '[0-9]{6,}', '<NUM>', 'g')), 1, 16) AS redacted_fp
        |FROM p ORDER BY doc_id""".stripMargin,
    "stratified_sample" ->
      """WITH s AS (
        |  SELECT lang, doc_id,
        |    md5('strat:' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |r AS (
        |  SELECT lang, doc_id, h,
        |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS sample_rank
        |  FROM s)
        |SELECT lang, sample_rank, doc_id,
        |  substring(h, 1, 8) AS hash8
        |FROM r WHERE sample_rank <= 20 ORDER BY lang, sample_rank""".stripMargin,
    "token_packing" ->
      """WITH t AS (
        |  SELECT lang, doc_id, len(string_split(text, ' ')) AS n_toks
        |  FROM documents),
        |c AS (
        |  SELECT lang, doc_id, n_toks,
        |    COALESCE(SUM(n_toks) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |  FROM t)
        |SELECT lang, CAST(floor(cum / 2048) AS BIGINT) AS batch_id,
        |  COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS batch_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2 ORDER BY lang, batch_id""".stripMargin,
    "split_contamination" ->
      s"""WITH d AS (
        |  SELECT doc_id, text, ${SplitRule.sql("doc_id")} AS split
        |  FROM documents WHERE doc_id < 1000),
        |w AS (
        |  SELECT doc_id, split, string_split(text, ' ') AS ws FROM d
        |  WHERE split IN ('test', 'train') AND len(string_split(text, ' ')) >= 3),
        |sh AS (
        |  SELECT DISTINCT doc_id, split, sh FROM (
        |    SELECT doc_id, split,
        |      unnest(list_transform(generate_series(1, len(ws) - 2),
        |        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
        |    FROM w))
        |SELECT t.doc_id AS test_doc, r.doc_id AS train_doc, COUNT(*) AS shared
        |FROM sh t JOIN sh r ON t.sh = r.sh
        |WHERE t.split = 'test' AND r.split = 'train'
        |GROUP BY 1, 2 HAVING COUNT(*) >= 5
        |ORDER BY test_doc, train_doc""".stripMargin
  )
}
