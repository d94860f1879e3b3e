package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Signature-based near-duplicate detection at corpus scale — MinHash+LSH
  * banding and SimHash (SURVEY.md §2.3 X1). Pure DataFrame/Catalyst
  * pipelines (xxhash64 is codegen'd), deterministic for a fixed corpus, but
  * engine-hash-dependent — so these are declared without DuckDB oracles and
  * pinned by NearDupSpec against the exact-Jaccard ground truth instead.
  *
  * 100 TB shape: signatures are one groupBy per doc (shuffle = docs × k
  * longs, not corpus bytes); banding turns all-pairs comparison into a
  * groupBy on (band index, band hash) — only same-bucket docs ever meet,
  * and the final exact-Jaccard verify touches candidate pairs only.
  */
object NearDup {

  val NumHashes = 32
  val Bands = 8 // 4 rows per band → catches pairs from ~0.5 Jaccard up

  /** Distinct word-3-gram shingles per document. The split is
    * materialized ONCE per row before the gram lambda — an
    * element_at(split(...)) inside transform() re-tokenizes the document
    * for every gram element, O(words²) per doc. */
  def shingles(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    docs
      .select(col(idCol), split(col(textCol), " ").as("__ws"))
      .filter(size(col("__ws")) >= 3)
      .select(col(idCol),
        explode(transform(
          sequence(lit(0), size(col("__ws")) - 3),
          i => concat_ws(" ", element_at(col("__ws"), i + 1),
            element_at(col("__ws"), i + 2), element_at(col("__ws"), i + 3))))
          .as("sh"))
      .distinct()
  }

  /** k-way MinHash signature: one row per doc with columns mh0..mh{k-1},
    * where mh_i = min over shingles of xxhash64(i, shingle). One shuffle. */
  def minhashSignatures(sh: DataFrame, k: Int = NumHashes): DataFrame = {
    val aggs = (0 until k).map(i => min(xxhash64(lit(i), col("sh"))).as(s"mh$i"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: explode each signature into (band_idx, band_hash) keys;
    * docs sharing any band key are candidate pairs.
    *
    * `maxBandDocs` is the hot-bucket guard for skewed corpora: a band
    * bucket holding f docs produces f²/2 candidate pairs, so one
    * degenerate bucket (e.g. a boilerplate header shared by millions of
    * docs) can dominate the whole join. Buckets larger than the cap are
    * dropped — their members are so common that any pair they'd surface
    * is either boilerplate or still reachable through another band. */
  def bandedCandidates(sig: DataFrame, k: Int = NumHashes, bands: Int = Bands,
      maxBandDocs: Int = Int.MaxValue): DataFrame = {
    val banded = bandKeys(sig, k, bands, maxBandDocs)
    banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
  }

  /** Cross-set banded candidates: pairs (a from `sigNew`, b from
    * `sigOld`) sharing a band key — the incremental-dedup shape, where a
    * nightly batch screens against the existing corpus WITHOUT the
    * corpus ever comparing against itself (the old×old pairs were
    * handled when those docs arrived). In production the corpus side's
    * signatures are precomputed and stored; cost is the band join of
    * |new| exploded keys against the corpus keys. `maxBandDocs` caps
    * bucket size on the corpus side (the blow-up side). */
  def bandedCandidatesBetween(sigNew: DataFrame, sigOld: DataFrame,
      k: Int = NumHashes, bands: Int = Bands,
      maxBandDocs: Int = Int.MaxValue): DataFrame =
    bandKeys(sigNew, k, bands, Int.MaxValue).as("a")
      .join(bandKeys(sigOld, k, bands, maxBandDocs).as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          // a re-crawled doc present on BOTH sides under the same id
          // would trivially band-match itself and verify as its own dup
          col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()

  /** (band_idx, band_hash) keys per doc, optionally dropping hot buckets
    * (see [[bandedCandidates]] for the f²/2 rationale). */
  private def bandKeys(sig: DataFrame, k: Int, bands: Int, maxBandDocs: Int): DataFrame = {
    require(k % bands == 0,
      s"k ($k) must be divisible by bands ($bands): integer-division row " +
        "width would silently drop the trailing k % bands minhash columns")
    val rows = k / bands
    val bandCols: Seq[Column] = (0 until bands).map { b =>
      val cols = (b * rows until (b + 1) * rows).map(i => col(s"mh$i"))
      struct(lit(b).as("band_idx"), xxhash64(cols: _*).as("band_hash"))
    }
    val exploded = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band_idx"), col("bk.band_hash"))
    if (maxBandDocs == Int.MaxValue) exploded
    else {
      val hot = exploded.groupBy(col("band_idx"), col("band_hash"))
        .agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") > maxBandDocs)
        .select(col("band_idx"), col("band_hash"))
      exploded.join(broadcast(hot), Seq("band_idx", "band_hash"), "left_anti")
    }
  }

  /** (a_id, b_id, inter, uni) for the given candidate pairs against the
    * shingle sets — the exact-Jaccard verification core, shared by the
    * MinHash pipeline (candidates from banding) and the oracle-checked
    * all-sharing-pairs form (DedupQueries.ngramJaccard). */
  def jaccardOnPairs(sh: DataFrame, pairs: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    pairs
      .join(sh.as("sa"), col("a_id") === col("sa.doc_id"))
      .join(sh.as("sb"), col("b_id") === col("sb.doc_id") && col("sa.sh") === col("sb.sh"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(sizes.as("na")), col("a_id") === col("na.doc_id"))
      .join(broadcast(sizes.as("nb")), col("b_id") === col("nb.doc_id"))
      .select(col("a_id"), col("b_id"), col("inter"),
        (col("na.n") + col("nb.n") - col("inter")).as("uni"))
  }

  /** Exact Jaccard for every pair sharing ≥1 shingle (no signatures —
    * ground truth / oracle form; quadratic only within co-shingle groups).
    *
    * `maxShingleDf` caps the document frequency of shingles used for PAIR
    * GENERATION only: a stop-word 3-gram appearing in f docs creates an
    * f²/2 pair group, the unbounded hot-key blowup at corpus scale.
    * Dropping a df>cap shingle from pairing never changes the Jaccard of
    * a surfaced pair (inter/uni still count the full shingle sets) — it
    * can only lose pairs whose ONLY shared shingles are ubiquitous, i.e.
    * pairs whose Jaccard is ≤ (shared hot shingles)/union — far below any
    * useful near-dup threshold. NearDupSpec pins cap-on == cap-off on the
    * fixture at threshold 0.2. */
  def exactJaccardPairs(sh: DataFrame, maxShingleDf: Int = Int.MaxValue): DataFrame = {
    val pairGen =
      if (maxShingleDf == Int.MaxValue) sh
      else {
        val hot = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
          .filter(col("df") > maxShingleDf)
          .select(col("sh"))
        sh.join(broadcast(hot), Seq("sh"), "left_anti")
      }
    val pairs = pairGen.as("a")
      .join(pairGen.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    jaccardOnPairs(sh, pairs)
  }

  /** Full MinHash near-dup pipeline: candidates from banding, then exact
    * Jaccard verification on the candidate pairs only. Returns pairs with
    * jaccard ≥ `threshold`. More bands (with k/bands rows each) raise the
    * candidate probability 1-(1-J^rows)^bands — k=64/bands=32 makes misses
    * at J ≥ 0.5 vanishingly rare, which is what the oracle-checked
    * `minhash_precision` parameterization relies on. `maxBandDocs` is the
    * hot-bucket guard (see [[bandedCandidates]]). */
  def minhashNearDups(docs: DataFrame, threshold: Double = 0.5,
      k: Int = NumHashes, bands: Int = Bands,
      maxBandDocs: Int = Int.MaxValue): DataFrame =
    minhashNearDupsOnShingles(shingles(docs), threshold, k, bands, maxBandDocs)

  /** Same pipeline over a PREBUILT shingle frame — the production entry
    * point, where shingles are precomputed-and-stored at ingest
    * (ShingleStore) rather than rebuilt per screen. */
  def minhashNearDupsOnShingles(sh: DataFrame, threshold: Double = 0.5,
      k: Int = NumHashes, bands: Int = Bands,
      maxBandDocs: Int = Int.MaxValue): DataFrame = {
    val cands = bandedCandidates(minhashSignatures(sh, k), k, bands, maxBandDocs)
    jaccardOnPairs(sh, cands)
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("inter"), col("uni"),
        round(col("jaccard") * 10000).cast("long").as("jacc_e4"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Embedding-cosine near-dup with IVF-cell blocking — the production
    * block key the label-blocked oracle query (DedupQueries
    * .embeddingNeardup) stands in for: vectors only compare within a
    * shared cell, so pair count is Σ|cell|² instead of n², and the same
    * cell layout that serves ANN search serves dedup. Recall loss is the
    * boundary pairs whose members quantize to different cells;
    * `multiProbe` ≥ 2 assigns each vector to its top-p cells (explode,
    * p× shuffle volume) so boundary pairs meet in the second-best cell —
    * the standard multi-probe recall recovery. NearDupSpec measures both
    * modes against the exact join. */
  def cosineNearDupsByCell(assigned: DataFrame, simThreshold: Double,
      centroids: Array[Array[Float]] = null, multiProbe: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(multiProbe <= 1 || centroids != null,
      "multiProbe > 1 needs the centroids to rank alternate cells")
    val base =
      if (multiProbe <= 1) assigned.select(col(idCol), col(vecCol), col("cell"))
      else {
        // UNION with the stored cell: Ivf.build now assigns through the
        // same float-centroid kernel, so for its output the top-1 probe
        // duplicates the stored cell (dropDuplicates absorbs it) — but
        // `assigned` is caller-supplied, and multi-probe must stay a
        // strict superset of whatever single-probe layout came in
        assigned.select(col(idCol), col(vecCol), col("cell"))
          .unionByName(assigned.select(col(idCol), col(vecCol),
            explode(Ivf.nearestCellsCol(centroids, col(vecCol), multiProbe))
              .as("cell")))
          .dropDuplicates(idCol, "cell")
      }
    val e = base.withColumn("nrm",
      sqrt(graft.core.VectorOps.dot(col(vecCol), col(vecCol))))
    val sim = graft.core.VectorOps.dot(col(s"a.$vecCol"), col(s"b.$vecCol")) /
      (col("a.nrm") * col("b.nrm"))
    val pairs = e.as("a")
      .join(e.as("b"),
        col("a.cell") === col("b.cell") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("a_id"), col(s"b.$idCol").as("b_id"), sim.as("sim"))
      .filter(col("sim") >= simThreshold) // filter BEFORE any dedup shuffle
    // only multi-probe can produce a pair twice (same sim both times);
    // the single-probe hot path must not pay a dedup shuffle for nothing
    (if (multiProbe > 1) pairs.distinct() else pairs)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Bit-parallel SimHash core: majority vote of token-hash bits,
    * token-frequency weighted — explode tokens → `bits` conditional sums
    * in ONE aggregation (the shuffle carries one row of `bits` longs per
    * doc, never per-token rows past the partial agg). `tokenHash` maps the
    * token column to a long whose low `bits` bits are the vote source. */
  private def signaturesWith(docs: DataFrame, idCol: String, textCol: String,
      tokenHash: Column => Column, bits: Int): DataFrame = {
    val toks = docs.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("h", tokenHash(col("tok")))
    val bitSums = (0 until bits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$b")
    }
    val summed = toks.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until bits)
      .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    summed.select(col(idCol), sim.as("simhash"))
  }

  /** Chunk-banded candidate pairs + exact Hamming verify over a signature
    * frame: any pair within distance < `chunks` must agree on at least one
    * of the equal-width chunks (pigeonhole), so banding is COMPLETE for
    * maxHamming ≤ chunks - 1 — enforced when `requireComplete` (the
    * oracle-checked parameterization); the headline form runs looser
    * thresholds where banding is a deliberate recall/cost trade, like
    * every LSH. Pair count is Σ_bucket f²/2 over chunk-value buckets,
    * never all-pairs. */
  private def bandedHamming(sig: DataFrame, bits: Int, chunks: Int,
      maxHamming: Int, requireComplete: Boolean,
      idCol: String = "doc_id"): DataFrame = {
    require(bits % chunks == 0, s"chunks ($chunks) must divide bits ($bits)")
    require(!requireComplete || maxHamming < chunks,
      s"pigeonhole completeness needs maxHamming ($maxHamming) < chunks ($chunks)")
    val width = bits / chunks
    val mask = (1L << width) - 1
    val keyed = sig.select(col(idCol).as("doc_id"), col("simhash"),
      explode(array((0 until chunks).map(c =>
        struct(lit(c).as("chunk_idx"),
          shiftright(col("simhash"), c * width).bitwiseAND(mask).as("chunk_val"))): _*)).as("ck"))
      .select(col("doc_id"), col("simhash"), col("ck.chunk_idx"), col("ck.chunk_val"))
    keyed.as("a")
      .join(keyed.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** 64-bit SimHash per document (xxhash64 token hash — the fast
    * engine-native headline form). */
  def simhashSignatures(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    signaturesWith(docs, idCol, textCol, xxhash64(_), bits = 64)

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, blocked on
    * 16-bit signature chunks (any pair within distance 3 must agree on at
    * least one of the 4 chunks — pigeonhole). */
  def simhashNearDups(docs: DataFrame, maxHamming: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    bandedHamming(simhashSignatures(docs, idCol, textCol), bits = 64, chunks = 4,
      maxHamming = maxHamming, requireComplete = false, idCol = idCol)

  /** 60-bit SimHash with an engine-PORTABLE token hash — the top 15 hex
    * chars of md5 parsed as an integer — so an external SQL engine can
    * recompute the signature bit for bit. Same bit-parallel plan as the
    * headline form; only the per-token hash expression differs. */
  def simhashSignaturesPortable(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    signaturesWith(docs, idCol, textCol,
      t => conv(substring(md5(t), 1, 15), 16, 10).cast("long"), bits = 60)

  /** The oracle-checkable simhash parameterization: portable 60-bit
    * signatures, 6 chunks of 10 bits (pigeonhole-complete for Hamming ≤ 5),
    * exact bit_count verify — every stage (signature majority vote, chunk
    * banding, XOR distance) is reproducible by an external engine, so the
    * banded pipeline's output must equal the ALL-PAIRS Hamming screen the
    * oracle runs: a banding bug that drops a candidate breaks the row
    * match, not just a recall metric. */
  def simhashNearDupsPortable(docs: DataFrame, maxHamming: Int = 5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    bandedHamming(simhashSignaturesPortable(docs, idCol, textCol), bits = 60, chunks = 6,
      maxHamming = maxHamming, requireComplete = true, idCol = idCol)
}
