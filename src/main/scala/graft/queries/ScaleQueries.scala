package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal
import graft.scale.{Ivf, LshJoin, NearDup, Pq}

/** Declared entries for the scale-out operators (SURVEY.md §2.3): MinHash/
  * SimHash near-dup, IVF ANN search, LSH similarity join, multimodal
  * columns. Signature/ANN operators depend on engine hash functions or
  * MLlib models, so they carry no DuckDB oracle (driver rows-only check);
  * their semantics are pinned by ScaleSpec against exact ground truth.
  * `multimodal_meta` is exact and oracle-checked.
  */
object ScaleQueries {

  /** One default-parameter IVF index per (session, fixture dir):
    * ivf_topk and ivf_precision probe the SAME index — as in production,
    * where the index is built once and served to every query — so the
    * declared surface doesn't pay (or time) two KMeans fits. Determinism
    * is unaffected: build is seeded, and reruns reuse the identical
    * index. */
  // keyed by sessionUUID, not the session reference (identityHashCode can
  // be reused after GC) and not a weak key (the Index's DataFrame strongly
  // references its session, which would defeat a WeakHashMap). Retention
  // is therefore bounded by sessions-per-JVM × fixture dirs — a handful of
  // entries in every real process shape (one session for Verify/Bench/
  // tests), never served across sessions.
  private val indexMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), Ivf.Index]
  private def defaultIndex(spark: SparkSession, dir: String): Ivf.Index =
    indexMemo.getOrElseUpdate(
      (org.apache.spark.sql.graftbridge.ColumnBridge.sessionUuid(spark), dir),
      Ivf.build(spark, Tables.embeddings(spark, dir)))

  /** PQ layers on the shared IVF index, memoized the same way — one
    * compressed variant (the production shape) and one lossless variant
    * (ksub ≥ every distinct residual sub-vector at fixture scales, so
    * encoding is exact — the oracle parameterization). */
  private val pqMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), Pq.Index]
  private def pqIndex(spark: SparkSession, dir: String, variant: String): Pq.Index =
    pqMemo.getOrElseUpdate(
      (org.apache.spark.sql.graftbridge.ColumnBridge.sessionUuid(spark), dir, variant),
      variant match {
        case "compressed" =>
          Pq.build(defaultIndex(spark, dir), m = 8, ksub = 256, sampleCap = 2048)
        case "lossless" =>
          // oracle-regime configuration: the unbounded driver sample is
          // explicitly acknowledged (Pq.build requires it)
          Pq.build(defaultIndex(spark, dir), m = 8, ksub = 4096,
            sampleCap = Int.MaxValue, allowUnboundedSample = true)
      })

  /** Sharded NSW graph (Nsw) per (session, fixture dir), cached: both
    * nsw_topk and nsw_precision beam-search the SAME persisted graph,
    * as a serving deployment would. */
  private val nswMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
  private def nswGraph(spark: SparkSession, dir: String): DataFrame =
    nswMemo.getOrElseUpdate(
      (org.apache.spark.sql.graftbridge.ColumnBridge.sessionUuid(spark), dir),
      graft.scale.Nsw.build(Tables.embeddings(spark, dir), numShards = 4).cache())

  /** NSW graph beam search: top-13 for the vec_id=0 query at working
    * beam width (ef=48). Rows-only headline (graph topology depends on
    * insertion geometry no SQL oracle can replay); NswSpec pins recall
    * vs exact ground truth and nsw_precision pins the identical
    * machinery exhaustively. */
  def nswTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    graft.scale.Nsw.search(nswGraph(spark, dir), q, k = 13, ef = 48)
      .select(col("vec_id"), round(col("dist") * 10000).cast("long").as("dist_e4"))
  }

  /** NSW with an exhaustive beam (ef ≥ any shard size): NSW graphs are
    * connected by construction, so an unbounded beam visits every node
    * and the per-shard results merge to exact brute-force top-13 — the
    * whole build/link/prune/beam chain must reproduce it or the hash
    * breaks. Same oracle as ivf_precision. */
  def nswPrecision(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    graft.scale.Nsw.search(nswGraph(spark, dir), q, k = 13, ef = Int.MaxValue)
      .select(col("vec_id"), round(col("dist") * 10000).cast("long").as("dist_e4"))
  }

  /** FILTERED graph search at the exact regime: the metadata predicate
    * (label % 4 = 1, the `ivf_filtered_precision` predicate — Chroma's
    * `where=` applies to its HNSW serving path too, app.py:409) rides
    * INSIDE the beam via the admitted-id flag, so matching rows can't
    * be crowded out of a bounded beam by closer non-matching ones; at
    * unbounded ef the result must equal brute force over the filtered
    * corpus — graph traversal THROUGH filtered-out nodes included, or
    * matching regions behind them go missing and the hash breaks. */
  def nswFilteredPrecision(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    graft.scale.Nsw.search(nswGraph(spark, dir), q, k = 13, ef = Int.MaxValue,
        admitted = emb.filter(col("label") % 4 === 1).select(col("vec_id")))
      .select(col("vec_id"), round(col("dist") * 10000).cast("long").as("dist_e4"))
  }

  /** [[nswFilteredPrecision]] through the HNSW hierarchy: descent stays
    * unfiltered navigation, the layer-0 beam admits only matching rows
    * — exhaustive beam ⇒ equality with filtered brute force. */
  def hnswFilteredPrecision(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    graft.scale.Nsw.searchHnsw(hnswGraph(spark, dir), q, k = 13, ef = Int.MaxValue,
        admitted = emb.filter(col("label") % 4 === 1).select(col("vec_id")))
      .select(col("vec_id"), round(col("dist") * 10000).cast("long").as("dist_e4"))
  }

  /** Sharded HNSW graph (hierarchical layers over the same guarded
    * construction) per (session, dir), cached: hnsw_topk and
    * hnsw_precision descend the SAME persisted hierarchy. */
  private val hnswMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
  private def hnswGraph(spark: SparkSession, dir: String): DataFrame =
    hnswMemo.getOrElseUpdate(
      (org.apache.spark.sql.graftbridge.ColumnBridge.sessionUuid(spark), dir),
      graft.scale.Nsw.buildHnsw(Tables.embeddings(spark, dir), numShards = 4).cache())

  /** HNSW beam search: top-13 for the vec_id=0 query at working beam
    * width (ef=48), entering through the layer hierarchy's top and
    * descending coarse-to-fine. Rows-only headline (layer topology
    * depends on insertion geometry no SQL oracle can replay); NswSpec
    * pins recall vs the flat graph and hnsw_precision pins the identical
    * machinery exhaustively. */
  def hnswTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    graft.scale.Nsw.searchHnsw(hnswGraph(spark, dir), q, k = 13, ef = 48)
      .select(col("vec_id"), round(col("dist") * 10000).cast("long").as("dist_e4"))
  }

  /** HNSW with an exhaustive layer-0 beam: the hierarchy only picks the
    * entry point, and layer 0 is connected by the guarded construction,
    * so an unbounded beam visits every node and the per-shard results
    * merge to exact brute-force top-13 — descent, layer assignment, and
    * the base graph must all compose correctly or the hash breaks. Same
    * oracle as nsw_precision. */
  def hnswPrecision(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    graft.scale.Nsw.searchHnsw(hnswGraph(spark, dir), q, k = 13, ef = Int.MaxValue)
      .select(col("vec_id"), round(col("dist") * 10000).cast("long").as("dist_e4"))
  }

  /** Batch k-NN join over the flat NSW shard graphs: 30 query vectors
    * fan out to every shard, each shard task rebuilds its graph once and
    * beams all of them, WindowGroupLimit merges the global per-query
    * top-5 — the offline-eval shape of [[nswTopk]]. Rows-only headline;
    * NswSpec pins recall against the exact join and equality at an
    * unbounded beam. */
  def nswKnnJoin(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    graft.scale.Nsw.knnJoin(nswGraph(spark, dir),
        emb.filter(col("vec_id") < 30), k = 5, ef = 48)
      .select(col("q_id"), col("rn"), col("n_id"),
        round(col("d") * 10000).cast("long").as("dist_e4"))
  }

  /** The batch graph join at an UNBOUNDED beam: connected shard graphs
    * make every shard search exhaustive, so the distributed fan-out +
    * cogroup + WindowGroupLimit merge must reproduce the exact per-query
    * top-5 (self-matches at d = 0 included — the join's documented
    * identity) the oracle brute-forces — the driver-visible row for the
    * exactness NswSpec pins in-engine. */
  def nswKnnJoinPrecision(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    graft.scale.Nsw.knnJoin(nswGraph(spark, dir),
        emb.filter(col("vec_id") < 30), k = 5, ef = Int.MaxValue)
      .select(col("q_id"), col("rn"), col("n_id"),
        round(col("d") * 10000).cast("long").as("dist_e4"))
  }

  /** The layered twin: hierarchy descent + root-seeded layer-0 beam per
    * query, exhaustive at ef = ∞ — same oracle. */
  def hnswKnnJoinPrecision(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    graft.scale.Nsw.knnJoinHnsw(hnswGraph(spark, dir),
        emb.filter(col("vec_id") < 30), k = 5, ef = Int.MaxValue)
      .select(col("q_id"), col("rn"), col("n_id"),
        round(col("d") * 10000).cast("long").as("dist_e4"))
  }

  /** The batch join driven by the HNSW hierarchy: same fan-out/merge as
    * [[nswKnnJoin]], per-query coarse-to-fine descent inside each shard.
    * Rows-only headline; NswSpec pins unbounded beam == exact join. */
  def hnswKnnJoin(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    graft.scale.Nsw.knnJoinHnsw(hnswGraph(spark, dir),
        emb.filter(col("vec_id") < 30), k = 5, ef = 48)
      .select(col("q_id"), col("rn"), col("n_id"),
        round(col("d") * 10000).cast("long").as("dist_e4"))
  }

  /** Cell-keyed NSW graph (the IVF hybrid) per (session, dir), cached —
    * built over the SAME shared IVF index the ivf_* queries probe. */
  private val nswIvfMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
  private def nswIvfGraph(spark: SparkSession, dir: String): DataFrame =
    nswIvfMemo.getOrElseUpdate(
      (org.apache.spark.sql.graftbridge.ColumnBridge.sessionUuid(spark), dir),
      graft.scale.Nsw.buildByCell(defaultIndex(spark, dir)).cache())

  /** NSW-in-IVF-cells hybrid: probe the 3 nearest cells' shard graphs,
    * beam inside each — IVF's pruning with NSW's in-cell beam instead of
    * an exhaustive rerank. Rows-only headline; NswSpec pins recall and
    * nswivf_precision pins the machinery exhaustively. */
  def nswIvfTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val index = defaultIndex(spark, dir)
    graft.scale.Nsw.searchPruned(nswIvfGraph(spark, dir), index.centroids, q,
      k = 13, nprobe = 3, ef = 48)
      .select(col("vec_id"), round(col("dist") * 10000).cast("long").as("dist_e4"))
  }

  /** Hybrid with every cell probed and an unbounded beam: cells partition
    * the corpus and each cell graph is connected, so the search is
    * exhaustive — must equal brute-force top-13. Same oracle as
    * ivf_precision. */
  def nswIvfPrecision(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val index = defaultIndex(spark, dir)
    graft.scale.Nsw.searchPruned(nswIvfGraph(spark, dir), index.centroids, q,
      k = 13, nprobe = index.centroids.length, ef = Int.MaxValue)
      .select(col("vec_id"), round(col("dist") * 10000).cast("long").as("dist_e4"))
  }

  /** Incrementally-grown graphs: built on 80% of the corpus, then the
    * remaining 20% (every 5th id — INTERLEAVED with resident ids, the
    * hard case for insertion-order-sensitive structures) arrives as a CDC
    * batch through [[graft.scale.Nsw.insert]]/[[graft.scale.Nsw.insertHnsw]].
    * Memoized like the batch-built graphs. */
  private val nswInsMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
  private def nswInsertedGraph(spark: SparkSession, dir: String): DataFrame =
    nswInsMemo.getOrElseUpdate(
      (org.apache.spark.sql.graftbridge.ColumnBridge.sessionUuid(spark), dir), {
        val emb = Tables.embeddings(spark, dir)
        graft.scale.Nsw.insert(
          graft.scale.Nsw.build(emb.filter(col("vec_id") % 5 =!= 0), numShards = 4),
          emb.filter(col("vec_id") % 5 === 0), numShards = 4).cache()
      })
  private val hnswInsMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
  private def hnswInsertedGraph(spark: SparkSession, dir: String): DataFrame =
    hnswInsMemo.getOrElseUpdate(
      (org.apache.spark.sql.graftbridge.ColumnBridge.sessionUuid(spark), dir), {
        val emb = Tables.embeddings(spark, dir)
        graft.scale.Nsw.insertHnsw(
          graft.scale.Nsw.buildHnsw(emb.filter(col("vec_id") % 5 =!= 0), numShards = 4),
          emb.filter(col("vec_id") % 5 === 0), numShards = 4).cache()
      })

  /** Exhaustive beam over the incrementally-grown flat graph: the
    * guarded-parent invariant must survive the insert batch (every
    * inserted node reachable, every resident node still reachable), or
    * the unbounded-beam search misses a vector and the brute-force hash
    * breaks. The query vector (vec_id 0) is itself part of the INSERTED
    * delta. Same oracle as nsw_precision. */
  def nswInsertPrecision(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    graft.scale.Nsw.search(nswInsertedGraph(spark, dir), q, k = 13, ef = Int.MaxValue)
      .select(col("vec_id"), round(col("dist") * 10000).cast("long").as("dist_e4"))
  }

  /** The layered analog over the incrementally-grown HNSW: descent entry
    * re-selection (a delta node can out-level every resident), layer
    * rehydration, and layer-0 guard restoration all under the exactness
    * check. Same oracle as hnsw_precision. */
  def hnswInsertPrecision(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    graft.scale.Nsw.searchHnsw(hnswInsertedGraph(spark, dir), q, k = 13, ef = Int.MaxValue)
      .select(col("vec_id"), round(col("dist") * 10000).cast("long").as("dist_e4"))
  }

  /** One deterministic transformer checkpoint per (session, dir) — the
    * weights FILE a production deployment would broadcast, resolved
    * content-addressed from the committed artifact store
    * (TinyTransformer.writeServedWeights): skip-gram embeddings over the
    * bounded corpus sample (≤ 2000 docs ordered by doc_id) PLUS the
    * backprop-trained attention/FFN blocks from the batch-hard triplet
    * fine-tune on the SF-stable doc_id < 200 slice — the X123 gradient
    * work, now on the serving path (round-9 verdict ask #6). Training is
    * deterministic (same corpus + seed ⇒ bit-identical floats), so the
    * artifact is verifiable by retraining (TransformerSpec's slow test)
    * and reruns/DeterminismSpec hash identically. An unseen corpus falls
    * back to the skip-gram checkpoint rather than minutes of driver
    * training inside a query. */
  private val ttConfig = graft.functions.TinyTransformer.Config(vocab = 2048,
    dModel = 64, nHeads = 4, nLayers = 2, dFf = 128, maxLen = 64)
  /** The served config, exposed for the artifact builder and specs. */
  def ttServedConfig: graft.functions.TinyTransformer.Config = ttConfig
  private val ttWeightsMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]
  private def ttWeightsPath(spark: SparkSession, dir: String): String =
    ttWeightsMemo.getOrElseUpdate(
      (org.apache.spark.sql.graftbridge.ColumnBridge.sessionUuid(spark), dir), {
        val p = java.nio.file.Files.createTempDirectory("graft-tt-")
          .resolve("minilm-shape.bin")
        // recursive exit cleanup — deleteOnExit only removes EMPTY dirs,
        // so the weights file would leak the tree across harness runs
        StoreQueries.cleanupAtExit(p.getParent.toString)
        val (corpus, slice) = ttCorpus(spark, dir)
        graft.functions.TinyTransformer.writeServedWeights(
          p.toString, ttConfig, corpus, slice): Unit
        p.toString
      })

  /** The (full sample, fine-tune slice) text pair behind the served
    * checkpoint — shared verbatim by [[graft.tools.TrainCheckpoint]] so
    * the artifact's content id matches the serving lookup. */
  def ttCorpus(spark: SparkSession, dir: String): (IndexedSeq[String], IndexedSeq[String]) = {
    val rows = Tables.documents(spark, dir)
      .filter(col("doc_id") < 2000).orderBy(col("doc_id"))
      .select(col("doc_id"), col("text")).collect()
    (rows.map(_.getString(1)).toIndexedSeq,
      rows.filter(_.getLong(0) < 200).map(_.getString(1)).toIndexedSeq)
  }

  /** REAL neural inference through the T6 seam: a complete transformer
    * encoder (multi-head attention, GELU FFN, mean pooling — the MiniLM
    * graph the reference binds at app.py:46-48) runs over the corpus from
    * a weights file, one session per partition, rows streamed through
    * mapPartitions. The checkpoint is corpus-TRAINED (ttWeightsPath —
    * skip-gram over the same documents table), so neighbors in this
    * embedding space track corpus co-occurrence; TransformerSpec asserts
    * the planted paraphrase pairs rank closer than random pairs through
    * this exact path. Rows-only by necessity (no SQL oracle can run a
    * transformer — BASELINE.md's neural-seam rule) but bit-deterministic:
    * fixed-order double accumulation and deterministic training, so
    * reruns hash identically; TransformerSpec also pins a closed-form
    * forward pass and the seam contract. The bench row for this query IS
    * the embed-throughput measurement. */
  def neuralEmbed(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 200)
      .select(col("doc_id"), col("text"))
    graft.functions.Embedder.embedFrame(docs, dim = 64,
        loader = new graft.functions.TinyTransformer.Loader(ttWeightsPath(spark, dir)))
      .select(col("vec_id"),
        round(element_at(col("embedding"), 1) * 1000000).cast("long").as("c0_e6"),
        round(element_at(col("embedding"), 2) * 1000000).cast("long").as("c1_e6"),
        round(element_at(col("embedding"), 3) * 1000000).cast("long").as("c2_e6"))
      .orderBy(col("vec_id"))
  }

  // deterministic random MiniLM-shape checkpoint, written once per JVM
  // (seeded generator ⇒ identical bytes on every write; the parent dir
  // cleans up at exit like the served-checkpoint scratch)
  private lazy val miniLm384Path: String = {
    val p = java.nio.file.Files.createTempDirectory("graft-minilm384-")
      .resolve("w.bin")
    StoreQueries.cleanupAtExit(p.getParent.toString)
    graft.functions.TinyTransformer.writeRandomWeights(
      p.toString, graft.functions.TinyTransformer.MiniLmShape)
    p.toString
  }

  /** Serving parity at the reference's embedding WIDTH (X308 — VERDICT
    * r14 #3): an all-MiniLM-L6-v2-shaped checkpoint (6 layers × 384
    * dims × 12 heads, [[graft.functions.TinyTransformer.MiniLmShape]])
    * through the SAME partition-loaded seam `neural_embed` exercises at
    * fixture width. The weights are a deterministic random checkpoint —
    * the real model isn't available offline; what this pins is that the
    * serving path's arithmetic (head split, attention, LN, GELU) runs
    * and stays finite at the reference's true geometry, plus the
    * throughput row the bench records at that width. The declared row
    * reduces to oracle-checkable invariants: every doc embedded, every
    * vector exactly 384 wide, zero non-finite coordinates. */
  def neuralEmbed384(spark: SparkSession, dir: String): DataFrame = {
    // one doc per task: a 384-wide encode is ~0.7 GMAC of per-doc CPU,
    // so the batch must spread over every core — the parquet scan's 1-2
    // input splits would otherwise serialize 32 encodes onto 2 threads
    // (this is the 100 TB shape too: embedding work repartitions to the
    // cluster's full width, model loads amortize per partition)
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 32)
      .select(col("doc_id"), col("text")).repartition(32)
    graft.functions.Embedder.embedFrame(docs, dim = 384,
        loader = new graft.functions.TinyTransformer.Loader(miniLm384Path))
      .agg(count(lit(1)).as("n_docs"),
        min(size(col("embedding"))).cast("long").as("dim_min"),
        max(size(col("embedding"))).cast("long").as("dim_max"),
        count(when(expr("exists(embedding, v -> isnan(v) OR abs(v) > 1e9d)"),
          1)).as("n_nonfinite"))
  }

  /** MinHash LSH near-dups over the planted near-identical docs, from
    * the stored shingle frame (ShingleStore). */
  def minhashNeardup(spark: SparkSession, dir: String): DataFrame =
    NearDup.minhashNearDupsOnShingles(
      graft.scale.ShingleStore.docShingles(spark, dir).filter(col("doc_id") < 200), 0.5)

  /** SimHash near-dups (Hamming ≤ 12 of 64 bits) over the same corpus. */
  def simhashNeardup(spark: SparkSession, dir: String): DataFrame =
    NearDup.simhashNearDups(Tables.documents(spark, dir).filter(col("doc_id") < 200), 12)

  /** IVF build + probe: top-13 for the vec_id=0 query with nprobe=3/16. */
  def ivfTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val index = defaultIndex(spark, dir)
    Ivf.search(index, q, k = 13, nprobe = 3)
      .select(col("vec_id"), col("cell"), round(col("dist") * 10000).cast("long").as("dist_e4"))
  }

  /** IVF-PQ at production compression (m=8, 256-entry books: 64-dim
    * float32 → 8 one-byte codes, 32× smaller than raw, sample-trained
    * — the standard 8-bit PQ configuration): ADC over
    * 3 probed cells, shortlist-64 exact rerank, top-13. Rows-only
    * headline (codebooks are Lloyd outputs no SQL oracle can recompute);
    * PqSpec pins recall against exact ground truth and pq_precision
    * pins the identical machinery losslessly. */
  def ivfpqTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    Pq.search(pqIndex(spark, dir, "compressed"), q, k = 13, nprobe = 3, shortlist = 64)
      .select(col("vec_id"), col("cell"),
        round(col("dist") * 10000).cast("long").as("dist_e4"))
  }

  /** MLlib BucketedRandomProjectionLSH self-join: pairs with L2 < 1.1. */
  def lshJoin(spark: SparkSession, dir: String): DataFrame =
    LshJoin.selfJoin(Tables.embeddings(spark, dir), threshold = 1.1)
      .select(col("a_id"), col("b_id"), round(col("dist") * 10000).cast("long").as("dist_e4"))

  /** Multimodal metadata pass: typed metadata (modality, byte length,
    * content hash) over opaque binary payloads — exact, oracle-checked.
    * Payloads are fabricated deterministically from document text (the
    * fixture set ships no media files). */
  /** Scene-change detection through the REAL video decode path (X243):
    * a 30-frame AVI-MJPEG clip is synthesized whose per-frame brightness
    * encodes the daily revenue regime (above/below the interpolated
    * median → flat luma 200/56), then the ENGINE side goes the long way
    * — RIFF walk, per-frame JDK JPEG decode
    * ([[graft.multimodal.MediaCodecs.aviFrameMeanLumas]]), mean-luma
    * thresholding, cut = brightness class change — while the oracle
    * derives the same cuts from the daily series directly. The 72-level
    * luma margin dwarfs JPEG's flat-frame round-trip error (±2), so the
    * decisions are deterministic and the decoder sits ON the oracle
    * hash path (multimodal decode graduates from spec-only to
    * driver-checked). The calendar-bounded series is collected to build
    * the clip (≤31 rows — the kmeans-centroid pattern); the decode runs
    * in an executor task. At scale: one such task per ASSET — the
    * per-asset decode parallelism of any video pipeline. */
  def sceneChange(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(expr("CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)")
        .as("rev"))
      .orderBy(col("day")).as[(java.sql.Date, Long)].collect()
    val sorted = daily.map(_._2).sorted
    val n = sorted.length
    // interpolated median, mirroring quantile_cont(0.5)
    val med: Double =
      if (n % 2 == 1) sorted(n / 2).toDouble
      else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
    val frames = daily.map { case (_, r) => if (r > med) 200 else 56 }
    val avi = graft.multimodal.MediaCodecs.encodeAviMjpeg(
      32, 32, frames.toIndexedSeq.map(v => (_: Int, _: Int) => v))
    Seq(("v1", avi)).toDF("asset_id", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (_, bytes) =>
        val lumas = graft.multimodal.MediaCodecs.aviFrameMeanLumas(bytes)
          .fold(e => sys.error(e), identity)
        lumas.zipWithIndex.map { case (l, i) =>
          val bright = l > 128
          val cut = i > 0 && (lumas(i - 1) > 128) != bright
          (i.toLong, if (bright) 1L else 0L, if (cut) 1L else 0L)
        }
      }
      .toDF("frame_idx", "is_bright", "is_cut")
      .orderBy(col("frame_idx"))
  }

  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val modality = when(col("doc_id") % 3 === 0, "image")
      .when(col("doc_id") % 3 === 1, "audio")
      .otherwise("video")
    Tables.documents(spark, dir)
      .select(col("doc_id"), modality.as("modality"), col("text").cast("binary").as("content"))
      .select(
        col("doc_id"), col("modality"),
        length(col("content")).as("byte_len"),
        substring(sha2(col("content"), 256), 1, 16).as("content_hash"))
      .orderBy(col("doc_id"))
  }

  /** Multimodal frame sampling as a declared query: the real
    * Multimodal.sampleFrames generator (1 asset → N fixed-stride frames,
    * the shape of video frame extraction) over deterministic payloads
    * fabricated from document text. Exact and oracle-checked — the
    * fixture text is pure ASCII, so byte offsets equal char offsets and
    * DuckDB reproduces every frame hash with substring + sha256. */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val assets = Tables.documents(spark, dir).filter(col("doc_id") < 100)
      .select(col("doc_id").as("asset_id"), lit("video").as("modality"),
        col("source").as("name"), col("text").cast("binary").as("content"))
      .as[Multimodal.Asset]
    Multimodal.sampleFrames(assets, frameLen = 64, stride = 100)
      .select(col("asset_id"), col("frame_idx"), col("byte_offset"), col("frame_len"),
        substring(col("frame_hash"), 1, 16).as("frame_fp"))
      .orderBy(col("asset_id"), col("frame_idx"))
  }

  // ------------------------------------------------------- precision oracles
  //
  // The signature/ANN pipelines are engine-hash/MLlib-dependent, so their
  // headline parameterizations are rows-only. These companion queries pin
  // the SAME machinery with parameters under which the approximate answer
  // provably (ivf: nprobe = nlist ⇒ nothing pruned) or verifiably
  // (minhash/lsh: recall 1.0 on the fixture under fixed seeds, checked at
  // every SF) equals exact ground truth DuckDB can recompute from parquet —
  // turning "trust ScalaTest" into a driver-checked CORRECTNESS row for the
  // production dedup/ANN paths.

  /** IVF with every cell probed: the index machinery (KMeans assignment,
    * cell layout, pruning filter, rerank arithmetic) must reproduce the
    * exact brute-force top-13 — any mis-assigned or dropped vector breaks
    * the hash match. Same oracle as knn_top13. */
  def ivfPrecision(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val index = defaultIndex(spark, dir)
    Ivf.search(index, q, k = 13, nprobe = 16)
      .select(col("vec_id"), round(col("dist") * 10000).cast("long").as("dist_e4"))
  }

  /** IVF-PQ with lossless codebooks (every distinct residual sub-vector
    * is its own code ⇒ ADC distance == exact distance to fp-regrouping),
    * every cell probed, and shortlist = k — so the 13 survivors are
    * CHOSEN by the ADC ordering, then reranked exactly: the whole
    * residual-encode/table-lookup/rerank chain must reproduce
    * brute-force top-13 or the hash breaks. Same oracle as
    * ivf_precision. */
  def pqPrecision(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    Pq.search(pqIndex(spark, dir, "lossless"), q, k = 13, nprobe = 16, shortlist = 13)
      .select(col("vec_id"), round(col("dist") * 10000).cast("long").as("dist_e4"))
  }

  /** Filtered vector search at the oracle parameterization — the
    * metadata-scoped retrieval every serving store exposes (Chroma's
    * `where=` clause, which the reference itself uses for its dedup
    * probe, multiple_document_upload.py:141, yet omits from its own
    * retrieval — §2.1 Q1's cross-user leakage): a label predicate is
    * pushed BELOW the probe, between cell pruning and the rerank/top-k,
    * so matching rows can never be crowded out of the k by
    * filtered-out neighbors (the post-filter formulation would return
    * < k rows). At nprobe = nlist nothing is pruned, so the whole
    * probe + filter + rerank chain must equal brute force over the
    * filtered corpus — which DuckDB recomputes. */
  def ivfFilteredPrecision(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    Ivf.search(defaultIndex(spark, dir), q, k = 13, nprobe = 16,
      corpusFilter = col("label") % 4 === 1)
      .select(col("vec_id"), round(col("dist") * 10000).cast("long").as("dist_e4"))
  }

  /** Offline retrieval-quality evaluation — the recall@k / MRR harness a
    * vector-store team runs nightly against ground truth before shipping
    * an index parameterization. The index under test is a sign-LSH
    * (4 tables × 6 hyperplanes, OR-composed) whose projection matrix is
    * md5-derived (the X92 recipe) and whose arithmetic is integer
    * (inputs e4-fixed, dot products and distances are order-free integer
    * sums) — so unlike the MLlib-seeded LSH family, the ENTIRE eval —
    * signatures, buckets, candidate join, rerank, exact ground truth,
    * and both metrics — is reproduced digit-for-digit by DuckDB: the
    * eval harness itself is oracle-checked, not just the index.
    *
    * Plan shape at scale: signatures are one map-only pass (24 codegen'd
    * HOF dot products per row); candidates are a (table, bucket)
    * equi-join, never query × corpus; the exact ground-truth side is
    * bounded to the |Q|-row query SAMPLE (the only place brute force
    * appears — ground truth for an eval is bounded by construction).
    * Per-query metrics: n_cand (candidate-set size = retrieval cost),
    * recall@10 against exact top-10, reciprocal rank of the true
    * nearest neighbor (0 when missed). */
  def retrievalEval(spark: SparkSession, dir: String): DataFrame = {
    val (cand, approx, exact) = lshEvalFrames(spark, dir)
    val nCand = cand.groupBy(col("q_id")).agg(count(lit(1)).as("n_cand"))
    val hits = exact.select(col("q_id"), col("n_id"), col("rank").as("e_rank"))
      .join(approx.select(col("q_id"), col("n_id"), col("rank").as("a_rank")),
        Seq("q_id", "n_id"), "left")
    hits.groupBy(col("q_id"))
      .agg(
        // K=10 ⇒ recall_e4 = matches * 1000, an exact integer
        (count(col("a_rank")) * 1000).as("recall_e4"),
        // reciprocal rank of the TRUE nearest neighbor in the approx
        // list; 10000/r never lands on .5 for r ≤ 10, so HALF_UP vs
        // HALF_EVEN can't diverge
        coalesce(max(when(col("e_rank") === 1,
            round(lit(10000.0) / col("a_rank")).cast("long"))), lit(0L))
          .as("rr_e4"))
      // LEFT join: a query whose buckets hold no neighbor at all still
      // reports (n_cand=0, recall=0) instead of vanishing from the eval
      .join(nCand, Seq("q_id"), "left")
      .select(col("q_id"), coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        col("recall_e4"), col("rr_e4"))
      .orderBy(col("q_id"))
  }

  /** NDCG@10 of the same LSH retrieval (X299 — the GRADED-relevance
    * eval metric recall/MRR can't express: finding the true #1 at
    * approx rank 1 must score more than finding the true #10 there).
    * Relevance of exact-rank r is 11−r; position discounts are e6
    * integers round(10⁶/log2(i+1)) computed by each engine's own log2
    * (never a cross-row float sum); DCG/IDCG are exact integer sums
    * and NDCG the exact e6 integer quotient. Same bounded harness as
    * [[retrievalEval]] — the |Q|-row exact side is the only brute
    * force, candidates come from the bucket join. */
  def ndcgEval(spark: SparkSession, dir: String): DataFrame = {
    val (_, approx, exact) = lshEvalFrames(spark, dir)
    val w = spark.range(1, 11).select(col("id").as("r"),
      expr("CAST(round(1000000 / log2(CAST(id AS DOUBLE) + 1)) AS BIGINT)")
        .as("wt"))
    val idcg = w.agg(sum((lit(11L) - col("r")) * col("wt")).as("idcg"))
    val hits = exact.select(col("q_id"), col("n_id"), col("rank").as("e_rank"))
      .join(approx.select(col("q_id"), col("n_id"), col("rank").as("a_rank")),
        Seq("q_id", "n_id"))
    val dcg = hits.join(broadcast(w), col("a_rank") === col("r"))
      .groupBy(col("q_id"))
      .agg(sum((lit(11L) - col("e_rank")) * col("wt")).as("dcg"))
    exact.select(col("q_id")).distinct()
      .join(dcg, Seq("q_id"), "left")
      .crossJoin(broadcast(idcg))
      .select(col("q_id"),
        coalesce(col("dcg"), lit(0L)).as("dcg_e6"),
        col("idcg").as("idcg_e6"),
        expr("(coalesce(dcg, 0) * 1000000) div idcg").as("ndcg_e6"))
      .orderBy(col("q_id"))
  }

  /** The shared sign-LSH eval harness: (candidates, approx top-10,
    * exact top-10), each ranked per query — integer arithmetic end to
    * end so DuckDB replays every frame (see [[retrievalEval]]). */
  private def lshEvalFrames(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val nTables = 4; val nBits = 6; val dim = 64; val k = 10; val nQ = 30
    def sign(t: Int, b: Int, i: Int): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"re:$t:$b:$i".getBytes("UTF-8"))
      if ((h(0) & 0x80) != 0) 1L else -1L // first hex digit in 8..f
    }
    val xe4 = transform(col("embedding"),
      x => round(x.cast("double") * 10000).cast("long"))
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), xe4.as("xe4"))
    // per-table bucket id: 6 hyperplane sign bits packed little-endian;
    // each bit is one codegen'd integer HOF dot against a literal row
    val bucketCols = (0 until nTables).map { t =>
      (0 until nBits).map { b =>
        val row = typedlit(Seq.tabulate(dim)(i => sign(t, b, i)))
        val dot = aggregate(
          zip_with(col("xe4"), row, (x, s) => x * s), lit(0L), (a, v) => a + v)
        when(dot >= 0, lit(1 << b)).otherwise(lit(0))
      }.reduce(_ + _).as(s"bkt_$t")
    }
    val sigs = base.select((col("vec_id") +: bucketCols): _*)
      .select(col("vec_id"), explode(array((0 until nTables).map(t =>
        struct(lit(t).as("t"), col(s"bkt_$t").as("bkt"))): _*)).as("tb"))
      .select(col("vec_id"), col("tb.t").as("t"), col("tb.bkt").as("bkt"))
    // candidates: bucket-mates in ANY table (OR composition), deduped
    val cand = sigs.filter(col("vec_id") < nQ).select(col("vec_id").as("q_id"),
        col("t"), col("bkt"))
      .join(sigs.select(col("vec_id").as("n_id"), col("t"), col("bkt")),
        Seq("t", "bkt"))
      .filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id")).distinct()
    val intDist = aggregate(
      zip_with(col("q_xe4"), col("n_xe4"), (a, b) => (a - b) * (a - b)),
      lit(0L), (a, v) => a + v)
    val qv = base.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("q_id"), col("xe4").as("q_xe4"))
    val nv = base.select(col("vec_id").as("n_id"), col("xe4").as("n_xe4"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("d").asc, col("n_id").asc)
    val approx = cand.join(qv, "q_id").join(nv, "n_id")
      .select(col("q_id"), col("n_id"), intDist.as("d"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
    val exact = qv.crossJoin(nv).filter(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), intDist.as("d"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
    (cand, approx, exact)
  }

  /** Matryoshka (prefix-dimension) retrieval eval — Kusupati et al. 2022
    * MRL / the truncated-embedding serving trade every vector platform
    * now offers: how much top-10 retrieval quality survives when only the
    * FIRST p dimensions are kept (8/16/32 of 64 here — shorter vectors =
    * smaller index, faster scan)? Ground truth = exact full-dim top-10;
    * each prefix re-ranks the same queries on the sliced vectors;
    * recall@10 per (prefix, query), with p = 64 carried as the built-in
    * sanity row (must read 1000 e4 exactly).
    *
    * Exactness is retrieval_eval's recipe: e4-fixed integer vectors ⇒
    * squared-L2 distances are order-free BIGINT sums (no norm, no sqrt —
    * L2 on the raw prefixes, so no cross-engine rational ranking);
    * rank windows partition on (prefix, query) — 120 keys, growing with
    * the query sample. The fixture's hash embeddings have NO Matryoshka
    * training, so prefix recall is the honest diffuse-information
    * baseline (~0.3-0.5) — the eval HARNESS is the operator; a trained
    * MRL checkpoint slots into the same query unchanged. */
  def mrlRecall(spark: SparkSession, dir: String): DataFrame = {
    val k = 10; val nQ = 30
    val xe4 = transform(col("embedding"),
      x => round(x.cast("double") * 10000).cast("long"))
    val base = Tables.embeddings(spark, dir).select(col("vec_id"), xe4.as("xe4"))
    val qv = base.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("q_id"), col("xe4").as("q_xe4"))
    val pairs = qv.crossJoin(base.select(col("vec_id").as("n_id"),
        col("xe4").as("n_xe4")))
      .filter(col("n_id") =!= col("q_id"))
    import spark.implicits._
    val pref = Seq(8, 16, 32, 64).toDF("p")
    val dist = aggregate(
      zip_with(slice(col("q_xe4"), lit(1), col("p")),
        slice(col("n_xe4"), lit(1), col("p")),
        (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, v) => acc + v)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("p"), col("q_id")).orderBy(col("d").asc, col("n_id").asc)
    val ranked = pairs.crossJoin(broadcast(pref))
      .select(col("p"), col("q_id"), col("n_id"), dist.as("d"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .cache()
    val truth = ranked.filter(col("p") === 64)
      .select(col("q_id"), col("n_id"))
    ranked
      .join(truth.withColumn("hit", lit(1L)), Seq("q_id", "n_id"), "left")
      .groupBy(col("p").as("prefix_dim"), col("q_id"))
      .agg((sum(coalesce(col("hit"), lit(0L))) * 1000).as("recall_e4"))
      .orderBy(col("prefix_dim"), col("q_id"))
  }

  /** MinHash at full-recall banding (k=64, 32 bands × 2 rows: candidate
    * probability at J ≥ 0.5 is 1-(1-J²)^32 ≥ 0.9999, and deterministic
    * under the fixed engine hash) + the exact-Jaccard verify ⇒ the output
    * equals the exact J ≥ 0.5 pair set, which DuckDB recomputes from
    * shingles. A banding bug that loses a candidate, or a verify bug that
    * mis-counts a shingle, fails the row/hash match. */
  def minhashPrecision(spark: SparkSession, dir: String): DataFrame =
    NearDup.minhashNearDupsOnShingles(
      graft.scale.ShingleStore.docShingles(spark, dir).filter(col("doc_id") < 200),
      0.5, k = 64, bands = 32)
      .select(col("a_id"), col("b_id"), col("inter"), col("uni"),
        round(col("inter").cast("double") * 10000 / col("uni")).cast("long").as("jacc_e4"))

  /** LSH self-join at full-recall parameters + the exact rerank ⇒ the
    * output equals the exact sub-1.1 L2 pair set among vec_id < 500,
    * recomputed by DuckDB as an all-pairs join. Pins the whole
    * projection/bucket/rerank chain. Parameter math: the hardest exact
    * pairs sit near d=1.1 (unit vectors ⇒ cos≈0.4, near-orthogonal), where
    * a wide-bucket projection degenerates to sign-of-dot with collision
    * probability 1-θ/π ≈ 0.63 — so AND-composition would crush recall
    * (0.63⁴ ≈ 0.16/table) and full recall needs pure OR: 1 hash × 24
    * tables ⇒ worst-pair miss ≈ 0.37²⁴ ≈ 4e-11 under the fixed seed. */
  def lshPrecision(spark: SparkSession, dir: String): DataFrame =
    LshJoin.selfJoin(Tables.embeddings(spark, dir).filter(col("vec_id") < 500),
      threshold = 1.1, bucketLength = 8.0, numHashTables = 24, hashesPerTable = 1)
      .select(col("a_id"), col("b_id"), round(col("dist") * 10000).cast("long").as("dist_e4"))

  final case class MediaMetaRow(doc_id: Long, modality: String, container: String,
      dim_a: Int, dim_b: Int, bits: Int, units: Long, payload_sum: Long, duration_us: Long)

  /** Real-decoder multimodal metadata: encode genuine PNG (javax.imageio)
    * and WAV PCM (javax.sound) payloads in-plan from closed-form per-doc
    * parameters, decode them with [[MediaCodecs]], and emit the DECODED
    * metadata — dimensions, PCM frame counts, raster/sample sums. The
    * DuckDB oracle recomputes every value from the same closed forms, so
    * a broken decoder (wrong dimensions, dropped samples, sign errors in
    * PCM parsing) hash-mismatches. Gray ramp stays < 256 by construction
    * (base ≤ 189, x+y ≤ 62) — no modular wraparound to mask a clamp bug.
    * mapPartitions mirrors the per-partition decoder amortization of
    * [[Multimodal.extractFeatures]]; the stage is map-only. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.MediaCodecs
    val ids = Tables.documents(spark, dir).filter(col("doc_id") < 300)
      .select(col("doc_id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        if (id % 2 == 0) {
          val w = 8 + (id % 25).toInt
          val h = 8 + ((id * 7) % 25).toInt
          val base = (id % 190).toInt
          val png = MediaCodecs.encodeGray(w, h, (x, y) => base + x + y)
          val m = MediaCodecs.decodeImage(png).fold(e => sys.error(e), identity)
          MediaMetaRow(id, "image", m.container, m.width, m.height, m.bitsPerSample,
            m.width.toLong * m.height, m.sampleSum, 0L)
        } else {
          val k = 1 + (id % 37).toInt
          val n = 500 + (id % 1000).toInt
          val rate = 8000 + (id % 5).toInt * 1000
          val samples = Array.tabulate(n)(i => ((i * k) % 2000 - 1000).toShort)
          val wav = MediaCodecs.encodeWavPcm16(rate, samples)
          val m = MediaCodecs.decodeWav(wav).fold(e => sys.error(e), identity)
          MediaMetaRow(id, "audio", m.container, m.sampleRate, m.channels, m.bitsPerSample,
            m.frames, m.sampleSum, m.durationUs)
        }
      }
    }.toDF().orderBy(col("doc_id"))
  }

  /** IVF-cell-blocked batch k-NN join: top-5 neighbors for each of the
    * first 50 vectors against the whole corpus, neither side broadcast —
    * the similarity-graph builder at 100 TB (feeds near-dup clustering,
    * retrieval eval, hard-negative mining). Rows-only headline (cell
    * layout is KMeans-dependent); ScaleSpec pins recall vs the exact
    * join. */
  def knnJoinBlocked(spark: SparkSession, dir: String): DataFrame = {
    val index = defaultIndex(spark, dir)
    val queries = Tables.embeddings(spark, dir).filter(col("vec_id") < 50)
    Ivf.knnJoin(index, queries, k = 5, nprobe = 4)
      .select(col("q_id"), col("n_id"),
        round(col("d") * 10000).cast("long").as("dist_e4"), col("rn"))
  }

  /** The blocked batch k-NN join with every cell probed: nprobe = nlist
    * means nothing is pruned, so the cell equi-join + WindowGroupLimit
    * machinery must reproduce the exact per-query top-5 the oracle
    * computes by brute force — the ivf_precision recipe applied to the
    * batch-join path (probe explode, cell routing, rank-window merge all
    * under the hash check). */
  def knnJoinBlockedPrecision(spark: SparkSession, dir: String): DataFrame = {
    val index = defaultIndex(spark, dir)
    val queries = Tables.embeddings(spark, dir).filter(col("vec_id") < 50)
    Ivf.knnJoin(index, queries, k = 5, nprobe = 16)
      .select(col("q_id"), col("n_id"),
        round(col("d") * 10000).cast("long").as("dist_e4"), col("rn"))
  }

  /** The oracle-checkable simhash parameterization: portable md5-derived
    * 60-bit signatures, 6×10-bit chunk banding (pigeonhole-complete for
    * Hamming ≤ 5), exact bit_count verify. The oracle recomputes the
    * signatures AND runs the screen as ALL PAIRS, so the banded pipeline
    * must surface every qualifying pair — completeness is hash-checked,
    * not just sampled. */
  def simhashPrecision(spark: SparkSession, dir: String): DataFrame =
    NearDup.simhashNearDupsPortable(
      Tables.documents(spark, dir).filter(col("doc_id") < 200), maxHamming = 5)

  /** The shared deterministic split rule ([[SplitRule]]) applied to a
    * vector id, so the eval split of an embedding row is THE SAME
    * assignment `deterministic_split` reports. */
  private def splitOf(id: org.apache.spark.sql.Column) = SplitRule.of(id)

  /** Embedding-level train/test decontamination — the semantic analog of
    * X36's shingle-overlap screen: a test-split vector whose nearest
    * TRAIN-split vector lies within squared-L2 1.2 is a near-duplicate of
    * training data and leaks eval signal (paraphrases and re-encodings
    * that shingle overlap can't see). Candidates come from the shared IVF
    * index with the corpus side narrowed to the train split BEFORE the
    * cell join, so the pair count is cell-blocked — never test × train —
    * and the per-test nearest hit is one WindowGroupLimit rank. The
    * threshold compares the e4-ROUNDED distance, keeping the cut engine-
    * exact. Headline probes 4/16 cells (rows-only, recall follows probe
    * coverage as in ivf_topk); [[semanticDecontamPrecision]] probes every
    * cell, which makes the same plan exact and oracle-checkable. */
  private def semanticDecontam(spark: SparkSession, dir: String,
      nprobe: Int): DataFrame = {
    val index = defaultIndex(spark, dir)
    val tests = Tables.embeddings(spark, dir)
      .filter(splitOf(col("vec_id")) === "test")
    Ivf.knnJoin(index, tests, k = 1, nprobe = nprobe,
        corpusFilter = splitOf(col("vec_id")) === "train")
      .withColumn("dist_e4", round(col("d") * 10000).cast("long"))
      .filter(col("dist_e4") <= 12000)
      .select(col("q_id").as("test_id"), col("n_id").as("train_id"),
        col("dist_e4"))
      .orderBy(col("test_id"))
  }

  def semanticDecontamQ(spark: SparkSession, dir: String): DataFrame =
    semanticDecontam(spark, dir, nprobe = 4)

  /** All-cells parameterization: probing every IVF cell makes the blocked
    * join exhaustive over the train split, so the output must equal the
    * brute-force nearest-train-neighbor screen — the DuckDB oracle. */
  def semanticDecontamPrecision(spark: SparkSession, dir: String): DataFrame =
    semanticDecontam(spark, dir, nprobe = 16)

  /** Grid-DBSCAN density clustering (X304 — the grid-cell DBSCAN
    * approximation every at-scale implementation uses, GriT-DBSCAN /
    * the NG-DBSCAN family's first stage): points land in τ-cells by
    * shifted-positive integer division, CORE cells carry ≥ minPts
    * points, and clusters are the connected components of core cells
    * under 8-neighborhood adjacency. ONE data-sized pass (the cell
    * histogram); the core-cell frame is bounded by (value-range/τ)² —
    * a property of the DOMAIN, not the row count — so the component
    * labeling runs driver-side union-find (deterministic: a
    * component's label is its lexicographically smallest cell) at any
    * corpus size. The oracle replays the labeling as 24 unrolled
    * min-label rounds — equal to the union-find fixpoint because 24
    * exceeds any component diameter at both tested SFs (probed: 6 core
    * cells at sf0.01, 22 at sf0.1). Border/noise points are reported
    * in aggregate (points outside core cells), the standard grid-first
    * accounting. */
  def gridDbscan(spark: SparkSession, dir: String): DataFrame =
    gridDbscanOf(spark, Tables.embeddings(spark, dir), minPts = 25)

  private[graft] def gridDbscanOf(spark: SparkSession, emb: DataFrame,
      minPts: Long): DataFrame = {
    import spark.implicits._
    val cells = emb.select(
        expr("(CAST(round(CAST(element_at(embedding, 1) AS DOUBLE) * 10000) " +
          "AS BIGINT) + 100000) div 1000").as("cx"),
        expr("(CAST(round(CAST(element_at(embedding, 2) AS DOUBLE) * 10000) " +
          "AS BIGINT) + 100000) div 1000").as("cy"))
      .groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("n"))
    val core = cells.filter(col("n") >= minPts)
      .select(col("cx"), col("cy"), col("n"))
      .as[(Long, Long, Long)].collect().sortBy(c => (c._1, c._2))
    val noise = cells.filter(col("n") < minPts)
      .agg(coalesce(sum(col("n")), lit(0L)).as("pts"),
        count(lit(1)).as("cells"))
      .head()
    // union-find over the bounded core grid; final label = the
    // component's lexicographically smallest (cx, cy)
    val idx = core.zipWithIndex.map { case (c, i) => (c._1, c._2) -> i }.toMap
    val parent = Array.tabulate(core.length)(identity)
    def find(i: Int): Int = {
      var r = i
      while (parent(r) != r) r = parent(r)
      var j = i
      while (parent(j) != r) { val nx = parent(j); parent(j) = r; j = nx }
      r
    }
    for (((cx, cy, _), i) <- core.zipWithIndex; dx <- -1L to 1L; dy <- -1L to 1L)
      idx.get((cx + dx, cy + dy)).foreach { j =>
        val (ri, rj) = (find(i), find(j))
        if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
      }
    val label = new Array[(Long, Long)](core.length)
    for (i <- core.indices) {
      val r = find(i)
      val c = (core(i)._1, core(i)._2)
      if (label(r) == null || Ordering[(Long, Long)].lt(c, label(r)))
        label(r) = c
    }
    val rows = core.zipWithIndex.map { case ((cx, cy, n), i) =>
      val l = label(find(i))
      (l._1, l._2, cx, cy, n)
    }.toSeq
    val labeled = rows.toDF("label_cx", "label_cy", "cx", "cy", "n")
    labeled.groupBy(col("label_cx"), col("label_cy"))
      .agg(count(lit(1)).as("n_cells"), sum(col("n")).as("n_points"))
      .crossJoin(broadcast(Seq((noise.getLong(0), noise.getLong(1)))
        .toDF("noise_points", "noise_cells")))
      .orderBy(col("n_points").desc, col("label_cx"), col("label_cy"))
  }

  final case class AHashRow(doc_id: Long, h0: Int, h1: Int, h2: Int, h3: Int)

  /** Perceptual image hashes over DECODED rasters: groups of 4
    * consecutive ids share an md5-derived 8×8 cell pattern (the
    * random_projection recipe — a pure function both engines reproduce),
    * rendered as a genuine gray PNG with 120-gray-level cell contrast
    * plus an x+y gradient; the id-within-group `step` flips the pattern
    * of the first `step` cells, planting NEAR-duplicates at Hamming
    * exactly |Δstep| ∈ 1..3 within a group and ~32 across groups. The
    * payload decodes through the real JDK reader and hashes with
    * [[MediaCodecs.aHash64]] (exact integer mean comparisons, no
    * floating point); PNG gray8 is lossless, so the oracle recomputes
    * every hash bit from the SAME closed forms — the whole encode →
    * decode → perceptual-hash chain is under the hash check. Chunked
    * 4×16-bit (h0..h3) to stay clear of signed-64 edge cases in both
    * engines. Samples stay < 256 by construction (60 + 120 + x + y ≤
    * 242) — no clamp to mask a codec bug. */
  def imageAhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.MediaCodecs
    val ids = Tables.documents(spark, dir).filter(col("doc_id") < 240)
      .select(col("doc_id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val g = id / 4
        val w = 8 + (g % 25).toInt
        val h = 8 + ((g * 7) % 25).toInt
        val step = (id % 4).toInt
        def patBit(cx: Int, cy: Int): Boolean = {
          val d = java.security.MessageDigest.getInstance("MD5")
            .digest(s"ah:$g:$cx:$cy".getBytes("UTF-8"))
          (d(0) & 0x80) != 0 // first hex digit in 8..f
        }
        val png = MediaCodecs.encodeGray(w, h, (x, y) => {
          val cx = x * 8 / w
          val cy = y * 8 / h
          val flipped = patBit(cx, cy) ^ (cy * 8 + cx < step)
          60 + (if (flipped) 120 else 0) + x + y
        })
        val c = MediaCodecs.aHash64(png).fold(e => sys.error(e), identity)
        AHashRow(id, c(0), c(1), c(2), c(3))
      }
    }.toDF().orderBy(col("doc_id"))
  }

  /** Banded Hamming pairs over a 4×16-bit chunked signature frame
    * (doc_id, h0..h3): pigeonhole-complete for maxHamming ≤ 3, pair
    * count Σ_bucket f²/2 — shared by the image and audio perceptual
    * dedup queries. */
  private def chunkedHammingPairs(sig: DataFrame, maxHamming: Int): DataFrame = {
    val keyed = sig.select(col("doc_id"), col("h0"), col("h1"), col("h2"), col("h3"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk_idx"), col(s"h$c").as("chunk_val"))): _*)).as("ck"))
      .select(col("doc_id"), col("h0"), col("h1"), col("h2"), col("h3"),
        col("ck.chunk_idx"), col("ck.chunk_val"))
    val ham = (0 until 4).map(c =>
      bit_count(col(s"a.h$c").bitwiseXOR(col(s"b.h$c")))).reduce(_ + _)
    keyed.as("a")
      .join(keyed.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        ham.cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Multimodal near-dup dedup: banded aHash pairs at Hamming ≤ 3 — the
    * image-column sibling of the text dedup family (X1/X87), with the
    * same pigeonhole-complete 4-chunk banding and the oracle running the
    * ALL-PAIRS screen from closed-form hashes. Brightness-shifted
    * re-encodes collapse (aHash is mean-relative); the planted
    * step-flips keep within-group pairs NEAR-identical (Hamming 1–3)
    * rather than identical, so the Hamming verify is non-vacuous. */
  def imageAhashDedup(spark: SparkSession, dir: String): DataFrame =
    chunkedHammingPairs(imageAhash(spark, dir), maxHamming = 3)

  /** Difference-hashes over the SAME generated rasters as
    * [[imageAhash]], hashed with [[MediaCodecs.dHash64]] (X300 — the
    * gradient perceptual hash): 8×9 box cells, bit = right cell mean >
    * left cell mean as exact integer cross-products. The x+y brightness
    * ramp that shifts every aHash cell uniformly is DIFFERENCED away
    * here, which is why production near-dup stacks run dHash next to
    * aHash. PNG gray8 is lossless, so the oracle recomputes every bit
    * of the encode → JDK-decode → hash chain from the closed forms. */
  def imageDhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.MediaCodecs
    val ids = Tables.documents(spark, dir).filter(col("doc_id") < 240)
      .select(col("doc_id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val g = id / 4
        // width floor is 9 (the dHash grid needs a 9th column); same
        // md5 pattern and brightness ramp as the aHash fixture otherwise
        val w = 9 + (g % 25).toInt
        val h = 8 + ((g * 7) % 25).toInt
        val step = (id % 4).toInt
        def patBit(cx: Int, cy: Int): Boolean = {
          val d = java.security.MessageDigest.getInstance("MD5")
            .digest(s"ah:$g:$cx:$cy".getBytes("UTF-8"))
          (d(0) & 0x80) != 0 // first hex digit in 8..f
        }
        val png = MediaCodecs.encodeGray(w, h, (x, y) => {
          val cx = x * 8 / w
          val cy = y * 8 / h
          val flipped = patBit(cx, cy) ^ (cy * 8 + cx < step)
          60 + (if (flipped) 120 else 0) + x + y
        })
        val c = MediaCodecs.dHash64(png).fold(e => sys.error(e), identity)
        AHashRow(id, c(0), c(1), c(2), c(3))
      }
    }.toDF().orderBy(col("doc_id"))
  }

  /** The dHash near-dup pair screen — same pigeonhole-complete 4-chunk
    * banding as [[imageAhashDedup]]; the step-flips perturb only a few
    * pattern cells, so within-group pairs stay under the Hamming bar
    * while cross-group hashes are unrelated. Oracle: all-pairs from the
    * closed-form hashes. */
  def imageDhashDedup(spark: SparkSession, dir: String): DataFrame =
    chunkedHammingPairs(imageDhash(spark, dir), maxHamming = 3)

  final case class SilenceRow(doc_id: Long, n_frames: Long, n_silent: Long,
      lead_silent: Long)

  /** Silence profiling over DECODED PCM (X301 — the dead-air gate an
    * audio-ingest pipeline runs before paying for transcription): the
    * same generated WAVs as [[audioFingerprintQ]] (step·40 leading zero
    * samples planted per id) decode through javax.sound and
    * [[MediaCodecs.silenceProfile]] counts exact integer frame
    * energies against the threshold — total / silent / LEADING silent
    * frames per document. The oracle replays every energy from the
    * closed-form samples (PCM16 is lossless). */
  def audioSilence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.MediaCodecs
    val ids = Tables.documents(spark, dir).filter(col("doc_id") < 240)
      .select(col("doc_id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val g = id / 4
        val k = 3 + 2 * g.toInt
        val step = (id % 4).toInt
        val samples = Array.tabulate(65 * 32) { t =>
          if (t < step * 40) 0.toShort
          else (((t * k) % 2000) - 1000).toShort
        }
        val wav = MediaCodecs.encodeWavPcm16(8000, samples)
        val (nf, ns, lead) = MediaCodecs.silenceProfile(wav, frameLen = 32,
          threshold = 1000L).fold(e => sys.error(e), identity)
        SilenceRow(id, nf, ns, lead)
      }
    }.toDF().orderBy(col("doc_id"))
  }

  /** Acoustic fingerprints over DECODED 16-bit PCM: groups of 4 ids
    * share a sawtooth waveform (period parameter k from the group id);
    * the id-within-group `step` silences the first step·40 samples,
    * perturbing the first 1–2 frame energies — near-duplicate
    * fingerprints within a group, unrelated across groups. The payload
    * round-trips through a real WAV encode → javax.sound decode →
    * [[graft.multimodal.MediaCodecs.audioFingerprint]] (energy-delta
    * sign bits, exact integer — no FFT, no floating point), and the
    * oracle recomputes every bit from the closed-form samples (PCM16 is
    * lossless). Chunked 4×16-bit like the image hash. */
  def audioFingerprintQ(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.MediaCodecs
    val ids = Tables.documents(spark, dir).filter(col("doc_id") < 240)
      .select(col("doc_id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val g = id / 4
        val k = 3 + 2 * g.toInt // injective per group: no cross-group collisions
        val step = (id % 4).toInt
        val samples = Array.tabulate(65 * 32) { t =>
          if (t < step * 40) 0.toShort
          else (((t * k) % 2000) - 1000).toShort
        }
        val wav = MediaCodecs.encodeWavPcm16(8000, samples)
        val c = MediaCodecs.audioFingerprint(wav).fold(e => sys.error(e), identity)
        AHashRow(id, c(0), c(1), c(2), c(3))
      }
    }.toDF().orderBy(col("doc_id"))
  }

  /** The audio dedup pair screen — same banding/verify machinery as
    * [[imageAhashDedup]] over the acoustic fingerprints; the oracle runs
    * all pairs from the closed forms. */
  def audioFpDedup(spark: SparkSession, dir: String): DataFrame =
    chunkedHammingPairs(audioFingerprintQ(spark, dir), maxHamming = 3)

  final case class VideoMetaRow(doc_id: Long, container: String, codec: String,
      width: Int, height: Int, n_frames: Long, us_per_frame: Long, duration_us: Long)

  /** Real video-container round-trips over all four container families:
    * doc_id % 3 == 0 encodes a genuine AVI (JDK JPEG frames, hand-built
    * RIFF) decoded with [[MediaCodecs.decodeAvi]] — dimensions from the
    * avih header, frame count from the actual movi chunks; % 3 == 1 an
    * ISO-BMFF MP4 skeleton decoded with [[MediaCodecs.decodeMp4]]'s
    * `moov` box walk (tkhd 16.16 dims, stsz frame count, mdhd/stts
    * timing); % 3 == 2 a Matroska/WebM skeleton (webm DocType at
    * doc_id % 6 == 2) decoded with [[MediaCodecs.decodeMkv]]'s EBML walk
    * — dims/codec from the TrackEntry, frames counted from the actual
    * SimpleBlocks. No container is stubbed any more (frame PAYLOADS stay
    * opaque outside AVI-MJPEG — the JDK ships no H.264/VP9 codec). The
    * oracle recomputes every value from the same closed forms, so a
    * broken chunk walker, box-offset error, varint misparse, or frame
    * counter hash-mismatches. Pixel sums are lossy-JPEG output and stay
    * in MediaCodecsSpec's error-budget check instead of the oracle.
    * mapPartitions mirrors the per-partition decoder amortization; the
    * stage is map-only. */
  def videoMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.multimodal.MediaCodecs
    val ids = Tables.documents(spark, dir).filter(col("doc_id") < 120)
      .select(col("doc_id")).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val w = 16 + (id % 17).toInt
        val h = 16 + ((id * 5) % 17).toInt
        val base = (id % 150).toInt
        val n = 2 + (id % 4).toInt
        val m = (id % 3) match {
          case 0 =>
            val avi = MediaCodecs.encodeAviMjpeg(w, h,
              Seq.tabulate(n)(f => (x: Int, y: Int) => base + f + x + y), usPerFrame = 40000L)
            MediaCodecs.decodeAvi(avi).fold(e => sys.error(e), identity)
          case 1 =>
            val mp4 = MediaCodecs.encodeMp4Skeleton(w, h, n, sampleDeltaUs = 40000L)
            MediaCodecs.decodeMp4(mp4).fold(e => sys.error(e), identity)
          case _ =>
            val docType = if (id % 6 == 2) "webm" else "matroska"
            val codec = if (id % 6 == 2) "V_VP9" else "V_MPEG4/ISO/AVC"
            val mkv = MediaCodecs.encodeMkvSkeleton(w, h, n,
              usPerFrame = 40000L, docType = docType, codec = codec)
            MediaCodecs.decodeMkv(mkv).fold(e => sys.error(e), identity)
        }
        VideoMetaRow(id, m.container, m.codec, m.width, m.height, m.frames,
          m.usPerFrame, m.durationUs)
      }
    }.toDF().orderBy(col("doc_id"))
  }

  /** Top-13 k-NN over SQ8-quantized embeddings: vectors round-trip
    * through per-vector int8 codes before scoring, the query stays exact
    * float — the storage-quantized search path at 100 TB (4× less IO),
    * exact and oracle-checked because the quantization arithmetic is a
    * fixed double op chain both engines reproduce bit-for-bit.
    * QuantizeSpec measures recall vs the unquantized top-k. */
  def sq8Topk(spark: SparkSession, dir: String): DataFrame = {
    import graft.scale.Quantize
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0)
      .select(transform(col("embedding"), x => x.cast("double")).as("q_emb"))
    emb
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        graft.core.VectorOps.squaredL2Hof(Quantize.sq8Roundtrip(col("embedding")), col("q_emb")).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc)
      .limit(13)
      .select(col("vec_id"), round(col("d") * 10000).cast("long").as("dist_e4"))
  }

  /** Binary-quantized retrieval: 64 float dims → two sign-packed longs
    * (16× smaller than float32), Hamming `bit_count(xor)` shortlist of
    * 50, exact-float rerank to top-10 — the modern vector-store
    * first-pass design ([[graft.scale.Quantize.signBits]]). The
    * shortlist is a TakeOrdered (top-C never sorts the corpus); at
    * 100 TB the packed columns are the only thing the first pass scans.
    * Every stage is deterministic with total (score, id) tie-breaks,
    * so the oracle replays the ALGORITHM — pack, Hamming, shortlist,
    * rerank — term for term; QuantizeSpec measures shortlist recall
    * against the unquantized top-k. */
  def bqTopk(spark: SparkSession, dir: String): DataFrame = {
    import graft.scale.Quantize
    val emb = Tables.embeddings(spark, dir)
    val packed = emb.select(col("vec_id"), col("embedding"),
      Quantize.signBits(col("embedding"), 0).as("h0"),
      Quantize.signBits(col("embedding"), 32).as("h1"))
    val q = packed.filter(col("vec_id") === 0)
      .select(transform(col("embedding"), x => x.cast("double")).as("q_emb"),
        col("h0").as("q0"), col("h1").as("q1"))
    val shortlist = packed.crossJoin(broadcast(q))
      .select(col("vec_id"), col("embedding"), col("q_emb"),
        Quantize.hamming(col("h0"), col("h1"), col("q0"), col("q1")).as("ham"))
      .orderBy(col("ham").asc, col("vec_id").asc)
      .limit(50)
    shortlist
      .select(col("vec_id"), col("ham").cast("long").as("ham"),
        graft.core.VectorOps.squaredL2Hof(
          transform(col("embedding"), x => x.cast("double")), col("q_emb")).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), col("ham"),
        round(col("d") * 10000).cast("long").as("dist_e4"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bq_topk" -> (bqTopk _),
    "sq8_topk" -> (sq8Topk _),
    "minhash_neardup" -> (minhashNeardup _),
    "simhash_neardup" -> (simhashNeardup _),
    "ivf_topk" -> (ivfTopk _),
    "ivfpq_topk" -> (ivfpqTopk _),
    "nsw_topk" -> (nswTopk _),
    "nsw_precision" -> (nswPrecision _),
    "nsw_filtered_precision" -> (nswFilteredPrecision _),
    "hnsw_filtered_precision" -> (hnswFilteredPrecision _),
    "nsw_insert_precision" -> (nswInsertPrecision _),
    "hnsw_insert_precision" -> (hnswInsertPrecision _),
    "hnsw_topk" -> (hnswTopk _),
    "hnsw_precision" -> (hnswPrecision _),
    "nsw_knn_join" -> (nswKnnJoin _),
    "nsw_knn_join_precision" -> (nswKnnJoinPrecision _),
    "hnsw_knn_join" -> (hnswKnnJoin _),
    "hnsw_knn_join_precision" -> (hnswKnnJoinPrecision _),
    "nswivf_topk" -> (nswIvfTopk _),
    "nswivf_precision" -> (nswIvfPrecision _),
    "knn_join_blocked" -> (knnJoinBlocked _),
    "knn_join_blocked_precision" -> (knnJoinBlockedPrecision _),
    "simhash_precision" -> (simhashPrecision _),
    "neural_embed" -> (neuralEmbed _),
    "neural_embed_384" -> (neuralEmbed384 _),
    "image_ahash" -> (imageAhash _),
    "image_ahash_dedup" -> (imageAhashDedup _),
    "image_dhash" -> (imageDhash _),
    "image_dhash_dedup" -> (imageDhashDedup _),
    "audio_silence" -> (audioSilence _),
    "grid_dbscan" -> (gridDbscan _),
    "audio_fingerprint" -> (audioFingerprintQ _),
    "audio_fp_dedup" -> (audioFpDedup _),
    "pq_precision" -> (pqPrecision _),
    "lsh_join" -> (lshJoin _),
    "multimodal_meta" -> (multimodalMeta _),
    "scene_change" -> (sceneChange _),
    "media_meta" -> (mediaMeta _),
    "video_meta" -> (videoMeta _),
    "frame_sample" -> (frameSample _),
    "ivf_precision" -> (ivfPrecision _),
    "ivf_filtered_precision" -> (ivfFilteredPrecision _),
    "retrieval_eval" -> (retrievalEval _),
    "ndcg_eval" -> (ndcgEval _),
    "mrl_recall" -> (mrlRecall _),
    "minhash_precision" -> (minhashPrecision _),
    "lsh_precision" -> (lshPrecision _),
    "semantic_decontam" -> (semanticDecontamQ _),
    "semantic_decontam_precision" -> (semanticDecontamPrecision _)
  )

  /** Shared CTE chain: closed-form pixel field → 8×8 box cells → exact
    * rational mean bits → 4×16-bit chunks (`hh`), mirroring
    * [[graft.multimodal.MediaCodecs.aHash64]] over the generated PNGs. */
  private val aHashSigSql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    8 + (doc_id // 4) % 25 AS w, 8 + ((doc_id // 4) * 7) % 25 AS h,
      |    doc_id // 4 AS g, doc_id % 4 AS step
      |  FROM documents WHERE doc_id < 240),
      |pxx AS (SELECT doc_id, w, h, g, step,
      |          unnest(generate_series(0, w - 1)) AS x FROM p),
      |pxy AS (SELECT doc_id, w, h, g, step, x,
      |          unnest(generate_series(0, h - 1)) AS y FROM pxx),
      |pxv AS (SELECT doc_id, w, h, x, y,
      |          60 + 120 * (CASE WHEN
      |              (substr(md5('ah:' || g || ':' || ((x*8)//w) || ':' || ((y*8)//h)), 1, 1)
      |                 IN ('8','9','a','b','c','d','e','f'))
      |              <> (((y*8)//h) * 8 + ((x*8)//w) < step)
      |            THEN 1 ELSE 0 END) + x + y AS v
      |        FROM pxy),
      |cells AS (
      |  SELECT doc_id, (y * 8) // h AS cy, (x * 8) // w AS cx,
      |    SUM(v) AS cs, COUNT(*) AS cn, MAX(w * h) AS wh
      |  FROM pxv GROUP BY doc_id, (y * 8) // h, (x * 8) // w),
      |tot AS (SELECT doc_id, SUM(v) AS tv FROM pxv GROUP BY doc_id),
      |bits AS (
      |  SELECT c.doc_id, cy * 8 + cx AS b,
      |    CASE WHEN c.cs * c.wh > t.tv * c.cn THEN 1 ELSE 0 END AS bit
      |  FROM cells c JOIN tot t USING (doc_id)),
      |hh AS (
      |  SELECT doc_id, b // 16 AS ci,
      |    CAST(SUM(bit * (1 << (b % 16))) AS INT) AS cv
      |  FROM bits GROUP BY doc_id, b // 16)""".stripMargin

  /** [[gridDbscan]]'s oracle: the same cell histogram, then the
    * union-find fixpoint replayed as [[GridDbscanRounds]] unrolled
    * min-label rounds over the 8-neighborhood (the kcore_peel /
    * label_prop unroll regime) — equal because the round count exceeds
    * any component diameter at the tested SFs. */
  private val GridDbscanRounds = 24

  private def gridDbscanSql: String = {
    // MATERIALIZED is load-bearing: inlined, the 24-step chain becomes
    // ONE join tree and DuckDB's join-order enumeration explodes
    // combinatorially (observed: minutes of planning for 6 rows)
    val steps = (1 to GridDbscanRounds).map { t =>
      s"""r$t AS MATERIALIZED (
         |  SELECT c.cx, c.cy, MIN(r.l) AS l
         |  FROM core c JOIN r${t - 1} r
         |    ON abs(r.cx - c.cx) <= 1 AND abs(r.cy - c.cy) <= 1
         |  GROUP BY c.cx, c.cy)""".stripMargin
    }.mkString(",\n")
    s"""WITH p AS (
       |  SELECT (CAST(round(CAST(embedding[1] AS DOUBLE) * 10000) AS BIGINT) + 100000) // 1000 AS cx,
       |    (CAST(round(CAST(embedding[2] AS DOUBLE) * 10000) AS BIGINT) + 100000) // 1000 AS cy
       |  FROM embeddings),
       |c0 AS (SELECT cx, cy, COUNT(*) AS n FROM p GROUP BY 1, 2),
       |core AS MATERIALIZED (SELECT cx, cy, n FROM c0 WHERE n >= 25),
       |noise AS (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS noise_points,
       |  CAST(COUNT(*) AS BIGINT) AS noise_cells FROM c0 WHERE n < 25),
       |r0 AS (SELECT cx, cy, cx * 1000 + cy AS l FROM core),
       |$steps
       |SELECT CAST(l // 1000 AS BIGINT) AS label_cx,
       |  CAST(l % 1000 AS BIGINT) AS label_cy,
       |  CAST(COUNT(*) AS BIGINT) AS n_cells,
       |  CAST(SUM(core.n) AS BIGINT) AS n_points,
       |  noise_points, noise_cells
       |FROM r$GridDbscanRounds r
       |JOIN core ON core.cx = r.cx AND core.cy = r.cy, noise
       |GROUP BY l, noise_points, noise_cells
       |ORDER BY n_points DESC, label_cx, label_cy""".stripMargin
  }

  /** Shared CTE chain for the DIFFERENCE hash: the same closed-form
    * pixel field as [[aHashSigSql]], box-celled on the 8×9 dHash grid,
    * exact rational ADJACENT-cell comparisons → 4×16-bit chunks,
    * mirroring [[graft.multimodal.MediaCodecs.dHash64]]. */
  private val dHashSigSql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    9 + (doc_id // 4) % 25 AS w, 8 + ((doc_id // 4) * 7) % 25 AS h,
      |    doc_id // 4 AS g, doc_id % 4 AS step
      |  FROM documents WHERE doc_id < 240),
      |pxx AS (SELECT doc_id, w, h, g, step,
      |          unnest(generate_series(0, w - 1)) AS x FROM p),
      |pxy AS (SELECT doc_id, w, h, g, step, x,
      |          unnest(generate_series(0, h - 1)) AS y FROM pxx),
      |pxv AS (SELECT doc_id, w, h, x, y,
      |          60 + 120 * (CASE WHEN
      |              (substr(md5('ah:' || g || ':' || ((x*8)//w) || ':' || ((y*8)//h)), 1, 1)
      |                 IN ('8','9','a','b','c','d','e','f'))
      |              <> (((y*8)//h) * 8 + ((x*8)//w) < step)
      |            THEN 1 ELSE 0 END) + x + y AS v
      |        FROM pxy),
      |cells AS (
      |  SELECT doc_id, (y * 8) // h AS cy, (x * 9) // w AS cx,
      |    SUM(v) AS cs, COUNT(*) AS cn
      |  FROM pxv GROUP BY doc_id, (y * 8) // h, (x * 9) // w),
      |bits AS (
      |  SELECT l.doc_id, l.cy * 8 + l.cx AS b,
      |    CASE WHEN r.cs * l.cn > l.cs * r.cn THEN 1 ELSE 0 END AS bit
      |  FROM cells l JOIN cells r
      |    ON r.doc_id = l.doc_id AND r.cy = l.cy AND r.cx = l.cx + 1
      |  WHERE l.cx < 8),
      |hh AS (
      |  SELECT doc_id, b // 16 AS ci,
      |    CAST(SUM(bit * (1 << (b % 16))) AS INT) AS cv
      |  FROM bits GROUP BY doc_id, b // 16)""".stripMargin

  /** Shared CTE chain for the acoustic fingerprint: closed-form PCM →
    * 32-sample frame energies → energy-delta sign bits → 4×16-bit chunks
    * (`hh`), mirroring [[graft.multimodal.MediaCodecs.audioFingerprint]]
    * over the generated WAVs. */
  private val audioFpSigSql: String =
    """WITH p AS (
      |  SELECT doc_id, 3 + 2 * (doc_id // 4) AS k, doc_id % 4 AS step
      |  FROM documents WHERE doc_id < 240),
      |ts AS (SELECT doc_id, k, step,
      |         unnest(generate_series(0, 65 * 32 - 1)) AS t FROM p),
      |sv AS (SELECT doc_id, t // 32 AS f,
      |         CASE WHEN t < step * 40 THEN 0
      |              ELSE abs(((t * k) % 2000) - 1000) END AS av
      |       FROM ts),
      |en AS (SELECT doc_id, f, SUM(av) AS e FROM sv GROUP BY doc_id, f),
      |bits AS (
      |  SELECT e0.doc_id, e0.f AS b,
      |    CASE WHEN e1.e > e0.e THEN 1 ELSE 0 END AS bit
      |  FROM en e0 JOIN en e1 ON e1.doc_id = e0.doc_id AND e1.f = e0.f + 1
      |  WHERE e0.f < 64),
      |hh AS (
      |  SELECT doc_id, b // 16 AS ci,
      |    CAST(SUM(bit * (1 << (b % 16))) AS INT) AS cv
      |  FROM bits GROUP BY doc_id, b // 16)""".stripMargin

  private def sqL2Sql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), " +
      s"p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"

  /** Sum of literal CASE terms packing 32 sign bits — mirrors
    * [[graft.scale.Quantize.signBits]] term for term. */
  private def signBitsSql(off: Int): String =
    (0 until 32).map(i =>
      s"(CASE WHEN embedding[${off + i + 1}] >= 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")

  val oracles: Map[String, String] = Map(
    // width/coverage/finiteness invariants of the MiniLM-shape serving
    // run: count from the fixture, the rest pinned by construction
    "neural_embed_384" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(384 AS BIGINT) AS dim_min, CAST(384 AS BIGINT) AS dim_max,
        |  CAST(0 AS BIGINT) AS n_nonfinite
        |FROM documents WHERE doc_id < 32""".stripMargin,
    // the oracle replays the full algorithm — sign pack, Hamming
    // shortlist-50, exact rerank — with the same total tie-breaks
    "bq_topk" ->
      s"""WITH p AS (
         |  SELECT vec_id, embedding,
         |    CAST(${signBitsSql(0)} AS BIGINT) AS h0,
         |    CAST(${signBitsSql(32)} AS BIGINT) AS h1
         |  FROM embeddings),
         |q AS (SELECT embedding AS q_emb, h0 AS q0, h1 AS q1 FROM p WHERE vec_id = 0),
         |s AS (
         |  SELECT vec_id, embedding, q_emb,
         |    bit_count(xor(h0, q0)) + bit_count(xor(h1, q1)) AS ham
         |  FROM p CROSS JOIN q
         |  ORDER BY ham, vec_id LIMIT 50),
         |d AS (SELECT vec_id, ham, ${sqL2Sql("embedding", "q_emb")} AS d FROM s)
         |SELECT vec_id, CAST(ham AS BIGINT) AS ham,
         |  CAST(round(d * 10000) AS BIGINT) AS dist_e4
         |FROM d ORDER BY d, vec_id LIMIT 10""".stripMargin,
    // minhash/simhash/ivf/lsh headline forms: engine-hash/MLlib-dependent →
    // no SQL oracle; pinned against exact ground truth in ScaleSpec. Their
    // *_precision parameterizations below ARE oracle-checked.
    "ivf_precision" ->
      s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
         |d AS (SELECT e.vec_id, ${sqL2Sql("e.embedding", "q.q_emb")} AS d
         |      FROM embeddings e CROSS JOIN q)
         |SELECT vec_id, CAST(round(d * 10000) AS BIGINT) AS dist_e4
         |FROM d ORDER BY d, vec_id LIMIT 13""".stripMargin,
    // brute force over the FILTERED corpus: nprobe = nlist ⇒ the filter
    // placement (below the probe, before the top-k) is what's under test
    "ivf_filtered_precision" ->
      s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
         |d AS (SELECT e.vec_id, ${sqL2Sql("e.embedding", "q.q_emb")} AS d
         |      FROM embeddings e CROSS JOIN q WHERE e.label % 4 = 1)
         |SELECT vec_id, CAST(round(d * 10000) AS BIGINT) AS dist_e4
         |FROM d ORDER BY d, vec_id LIMIT 13""".stripMargin,
    // the FULL eval harness re-derived: md5 sign matrix → integer sign-LSH
    // buckets → OR-composed candidates → integer rerank → exact ground
    // truth → recall@10 and MRR — any divergence in any stage breaks the
    // per-query metric hash
    // same integer machinery sliced to each prefix; p=64 is the
    // built-in sanity row (recall exactly 1000)
    "mrl_recall" ->
      """WITH ints AS (
        |  SELECT vec_id, list_transform(embedding,
        |    v -> CAST(round(CAST(v AS DOUBLE) * 10000) AS BIGINT)) AS xe4
        |  FROM embeddings),
        |pf AS (SELECT unnest([8, 16, 32, 64]) AS p),
        |d AS (
        |  SELECT pf.p, q.vec_id AS q_id, n.vec_id AS n_id,
        |    list_sum(list_transform(list_zip(q.xe4[1:pf.p], n.xe4[1:pf.p]),
        |      z -> (z[1] - z[2]) * (z[1] - z[2]))) AS d
        |  FROM ints q CROSS JOIN ints n CROSS JOIN pf
        |  WHERE q.vec_id < 30 AND n.vec_id <> q.vec_id),
        |r AS (
        |  SELECT p, q_id, n_id,
        |    row_number() OVER (PARTITION BY p, q_id ORDER BY d, n_id) AS rank
        |  FROM d QUALIFY rank <= 10),
        |truth AS (SELECT q_id, n_id FROM r WHERE p = 64)
        |SELECT r.p AS prefix_dim, r.q_id AS q_id,
        |  CAST(SUM(CASE WHEN t.n_id IS NOT NULL THEN 1 ELSE 0 END) * 1000 AS BIGINT)
        |    AS recall_e4
        |FROM r LEFT JOIN truth t ON t.q_id = r.q_id AND t.n_id = r.n_id
        |GROUP BY r.p, r.q_id ORDER BY prefix_dim, r.q_id""".stripMargin,
    "retrieval_eval" ->
      """WITH idx AS (SELECT unnest(generate_series(0, 63)) AS i),
        |tb AS (SELECT tt.t, bb.b
        |       FROM (SELECT unnest(generate_series(0, 3)) AS t) tt
        |       CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS b) bb),
        |s AS (SELECT tb.t, tb.b, idx.i,
        |        CASE WHEN substr(md5('re:' || tb.t || ':' || tb.b || ':' || idx.i), 1, 1)
        |               IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END AS sgn
        |      FROM tb CROSS JOIN idx),
        |x AS (SELECT vec_id, idx.i,
        |        CAST(round(CAST(embedding[idx.i + 1] AS DOUBLE) * 10000) AS BIGINT) AS xe4
        |      FROM embeddings CROSS JOIN idx),
        |bits AS (SELECT x.vec_id, s.t, s.b,
        |           CASE WHEN SUM(x.xe4 * s.sgn) >= 0 THEN 1 ELSE 0 END AS bit
        |         FROM x JOIN s ON s.i = x.i GROUP BY x.vec_id, s.t, s.b),
        |bkt AS (SELECT vec_id, t, CAST(SUM(bit * (1 << b)) AS BIGINT) AS bkt
        |        FROM bits GROUP BY vec_id, t),
        |cand AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS n_id
        |         FROM bkt q JOIN bkt c ON q.t = c.t AND q.bkt = c.bkt
        |         WHERE q.vec_id < 30 AND c.vec_id <> q.vec_id),
        |ints AS (SELECT vec_id,
        |           list_transform(embedding,
        |             v -> CAST(round(CAST(v AS DOUBLE) * 10000) AS BIGINT)) AS xe4
        |         FROM embeddings),
        |ad AS (SELECT c.q_id, c.n_id,
        |         list_sum(list_transform(list_zip(q.xe4, n.xe4),
        |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
        |       FROM cand c
        |       JOIN ints q ON q.vec_id = c.q_id JOIN ints n ON n.vec_id = c.n_id),
        |ar AS (SELECT q_id, n_id,
        |         row_number() OVER (PARTITION BY q_id ORDER BY d, n_id) AS a_rank
        |       FROM ad QUALIFY a_rank <= 10),
        |ed AS (SELECT q.vec_id AS q_id, n.vec_id AS n_id,
        |         list_sum(list_transform(list_zip(q.xe4, n.xe4),
        |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
        |       FROM ints q CROSS JOIN ints n
        |       WHERE q.vec_id < 30 AND n.vec_id <> q.vec_id),
        |er AS (SELECT q_id, n_id,
        |         row_number() OVER (PARTITION BY q_id ORDER BY d, n_id) AS e_rank
        |       FROM ed QUALIFY e_rank <= 10),
        |nc AS (SELECT q_id, COUNT(*) AS n_cand FROM cand GROUP BY q_id),
        |h AS (SELECT er.q_id, er.e_rank, ar.a_rank
        |      FROM er LEFT JOIN ar ON ar.q_id = er.q_id AND ar.n_id = er.n_id),
        |m AS (SELECT q_id, COUNT(a_rank) * 1000 AS recall_e4,
        |        COALESCE(MAX(CASE WHEN e_rank = 1
        |          THEN CAST(round(10000.0 / a_rank) AS BIGINT) END), 0) AS rr_e4
        |      FROM h GROUP BY q_id)
        |SELECT m.q_id, COALESCE(nc.n_cand, 0) AS n_cand,
        |  CAST(m.recall_e4 AS BIGINT) AS recall_e4, CAST(m.rr_e4 AS BIGINT) AS rr_e4
        |FROM m LEFT JOIN nc ON nc.q_id = m.q_id ORDER BY m.q_id""".stripMargin,
    // same LSH chain as retrieval_eval; graded relevance 11−e_rank,
    // e6 log2 position discounts, exact integer DCG/IDCG quotient
    "ndcg_eval" ->
      """WITH idx AS (SELECT unnest(generate_series(0, 63)) AS i),
        |tb AS (SELECT tt.t, bb.b
        |       FROM (SELECT unnest(generate_series(0, 3)) AS t) tt
        |       CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS b) bb),
        |s AS (SELECT tb.t, tb.b, idx.i,
        |        CASE WHEN substr(md5('re:' || tb.t || ':' || tb.b || ':' || idx.i), 1, 1)
        |               IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END AS sgn
        |      FROM tb CROSS JOIN idx),
        |x AS (SELECT vec_id, idx.i,
        |        CAST(round(CAST(embedding[idx.i + 1] AS DOUBLE) * 10000) AS BIGINT) AS xe4
        |      FROM embeddings CROSS JOIN idx),
        |bits AS (SELECT x.vec_id, s.t, s.b,
        |           CASE WHEN SUM(x.xe4 * s.sgn) >= 0 THEN 1 ELSE 0 END AS bit
        |         FROM x JOIN s ON s.i = x.i GROUP BY x.vec_id, s.t, s.b),
        |bkt AS (SELECT vec_id, t, CAST(SUM(bit * (1 << b)) AS BIGINT) AS bkt
        |        FROM bits GROUP BY vec_id, t),
        |cand AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS n_id
        |         FROM bkt q JOIN bkt c ON q.t = c.t AND q.bkt = c.bkt
        |         WHERE q.vec_id < 30 AND c.vec_id <> q.vec_id),
        |ints AS (SELECT vec_id,
        |           list_transform(embedding,
        |             v -> CAST(round(CAST(v AS DOUBLE) * 10000) AS BIGINT)) AS xe4
        |         FROM embeddings),
        |ad AS (SELECT c.q_id, c.n_id,
        |         list_sum(list_transform(list_zip(q.xe4, n.xe4),
        |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
        |       FROM cand c
        |       JOIN ints q ON q.vec_id = c.q_id JOIN ints n ON n.vec_id = c.n_id),
        |ar AS (SELECT q_id, n_id,
        |         row_number() OVER (PARTITION BY q_id ORDER BY d, n_id) AS a_rank
        |       FROM ad QUALIFY a_rank <= 10),
        |ed AS (SELECT q.vec_id AS q_id, n.vec_id AS n_id,
        |         list_sum(list_transform(list_zip(q.xe4, n.xe4),
        |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
        |       FROM ints q CROSS JOIN ints n
        |       WHERE q.vec_id < 30 AND n.vec_id <> q.vec_id),
        |er AS (SELECT q_id, n_id,
        |         row_number() OVER (PARTITION BY q_id ORDER BY d, n_id) AS e_rank
        |       FROM ed QUALIFY e_rank <= 10),
        |w AS (SELECT r, CAST(round(1000000 / log2(CAST(r AS DOUBLE) + 1)) AS BIGINT) AS wt
        |      FROM (SELECT unnest(generate_series(1, 10)) AS r)),
        |idcg AS (SELECT SUM((11 - r) * wt) AS idcg FROM w),
        |hits AS (SELECT er.q_id, er.e_rank, ar.a_rank
        |         FROM er JOIN ar ON ar.q_id = er.q_id AND ar.n_id = er.n_id),
        |d AS (SELECT q_id, SUM((11 - e_rank) * w.wt) AS dcg
        |      FROM hits JOIN w ON w.r = hits.a_rank GROUP BY q_id),
        |qs AS (SELECT DISTINCT q_id FROM er)
        |SELECT qs.q_id, CAST(COALESCE(d.dcg, 0) AS BIGINT) AS dcg_e6,
        |  CAST(idcg AS BIGINT) AS idcg_e6,
        |  CAST(COALESCE(d.dcg, 0) * 1000000 // idcg AS BIGINT) AS ndcg_e6
        |FROM qs LEFT JOIN d USING (q_id), idcg ORDER BY qs.q_id""".stripMargin,
    // identical ground truth to ivf_precision: lossless PQ + all cells +
    // shortlist=k must collapse to brute-force top-13
    "pq_precision" ->
      s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
         |d AS (SELECT e.vec_id, ${sqL2Sql("e.embedding", "q.q_emb")} AS d
         |      FROM embeddings e CROSS JOIN q)
         |SELECT vec_id, CAST(round(d * 10000) AS BIGINT) AS dist_e4
         |FROM d ORDER BY d, vec_id LIMIT 13""".stripMargin,
    // identical ground truth again: connected graph + unbounded beam ⇒
    // the NSW search must collapse to brute-force top-13
    "nsw_precision" ->
      s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
         |d AS (SELECT e.vec_id, ${sqL2Sql("e.embedding", "q.q_emb")} AS d
         |      FROM embeddings e CROSS JOIN q)
         |SELECT vec_id, CAST(round(d * 10000) AS BIGINT) AS dist_e4
         |FROM d ORDER BY d, vec_id LIMIT 13""".stripMargin,
    // brute force over the FILTERED corpus — the admitted-flag beam with
    // ef = ∞ must reproduce it through (not around) filtered-out nodes
    "nsw_filtered_precision" ->
      s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
         |d AS (SELECT e.vec_id, ${sqL2Sql("e.embedding", "q.q_emb")} AS d
         |      FROM embeddings e CROSS JOIN q WHERE e.label % 4 = 1)
         |SELECT vec_id, CAST(round(d * 10000) AS BIGINT) AS dist_e4
         |FROM d ORDER BY d, vec_id LIMIT 13""".stripMargin,
    "hnsw_filtered_precision" ->
      s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
         |d AS (SELECT e.vec_id, ${sqL2Sql("e.embedding", "q.q_emb")} AS d
         |      FROM embeddings e CROSS JOIN q WHERE e.label % 4 = 1)
         |SELECT vec_id, CAST(round(d * 10000) AS BIGINT) AS dist_e4
         |FROM d ORDER BY d, vec_id LIMIT 13""".stripMargin,
    // the incrementally-grown graphs must stay exhaustive at ef = ∞: the
    // guarded invariant survives the insert batch or the hash breaks
    "nsw_insert_precision" ->
      s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
         |d AS (SELECT e.vec_id, ${sqL2Sql("e.embedding", "q.q_emb")} AS d
         |      FROM embeddings e CROSS JOIN q)
         |SELECT vec_id, CAST(round(d * 10000) AS BIGINT) AS dist_e4
         |FROM d ORDER BY d, vec_id LIMIT 13""".stripMargin,
    "hnsw_insert_precision" ->
      s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
         |d AS (SELECT e.vec_id, ${sqL2Sql("e.embedding", "q.q_emb")} AS d
         |      FROM embeddings e CROSS JOIN q)
         |SELECT vec_id, CAST(round(d * 10000) AS BIGINT) AS dist_e4
         |FROM d ORDER BY d, vec_id LIMIT 13""".stripMargin,
    // the hierarchy only routes to an entry; layer 0 stays connected, so
    // HNSW with an unbounded layer-0 beam ⇒ exact brute-force top-13
    "hnsw_precision" ->
      s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
         |d AS (SELECT e.vec_id, ${sqL2Sql("e.embedding", "q.q_emb")} AS d
         |      FROM embeddings e CROSS JOIN q)
         |SELECT vec_id, CAST(round(d * 10000) AS BIGINT) AS dist_e4
         |FROM d ORDER BY d, vec_id LIMIT 13""".stripMargin,
    // and once more for the hybrid: all cells + unbounded beam ⇒ exact
    "nswivf_precision" ->
      s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
         |d AS (SELECT e.vec_id, ${sqL2Sql("e.embedding", "q.q_emb")} AS d
         |      FROM embeddings e CROSS JOIN q)
         |SELECT vec_id, CAST(round(d * 10000) AS BIGINT) AS dist_e4
         |FROM d ORDER BY d, vec_id LIMIT 13""".stripMargin,
    // all-cells probe ⇒ the blocked decontamination join is exhaustive
    // over the train split ⇒ must equal the brute-force nearest-train
    // screen; threshold applied to the e4-rounded distance in both engines
    "semantic_decontam_precision" ->
      s"""WITH s AS (
         |  SELECT vec_id, embedding, ${SplitRule.sql("vec_id")} AS split
         |  FROM embeddings),
         |d AS (
         |  SELECT t.vec_id AS test_id, r.vec_id AS train_id,
         |    ${sqL2Sql("t.embedding", "r.embedding")} AS d
         |  FROM s t JOIN s r ON t.split = 'test' AND r.split = 'train'),
         |r AS (
         |  SELECT test_id, train_id, d,
         |    row_number() OVER (PARTITION BY test_id ORDER BY d, train_id) AS rn
         |  FROM d)
         |SELECT test_id, train_id, CAST(round(d * 10000) AS BIGINT) AS dist_e4
         |FROM r WHERE rn = 1 AND round(d * 10000) <= 12000
         |ORDER BY test_id""".stripMargin,
    // unbounded beam over connected shard graphs ⇒ the batch graph joins
    // are exhaustive: brute-force per-query top-5, SELF-matches included
    // (d = 0 ranks first), tie-broken on (d, n_id) as in mergeTopK
    "nsw_knn_join_precision" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
         |           FROM embeddings WHERE vec_id < 30),
         |d AS (SELECT q.q_id, e.vec_id AS n_id,
         |        ${sqL2Sql("e.embedding", "q.q_emb")} AS d
         |      FROM q CROSS JOIN embeddings e),
         |r AS (SELECT q_id, n_id, d,
         |        row_number() OVER (PARTITION BY q_id ORDER BY d, n_id) AS rn
         |      FROM d)
         |SELECT q_id, CAST(rn AS INT) AS rn, n_id,
         |  CAST(round(d * 10000) AS BIGINT) AS dist_e4
         |FROM r WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin,
    "hnsw_knn_join_precision" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
         |           FROM embeddings WHERE vec_id < 30),
         |d AS (SELECT q.q_id, e.vec_id AS n_id,
         |        ${sqL2Sql("e.embedding", "q.q_emb")} AS d
         |      FROM q CROSS JOIN embeddings e),
         |r AS (SELECT q_id, n_id, d,
         |        row_number() OVER (PARTITION BY q_id ORDER BY d, n_id) AS rn
         |      FROM d)
         |SELECT q_id, CAST(rn AS INT) AS rn, n_id,
         |  CAST(round(d * 10000) AS BIGINT) AS dist_e4
         |FROM r WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin,
    // nprobe = nlist ⇒ the blocked join is exhaustive: brute-force
    // per-query top-5 (self excluded), rank tie-broken on (d, n_id) as in
    // Ivf.knnJoin's window
    "knn_join_blocked_precision" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
         |           FROM embeddings WHERE vec_id < 50),
         |d AS (SELECT q.q_id, e.vec_id AS n_id,
         |        ${sqL2Sql("e.embedding", "q.q_emb")} AS d
         |      FROM q JOIN embeddings e ON e.vec_id <> q.q_id),
         |r AS (SELECT q_id, n_id, d,
         |        row_number() OVER (PARTITION BY q_id ORDER BY d, n_id) AS rn
         |      FROM d)
         |SELECT q_id, n_id, CAST(round(d * 10000) AS BIGINT) AS dist_e4,
         |  CAST(rn AS INT) AS rn
         |FROM r WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin,
    // the oracle recomputes the portable 60-bit signature (majority vote
    // of md5-top-60 token-hash bits) and screens ALL pairs at Hamming ≤ 5
    // — banding completeness (pigeonhole over 6 chunks) is part of the
    // contract being checked, not assumed
    "simhash_precision" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents WHERE doc_id < 200),
        |th AS (
        |  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
        |  FROM toks WHERE tok != ''),
        |votes AS (
        |  SELECT doc_id, b,
        |    SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM th CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS b) bs
        |  GROUP BY doc_id, b),
        |sig AS (
        |  SELECT doc_id,
        |    SUM(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS simhash
        |  FROM votes GROUP BY doc_id)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 5
        |ORDER BY a_id, b_id""".stripMargin,
    // the oracle recomputes every hash bit from the closed-form pixel
    // values (PNG gray8 is lossless, so decoded raster == closed form);
    // SUMs widen to HUGEINT -> cast at the boundary
    "image_ahash" -> (aHashSigSql +
      """
        |SELECT doc_id,
        |  MAX(CASE WHEN ci = 0 THEN cv END) AS h0,
        |  MAX(CASE WHEN ci = 1 THEN cv END) AS h1,
        |  MAX(CASE WHEN ci = 2 THEN cv END) AS h2,
        |  MAX(CASE WHEN ci = 3 THEN cv END) AS h3
        |FROM hh GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    // all-pairs Hamming screen over the same closed-form hashes: the
    // banded pipeline must surface every qualifying pair (pigeonhole)
    "image_ahash_dedup" -> (aHashSigSql +
      """,
        |sig AS (
        |  SELECT doc_id,
        |    MAX(CASE WHEN ci = 0 THEN cv END) AS h0,
        |    MAX(CASE WHEN ci = 1 THEN cv END) AS h1,
        |    MAX(CASE WHEN ci = 2 THEN cv END) AS h2,
        |    MAX(CASE WHEN ci = 3 THEN cv END) AS h3
        |  FROM hh GROUP BY doc_id)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(bit_count(xor(a.h0, b.h0)) + bit_count(xor(a.h1, b.h1))
        |     + bit_count(xor(a.h2, b.h2)) + bit_count(xor(a.h3, b.h3)) AS INT) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.h0, b.h0)) + bit_count(xor(a.h1, b.h1))
        |    + bit_count(xor(a.h2, b.h2)) + bit_count(xor(a.h3, b.h3)) <= 3
        |ORDER BY a_id, b_id""".stripMargin),
    "grid_dbscan" -> gridDbscanSql,
    // every dHash bit recomputed from the closed-form pixels on the
    // 8×9 gradient grid
    "image_dhash" -> (dHashSigSql +
      """
        |SELECT doc_id,
        |  MAX(CASE WHEN ci = 0 THEN cv END) AS h0,
        |  MAX(CASE WHEN ci = 1 THEN cv END) AS h1,
        |  MAX(CASE WHEN ci = 2 THEN cv END) AS h2,
        |  MAX(CASE WHEN ci = 3 THEN cv END) AS h3
        |FROM hh GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "image_dhash_dedup" -> (dHashSigSql +
      """,
        |sig AS (
        |  SELECT doc_id,
        |    MAX(CASE WHEN ci = 0 THEN cv END) AS h0,
        |    MAX(CASE WHEN ci = 1 THEN cv END) AS h1,
        |    MAX(CASE WHEN ci = 2 THEN cv END) AS h2,
        |    MAX(CASE WHEN ci = 3 THEN cv END) AS h3
        |  FROM hh GROUP BY doc_id)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(bit_count(xor(a.h0, b.h0)) + bit_count(xor(a.h1, b.h1))
        |     + bit_count(xor(a.h2, b.h2)) + bit_count(xor(a.h3, b.h3)) AS INT) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.h0, b.h0)) + bit_count(xor(a.h1, b.h1))
        |    + bit_count(xor(a.h2, b.h2)) + bit_count(xor(a.h3, b.h3)) <= 3
        |ORDER BY a_id, b_id""".stripMargin),
    // every frame energy recomputed from the closed-form PCM samples
    "audio_silence" ->
      """WITH p AS (
        |  SELECT doc_id, 3 + 2 * (doc_id // 4) AS k, doc_id % 4 AS step
        |  FROM documents WHERE doc_id < 240),
        |ts AS (SELECT doc_id, k, step,
        |         unnest(generate_series(0, 65 * 32 - 1)) AS t FROM p),
        |sv AS (SELECT doc_id, t // 32 AS f,
        |         CASE WHEN t < step * 40 THEN 0
        |              ELSE abs(((t * k) % 2000) - 1000) END AS av
        |       FROM ts),
        |en AS (SELECT doc_id, f, SUM(av) AS e FROM sv GROUP BY doc_id, f)
        |SELECT doc_id, CAST(65 AS BIGINT) AS n_frames,
        |  CAST(SUM(CASE WHEN e <= 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_silent,
        |  CAST(COALESCE(MIN(CASE WHEN e > 1000 THEN f END), 65) AS BIGINT)
        |    AS lead_silent
        |FROM en GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // every fingerprint bit recomputed from the closed-form PCM (PCM16
    // round-trips losslessly through the WAV container)
    "audio_fingerprint" -> (audioFpSigSql +
      """
        |SELECT doc_id,
        |  MAX(CASE WHEN ci = 0 THEN cv END) AS h0,
        |  MAX(CASE WHEN ci = 1 THEN cv END) AS h1,
        |  MAX(CASE WHEN ci = 2 THEN cv END) AS h2,
        |  MAX(CASE WHEN ci = 3 THEN cv END) AS h3
        |FROM hh GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "audio_fp_dedup" -> (audioFpSigSql +
      """,
        |sig AS (
        |  SELECT doc_id,
        |    MAX(CASE WHEN ci = 0 THEN cv END) AS h0,
        |    MAX(CASE WHEN ci = 1 THEN cv END) AS h1,
        |    MAX(CASE WHEN ci = 2 THEN cv END) AS h2,
        |    MAX(CASE WHEN ci = 3 THEN cv END) AS h3
        |  FROM hh GROUP BY doc_id)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(bit_count(xor(a.h0, b.h0)) + bit_count(xor(a.h1, b.h1))
        |     + bit_count(xor(a.h2, b.h2)) + bit_count(xor(a.h3, b.h3)) AS INT) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.h0, b.h0)) + bit_count(xor(a.h1, b.h1))
        |    + bit_count(xor(a.h2, b.h2)) + bit_count(xor(a.h3, b.h3)) <= 3
        |ORDER BY a_id, b_id""".stripMargin),
    "minhash_precision" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |  WHERE doc_id < 200 AND len(string_split(text, ' ')) >= 3),
        |sh AS (
        |  SELECT DISTINCT doc_id, sh FROM (
        |    SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 2),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
        |    FROM w)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT p.a_id, p.b_id, p.inter,
        |  CAST(na.n + nb.n - p.inter AS BIGINT) AS uni,
        |  CAST(round(CAST(p.inter AS DOUBLE) * 10000 / (na.n + nb.n - p.inter)) AS BIGINT) AS jacc_e4
        |FROM pairs p
        |JOIN sizes na ON na.doc_id = p.a_id
        |JOIN sizes nb ON nb.doc_id = p.b_id
        |WHERE p.inter * 2 >= na.n + nb.n - p.inter
        |ORDER BY p.a_id, p.b_id""".stripMargin,
    "lsh_precision" ->
      s"""WITH p AS (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |    sqrt(${sqL2Sql("a.embedding", "b.embedding")}) AS dist
         |  FROM embeddings a JOIN embeddings b
         |    ON a.vec_id < b.vec_id AND a.vec_id < 500 AND b.vec_id < 500)
         |SELECT a_id, b_id, CAST(round(dist * 10000) AS BIGINT) AS dist_e4
         |FROM p WHERE dist < 1.1 ORDER BY a_id, b_id""".stripMargin,
    "sq8_topk" ->
      """WITH q AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS q_emb
        |  FROM embeddings WHERE vec_id = 0),
        |mm AS (
        |  SELECT vec_id, embedding,
        |    CAST(list_min(embedding) AS DOUBLE) AS vmin,
        |    CAST(list_max(embedding) AS DOUBLE) AS vmax
        |  FROM embeddings),
        |dec AS (
        |  SELECT vec_id,
        |    CASE WHEN vmax = vmin
        |      THEN list_transform(embedding, x -> CAST(x AS DOUBLE))
        |      ELSE list_transform(embedding,
        |        x -> vmin + round((CAST(x AS DOUBLE) - vmin) * 255.0 / (vmax - vmin)) * (vmax - vmin) / 255.0)
        |    END AS dv
        |  FROM mm),
        |d AS (
        |  SELECT vec_id,
        |    list_sum(list_transform(list_zip(dv, q_emb), p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
        |  FROM dec CROSS JOIN q)
        |SELECT vec_id, CAST(round(d * 10000) AS BIGINT) AS dist_e4
        |FROM d ORDER BY d, vec_id LIMIT 13""".stripMargin,
    // the cuts derived from the daily series directly — the engine side
    // must reach the same decisions through the real AVI/JPEG decode
    "scene_change" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM events GROUP BY 1),
        |m AS (SELECT quantile_cont(rev, 0.5) AS md FROM daily),
        |idx AS (SELECT rev, ROW_NUMBER() OVER (ORDER BY day) - 1 AS i FROM daily),
        |b AS (
        |  SELECT i,
        |    CASE WHEN CAST(rev AS DOUBLE) > (SELECT md FROM m)
        |      THEN 1 ELSE 0 END AS br
        |  FROM idx)
        |SELECT CAST(i AS BIGINT) AS frame_idx, CAST(br AS BIGINT) AS is_bright,
        |  CAST(CASE WHEN i > 0 AND br <> LAG(br) OVER (ORDER BY i)
        |    THEN 1 ELSE 0 END AS BIGINT) AS is_cut
        |FROM b ORDER BY frame_idx""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  CAST(octet_length(CAST(text AS BLOB)) AS INT) AS byte_len,
        |  substring(sha256(text), 1, 16) AS content_hash
        |FROM documents ORDER BY doc_id""".stripMargin,
    "media_meta" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 300),
        |img AS (
        |  SELECT doc_id,
        |    8 + doc_id % 25 AS w, 8 + (doc_id * 7) % 25 AS h, doc_id % 190 AS base
        |  FROM ids WHERE doc_id % 2 = 0),
        |aud AS (
        |  SELECT doc_id,
        |    1 + doc_id % 37 AS k, 500 + doc_id % 1000 AS n,
        |    8000 + (doc_id % 5) * 1000 AS rate
        |  FROM ids WHERE doc_id % 2 = 1)
        |SELECT doc_id, 'image' AS modality, 'png' AS container,
        |  CAST(w AS INT) AS dim_a, CAST(h AS INT) AS dim_b, CAST(8 AS INT) AS bits,
        |  CAST(w * h AS BIGINT) AS units,
        |  CAST(w * h * base + h * (w * (w - 1) // 2) + w * (h * (h - 1) // 2) AS BIGINT) AS payload_sum,
        |  CAST(0 AS BIGINT) AS duration_us
        |FROM img
        |UNION ALL
        |SELECT doc_id, 'audio', 'wav', CAST(rate AS INT), CAST(1 AS INT), CAST(16 AS INT),
        |  CAST(n AS BIGINT),
        |  CAST(list_sum(list_transform(generate_series(0, n - 1), i -> (i * k) % 2000 - 1000)) AS BIGINT),
        |  CAST(n * 1000000 // rate AS BIGINT)
        |FROM aud
        |ORDER BY doc_id""".stripMargin,
    "video_meta" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'avi' WHEN 1 THEN 'mp4'
        |    ELSE CASE WHEN doc_id % 6 = 2 THEN 'webm' ELSE 'mkv' END END AS container,
        |  CASE doc_id % 3 WHEN 0 THEN 'mjpeg' WHEN 1 THEN 'avc1'
        |    ELSE CASE WHEN doc_id % 6 = 2 THEN 'V_VP9' ELSE 'V_MPEG4/ISO/AVC' END END AS codec,
        |  CAST(16 + doc_id % 17 AS INT) AS width,
        |  CAST(16 + (doc_id * 5) % 17 AS INT) AS height,
        |  CAST(2 + doc_id % 4 AS BIGINT) AS n_frames,
        |  CAST(40000 AS BIGINT) AS us_per_frame,
        |  CAST((2 + doc_id % 4) * 40000 AS BIGINT) AS duration_us
        |FROM documents WHERE doc_id < 120 ORDER BY doc_id""".stripMargin,
    "frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(0, (length(text) - 1) // 100),
        |    i -> struct_pack(frame_idx := i, byte_offset := i * 100,
        |                     frame := substring(text, i * 100 + 1, 64)))) AS s
        |  FROM documents WHERE doc_id < 100)
        |SELECT doc_id AS asset_id, CAST(s.frame_idx AS INT) AS frame_idx,
        |  CAST(s.byte_offset AS BIGINT) AS byte_offset,
        |  CAST(length(s.frame) AS BIGINT) AS frame_len,
        |  substring(sha256(s.frame), 1, 16) AS frame_fp
        |FROM f ORDER BY asset_id, frame_idx""".stripMargin
  )
}
