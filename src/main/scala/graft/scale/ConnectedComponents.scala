package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair/edge list — the step that
  * turns near-duplicate PAIRS (MinHash/SimHash/cosine output, [[NearDup]])
  * into duplicate CLUSTERS a training pipeline can collapse to one
  * representative per group. The reference deduplicates per-file by exact
  * hash only (/root/reference/helper/multiple_document_upload.py:139-149);
  * cluster collapse is the corpus-scale generalization the north star's
  * dedup family needs: near-dup is not transitive, so "keep min id per
  * pair" over-deletes — the correct unit is the connected component.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) — converges
  * in O(log² n) rounds independent of graph diameter, each round two
  * hash-partitioned shuffles keyed on node id. No adjacency list is ever
  * collected (a hot node with 10⁸ neighbors streams through min+join, not
  * collect_set), so the 100 TB shape holds: shuffle volume per round is
  * O(|edges|) of 16-byte rows.
  *
  * Per-round lineage is truncated with a LAZY `localCheckpoint`,
  * materialized by the convergence probe's aggregate in the same job.
  * Why not the cache+count cut [[PageRank]] uses (the repo's default
  * after the eager-localCheckpoint incident)? Because caching bounds
  * RE-EXECUTION, not PLAN SIZE: each round here references the previous
  * round's frame FOUR times (largeStar's two-way union, then smallStar's
  * self-join), so without real plan truncation the logical tree grows
  * ~4× per round and Catalyst analysis goes exponential long before
  * execution matters — a checkpoint (plan → LogicalRDD) is the only
  * thing that resets it. The PageRank footgun does not apply at this
  * site: that regression came from the EAGER variant paying a separate
  * non-AQE `toRdd` pass per iteration that re-sorted a large cached
  * join side; here the checkpoint is lazy (no second pass — the probe's
  * aggregate materializes it), each round's input is a checkpointed
  * RDD with no cached layout to lose, and the per-round plan is a
  * fixed-size two-shuffle star step where AQE has nothing to re-plan
  * at 32 partitions. On a multi-executor cluster with a long run, swap
  * for reliable `checkpoint` to a cluster-visible dir (mind its own
  * eagerness default); the loop shape is unchanged.
  */
object ConnectedComponents {

  /** Component id (= min node id in the component) for every node.
    *
    * @param edges undirected edge list with `src`/`dst` long columns;
    *              self-loops and duplicates tolerated.
    * @param nodes one `node` column — the full node universe, so isolated
    *              nodes (no edges) come back as their own singleton
    *              component instead of vanishing.
    * @return (node, component) — deterministic: the labeling is a pure
    *         function of the graph, whatever the partitioning or
    *         iteration interleave.
    */
  def components(edges: DataFrame, nodes: DataFrame, maxIter: Int = 50): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    // LAZY checkpoints: the signature probe right below is the first
    // action and materializes the checkpoint in the SAME job — an eager
    // checkpoint would pay a second full pass per round just to persist
    var (cur, curBlocks) = checkpointTracked(sc, canonical(edges))
    var sig = signature(cur)
    var converged = sig._1 == 0L // edgeless graph: all singletons
    var iter = 0
    while (!converged && iter < maxIter) {
      val (next, nextBlocks) = checkpointTracked(sc, smallStar(largeStar(cur)))
      val nsig = signature(next)
      // star-contraction is monotone: the edge set is a fixpoint iff one
      // more round reproduces it, compared here by (count, hash-sum)
      converged = nsig == sig
      // the probe above materialized `next`, so the superseded round's
      // checkpoint blocks can go now — without this, up to maxIter rounds
      // of edge blocks pile up on executor storage for the whole job. Only
      // the final round's blocks stay alive (the returned plan reads them).
      curBlocks.foreach(_.unpersist(blocking = false))
      cur = next; curBlocks = nextBlocks; sig = nsig
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    // fixpoint is a forest of stars: every edge is (member, root) with the
    // root the component minimum; roots and isolated nodes map to themselves
    val membership = cur.select(col("u").as("node"), col("v").as("component"))
      .unionByName(cur.select(col("v").as("node"), col("v").as("component")))
      .groupBy(col("node")).agg(min(col("component")).as("component"))
    nodes.select(col("node").cast("long"))
      .join(membership, Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
  }

  /** Incremental maintenance: fold NEW edges into an existing labeling
    * without touching the old graph's edge set. The prior labeling is
    * itself a star forest (node → component), so re-running contraction
    * over [labels-as-edges ∪ new edges] starts one contraction step from
    * done wherever nothing changed — rounds scale with how much the new
    * edges perturb the structure, not with history. Component ids stay
    * the component minimum, so ids are stable unless a merge introduces
    * a smaller member (exactly the semantics a dedup pipeline wants:
    * growing a cluster keeps its representative).
    *
    * @param labels prior (node, component) output of [[components]]
    * @param newEdges src/dst pairs; may reference brand-new nodes
    */
  def addEdges(labels: DataFrame, newEdges: DataFrame, maxIter: Int = 50): DataFrame = {
    val labelEdges = labels.select(col("node").as("src"), col("component").as("dst"))
    val nodes = labels.select(col("node"))
      .unionByName(newEdges.select(col("src").cast("long").as("node")))
      .unionByName(newEdges.select(col("dst").cast("long").as("node")))
      .distinct()
    components(labelEdges.unionByName(
      newEdges.select(col("src").cast("long"), col("dst").cast("long"))),
      nodes, maxIter)
  }

  /** `localCheckpoint` plus a handle to the blocks it persisted, so the
    * loop can free a superseded round. `Dataset.unpersist` can't do it —
    * it only uncaches cache-manager entries, and a checkpoint persists at
    * the RDD layer — so the fresh RDD is identified by diffing
    * `getPersistentRDDs` around the call (the checkpoint registers its
    * persistence eagerly even when materialization is lazy). A concurrent
    * persist from another thread inside this microsecond window would be
    * collateral; the CC loop is single-threaded per call and worst case is
    * an early re-computation, never wrong results. */
  private def checkpointTracked(sc: org.apache.spark.SparkContext,
      df: DataFrame): (DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) = {
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint(false)
    val fresh = sc.getPersistentRDDs.collect {
      case (id, rdd) if !before(id) => rdd
    }.toSeq
    (out, fresh)
  }

  /** canonical undirected form: (u, v) with u > v, no self-loops, distinct. */
  private def canonical(edges: DataFrame): DataFrame =
    edges.select(
        greatest(col("src").cast("long"), col("dst").cast("long")).as("u"),
        least(col("src").cast("long"), col("dst").cast("long")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  /** Large-star: every node links its LARGER neighbors to the minimum of
    * its neighborhood (incl. itself). Computed as agg-then-join so a hot
    * node never materializes its neighbor array on one task. */
  private def largeStar(edges: DataFrame): DataFrame = {
    val adj = edges.select(col("u").as("a"), col("v").as("b"))
      .unionByName(edges.select(col("v").as("a"), col("u").as("b")))
    val mins = adj.groupBy(col("a")).agg(min(col("b")).as("mn"))
      .select(col("a"), least(col("mn"), col("a")).as("m"))
    adj.join(mins, Seq("a")) // co-partitioned on a with the agg above
      .filter(col("b") > col("a"))
      .select(col("b").as("u"), col("m").as("v")) // b > a >= m, stays canonical
      .distinct()
  }

  /** Small-star: every node links its SMALLER neighbors (and itself) to
    * the minimum of those. Input must be canonical (u > v). */
  private def smallStar(edges: DataFrame): DataFrame = {
    val mins = edges.groupBy(col("u")).agg(min(col("v")).as("m"))
    edges.join(mins, Seq("u"))
      .select(col("v").as("x"), col("m"))
      .unionByName(mins.select(col("u").as("x"), col("m")))
      .filter(col("x") =!= col("m"))
      .select(greatest(col("x"), col("m")).as("u"), least(col("x"), col("m")).as("v"))
      .distinct()
  }

  /** Cheap fixpoint probe: (row count, XOR of edge hashes) — XOR is
    * order-independent and overflow-free under ANSI mode. A collision
    * passing as convergence needs two distinct same-size edge sets with
    * equal 64-bit hash XORs inside one run — negligible next to task
    * failure rates, and the declared-query oracle would catch it. */
  private def signature(edges: DataFrame): (Long, Long) = {
    val r = edges.agg(
      count(lit(1)).as("n"),
      coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("h")).head()
    (r.getLong(0), r.getLong(1))
  }
}
