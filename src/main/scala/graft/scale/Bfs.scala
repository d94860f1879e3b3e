package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS (minimum hop count) over a directed edge list — the
  * reachability primitive behind link-graph crawl frontier scheduling
  * ("how far is each page from the seed list?") and contamination
  * spread analysis over citation/link graphs.
  *
  * Reference scope: no graph op in the reference; SURVEY §2.3 graph
  * family extension alongside PageRank / label propagation / connected
  * components / triangles.
  *
  * Shape, like [[PageRank]]: the edge list is hash-partitioned on `src`
  * ONCE and cached; each round moves only the frontier (the nodes first
  * reached in the previous round — against a web graph the frontier is
  * a vanishing fraction of |E|). A round is one equi-join frontier⨝edges
  * plus one `groupBy(node).min(hop)` partial-aggregated shuffle, and the
  * visited set is folded in with a union+min rather than an anti-join
  * (same result — a revisited node keeps its smaller hop — but one
  * shuffle, not two). Rounds are synchronous; `maxHops` bounds them, so
  * the driver loop is O(maxHops) fixed iterations of declarative plans,
  * with a cache+count lineage cut per round (the [[PageRank]] idiom —
  * NOT eager localCheckpoint, which bypasses AQE).
  */
object Bfs {

  /** Minimum hops from any seed, up to `maxHops`. `edges`: (`src`,
    * `dst`) directed; `seeds`: (`node`). Unreachable nodes are absent.
    * Output: (`node`, `hop`).
    *
    * `broadcastFrontier`: when the caller KNOWS the frontier stays
    * driver-small (a bounded community, one bipartition side), each
    * round's frontier⨝edges join broadcasts the frontier — map-side
    * over the cached edge partitions, no frontier shuffle and no edge
    * exchange at all. Default OFF: on a web-scale graph the wavefront
    * can be O(|V|) and a forced broadcast would OOM the driver — the
    * shuffling plan is the scale-safe default. */
  def run(edges: DataFrame, seeds: DataFrame, maxHops: Int,
      broadcastFrontier: Boolean = false): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    if (maxHops <= LazyHorizon)
      return runUnrolled(edges, seeds, maxHops, broadcastFrontier)
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src")).cache()
    // dedup seeds: visitedSize counts ROWS, and the fixpoint test below
    // compares it against a groupBy-deduped merge — duplicate seed rows
    // would make round 1 look like a no-op and exit before traversal
    var visited = seeds.select(col("node")).distinct()
      .select(col("node"), lit(0).as("hop")).cache()
    var visitedSize = visited.count()
    var frontier = visited
    var hop = 0
    var exhausted = false
    while (hop < maxHops && !exhausted) {
      hop += 1
      val f = if (broadcastFrontier) broadcast(frontier) else frontier
      val next = f.join(e, col("node") === col("src"))
        .select(col("dst").as("node"), lit(hop).as("hop"))
      val merged = visited.unionByName(next)
        .groupBy(col("node")).agg(min(col("hop")).as("hop"))
        .cache()
      val mergedSize = merged.count() // materialize: cuts lineage, lets the old cache drop
      // drop the previous round's cache only AFTER merged materialized
      // (the union read it); the final round's cache backs the returned
      // frame and is the caller's to release
      visited.unpersist()
      visited = merged
      frontier = merged.filter(col("hop") === hop)
      // fixpoint: a round can only ADD nodes (an already-visited node
      // keeps its smaller hop), so an unchanged count means an empty
      // frontier — stop instead of paying a join+shuffle per dead round
      // when maxHops exceeds the graph's eccentricity
      exhausted = mergedSize == visitedSize
      visitedSize = mergedSize
    }
    e.unpersist()
    visited
  }

  /** Horizon below which the whole traversal is ONE lazy plan. Both
    * engine callers use 3-4 hops; past ~6 the per-level distinct plans
    * nest deep enough that the materialized loop's lineage cuts win. */
  private val LazyHorizon = 6

  /** Fixed-small-horizon BFS as ONE lazy plan (r17, guide §2.4 — the
    * harmonic_centrality r16 rework generalized): level k is the distinct
    * exactly-k-step neighborhood of the seeds; levels union lazily and
    * ONE final min-hop aggregate recovers the BFS layering (a shortest
    * path of length k is a k-step walk, so node v appears in level d(v);
    * min over levels = d(v) — output-identical to the materialized loop).
    * No per-round cache/count/unpersist: the loop version paid ~7 jobs
    * per traversal in per-job fixed cost at any scale (and at 100 TB a
    * blocking materialization barrier per round); this is one job, and
    * identical level subplans deduplicate through exchange reuse. The
    * per-level distinct still bounds growth at |V| rows per level. */
  private def runUnrolled(edges: DataFrame, seeds: DataFrame, maxHops: Int,
      broadcastFrontier: Boolean): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    var cur = seeds.select(col("node")).distinct()
    var levels = Vector(cur.select(col("node"), lit(0).as("hop")))
    for (hop <- 1 to maxHops) {
      val f = if (broadcastFrontier) broadcast(cur) else cur
      cur = f.join(e, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
      levels = levels :+ cur.select(col("node"), lit(hop).as("hop"))
    }
    levels.reduce(_.unionByName(_))
      .groupBy(col("node")).agg(min(col("hop")).as("hop"))
  }
}
