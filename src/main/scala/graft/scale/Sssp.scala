package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-source (multi-seed) WEIGHTED shortest path over a directed
  * edge list — Bellman-Ford relaxation rounds with the frontier delta
  * optimization: [[Bfs]] answers "how many hops", this answers "how much
  * total edge weight", the routing/cost-propagation primitive (latency-
  * weighted link graphs, trust propagation, cheapest-join-path).
  *
  * Reference scope: no graph op in the reference; SURVEY §2.3 graph
  * family extension alongside BFS / PageRank / components.
  *
  * Shape: the edge list is hash-partitioned on `src` ONCE and cached.
  * A round relaxes only the FRONTIER — the nodes whose distance improved
  * in the previous round (after round 1 that is a vanishing fraction of
  * |V|, the same argument as [[Bfs]]'s frontier): one equi-join
  * frontier⨝edges, one `groupBy(node).min` candidate pre-aggregation
  * (map-side combine shrinks the shuffle to one row per touched node),
  * one left join against the current distance table to keep only true
  * improvements, and one union+min fold into the new distance table.
  * Frontier relaxation IS Bellman-Ford — after r rounds every node holds
  * the exact shortest distance using ≤ r edges, which is what the
  * bounded-round oracle (a recursive CTE with a hop guard) replays.
  * Rounds stop early when a round improves nothing; `rounds` bounds the
  * driver loop. Caches are count()-materialized per round to cut lineage
  * (the [[PageRank]] idiom).
  *
  * Weights are caller-supplied integers (column `w` ≥ 0) so distances
  * are exact longs — no float accumulation order to disagree on.
  */
object Sssp {

  /** Minimum total weight from any seed within `rounds` edges.
    * `edges`: (`src`, `dst`, `w`: long); `seeds`: (`node`).
    * Unreachable nodes are absent. Output: (`node`, `dist`).
    *
    * ONE action per round (VERDICT r13 #3 — the runPersonalized
    * combined-stats shape): the previous two-action form paid an
    * `improved.count()` job AND a `merged.count()` job, plus a third
    * shuffle (improvement left-join, then a separate union+groupBy
    * fold). Here one FULL-OUTER join folds distance table and
    * candidates into the new table with a per-row `imp` flag, and one
    * aggregate action both materializes the round's cache and returns
    * the improvement count the fixpoint test needs. */
  def run(edges: DataFrame, seeds: DataFrame, rounds: Int,
      broadcastFrontier: Boolean = false): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    if (rounds <= LazyHorizon)
      return runUnrolled(edges, seeds, rounds, broadcastFrontier)
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .repartition(col("src")).cache()
    var cached = seeds.select(col("node")).distinct()
      .select(col("node"), lit(0L).as("dist"), lit(true).as("imp")).cache()
    var dist = cached.select(col("node"), col("dist"))
    var frontier = dist
    var round = 0
    var done = false
    while (round < rounds && !done) {
      round += 1
      // candidate distances through the frontier, pre-aggregated so the
      // fold join sees one row per touched node
      val cand = frontier.join(e, col("node") === col("src"))
        .select(col("dst").as("cnode"), (col("dist") + col("w")).as("cdist"))
        .groupBy(col("cnode")).agg(min(col("cdist")).as("cdist"))
      val better = col("cnode").isNotNull &&
        (col("dold").isNull || col("cdist") < col("dold"))
      val folded = dist.select(col("node").as("dnode"), col("dist").as("dold"))
        .join(cand, col("dnode") === col("cnode"), "full_outer")
        .select(coalesce(col("dnode"), col("cnode")).as("node"),
          when(better, col("cdist")).otherwise(col("dold")).as("dist"),
          better.as("imp"))
        .cache()
      // the ONE driver action: materializes the cache AND answers the
      // fixpoint probe (count() of a filter would be a second job)
      val improvedCount = folded.agg(count(when(col("imp"), 1)).as("c"))
        .head.getLong(0)
      cached.unpersist() // folded is materialized; the old cache can drop
      cached = folded
      dist = folded.select(col("node"), col("dist"))
      if (improvedCount == 0) done = true
      else frontier = folded.filter(col("imp")).select(col("node"), col("dist"))
    }
    e.unpersist()
    dist // backed by the final round's cache, the caller's to release
  }

  /** Round count below which the relaxation is ONE lazy plan (the
    * [[Bfs.runUnrolled]] rationale; the engine caller uses 3 rounds). */
  private val LazyHorizon = 6

  /** Bounded Bellman-Ford as ONE lazy plan (r17, guide §2.4): round k's
    * distance table is min(D_{k−1}, relax(D_{k−1})) folded by a
    * union + groupBy-min — after r rounds every node holds the exact
    * min total weight over walks of ≤ r edges, identical to the
    * frontier loop's output (the frontier filter is a work-avoidance
    * device, not a semantics one). No per-round cache/count/head jobs:
    * the loop form paid a blocking materialization + a driver fixpoint
    * probe per round; identical D_{k−1} subplans deduplicate through
    * exchange reuse, and the per-round groupBy bounds each table at
    * |V| rows. */
  private def runUnrolled(edges: DataFrame, seeds: DataFrame,
      rounds: Int, broadcastFrontier: Boolean): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
    var dist = seeds.select(col("node")).distinct()
      .select(col("node"), lit(0L).as("dist"))
    for (_ <- 1 to rounds) {
      // `broadcastFrontier`: the caller asserts the node set is bounded
      // (a catalog-dimension graph) — the distance table, ≤ |V| rows,
      // broadcasts and each relaxation is map-side over the edge scan
      // (the [[Bfs.run]] contract; default stays the shuffling plan)
      val d = if (broadcastFrontier) broadcast(dist) else dist
      val cand = d.join(e, col("node") === col("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionByName(cand)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
    }
    dist
  }
}
