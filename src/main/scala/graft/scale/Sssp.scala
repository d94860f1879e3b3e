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
    * Unreachable nodes are absent. Output: (`node`, `dist`). */
  def run(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .repartition(col("src")).cache()
    var dist = seeds.select(col("node")).distinct()
      .select(col("node"), lit(0L).as("dist")).cache()
    var frontier = dist
    var round = 0
    var done = false
    while (round < rounds && !done) {
      round += 1
      // candidate distances through the frontier, pre-aggregated so the
      // improvement join sees one row per touched node
      val cand = frontier.join(e, col("node") === col("src"))
        .select(col("dst").as("cnode"), (col("dist") + col("w")).as("cdist"))
        .groupBy(col("cnode")).agg(min(col("cdist")).as("cdist"))
      // keep only true improvements (new node, or strictly smaller)
      val improved = cand
        .join(dist.select(col("node").as("dnode"), col("dist").as("dold")),
          col("cnode") === col("dnode"), "left")
        .where(col("dnode").isNull || col("cdist") < col("dold"))
        .select(col("cnode").as("node"), col("cdist").as("dist"))
        .cache()
      val improvedCount = improved.count()
      // improved is materialized, so the previous frontier's cache (the
      // prior round's improved set; round 1's aliases dist) can drop
      if (frontier ne dist) frontier.unpersist(): Unit
      if (improvedCount == 0) {
        improved.unpersist()
        done = true
      } else {
        val merged = dist.unionByName(improved)
          .groupBy(col("node")).agg(min(col("dist")).as("dist"))
          .cache()
        merged.count(): Unit // materialize, then drop the inputs' caches
        dist.unpersist()
        dist = merged
        frontier = improved
      }
    }
    e.unpersist()
    dist
  }
}
