package graft.scale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over a directed edge list — the web-graph
  * quality weight a pre-training corpus pipeline carries per page
  * (Common-Crawl-style harmonic/PageRank centrality as a document prior).
  *
  * Reference scope: the reference has no graph op; this is a SURVEY §2.3
  * north-star extension (training-data pipeline operator family, with
  * X23 connected components and X52 triangle counting).
  *
  * Shape, not Pregel: each iteration is one broadcast-free equi-join of
  * the rank vector against the out-degree-annotated edge list, then a
  * partial-aggregated `groupBy(dst)` — the contribution sum combines
  * map-side, so the per-iteration shuffle carries at most one row per
  * (partition, node), never one per edge. The edge list is hash-partitioned
  * on `src` ONCE and persisted; every iteration's join reuses that layout
  * (the rank vector, |V| rows, is the only side that moves). At 100 TB the
  * edge list is the big table and stays put — this is the property that
  * makes iterative graph analytics affordable on Spark without GraphX.
  *
  * Dangling mass: nodes with no out-edges would leak rank. Callers build
  * edge lists where every node has ≥ 1 out-edge (an undirected graph fed
  * as both directions satisfies this by construction); `run` asserts it.
  * Nodes with no IN-edges still receive the teleport term via the left
  * join against the node set.
  */
object PageRank {

  /** Ranks after `iterations` synchronous power-iteration steps from the
    * uniform vector, damping `d`: r(v) = (1-d)/N + d * Σ_{(u,v)∈E} r(u)/deg⁺(u).
    *
    * `edges` must be a deduplicated directed edge list with columns
    * (`src`, `dst`) in which every node occurs as a `src`.
    */
  def run(edges: DataFrame, iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg")).persist()
    // partition the (edge ⨝ degree) table by src once; the per-iteration
    // join then shuffles only the rank vector to this fixed layout
    val e = edges.join(deg, "src").repartition(col("src")).persist()
    // every node must appear as a src, so the degree table's key set IS
    // the node set — no separate distinct over the edge list
    val nodes = deg.select(col("src").as("node"))
    val n = nodes.count() // one driver scalar: |V|
    val danglers = edges.select(col("dst").as("src"))
      .join(deg.select("src"), Seq("src"), "left_anti").limit(1).count()
    require(danglers == 0,
      "every node must have an out-edge (feed undirected graphs as both directions)")

    val teleport = (1.0 - damping) / n
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("outdeg")).as("mass"))
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + lit(damping) * coalesce(col("mass"), lit(0.0))).as("rank"))
    }
    ranks
  }
}
