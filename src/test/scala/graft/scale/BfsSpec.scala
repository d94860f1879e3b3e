package graft.scale

import graft.SparkSpec

/** Frontier BFS: min-hop semantics, unreachable nodes, multi-source. */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(String, String)], seeds: Seq[String], max: Int) =
    Bfs.run(edges.toDF("src", "dst"), seeds.toDF("node"), max)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap

  test("min hop wins when a node is reachable along several paths") {
    // a->b->c->d plus shortcut a->c; c must be hop 1, d hop 2
    val g = Seq("a" -> "b", "b" -> "c", "c" -> "d", "a" -> "c")
    assert(run(g, Seq("a"), 3) ==
      Map("a" -> 0, "b" -> 1, "c" -> 1, "d" -> 2))
  }

  test("unreachable nodes are absent; maxHops truncates") {
    val g = Seq("a" -> "b", "b" -> "c", "x" -> "y")
    assert(run(g, Seq("a"), 1) == Map("a" -> 0, "b" -> 1))
    assert(run(g, Seq("a"), 0) == Map("a" -> 0))
  }

  test("multi-source: every node takes its closest seed; cycles terminate") {
    val g = Seq("a" -> "b", "b" -> "a", "b" -> "c", "z" -> "c")
    assert(run(g, Seq("a", "z"), 5) ==
      Map("a" -> 0, "z" -> 0, "b" -> 1, "c" -> 1))
  }

  test("duplicate seed rows don't fake a fixpoint (round-8 advice case)") {
    // with seeds [a,a] on a->b->c, an un-deduped visited frame counts 2
    // rows, round 1's deduped merge also counts 2 (a,b), and the
    // unchanged-count fixpoint would exit before reaching c
    val g = Seq("a" -> "b", "b" -> "c")
    assert(run(g, Seq("a", "a"), 3) == Map("a" -> 0, "b" -> 1, "c" -> 2))
  }

  test("seed re-reached via a cycle keeps hop 0") {
    val g = Seq("a" -> "b", "b" -> "a")
    assert(run(g, Seq("a"), 4) == Map("a" -> 0, "b" -> 1))
  }
}
