package graft.scale

import graft.SparkSpec

/** Weighted-shortest-path semantics: cheaper-but-longer paths must win
  * over fewer-hop paths (the case hop-BFS gets wrong), bounded rounds
  * must mean "shortest using ≤ r edges", and duplicate seeds must not
  * break the frontier rounds. */
class SsspSpec extends SparkSpec {
  import spark.implicits._

  private def dists(edges: Seq[(String, String, Long)], seeds: Seq[String],
      rounds: Int): Map[String, Long] =
    Sssp.run(edges.toDF("src", "dst", "w"), seeds.toDF("node"), rounds)
      .as[(String, Long)].collect().toMap

  test("cheaper two-hop path beats the direct heavy edge") {
    val e = Seq(("a", "b", 10L), ("a", "c", 2L), ("c", "b", 3L))
    assert(dists(e, Seq("a"), 3) == Map("a" -> 0L, "b" -> 5L, "c" -> 2L))
  }

  test("round bound limits path length: 1 round sees only direct edges") {
    val e = Seq(("a", "b", 10L), ("a", "c", 2L), ("c", "b", 3L))
    assert(dists(e, Seq("a"), 1) == Map("a" -> 0L, "b" -> 10L, "c" -> 2L))
  }

  test("multi-seed takes the minimum over sources; duplicate seeds harmless") {
    val e = Seq(("a", "m", 7L), ("b", "m", 4L), ("m", "z", 1L))
    assert(dists(e, Seq("a", "b", "b"), 3) ==
      Map("a" -> 0L, "b" -> 0L, "m" -> 4L, "z" -> 5L))
  }

  test("early fixpoint: extra rounds after convergence change nothing") {
    val e = Seq(("a", "b", 1L), ("b", "c", 1L))
    assert(dists(e, Seq("a"), 10) == Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
  }

  test("a later round may improve an already-settled node (negative-free relax)") {
    // b reached in 1 hop at cost 9, improved in round 3 via a->x->y->b = 3
    val e = Seq(("a", "b", 9L), ("a", "x", 1L), ("x", "y", 1L), ("y", "b", 1L))
    assert(dists(e, Seq("a"), 3)("b") == 3L)
    assert(dists(e, Seq("a"), 2)("b") == 9L)
  }
}
