package graft.scale

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Ground truth by sequential union-find. */
  private def unionFind(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // relabel every root to the component MINIMUM (union order above
    // already guarantees the root is the min, but normalize regardless)
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val m = members.min; members.map(_ -> m)
    }
  }

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    labelsOf(ConnectedComponents.components(edges.toDF("src", "dst"), nodes.toDF("node")))

  test("a long chain collapses to one component labeled by its minimum") {
    // path graph 0-1-2-...-63: diameter 63, but star contraction must
    // converge in far fewer than the maxIter=50 rounds (O(log^2 n))
    val nodes = (0L to 63L)
    val edges = (0L until 63L).map(i => (i, i + 1))
    val got = run(nodes, edges)
    assert(got.values.toSet == Set(0L))
    assert(got.size == 64)
  }

  test("isolated nodes are singleton components; self-loops are ignored") {
    val got = run(Seq(1L, 2L, 3L, 9L), Seq((1L, 2L), (3L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 9L -> 9L))
  }

  test("matches union-find on seeded random graphs") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val nodes = (0L until 200L)
      val edges = Seq.fill(150)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      assert(run(nodes, edges) == unionFind(nodes, edges), s"seed $seed")
    }
  }

  test("labels are ids, not positions: sparse non-contiguous node ids") {
    val nodes = Seq(5L, 1000000L, 7L, 42L)
    val edges = Seq((1000000L, 7L), (7L, 42L))
    assert(run(nodes, edges) == Map(5L -> 5L, 7L -> 7L, 42L -> 7L, 1000000L -> 7L))
  }

  test("incremental addEdges equals a full recompute over the union graph") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed * 17)
      val oldEdges = Seq.fill(60)((rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
      val newEdges = Seq.fill(40)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      val base = ConnectedComponents.components(
        oldEdges.toDF("src", "dst"), (0L until 100L).toDF("node"))
      val got = labelsOf(ConnectedComponents.addEdges(base, newEdges.toDF("src", "dst")))
      // addEdges' node universe = prior nodes ∪ new-edge endpoints (a
      // node it has never seen can't be labeled)
      val nodes = ((0L until 100L) ++ newEdges.flatMap(e => Seq(e._1, e._2))).distinct
      val want = unionFind(nodes, oldEdges ++ newEdges)
      assert(got == want, s"seed $seed")
    }
  }

  test("addEdges keeps a cluster's representative when it only grows") {
    val base = ConnectedComponents.components(
      Seq((5L, 9L)).toDF("src", "dst"), Seq(5L, 9L).toDF("node"))
    val got = labelsOf(ConnectedComponents.addEdges(base, Seq((9L, 30L)).toDF("src", "dst")))
    assert(got == Map(5L -> 5L, 9L -> 5L, 30L -> 5L))
  }

  test("duplicate and reversed edges do not change the labeling") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L))
    assert(run(Seq(1L, 2L, 3L), edges) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
