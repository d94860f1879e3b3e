package graft.scale

import graft.SparkSpec

/** K-core peel schedule: brute-force equality on planted graphs, the
  * ends-inward path cascade, fixture convergence inside the oracle
  * unroll. */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def doubled(es: Seq[(String, String)]) =
    (es ++ es.map(_.swap)).toDF("src", "dst")

  private def brute(es: Seq[(String, String)], k: Int): Map[String, (Long, Long)] = {
    val adj = (es ++ es.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var alive = adj.keySet
    var out = Map.empty[String, (Long, Long)]
    var round = 0L
    var done = false
    while (!done) {
      round += 1
      val dead = alive.filter(n => (adj(n) & alive).size < k)
      if (dead.isEmpty) done = true
      else { out ++= dead.map(_ -> (round, 0L)); alive --= dead }
    }
    out ++ alive.map(_ -> (0L, 1L))
  }

  private def got(es: Seq[(String, String)], k: Int): Map[String, (Long, Long)] =
    KCore.peel(doubled(es), k).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("path graph peels ends-inward, one layer per round") {
    // P6: a-b-c-d-e-f, k=2 — endpoints fall each round, 3 rounds, no core
    val es = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e", "e" -> "f")
    val r = got(es, 2)
    assert(r == Map(
      "a" -> (1L, 0L), "f" -> (1L, 0L),
      "b" -> (2L, 0L), "e" -> (2L, 0L),
      "c" -> (3L, 0L), "d" -> (3L, 0L)))
  }

  test("cycle plus pendant: core survives, pendant chain peels") {
    // triangle x-y-z (2-core) with chain z-p-q hanging off
    val es = Seq("x" -> "y", "y" -> "z", "z" -> "x", "z" -> "p", "p" -> "q")
    val r = got(es, 2)
    assert(r("x") == ((0L, 1L)) && r("y") == ((0L, 1L)) && r("z") == ((0L, 1L)))
    assert(r("q") == ((1L, 0L)) && r("p") == ((2L, 0L)))
  }

  test("random graph matches brute force at several k") {
    val rnd = new scala.util.Random(7)
    val es = Seq.fill(120)((s"n${rnd.nextInt(40)}", s"n${rnd.nextInt(40)}"))
      .filter(e => e._1 != e._2).distinct
    for (k <- Seq(1, 2, 3, 4)) assert(got(es, k) == brute(es, k), s"k=$k")
  }

  test("fixture cascade converges well inside the oracle unroll") {
    val rows = graft.Tables.lineitem(spark, sfDir)
      .groupBy($"l_partkey", $"l_suppkey").count().filter($"count" >= 3)
      .select(concat(lit("p"), $"l_partkey"), concat(lit("s"), $"l_suppkey"))
      .as[(String, String)].collect()
    val exp = brute(rows, 2)
    val maxRound = exp.values.map(_._1).max
    assert(maxRound <= graft.queries.RelationalQueries.KCORE_ROUNDS - 2,
      s"fixture peels in $maxRound rounds; oracle unrolls ${graft.queries.RelationalQueries.KCORE_ROUNDS}")
    val r = graft.queries.RelationalQueries.kCore(spark, sfDir).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r == exp)
  }

  private def concat(c1: org.apache.spark.sql.Column, c2: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.concat(c1, c2)
  private def lit(v: Any) = org.apache.spark.sql.functions.lit(v)

  test("ktruss: pendant chains prune, triangles survive, cascade works") {
    import org.apache.spark.sql.functions.col
    // triangle 1-2-3 with a pendant chain 3-4-5: chain edges never close
    // a triangle and drop in round 1; the triangle survives k=3
    val g1 = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val r1 = graft.queries.RelationalQueries.ktrussCore(g1, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(r1.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 2L)), r1.mkString(","))
    // CASCADE: two triangles sharing edge (2,3) plus a bow-tie bridge:
    // k=4 needs support >= 2 — only the shared edge has it initially,
    // but its endpoints' other edges died, so round 2 empties it too
    val g2 = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    assert(graft.queries.RelationalQueries.ktrussCore(g2, 4).count() == 0)
    // a K4 is a 4-truss: every edge sits in 2 triangles
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    val r4 = graft.queries.RelationalQueries.ktrussCore(k4, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(r4.toSeq == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
    // fixture replay sanity: declared query output is non-empty and every
    // truss degree >= 2 (any 3-truss survivor edge closes a triangle, so
    // each surviving node keeps >= 2 surviving edges — ADVICE r12)
    val fix = graft.queries.RelationalQueries.ktrussEdges(spark, sfDir)
      .collect()
    assert(fix.nonEmpty && fix.forall(_.getLong(1) >= 2))
  }

  test("ktruss: oriented wedge enumeration stays bounded on a planted hub star") {
    import org.apache.spark.sql.functions.col
    // a 400-leaf hub star with a K4 planted on the hub: the unoriented
    // dbl ⋈ dbl recipe generated O(hub-degree²) ≈ 160k wedge candidates;
    // the (deg, id) orientation points every star edge INTO the hub, so
    // the hub's out-degree is 0 and each leaf's is ≤ 3 (VERDICT r12 #2)
    val hub = 0L
    val star = (10L until 410L).map(l => (hub, l))
    val k4 = Seq((hub, 1L), (hub, 2L), (hub, 3L),
      (1L, 2L), (1L, 3L), (2L, 3L))
    val g = (star ++ k4).toDF("u", "v")
    val outDeg = graft.queries.RelationalQueries.orientEdges(g)
      .groupBy(col("s")).count().collect()
    // max degree is 403 (the hub) but max oriented out-degree must stay
    // tiny — the Σ outdeg² wedge bound the recipe exists for
    assert(outDeg.map(_.getLong(1)).max <= 3, outDeg.mkString(","))
    // each K4 triangle enumerated exactly once, none duplicated
    val tris = graft.queries.RelationalQueries.orientedTriangles(g)
      .collect().map(r => Set(r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(tris.length == 4 && tris.distinct.length == 4, tris.mkString(","))
    // and the truss readout is exactly the planted K4
    val r = graft.queries.RelationalQueries.ktrussCore(g, 4).collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(r.toSeq == Seq((hub, 3L), (1L, 3L), (2L, 3L), (3L, 3L)),
      r.mkString(","))
  }

  test("modularity: planted two-clique labeling scores the exact fraction") {
    // two K5 cliques {0..4} and {10..14} joined by one bridge (4, 10);
    // labels = clique membership. Q replays locally in exact rationals.
    def k5(off: Long) = for {
      a <- 0L until 5L; b <- 0L until 5L if a < b
    } yield (off + a, off + b)
    val fwd = (k5(0) ++ k5(10) :+ (4L, 10L)).toDF("u", "v")
    val edges = fwd.select($"u".as("src"), $"v".as("dst"))
      .unionByName(fwd.select($"v".as("src"), $"u".as("dst")))
    val lab = (0L until 5L).map(n => (n, 0L))
      .++((10L until 15L).map(n => (n, 1L))).toDF("node", "lbl")
    val got = graft.queries.RelationalQueries.modularityOf(edges, lab).head()
    val m2 = 2L * 21L // 21 undirected edges doubled
    val eIn2 = 2L * 20L // the bridge is the only cross edge
    // degree sums: bridge endpoints have deg 5, others 4 → 21 per clique
    val d2Sum = 2L * 21L * 21L
    assert(got.getLong(0) == m2 && got.getLong(1) == eIn2 &&
      got.getLong(2) == 2L)
    val expectQ = math.round(
      (eIn2.toDouble * m2 - d2Sum) / (m2.toDouble * m2) * 1e6)
    assert(got.getLong(3) == expectQ, s"q_e6=${got.getLong(3)} vs $expectQ")
    assert(got.getLong(3) > 400000L, "two planted cliques must score high Q")
    // degenerate labeling (everything one community) scores Q = 0
    val one = lab.select($"node", lit(0L).as("lbl"))
    assert(graft.queries.RelationalQueries.modularityOf(edges, one)
      .head().getLong(3) == 0L)
  }
}
