package graft.scale

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PageRankSpec extends SparkSpec {

  private def edges(pairs: (String, String)*) = {
    val s = spark; import s.implicits._
    pairs.toDF("src", "dst")
  }

  private def ranksOf(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
    df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  private def ranksE12(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.select("node", "rank_e12").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** The exact e12 integer recurrence of [[PageRank.run]], executed as
    * plain driver-side Scala — the independent twin the distributed run
    * must match BIT FOR BIT (integer arithmetic is order-free, so any
    * disagreement is a real defect, never summation noise). */
  private def simulate(adj: Map[String, Seq[String]], iters: Int): Map[String, Long] = {
    val nodes = adj.keySet
    val n = nodes.size
    val tp = 15L * 1000000000000L / (100L * n)
    var r = nodes.map(_ -> 1000000000000L / n).toMap
    for (_ <- 1 to iters) {
      val mass = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((u, outs) <- adj; v <- outs) mass(v) += r(u) / outs.size
      r = nodes.map(v => v -> (tp + 85L * mass(v) / 100L)).toMap
    }
    r
  }

  test("symmetric cycle converges to the uniform vector at every iteration") {
    // directed 3-cycle: out-degree 1 everywhere, perfectly symmetric —
    // the uniform e12 vector maps to itself exactly (85 * r // 100 undoes
    // the teleport floor), so ANY iteration count returns 1/3 to e12
    val e = edges("a" -> "b", "b" -> "c", "c" -> "a")
    val r = ranksOf(PageRank.run(e, iterations = 4))
    assert(r.keySet === Set("a", "b", "c"))
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("undirected star concentrates rank on the hub, spokes stay equal") {
    // hub h ↔ spokes s1..s4, both directions (no danglers)
    val spokes = (1 to 4).map(i => s"s$i")
    val e = edges(spokes.flatMap(s => Seq("h" -> s, s -> "h")): _*)
    val out = PageRank.run(e, iterations = 10)
    val rI = ranksE12(out)
    val sp = spokes.map(rI)
    // integer arithmetic ⇒ spoke symmetry is EXACT, not approximate
    sp.foreach(v => assert(v === sp.head))
    assert(rI("h") > 2 * sp.head) // hub dominates
    // fixed-point floors drift mass by ≤ (|E| + ~100|V|)/1e12 per
    // iteration: ~5e-10 × 10 iterations here
    assert(math.abs(rI.values.sum - 1000000000000L).toDouble < 1e5)
  }

  test("one hand-computed iteration matches the closed form") {
    // a → b, b → a, b → c, c → b ; N=3, d=0.85, r0 = 1/3 each
    // outdeg: a=1, b=2, c=1
    // r1(a) = 0.15/3 + 0.85*(r0(b)/2)            = 0.05 + 0.85/6
    // r1(b) = 0.15/3 + 0.85*(r0(a)/1 + r0(c)/1)  = 0.05 + 0.85*2/3
    // r1(c) = 0.15/3 + 0.85*(r0(b)/2)            = 0.05 + 0.85/6
    // (e12 quantization keeps each value within 1e-12 of the real line)
    val e = edges("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "b")
    val r = ranksOf(PageRank.run(e, iterations = 1))
    assert(math.abs(r("a") - (0.05 + 0.85 / 6)) < 1e-12)
    assert(math.abs(r("b") - (0.05 + 0.85 * 2 / 3)) < 1e-12)
    assert(math.abs(r("c") - (0.05 + 0.85 / 6)) < 1e-12)
  }

  test("20 iterations match the driver-side integer recurrence exactly (cut cadence)") {
    // 20 iterations cross the 5-round cache-cut three times — the cuts
    // must not perturb a single e12 unit, and the returned plan must
    // EXECUTE from the final vector's cache (cache substitution kicks in
    // before optimization), not re-run a 20-deep join tower
    val spokes = (1 to 4).map(i => s"s$i")
    val pairs = spokes.flatMap(s => Seq("h" -> s, s -> "h")) ++
      Seq("h" -> "x", "x" -> "h", "x" -> "s1", "s1" -> "x")
    val adj = pairs.groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2) }
    val out = PageRank.run(edges(pairs: _*), iterations = 20)
    assert(ranksE12(out) === simulate(adj, 20))
    val opt = out.queryExecution.optimizedPlan
    assert(opt.collectFirst {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }.isDefined, "returned plan should read the final vector's cache")
    // and the live segment above the cache scan is shallow: the cache is
    // the plan's direct source, not buried under re-derived iterations
    assert(opt.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryRelation]),
      "every leaf should be the cached vector, not a re-derived edge scan")
  }

  test("rank mass is conserved on the fixture graph") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val fwd = li.select(
      concat(lit("p"), col("l_partkey")).as("src"),
      concat(lit("s"), col("l_suppkey")).as("dst")).distinct()
    val e = fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
    val total = PageRank.run(e, iterations = 3)
      .agg(sum(col("rank"))).collect()(0).getDouble(0)
    // quantization drift bound: ≤ (|E| + ~100|V|)/1e12 ≈ 2e-7 per iteration
    assert(math.abs(total - 1.0) < 1e-5)
  }

  test("dangling nodes are rejected") {
    intercept[IllegalArgumentException] {
      PageRank.run(edges("a" -> "b"), iterations = 1).collect()
    }
  }

  test("personalized: mass concentrates near the seed and decays with distance") {
    // path graph a-b-c-d-e (doubled); walks restart at {a}, so rank must
    // be strictly decreasing with hop distance from the seed
    val pairs = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e")
    val both = pairs.flatMap { case (u, v) => Seq(u -> v, v -> u) }
    val r = ranksOf(PageRank.runPersonalized(edges(both: _*), Seq("a"),
      iterations = 10, doubledUndirected = true))
    assert(r("a") > r("b") && r("b") > r("c") && r("c") > r("d") && r("d") > r("e"),
      s"rank must decay with distance from the seed: $r")
    // uniform PageRank on the same graph is symmetric (b == d, a == e):
    // personalization is what breaks the symmetry
    val u = ranksOf(PageRank.run(edges(both: _*), iterations = 10,
      doubledUndirected = true))
    assert(math.abs(u("a") - u("e")) < 1e-9 && math.abs(u("b") - u("d")) < 1e-9)
  }

  test("personalized: seed set must exist in the graph; seeds split teleport evenly") {
    val both = Seq("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "b")
    intercept[IllegalArgumentException] {
      PageRank.runPersonalized(edges(both: _*), Seq("zz"), iterations = 2,
        doubledUndirected = true).collect()
    }
    // symmetric two-seed personalization on a symmetric graph: the two
    // seeds end with identical e12 ranks
    val r = ranksE12(PageRank.runPersonalized(edges(both: _*), Seq("a", "c"),
      iterations = 8, doubledUndirected = true))
    assert(r("a") == r("c"), s"symmetric seeds must tie exactly: $r")
  }

  test("doubledUndirected fast path is bit-identical to the probe path") {
    // the caller-asserted shape skips the membership probe (|V| becomes
    // the only setup action); on a graph that genuinely IS doubled the
    // two paths must agree to the e12 unit — same teleport divisor, same
    // full-coverage iteration shape
    val pairs = Seq("a" -> "b", "b" -> "c", "a" -> "c", "c" -> "d")
    val both = pairs.flatMap { case (u, v) => Seq(u -> v, v -> u) }
    val probed = ranksE12(PageRank.run(edges(both: _*), iterations = 7))
    val asserted = ranksE12(PageRank.run(edges(both: _*), iterations = 7,
      doubledUndirected = true))
    assert(asserted === probed)
  }
}
