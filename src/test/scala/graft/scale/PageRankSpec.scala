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

  test("symmetric cycle converges to the uniform vector at every iteration") {
    // directed 3-cycle: out-degree 1 everywhere, perfectly symmetric —
    // the uniform vector is the fixed point, so ANY iteration count must
    // return exactly 1/3 per node
    val e = edges("a" -> "b", "b" -> "c", "c" -> "a")
    val r = ranksOf(PageRank.run(e, iterations = 4))
    assert(r.keySet === Set("a", "b", "c"))
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("undirected star concentrates rank on the hub, spokes stay equal") {
    // hub h ↔ spokes s1..s4, both directions (no danglers)
    val spokes = (1 to 4).map(i => s"s$i")
    val e = edges(spokes.flatMap(s => Seq("h" -> s, s -> "h")): _*)
    val r = ranksOf(PageRank.run(e, iterations = 10))
    val hub = r("h")
    val sp = spokes.map(r)
    sp.foreach(v => assert(math.abs(v - sp.head) < 1e-12)) // symmetry
    assert(hub > 2 * sp.head) // hub dominates
    assert(math.abs(r.values.sum - 1.0) < 1e-9) // no mass leaks
  }

  test("one hand-computed iteration matches the closed form") {
    // a → b, b → a, b → c, c → b ; N=3, d=0.85, r0 = 1/3 each
    // outdeg: a=1, b=2, c=1
    // r1(a) = 0.15/3 + 0.85*(r0(b)/2)            = 0.05 + 0.85/6
    // r1(b) = 0.15/3 + 0.85*(r0(a)/1 + r0(c)/1)  = 0.05 + 0.85*2/3
    // r1(c) = 0.15/3 + 0.85*(r0(b)/2)            = 0.05 + 0.85/6
    val e = edges("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "b")
    val r = ranksOf(PageRank.run(e, iterations = 1))
    assert(math.abs(r("a") - (0.05 + 0.85 / 6)) < 1e-12)
    assert(math.abs(r("b") - (0.05 + 0.85 * 2 / 3)) < 1e-12)
    assert(math.abs(r("c") - (0.05 + 0.85 / 6)) < 1e-12)
  }

  test("rank mass is conserved on the fixture graph") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val fwd = li.select(
      concat(lit("p"), col("l_partkey")).as("src"),
      concat(lit("s"), col("l_suppkey")).as("dst")).distinct()
    val e = fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
    val total = PageRank.run(e, iterations = 3)
      .agg(sum(col("rank"))).collect()(0).getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9)
  }

  test("dangling nodes are rejected") {
    intercept[IllegalArgumentException] {
      PageRank.run(edges("a" -> "b"), iterations = 1).collect()
    }
  }
}
