package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** Semantic pins for the non-equi join family. The DuckDB oracle gates
  * these too; the tests here assert the SEMANTICS against independently
  * computed truth (brute force / direct formulas) plus the physical-plan
  * properties that make each shape scale. */
class JoinQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("link_predict matches brute-force portfolio Jaccard over all pairs") {
    val byS = Tables.lineitem(spark, sfDir)
      .select($"l_suppkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ss = byS.keys.toSeq.sorted
    val brute = (for {
      i <- ss; j <- ss if i < j
      inter = (byS(i) & byS(j)).size if inter > 0
    } yield (i, j, inter.toLong,
      inter.toLong * 1000000L / (byS(i).size + byS(j).size - inter)))
      .sortBy(t => (-t._4, t._1, t._2)).take(25)
    val got = RelationalQueries.linkPredict(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == brute)
  }

  test("link_predict stop-lists hub parts before the self-join (bounded pairs)") {
    // one 100-degree hub part p0 + one 3-supplier part p1: with cap 8 the
    // hub contributes ZERO pairs and degrees are computed over the capped
    // edge set, so each survivor's portfolio is exactly {p1} — Jaccard 1
    val hub = (1L to 100L).map(s => (s, 0L))
    val tail = Seq((1L, 1L), (2L, 1L), (3L, 1L))
    val e = (hub ++ tail).toDF("s", "p")
    val got = RelationalQueries.linkPredictCore(e, hubCap = 8)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 1L, 1000000L), (1L, 3L, 1L, 1000000L),
      (2L, 3L, 1L, 1000000L)))
    // uncapped, the hub alone emits C(100,2) = 4950 pairs (top-25 fills)
    assert(RelationalQueries.linkPredictCore(e, hubCap = 1000).count() == 25)
    // fixture degrees sit far below LINK_HUB_CAP: the declared query's
    // stop list is empty and the oracle row is byte-identical
    val fixtureMaxDeg = Tables.lineitem(spark, sfDir)
      .select($"l_suppkey", $"l_partkey").distinct()
      .groupBy($"l_partkey").count().agg(max($"count")).as[Long].head()
    assert(fixtureMaxDeg <= RelationalQueries.LINK_HUB_CAP)
  }

  test("degree_assortativity matches the locally computed Pearson r") {
    val e = Tables.lineitem(spark, sfDir)
      .select($"l_suppkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
    val edges = e.flatMap { case (s, p) => Seq((s"s$s", s"p$p"), (s"p$p", s"s$s")) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val xy = edges.map { case (a, b) => (deg(a), deg(b)) }
    val n = xy.size.toDouble
    val sx = xy.map(_._1).sum.toDouble; val sy = xy.map(_._2).sum.toDouble
    val sxy = xy.map(t => t._1 * t._2).sum.toDouble
    val sxx = xy.map(t => t._1 * t._1).sum.toDouble
    val syy = xy.map(t => t._2 * t._2).sum.toDouble
    val r = (n * sxy - sx * sy) / math.sqrt(n * sxx - sx * sx) / math.sqrt(n * syy - sy * sy)
    val Array((gotN, gotR)) = RelationalQueries.degreeAssortativity(spark, sfDir)
      .as[(Long, Long)].collect()
    assert(gotN == xy.size)
    assert(math.abs(gotR - math.round(r * 10000)) <= 1, s"got $gotR vs ${r * 10000}")
    // bipartite hub-to-leaf wiring must read strongly disassortative
    assert(gotR < -9000)
  }

  test("pareto_front: exact brute-force skyline; dominance contracts hold") {
    val su = Tables.lineitem(spark, sfDir)
      .groupBy($"l_suppkey")
      .agg(sum(expr("CAST(round(l_extendedprice*100) AS BIGINT)")).as("rev"),
        countDistinct($"l_partkey").as("p"))
      .as[(Long, Long, Long)].collect()
    def dominated(a: (Long, Long, Long)) = su.exists(b =>
      b._2 >= a._2 && b._3 >= a._3 && (b._2 > a._2 || b._3 > a._3))
    val expect = su.filterNot(dominated).sortBy(t => (-t._2, t._1))
    val got = RelationalQueries.paretoFront(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq == expect.toSeq)
    assert(got.nonEmpty && got.length < su.length,
      "the front must be a strict, non-empty subset")
    // along the front, breadth must rise as revenue falls (staircase)
    val parts = got.map(_._3)
    assert(parts.toSeq == parts.sorted.toSeq,
      "front sorted by rev desc must have non-decreasing n_parts")
  }

  test("bipartite_check: fixture graph passes with full coverage; planted odd cycle flags") {
    val Array(r) = RelationalQueries.bipartiteCheck(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    assert(r._1 == r._2, "BFS must reach every node (one component, diam <= 4)")
    assert(r._3 == 0L && r._4 == 1L, s"part-supplier graph is bipartite: $r")

    // planted: a triangle (odd cycle) must flag — doubled edge list
    val tri = Seq(("a", "b"), ("b", "c"), ("c", "a"))
    val doubled = tri.flatMap { case (x, y) => Seq((x, y), (y, x)) }
      .toDF("src", "dst")
    val Array(p) = RelationalQueries
      .bipartiteCheckCore(spark, doubled, Seq("a").toDF("node"), rounds = 3)
      .as[(Long, Long, Long, Long)].collect()
    assert(p._3 > 0L && p._4 == 0L, s"triangle must break 2-coloring: $p")
  }

  test("hits_scores: exact local replay of both normalized rounds") {
    val e = Tables.lineitem(spark, sfDir)
      .select($"l_partkey", $"l_suppkey").distinct()
      .as[(Long, Long)].collect()
    val byS = e.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val byP = e.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var h = byS.keys.map(_ -> 1000000L).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to 2) {
      val aRaw = byP.map { case (p, ss) => p -> ss.map(h).sum }
      val am = aRaw.values.max
      a = aRaw.view.mapValues(v => v * 1000000L / am).toMap
      val hRaw = byS.map { case (s, ps) => s -> ps.map(a).sum }
      val hm = hRaw.values.max
      h = hRaw.view.mapValues(v => v * 1000000L / hm).toMap
    }
    val expHubs = h.toSeq.sortBy(t => (-t._2, t._1)).take(10)
    val expAuth = a.toSeq.sortBy(t => (-t._2, t._1)).take(10)
    val got = RelationalQueries.hitsScores(spark, sfDir)
      .as[(String, Long, Long)].collect()
    assert(got.filter(_._1 == "hub").map(t => (t._2, t._3)).toSeq ==
      expHubs.sortBy(t => (-t._2, t._1)))
    assert(got.filter(_._1 == "authority").map(t => (t._2, t._3)).toSeq ==
      expAuth.sortBy(t => (-t._2, t._1)))
    // normalization contract: every score in (0, 1e6], max attained
    assert(got.forall(t => t._3 > 0 && t._3 <= 1000000L))
    assert(got.count(_._3 == 1000000L) >= 2, "both sides carry their max")
  }

  test("recursive_cte equals a local fold of the decay recurrence") {
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(to_date($"ts").as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("rev"))
      .as[(java.sql.Date, Long)].collect().sortBy(_._1.toLocalDate.toEpochDay)
    val expect = daily.drop(1).scanLeft((daily.head._1, daily.head._2, daily.head._2)) {
      case ((_, _, bal), (day, rev)) => (day, rev, bal * 9 / 10 + rev)
    }
    val got = RelationalQueries.recursiveCte(spark, sfDir)
      .as[(java.sql.Date, Long, Long)].collect().toSeq
    assert(got == expect.toSeq)
    // the per-step floor must actually bite (discard a remainder) —
    // otherwise the recurrence would be linear and window-rewritable
    assert(expect.exists { case (_, _, bal) => bal * 9 % 10 != 0 },
      "decay recurrence never exercised its floor")
  }

  test("winsorized_mean matches a local clamp/trim over exact quartiles") {
    val rows = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_quantity".cast("double"))
      .as[(String, Double)].collect().groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def quantile(xs: Array[Double], q: Double): Double = {
      val s = xs.sorted; val pos = (s.length - 1) * q
      val lo = pos.toInt; val f = pos - lo
      if (lo + 1 < s.length) s(lo) * (1 - f) + s(lo + 1) * f else s(lo)
    }
    val got = RelationalQueries.winsorizedMean(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet == rows.keySet)
    for ((flag, n, mean, wins, trim, nKept) <- got) {
      val xs = rows(flag)
      val (q25, q75) = (quantile(xs, 0.25), quantile(xs, 0.75))
      val kept = xs.filter(x => x >= q25 && x <= q75)
      assert(n == xs.length && nKept == kept.length)
      assert(mean == xs.map(_.toLong).sum * 10000 / n)
      assert(wins == xs.map(x => math.round(math.max(q25, math.min(q75, x)) * 100)).sum * 100 / n)
      assert(trim == kept.map(_.toLong).sum * 10000 / nKept)
      // clamping pulls the estimate toward the median band but keeps n
      assert(wins >= 0 && trim >= 0)
    }
  }

  test("asof_join matches the brute-force per-row maximum prior signup") {
    // full microsecond precision: getTime is millisecond-truncated and
    // would corrupt the <= comparison / tie-break for sub-ms neighbors
    def micros(t: java.sql.Timestamp): Long = t.getTime / 1000 * 1000000L + t.getNanos / 1000
    val ev = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"ts", $"event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), micros(r.getTimestamp(2)), r.getString(3)))
    val signups = ev.filter(_._4 == "signup")
    val expected = ev.filter(_._4 == "purchase").map { case (id, u, t, _) =>
      val prior = signups.filter(s => s._2 == u && s._3 <= t)
      // max (ts, event_id) = the as-of row; None when no prior signup
      id -> (if (prior.isEmpty) None else Some(prior.maxBy(s => (s._3, s._1))._1))
    }.toMap

    val got = JoinQueries.asofJoin(spark, sfDir)
      .select($"event_id", $"asof_id")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got.size == expected.size)
    assert(got == expected)
    // at least one purchase should predate any signup (null coverage)
    assert(expected.values.exists(_.isEmpty) || expected.values.forall(_.nonEmpty))
  }

  test("asof_join plans one shuffle on user_id, no pair explosion") {
    val p = JoinQueries.asofJoin(spark, sfDir).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the union-window form: a single Window over the combined stream
    assert(p.contains("Window"), p)
  }

  test("nearest_event_join matches brute force over (|Δt|, event_id)") {
    def micros(t: java.sql.Timestamp): Long = t.getTime / 1000 * 1000000L + t.getNanos / 1000
    val ev = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"ts", $"event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), micros(r.getTimestamp(2)), r.getString(3)))
    val errors = ev.filter(_._4 == "error")
    val tol = 1800L * 1000000L
    val expected = ev.filter(_._4 == "purchase").map { case (id, u, t, _) =>
      val cands = errors.filter(e => e._2 == u && math.abs(e._3 - t) <= tol)
      id -> (if (cands.isEmpty) None
             else Some(cands.minBy(e => (math.abs(e._3 - t), e._1))).map(e => (e._1, e._3 - t)))
    }.toMap
    val got = JoinQueries.nearestEventJoin(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_ =>
        (r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.size == expected.size)
    assert(got == expected)
    // non-vacuous on both branches
    assert(expected.values.exists(_.isDefined))
    assert(expected.values.flatten.exists(_._2 < 0) && expected.values.flatten.exists(_._2 > 0))
  }

  test("nearest_event_join plans windows, not a range join") {
    val p = JoinQueries.nearestEventJoin(spark, sfDir).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), p)
  }

  test("range_join buckets every part exactly once (bands partition the domain)") {
    val total = Tables.part(spark, sfDir).count()
    val banded = JoinQueries.rangeJoin(spark, sfDir)
      .agg(sum($"n_parts")).as[Long].head()
    assert(banded == total, s"bands must cover all $total parts, got $banded")
  }

  test("range_join broadcasts the band table (fact side never shuffles)") {
    val p = JoinQueries.rangeJoin(spark, sfDir).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("merge_upsert actions partition correctly and balances follow the merge rule") {
    val cust = Tables.customer(spark, sfDir)
    val nCust = cust.count()
    val nUpd = cust.filter($"c_custkey" % 5 === 0).count()
    val nIns = cust.filter($"c_custkey" % 7 === 3).count()
    val out = JoinQueries.mergeUpsert(spark, sfDir).cache()
    try {
      val byAction = out.groupBy($"action").count().as[(String, Long)].collect().toMap
      assert(byAction("insert") == nIns)
      assert(byAction("update") == nUpd)
      assert(byAction.getOrElse("keep", 0L) == nCust - nUpd)
      // spot rule: an updated row carries old balance + 100
      val joined = out.filter($"action" === "update")
        .join(cust, $"key" === $"c_custkey")
        .select(($"balance" - $"c_acctbal").as("delta")).as[Double].collect()
      // (a + 100.0) - a wobbles in the last ulp for 2-decimal doubles
      assert(joined.forall(d => math.abs(d - 100.0) < 1e-9))
      // inserts live in the shadow key space
      assert(out.filter($"action" === "insert").select(min($"key")).as[Long].head() >= 1000000L)
    } finally { out.unpersist(); () }
  }

  test("skew report: boundary ties break on the key, shares exact") {
    // 11 keys: k00 has 40 rows (top1), k01..k08 have 3 each (ranks
    // 2-9), and the 10th slot is contested — k09 and k10 both have 2.
    // The key tie-break must take k09 (asc) into the top-10 and leave
    // k10 out: top10 = 40 + 24 + 2 = 66 of n = 68
    val rows =
      Seq.fill(40)("k00") ++ (1 to 8).flatMap(i => Seq.fill(3)(f"k$i%02d")) ++
        Seq.fill(2)("k09") ++ Seq.fill(2)("k10")
    val df = rows.toDF("key")
    val r = RelationalQueries.skewReportCore(df, "key", "t").collect().head
    assert(r.getLong(1) == 68L && r.getLong(2) == 11L)
    assert(r.getLong(3) == 40L * 1000000L / 68L)
    assert(r.getLong(4) == 66L * 1000000L / 68L)
  }

  test("fs_linkage: weight bands separate true from false pairs; counts conserve") {
    val out = JoinQueries.fsLinkage(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    // bands ascending, counts conserve
    assert(out.map(_._1).toSeq == out.map(_._1).toSeq.sorted)
    assert(out.forall(b => b._2 == b._3 + b._4))
    // the dirty registry is a 1:1 derivation: every dirty record has its
    // true pair in the candidates (the attribute block guarantees it),
    // so n_true across bands == |dirty|
    val nDirty = graft.Tables.customer(spark, sfDir)
      .filter($"c_custkey" % 10 === 3).count()
    assert(out.map(_._3).sum == nDirty)
    // Fellegi-Sunter separation: every all-false band sits strictly below
    // every band holding true pairs, and negative bands are never 'link'
    val maxFalseOnly = out.filter(_._3 == 0).map(_._1)
    val minWithTrue = out.filter(_._3 > 0).map(_._1)
    assert(maxFalseOnly.nonEmpty && minWithTrue.nonEmpty)
    assert(maxFalseOnly.max < minWithTrue.min)
    assert(out.forall(b => if (b._1 >= 2) b._5 == "link"
      else if (b._1 >= 0) b._5 == "possible" else b._5 == "nonlink"))
  }
}
