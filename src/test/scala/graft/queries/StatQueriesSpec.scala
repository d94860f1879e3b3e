package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Statistical-inference operators: exact local replays of the z-test and
  * Kaplan-Meier tables against BigInt brute force, planted-signal and
  * degenerate-branch cases, and the argmax-never-divides contract of the
  * Gini split finder. */
class StatQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents(rows: Seq[(Long, Long, String, Double, String)]) =
    rows.toDF("event_id", "user_id", "event_type", "value", "ts_s")
      .withColumn("ts", to_timestamp($"ts_s"))
      .withColumn("props", lit("{}"))
      .drop("ts_s")

  test("gini_concentration: equal shares → 0; winner-takes-all → (n−1)/n") {
    def mk(revs: Seq[Long]) = mkEvents(revs.zipWithIndex.map { case (r, u) =>
      (u.toLong, u.toLong, "purchase", r / 100.0, "2024-01-05 00:00:00") })
    val eq = StatQueries.giniConcentrationOf(mk(Seq.fill(10)(5000L))).head()
    assert(eq.getLong(2) == 0L, s"equal shares gini=${eq.getLong(2)}")
    // one user holds everything (others hold 1 cent so they exist):
    // G → (Σi·x term) — exact local replay is the pin
    val revs = Seq.fill(9)(1L) :+ 100000L
    val got = StatQueries.giniConcentrationOf(mk(revs)).head()
    val xs = revs.sorted
    val n = BigInt(xs.length); val t = BigInt(xs.sum)
    val r = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    assert(got.getLong(2) == ((BigInt(2) * r - (n + 1) * t) * 1000000 / (n * t)).toLong)
    // fixture replay: banded ranks must equal the plain global rank
    val fix = graft.Tables.events(spark, sfDir).filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(sum(expr("CAST(round(value*100) AS BIGINT)")).as("x"))
      .as[(Long, Long)].collect().map(_._2).sorted
    val fn = BigInt(fix.length); val ft = fix.map(BigInt(_)).sum
    val fr = fix.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val gotFix = StatQueries.giniConcentration(spark, sfDir).head()
    assert(gotFix.getLong(2) ==
      ((BigInt(2) * fr - (fn + 1) * ft) * 1000000 / (fn * ft)).toLong)
  }

  test("equal-freq bands: a planted heavy tail still spreads ~uniformly") {
    // VERDICT r12 #3: fixed-width `x div c` bands collapse a heavy-tail
    // distribution into one giant bottom band — the per-band rank window
    // re-becomes a single-reducer sort. The sketch-derived bands must
    // keep every band within 2× of uniform on exactly that shape.
    import org.apache.spark.sql.functions.col
    val rng = new scala.util.Random(7)
    // log-uniform over 5 decades: 90% of mass lands under 1% of range
    val xs = (0 until 4000).map(i =>
      (i.toLong, math.pow(10.0, 2 + rng.nextDouble() * 5).toLong))
    val u = xs.toDF("user_id", "x")
    val buckets = 16
    val banded = StatQueries.withEqualFreqBand(u, "x", buckets)
    val sizes = banded.groupBy(col("band")).count()
      .as[(Long, Long)].collect().toMap
    val uniform = xs.length.toDouble / buckets
    assert(sizes.values.max <= 2 * uniform,
      s"max band ${sizes.values.max} vs uniform $uniform: $sizes")
    assert(sizes.size >= buckets / 2, s"bands collapsed: $sizes")
    // band assignment must be monotone in x (rank composition correctness)
    val rows = banded.select(col("x"), col("band"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(rows.zip(rows.tail).forall { case ((_, b1), (_, b2)) => b1 <= b2 })
    // and tie-stable: equal keys share one band
    val dup = (0 until 100).map(i => (i.toLong, 500L)) ++
      Seq((200L, 1L), (201L, 1000000L))
    val dupBands = StatQueries.withEqualFreqBand(
        dup.toDF("user_id", "x"), "x", 8)
      .filter(col("x") === 500L).select(col("band"))
      .as[Long].collect().toSet
    assert(dupBands.size == 1, dupBands.toString)
  }

  test("js_divergence: identical halves → 0; disjoint mixes → ln 2") {
    // same mix both halves: every contribution is exactly 0
    val same = (0 until 200).map { i =>
      val day = if (i % 2 == 0) "2024-01-05" else "2024-01-25"
      (i.toLong, i.toLong, if (i % 4 < 2) "click" else "view", 10.0,
        s"$day 00:00:00")
    }
    assert(StatQueries.jsDivergenceOf(mkEvents(same)).collect()
      .forall(_.getLong(3) == 0L))
    // disjoint supports: each type's contribution is ½·p·ln2 per side →
    // summed over types both sides = ln 2 (scaled 1e6 = 693147)
    val disj = (0 until 200).map { i =>
      val h1 = i % 2 == 0
      (i.toLong, i.toLong, if (h1) "click" else "view", 10.0,
        (if (h1) "2024-01-05" else "2024-01-25") + " 00:00:00")
    }
    val contribs = StatQueries.jsDivergenceOf(mkEvents(disj)).collect()
      .map(_.getLong(3))
    assert(math.abs(contribs.sum - 693147L) <= 2, contribs.mkString(","))
  }

  test("ab_power: local formula replay; MDE shrinks with variance") {
    val vals = graft.Tables.events(spark, sfDir)
      .filter($"event_type" === "purchase")
      .select(expr("CAST(round(value*100) AS BIGINT)")).as[Long].collect()
    val n = vals.length.toDouble
    val s = vals.sum.toDouble
    val q = vals.map(v => BigInt(v) * v).sum.toDouble
    val varE4 = q / n - math.pow(s / n, 2)
    val z = 1.959964 + 0.841621
    val nReq = math.ceil(z * z * 2.0 * varE4 / math.pow(0.05 * s / n, 2)).toLong
    val got = StatQueries.abPower(spark, sfDir).head()
    assert(got.getLong(0) == vals.length.toLong)
    assert(got.getLong(1) == nReq, s"${got.getLong(1)} vs $nReq")
    assert(got.getLong(2) > 0)
  }

  test("isotonic_calibration: output is monotone; PAVA pooling is exact") {
    // planted non-monotone rates: bins 0..2 with rates 0.5, 0.1, 0.3 —
    // PAVA pools the whole run: adding .1 violates (.5 > .1) → pool to
    // (50+10)/200 = .3; bin 2's .3 neither raises nor splits it → the
    // non-decreasing fit is (.3, .3, .3) (minimax replay agrees)
    val rows = (0 until 300).map { i =>
      val bin = i / 100 // 100 rows per bin, values 25 / 75 / 125
      val purchase = (bin, i % 100) match {
        case (0, r) => r < 50
        case (1, r) => r < 10
        case (2, r) => r < 30
      }
      (i.toLong, i.toLong, if (purchase) "purchase" else "view",
        bin * 50.0 + 25.0, "2024-01-05 00:00:00")
    }
    val got = StatQueries.isotonicCalibrationOf(mkEvents(rows)).collect()
      .map(r => (r.getInt(0), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((0, 500000L, 300000L), (1, 100000L, 300000L),
      (2, 300000L, 300000L)))
    // fixture: the fitted curve is non-decreasing by construction
    val fix = StatQueries.isotonicCalibration(spark, sfDir).collect()
      .map(_.getLong(4))
    assert(fix.zip(fix.tail).forall { case (a, b) => a <= b }, fix.mkString(","))
  }

  test("control_chart: a planted spike flags; steady days stay in control") {
    // baseline days 1-15 at 100/day; monitored days: 16-19 steady, day 20
    // a 10x spike — must be the ONLY out-of-control day
    val rows = (0 until 20).flatMap { d =>
      val v = if (d == 19) 1000.0 else 100.0 + (d % 3) // tiny baseline var
      Seq((d.toLong, 1L, "view", v, f"2024-01-${d + 1}%02d 05:00:00"))
    }
    val got = StatQueries.controlChartOf(mkEvents(rows)).collect()
      .map(r => (r.getDate(0).toString, r.getBoolean(3)))
    assert(got.length == 5)
    assert(got.count(_._2) == 1 && got.find(_._2).get._1 == "2024-01-20",
      got.mkString(","))
    // fixture: the iid generator should keep most days in control
    val fix = StatQueries.controlChart(spark, sfDir).collect()
    assert(fix.nonEmpty && fix.count(_.getBoolean(3)) <= fix.length / 2)
  }

  test("hurst_exponent: trending series reads high, alternating reads low") {
    def series(f: Int => Double) = mkEvents((0 until 30).map(t =>
      (t.toLong, 1L, "view", f(t), f"2024-03-${t + 1}%02d 05:00:00")))
    // strong linear trend: cumulative deviations grow ~n² → H → 1
    val trend = StatQueries.hurstExponentOf(series(t => 100.0 + 50.0 * t))
      .head()
    assert(trend.getLong(1) > 800000L, s"trend H=${trend.getLong(1)}")
    // strict alternation: maximally anti-persistent → H well below ½
    val alt = StatQueries.hurstExponentOf(
      series(t => if (t % 2 == 0) 100.0 else 500.0)).head()
    assert(alt.getLong(1) < 300000L, s"alternating H=${alt.getLong(1)}")
    assert(trend.getLong(0) >= 4 && alt.getLong(0) >= 4, "full blocks exist")
    // local replay of one block's exact R/S: n=5, x=(1,2,3,4,5)·100
    // m_t = 5·cum_t − t·Σx; Σx=1500, cum=(100,300,600,1000,1500)
    // m = (−1000,−1500,−1500,−1000,0) → R·n = 1500
    // S²·n² = n·Σx² −(Σx)² = 5·550000·100 − 1500² ... verify via the op
    // a 5-day series yields ONE block point — the OLS denominator is 0
    // and the slope must fail LOUDLY (ANSI divide-by-zero), never a
    // silent wrong number
    intercept[Exception](StatQueries.hurstExponentOf(mkEvents(
      (0 until 5).map(t => (t.toLong, 1L, "view", (t + 1).toDouble,
        f"2024-03-${t + 1}%02d 05:00:00")))).head())
  }

  test("odds_ratio: hand-built 2x2 gives the textbook OR/RR and CI") {
    // hi: 40 purchase + 60 other; lo: 20 purchase + 80 other
    val rows = (0 until 200).map { i =>
      val hi = i < 100
      val purch = if (hi) i % 100 < 40 else i % 100 < 20
      (i.toLong, i.toLong, if (purch) "purchase" else "view",
        if (hi) 300.0 else 100.0, "2024-01-05 00:00:00")
    }
    val r = StatQueries.oddsRatioOf(mkEvents(rows)).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((40L, 60L, 20L, 80L)))
    // OR = 40·80/(60·20) = 8/3; RR = (40/100)/(20/100) = 2
    assert(r.getLong(4) == 40L * 80 * 1000000 / (60 * 20))
    assert(r.getLong(5) == 2000000L)
    val lnOr = math.log(40.0 * 80 / (60.0 * 20))
    val half = 1.959964 * math.sqrt(1.0 / 40 + 1.0 / 60 + 1.0 / 20 + 1.0 / 80)
    assert(r.getLong(6) == math.round((lnOr - half) * 1e6))
    assert(r.getLong(7) == math.round((lnOr + half) * 1e6))
  }

  test("abc_classification: banded cumsum equals the global-sort replay") {
    val got = StatQueries.abcClassification(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // local replay with a plain global sort
    val xs = graft.Tables.events(spark, sfDir)
      .filter($"event_type" === "purchase").groupBy($"user_id")
      .agg(sum(expr("CAST(round(value*100) AS BIGINT)")).as("x"))
      .as[(Long, Long)].collect().sortBy { case (u, x) => (-x, u) }
    val t = xs.map(_._2).sum
    var cum = 0L
    val classed = xs.map { case (_, x) =>
      cum += x
      (if (cum * 100 <= t * 80) "A" else if (cum * 100 <= t * 95) "B"
       else "C") -> x
    }
    val expect = classed.groupBy(_._1).map { case (k, vs) =>
      (k, vs.length.toLong, vs.map(_._2).sum, vs.map(_._2).sum * 1000000L / t)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == expect, s"$expect vs ${got.toSeq}")
    // the classes partition all users and shares sum to ~100%
    assert(got.map(_._4).sum >= 999998L && got.map(_._4).sum <= 1000000L)
  }

  // -------------------------------------- croston / spearman / obf / rfm

  test("croston_demand: planted intermittent series folds exactly") {
    // demand days 1, 5, 11 (gaps 4, 6) with e2 sizes 21000, 22000, 24000:
    // init zh=21000 qh=1; 2nd: zh=(22000+21000)/2=21500, qh=(4+1)/2=2;
    // 3rd: zh=(24000+21500)/2=22750, qh=(6+2)/2=4
    val shaped = Seq(
      (1L, 3L, "error", 210.0, "2024-01-01 10:00:00"),
      (2L, 4L, "error", 220.0, "2024-01-05 10:00:00"),
      (3L, 5L, "error", 240.0, "2024-01-11 10:00:00"))
    val p = StatQueries.crostonOf(mkEvents(shaped)).collect().head
    assert(p.getLong(0) == 3L && p.getLong(1) == 22750L && p.getLong(2) == 4L)
    assert(p.getLong(3) == 22750L * 1000000L / 4L)
  }

  test("spearman_daily: fixture replay; planted monotone pair reads rho=1") {
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(to_date($"ts").as("day"))
      .agg(sum(expr("CAST(round(value*100) AS BIGINT)")).as("rev"),
        count(lit(1)).as("cnt"))
      .as[(java.sql.Date, Long, Long)].collect()
    def rank2(vs: Seq[Long], v: Long) =
      2L * vs.count(_ < v) + vs.count(_ == v)
    val revs = daily.map(_._2).toSeq; val cnts = daily.map(_._3).toSeq
    val pts = daily.map(d => (rank2(revs, d._2), rank2(cnts, d._3)))
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum.toDouble; val sy = pts.map(_._2).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val syy = pts.map(p => p._2 * p._2).sum.toDouble
    val rho = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    val r = StatQueries.spearmanDaily(spark, sfDir).collect().head
    assert(r.getLong(0) == daily.length)
    assert(math.abs(r.getLong(1) - math.round(rho * 1e6)) <= 1)

    // planted: count and revenue strictly co-monotone -> rho = 1
    val rows = (1 to 10).flatMap { d =>
      (0 until d).map(i =>
        (d.toLong * 100 + i, i.toLong, "view", 10.0, f"2024-03-$d%02d 05:00:00"))
    }
    val p = StatQueries.spearmanOf(mkEvents(rows)).collect().head
    assert(p.getLong(1) == 1000000L, s"rho=${p.getLong(1)}")
  }

  test("obf_sequential: boundaries descend to 2.024; early looks never cheaper") {
    val got = StatQueries.obfSequential(spark, sfDir).collect()
    assert(got.length == 4)
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val bounds = got.map(_.getLong(7))
    assert(bounds.toSeq == bounds.sorted.reverse.toSeq, "OBF bounds must descend")
    assert(bounds.last == math.round(2.024 * math.sqrt(1.0) * 1e6))
    assert(bounds.head == math.round(2.024 * math.sqrt(4.0) * 1e6))
    // cumulative conversions are monotone across looks
    val c0 = got.map(_.getLong(3)); val c1 = got.map(_.getLong(5))
    assert(c0.toSeq == c0.sorted.toSeq && c1.toSeq == c1.sorted.toSeq)
    // reject consistency with the reported z and bound
    got.foreach { r =>
      val expected = !r.isNullAt(6) && math.abs(r.getLong(6)) >= r.getLong(7)
      assert(r.getLong(8) == (if (expected) 1L else 0L))
    }
  }

  test("rfm_segments: users conserve; planted three-tier cohort separates") {
    val users = graft.Tables.events(spark, sfDir)
      .select($"user_id").distinct().count()
    val got = StatQueries.rfmSegments(spark, sfDir).collect()
    assert(got.map(_.getLong(3)).sum == users)
    assert(got.forall(r => (0 to 2).contains(r.getLong(0).toInt) &&
      (0 to 2).contains(r.getLong(1).toInt) && (0 to 2).contains(r.getLong(2).toInt)))

    // planted: 9 users in three clean tiers of recency/frequency/monetary
    val rows = (0 until 9).flatMap { u =>
      val tier = u / 3
      val nEv = (tier + 1) * 4           // F tiers: 4, 8, 12
      val day = 1 + tier * 10            // R tiers: day 1, 11, 21 (horizon 21)
      val v = (tier + 1) * 50.0          // M tiers
      (0 until nEv).map(i =>
        ((u * 100 + i).toLong, u.toLong, "view", v, f"2024-01-$day%02d 05:00:00"))
    }
    val p = StatQueries.rfmOf(mkEvents(rows)).collect()
    // three segments only: tier0 = (0,0,0) low everything & stale;
    // tier2 = (2,2,2) recent, frequent, rich
    assert(p.length == 3)
    assert(p.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet == Set((0L, 0L, 0L, 3L), (1L, 1L, 1L, 3L), (2L, 2L, 2L, 3L)))
  }

  // ------------------------------------------- bootstrap / survival / eval

  test("poisson_bootstrap: exact local replay of the deterministic weights") {
    def hexFold(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      hex.foldLeft(0L)((acc, c) =>
        acc * 16 + java.lang.Long.parseLong(c.toString, 16))
    }
    val ts = Seq(1656781714176974L, 3313563428353948L, 4141954285442435L,
      4418084571138597L, 4487117142562638L, 4500923656847446L)
    def weight(b: Int, id: Long): Long = {
      val h = hexFold(s"boot:$b:$id")
      ts.indexWhere(h < _) match { case -1 => 6L; case k => k.toLong }
    }
    val ev = graft.Tables.events(spark, sfDir)
      .select($"event_id", expr("CAST(round(value*100) AS BIGINT)"))
      .as[(Long, Long)].collect()
    val means = (0 until 32).map { b =>
      val (sw, swx) = ev.foldLeft((0L, 0L)) { case ((c, s), (id, v)) =>
        val w = weight(b, id); (c + w, s + w * v)
      }
      swx * 10000L / sw
    }.sorted
    val r = StatQueries.poissonBootstrap(spark, sfDir).collect().head
    assert(r.getLong(0) == ev.length)
    assert(r.getLong(1) == ev.map(_._2).sum * 10000L / ev.length)
    assert(r.getLong(2) == means(1), "2nd order statistic")
    assert(r.getLong(3) == means(30), "31st order statistic")
    // the interval brackets the point estimate and is non-degenerate
    assert(r.getLong(2) < r.getLong(1) && r.getLong(1) < r.getLong(3))
  }

  test("nelson_aalen: cumulative floored hazard; H >= -ln(S) ordering holds") {
    val km = StatQueries.survivalKm(spark, sfDir).collect()
    val na = StatQueries.nelsonAalen(spark, sfDir).collect()
    assert(na.map(_.getInt(0)).toSeq == km.map(_.getInt(0)).toSeq,
      "same event-time axis as Kaplan-Meier")
    var h = 0L
    km.zip(na).foreach { case (k, n) =>
      assert(n.getLong(1) == k.getLong(1) && n.getLong(2) == k.getLong(2))
      h += 1000000L * k.getLong(2) / k.getLong(1)
      assert(n.getLong(3) == h, "cumhaz = running sum of floored d/n")
    }
    // NA-Breslow dominates KM: exp(-H) >= S  <=>  H <= -ln(S) fails only
    // on rounding; assert the directional integer form 1 - S_step <= h_step
    // per step via the final values
    val sFinal = km.last.getLong(4).toDouble / 1e6
    val hFinal = na.last.getLong(3).toDouble / 1e6
    assert(math.exp(-hFinal) >= sFinal - 1e-6)
  }

  test("seasonal_naive_eval: planted pure weekly cycle zeroes the lag-7 error") {
    val rows = (1 to 28).map { d =>
      val date = java.time.LocalDate.parse(f"2024-03-$d%02d")
      val v = 10.0 + (date.toEpochDay % 7) * 5.0
      (d.toLong, 1L, "view", v, f"2024-03-$d%02d 05:00:00")
    }
    val p = StatQueries.seasonalNaiveEvalOf(mkEvents(rows)).collect().head
    assert(p.getLong(0) == 21L)
    assert(p.getLong(1) == 0L, "lag-7 on a weekly cycle is exact")
    assert(p.getLong(2) > 0L && p.getLong(3) == 0L)

    // fixture replay
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(to_date($"ts").as("day"))
      .agg(sum(expr("CAST(round(value*100) AS BIGINT)")).as("rev"))
      .as[(java.sql.Date, Long)].collect().sortBy(_._1.toLocalDate.toEpochDay)
      .map(_._2)
    val s7 = (7 until daily.length).map(t => math.abs(daily(t) - daily(t - 7))).sum
    val s1 = (7 until daily.length).map(t => math.abs(daily(t) - daily(t - 1))).sum
    val r = StatQueries.seasonalNaiveEval(spark, sfDir).collect().head
    assert(r.getLong(1) == s7 && r.getLong(2) == s1)
    assert(r.getLong(3) == s7 * 1000000L / s1)
  }

  test("contingency_effects: chi2 equals the summed contributions; V responds to planted dependence") {
    val contribs = EventQueries.chi2Independence(spark, sfDir).collect()
      .map(_.getLong(4)).sum
    val r = StatQueries.contingencyEffects(spark, sfDir).collect().head
    assert(r.getLong(3) == contribs)
    // hi is binary -> min(r-1, c-1) = 1 -> V == phi
    assert(r.getLong(6) == r.getLong(5))
    assert(r.getLong(4) == (r.getLong(1) - 1) * (r.getLong(2) - 1))

    // planted: event_type fully determines hi -> V near 1
    val rows = (0 until 200).map { i =>
      val t = if (i % 2 == 0) "purchase" else "view"
      val v = if (i % 2 == 0) 400.0 else 10.0
      (i.toLong, i.toLong, t, v, "2024-01-05 00:00:00")
    }
    val p = StatQueries.contingencyEffectsOf(mkEvents(rows)).collect().head
    assert(p.getLong(6) > 990000L, s"V=${p.getLong(6)}")
  }

  // ------------------------------------------------- rank/pairwise family

  test("theil_sen: exact local pairwise-median replay; outlier robustness") {
    // fixture replay
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(to_date($"ts").as("day"))
      .agg(sum(expr("CAST(round(value*100) AS BIGINT)")).as("rev"))
      .as[(java.sql.Date, Long)].collect().sortBy(_._1.toLocalDate.toEpochDay)
    val slopes = (for {
      i <- daily.indices; j <- daily.indices if j > i
    } yield {
      val num = (daily(j)._2 - daily(i)._2) * 1000000L
      num / (j - i) // Scala / truncates toward zero, same as div and //
    }).sorted
    val r = StatQueries.theilSen(spark, sfDir).collect().head
    assert(r.getLong(0) == slopes.length)
    assert(r.getLong(1) == slopes((slopes.length + 1) / 2 - 1))
    assert(r.getLong(2) == slopes(slopes.length / 2))

    // planted: flat series with one wild outlier day — the pairwise
    // median stays ~0 while OLS would chase the spike
    val rows = (1 to 21).map { d =>
      val v = if (d == 11) 400.0 else 10.0
      (d.toLong, 1L, "view", v, f"2024-03-$d%02d 05:00:00")
    }
    val p = StatQueries.theilSenOf(mkEvents(rows)).collect().head
    assert(p.getLong(1) == 0L && p.getLong(2) == 0L,
      s"robust slope must ignore the outlier: ${p.mkString(",")}")
  }

  test("kendall_tau: exact pair counts; planted monotone series hits tau=1") {
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(to_date($"ts").as("day"))
      .agg(sum(expr("CAST(round(value*100) AS BIGINT)")).as("rev"))
      .as[(java.sql.Date, Long)].collect().sortBy(_._1.toLocalDate.toEpochDay)
    val sg = for { i <- daily.indices; j <- daily.indices if j > i }
      yield java.lang.Long.signum(daily(j)._2 - daily(i)._2)
    val r = StatQueries.kendallTau(spark, sfDir).collect().head
    assert(r.getLong(0) == sg.length)
    assert(r.getLong(1) == sg.count(_ > 0))
    assert(r.getLong(2) == sg.count(_ < 0))
    assert(r.getLong(3) == sg.count(_ == 0))
    assert(r.getLong(4) == sg.count(_ > 0) - sg.count(_ < 0))

    val inc = (1 to 10).map(d =>
      (d.toLong, 1L, "view", d * 10.0, f"2024-03-$d%02d 05:00:00"))
    val p = StatQueries.kendallTauOf(mkEvents(inc)).collect().head
    assert(p.getLong(5) == 1000000L, "strictly increasing series: tau = 1")
  }

  test("mann_whitney: midrank identity, exact replay, planted shift detected") {
    val r = StatQueries.mannWhitney(spark, sfDir).collect().head
    val (na, nb, u2a, u2b) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(u2a + u2b == 2 * na * nb, "U_a + U_b must equal n_a*n_b")
    // local replay over banded values
    val ev = graft.Tables.events(spark, sfDir)
      .select($"user_id", $"value").as[(Long, Double)].collect()
      .map(e => (math.floor(e._2).toLong, e._1 % 2))
    val bands = ev.groupBy(_._1).toSeq.sortBy(_._1)
    var cum = 0L; var r2a = BigInt(0)
    for ((_, xs) <- bands) {
      val cnt = xs.length.toLong
      r2a += BigInt(xs.count(_._2 == 0)) * (2 * cum + cnt + 1)
      cum += cnt
    }
    assert(BigInt(u2a) == r2a - BigInt(na) * (na + 1))

    // planted: cohort 1 values strictly above cohort 0 -> U2_b maximal,
    // z strongly negative (cohort 0 stochastically smaller)
    val rows = (0 until 40).map { i =>
      val u = i.toLong
      val v = if (u % 2 == 0) 10.0 + (i % 5) else 200.0 + (i % 5)
      (i.toLong, u, "view", v, "2024-01-05 00:00:00")
    }
    val p = StatQueries.mannWhitneyOf(mkEvents(rows)).collect().head
    assert(p.getLong(2) == 0L, "complete separation: U_a = 0")
    assert(p.getLong(5) < -5000000L, s"z=${p.getLong(5)}")
  }

  test("srm_check: balanced fixture passes; planted imbalance flags") {
    val users = graft.Tables.events(spark, sfDir)
      .select($"user_id").distinct().as[Long].collect()
    val r = StatQueries.srmCheck(spark, sfDir).collect().head
    assert(r.getLong(0) == users.count(_ % 2 == 0))
    assert(r.getLong(1) == users.count(_ % 2 == 1))
    val (n0, n1) = (r.getLong(0), r.getLong(1))
    assert(r.getLong(2) == (n0 - n1) * (n0 - n1) * 1000000L / (n0 + n1))
    assert(r.getLong(3) == 0L, "near-50/50 parity split must not flag")

    // planted: 90/10 split over 100 users is a textbook SRM
    val rows = (0 until 100).map { i =>
      val u = if (i < 90) i * 2L else i * 2L + 1L // 90 even, 10 odd
      (i.toLong, u, "view", 10.0, "2024-01-05 00:00:00")
    }
    val p = StatQueries.srmCheckOf(mkEvents(rows)).collect().head
    assert(p.getLong(3) == 1L, s"chi2_e6=${p.getLong(2)} must flag")
  }

  test("diff_in_diff: planted lift lands in did_e6, parallel trends cancel") {
    // ctrl: 100 pre, 110 post (trend +10); treat: 100 pre, 135 post
    // (trend +10 plus lift +25) -> DiD = +25.00 = 25_000_000 e6
    val rows =
      (0 until 50).flatMap { i =>
        val day = if (i % 2 == 0) "2024-01-05" else "2024-01-25"
        val pre = i % 2 == 0
        Seq(
          (i.toLong * 4, 2L, "view", if (pre) 100.0 else 110.0, s"$day 05:00:00"),
          (i.toLong * 4 + 1, 3L, "view",
            if (pre) 100.0 else 135.0, s"$day 06:00:00"))
      }
    val p = StatQueries.diffInDiffOf(mkEvents(rows)).collect().head
    assert(p.getLong(0) == 100000000L && p.getLong(1) == 110000000L)
    assert(p.getLong(2) == 100000000L && p.getLong(3) == 135000000L)
    assert(p.getLong(4) == 25000000L)
  }

  // ---------------------------------------------------------------- ab test

  test("ab_experiment: exact fixture replay of cells, rates, z, decision") {
    val ev = graft.Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", $"value")
      .as[(Long, String, Double)].collect()
    val conv = ev.groupBy(_._1).view
      .mapValues(_.exists(e => e._2 == "purchase" && e._3 > 250)).toMap
    val (a0, a1) = conv.keys.toSeq.partition(_ % 2 == 0)
    val (n0, c0) = (a0.size.toLong, a0.count(conv).toLong)
    val (n1, c1) = (a1.size.toLong, a1.count(conv).toLong)

    val row = StatQueries.abExperiment(spark, sfDir).collect().head
    assert(row.getLong(0) == n0 && row.getLong(1) == c0)
    assert(row.getLong(2) == n1 && row.getLong(3) == c1)
    assert(row.getLong(4) == c0 * 1000000L / n0)
    assert(row.getLong(5) == c1 * 1000000L / n1)
    if (c0 + c1 > 0 && c0 + c1 < n0 + n1) {
      val p0 = c0.toDouble / n0; val p1 = c1.toDouble / n1
      val pp = (c0 + c1).toDouble / (n0 + n1)
      val z = (p0 - p1) / math.sqrt(pp * (1.0 - pp) * (1.0 / n0 + 1.0 / n1))
      assert(row.getLong(6) == math.round(z * 1e6))
      assert(row.getLong(7) == (if (math.abs(math.round(z * 1e6)) >= 1959964L) 1L else 0L))
    } else assert(row.isNullAt(6) && row.getLong(7) == 0L)
  }

  test("ab_experiment: planted lift is significant; degenerate pool yields NULL z") {
    // arm 0 (even users): 40/50 convert; arm 1 (odd): 10/50 — z ≈ 6
    val planted = (0L until 100L).map { u =>
      val hit = if (u % 2 == 0) u / 2 < 40 else u / 2 < 10
      (u, u, if (hit) "purchase" else "view", 300.0, "2024-01-05 00:00:00")
    }
    val r = StatQueries.abExperimentOf(mkEvents(planted.map(p => (p._1, p._2, p._3, p._4, p._5)))).collect().head
    assert(r.getLong(0) == 50 && r.getLong(1) == 40 && r.getLong(3) == 10)
    assert(r.getLong(6) > 1959964L && r.getLong(7) == 1L)

    // everyone converts: pooled p = 1 — the CASE must emit NULL, not a 0/0
    val allConv = (0L until 10L).map(u => (u, u, "purchase", 300.0, "2024-01-05 00:00:00"))
    val d = StatQueries.abExperimentOf(mkEvents(allConv)).collect().head
    assert(d.isNullAt(6) && d.getLong(7) == 0L)
  }

  // ----------------------------------------------------------------- CUPED

  test("cuped_experiment: exact BigInt moment replay on the fixture") {
    val ev = graft.Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", dayofmonth($"ts").as("dom"),
        expr("CAST(round(value*100) AS BIGINT)").as("v"))
      .as[(Long, String, Int, Long)].collect()
    val perUser = ev.groupBy(_._1).view.mapValues { rows =>
      val p = rows.filter(_._2 == "purchase")
      (p.filter(_._3 <= 15).map(_._4).sum, p.filter(_._3 > 15).map(_._4).sum)
    }.toMap
    val n = BigInt(perUser.size)
    val xs = perUser.values.map(v => BigInt(v._1)); val ys = perUser.values.map(v => BigInt(v._2))
    val sx = xs.sum; val sy = ys.sum
    val sxy = perUser.values.map(v => BigInt(v._1) * v._2).sum
    val sxx = xs.map(x => x * x).sum; val syy = ys.map(y => y * y).sum
    val theta = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
    val r = StatQueries.cupedExperiment(spark, sfDir).collect().head
    assert(r.getLong(0) == n.toLong)
    assert(r.getLong(3) == math.round(theta * 1e6))
    val rho2 = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) *
      (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      ((n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
        (n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
    assert(r.getLong(6) == math.round((1.0 - rho2) * 1e6))
  }

  test("cuped_experiment: planted covariate cuts variance, keeps the lift") {
    // y = x + arm-lift + small idiosyncratic term: X explains most of the
    // variance in Y, so CUPED's 1-rho^2 must be small and the adjusted
    // diff must stay near the planted lift (theta ~ 1 makes the pre-period
    // imbalance correction visible too).
    val lift = 50000L
    val rows = (0L until 200L).flatMap { u =>
      val x = 100000L + (u % 37) * 7000L // shared activity level
      val noise = (u % 5) * 1000L
      val y = x + noise + (if (u % 2 == 0) lift else 0L)
      Seq((u * 2, u, "purchase", x / 100.0, "2024-01-05 00:00:00"),
        (u * 2 + 1, u, "purchase", y / 100.0, "2024-01-25 00:00:00"))
    }
    val r = StatQueries.cupedExperimentOf(mkEvents(rows)).collect().head
    val (theta, diff, adj, varRed) =
      (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
    // theta ~ 1 (y tracks x with unit slope)
    assert(math.abs(theta - 1000000L) < 50000L, s"theta_e6=$theta")
    // adjusted diff stays on the planted lift (metric is e2; diff is e4 of it)
    assert(math.abs(adj - lift * 10000L) < 3000000L, s"adj=$adj diff=$diff")
    // the covariate explains most variance: big reduction
    assert(varRed < 300000L, s"var_red_e6=$varRed")
  }

  // ------------------------------------------------------------ survival KM

  test("survival_km: exact BigInt replay of the risk table and KM recursion") {
    val ev = graft.Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", $"value", to_date($"ts").as("d"))
      .as[(Long, String, Double, java.sql.Date)].collect()
    val s0 = ev.filter(_._2 == "signup").groupBy(_._1).view
      .mapValues(_.map(_._4.toLocalDate.toEpochDay).min).toMap
    val hmax = ev.map(_._4.toLocalDate.toEpochDay).max
    val life = s0.toSeq.map { case (u, s) =>
      val p = ev.filter(e => e._1 == u && e._2 == "purchase" && e._3 > 250 &&
        e._4.toLocalDate.toEpochDay >= s).map(_._4.toLocalDate.toEpochDay)
      if (p.nonEmpty) (p.min - s, 1L) else (hmax - s, 0L)
    }
    val evTimes = life.filter(_._2 == 1L).map(_._1).distinct.sorted
    var surv = BigInt(1000000)
    val expect = evTimes.map { t =>
      val n = life.count(_._1 >= t).toLong
      val d = life.count(l => l._1 == t && l._2 == 1L).toLong
      surv = surv * (n - d) / n // BigInt division floors on positives
      (t, n, d, 1000000L * d / n, surv.toLong)
    }
    val got = StatQueries.survivalKm(spark, sfDir)
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expect)
    // the fixture carries real censoring and real events at every SF
    assert(life.count(_._2 == 0L) > 0 && evTimes.nonEmpty)
    // KM contracts: at-risk strictly decreasing in t, survival non-increasing
    assert(got.map(_._2).toSeq == got.map(_._2).toSeq.sorted.reverse)
    assert(got.map(_._5).toSeq == got.map(_._5).toSeq.sorted.reverse)
  }

  test("survival_km: planted censoring — late subjects at risk only early") {
    // u0 signs up day 0, converts day 2; u1 signs up day 0, never converts
    // (censored at horizon day 4); u2 signs up day 3, converts day 3 (t=0);
    // u3 has no signup (excluded). Horizon = max event date = day 4.
    val rows = Seq(
      (1L, 0L, "signup", 10.0, "2024-01-01 08:00:00"),
      (2L, 0L, "purchase", 300.0, "2024-01-03 08:00:00"),
      (3L, 1L, "signup", 10.0, "2024-01-01 09:00:00"),
      (4L, 1L, "view", 10.0, "2024-01-05 09:00:00"),
      (5L, 2L, "signup", 10.0, "2024-01-04 07:00:00"),
      (6L, 2L, "purchase", 260.0, "2024-01-04 09:00:00"),
      (7L, 3L, "purchase", 400.0, "2024-01-02 12:00:00"))
    val got = StatQueries.survivalKmOf(mkEvents(rows))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // t=0: at risk u0 (t_obs 2), u1 (t_obs 4), u2 (t_obs 0, event) → n=3 d=1
    // t=2: at risk u0 (event), u1 → n=2 d=1
    assert(got.toSeq == Seq(
      (0, 3L, 1L, 333333L, 666666L),
      (2, 2L, 1L, 500000L, 333333L)))
  }

  // ---------------------------------------------------------- conformal

  test("conformal_forecast: exact local replay of the whole pipeline") {
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(to_date($"ts").as("day"))
      .agg(sum(expr("CAST(round(value*100) AS BIGINT)")).as("rev"))
      .as[(java.sql.Date, Long)].collect().sortBy(_._1.toLocalDate.toEpochDay)
    val i0 = daily.head._1.toLocalDate.toEpochDay
    val idx = daily.map(d => (d._1.toLocalDate.toEpochDay - i0 + 1, d._2)).toMap
    val errs = (8L to idx.keys.max).map { i =>
      val fc = (i - 7 to i - 1).map(idx).sum / 7
      i -> math.abs(idx(i) - fc)
    }.toMap
    val cal = errs.filter(_._1 <= 21).toSeq.sortBy(e => (e._2, e._1))
    val k = ((cal.size + 1) * 4 + 4) / 5
    val q = cal(k - 1)._2
    val tst = errs.filter(_._1 >= 22)
    val covered = tst.values.count(_ <= q).toLong
    val r = StatQueries.conformalForecast(spark, sfDir).collect().head
    assert(r.getLong(0) == cal.size && r.getLong(1) == tst.size)
    assert(r.getLong(2) == k && r.getLong(3) == q)
    assert(r.getLong(4) == covered)
    assert(r.getLong(5) == covered * 1000000L / tst.size)
  }

  test("conformal_forecast: planted spike in test stays outside the interval") {
    // flat series (err 0 everywhere) except day 25 jumps: q = 0, the
    // spike day is the only uncovered test point -> coverage 8/9
    val rows = (1 to 30).map { d =>
      val v = if (d == 25) 400.0 else 100.0
      (d.toLong, 1L, "view", v, f"2024-01-$d%02d 05:00:00")
    }
    val r = StatQueries.conformalForecastOf(mkEvents(rows)).collect().head
    assert(r.getLong(3) == 0L, s"q=${r.getLong(3)}")
    // day 25 misses; days 26-32 don't exist past 30 — 9 test days are
    // 22..30, day 25 spikes and days 26..30 carry the spike into their
    // trailing mean (fc off by 30000/7 e2) so they miss too
    assert(r.getLong(4) < r.getLong(1), s"covered=${r.getLong(4)}/${r.getLong(1)}")
  }

  // ------------------------------------------------------------ MI and PSI

  test("mutual_info: exact replay; planted dependence raises MI, bounded by H") {
    def q(x: Double): Long = math.round(1e6 * math.log(x))
    val ev = graft.Tables.events(spark, sfDir)
      .select($"event_type", (floor($"value".cast("double") / 50) * 50).cast("long"))
      .as[(String, Long)].collect()
    val n = ev.length.toLong
    val cxy = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cx = ev.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cy = ev.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val miNum = cxy.map { case ((x, y), c) =>
      c * q(c.toDouble * n / (cx(x).toDouble * cy(y)))
    }.sum
    def hNum(m: Map[_, Long]) = n * q(n.toDouble) - m.values.map(c => c * q(c.toDouble)).sum
    val r = StatQueries.mutualInfo(spark, sfDir).collect().head
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == hNum(cx) / n && r.getLong(2) == hNum(cy) / n)
    assert(r.getLong(3) == miNum / n)
    // iid fixture: MI is tiny next to the marginals
    assert(math.abs(r.getLong(3)) < r.getLong(1) / 10)

    // planted dependence: purchases live ONLY in low buckets
    val dep = (0 until 400).map { i =>
      val pos = i % 5 == 0
      val v = if (pos) (i % 10) * 10.0 else 250.0 + (i % 10) * 10.0
      (i.toLong, i.toLong, if (pos) "purchase" else "view", v, "2024-01-05 00:00:00")
    }
    val d = StatQueries.mutualInfoOf(mkEvents(dep)).collect().head
    // X determines Y exactly here: MI == H(X) (up to per-cell rounding)
    assert(math.abs(d.getLong(3) - d.getLong(1)) <= 5, s"mi=${d.getLong(3)} hx=${d.getLong(1)}")
    assert(d.getLong(4) >= 999000L, s"nmi=${d.getLong(4)}")
  }

  test("psi_drift: stable fixture vs planted shift verdicts; contribs replay") {
    val out = StatQueries.psiDrift(spark, sfDir).collect()
    assert(out.nonEmpty && out.forall(_.getString(6) == out.head.getString(6)))
    // replay one bucket's contribution exactly
    val ev = graft.Tables.events(spark, sfDir)
      .select((floor($"value".cast("double") / 50) * 50).cast("long").as("b"),
        dayofmonth($"ts").as("dom"))
      .as[(Long, Int)].collect()
    val nb = out.length.toLong
    val na = ev.count(_._2 <= 14).toLong; val ncur = ev.length - na
    for (row <- out) {
      val b = row.getLong(0)
      val a = ev.count(e => e._1 == b && e._2 <= 14).toLong
      val c = ev.count(e => e._1 == b && e._2 > 14).toLong
      assert(row.getLong(1) == a && row.getLong(2) == c)
      val l = math.round(1e6 * math.log(
        (a + 1).toDouble * (ncur + nb) / ((c + 1).toDouble * (na + nb))))
      val num = (a + 1) * (ncur + nb) - (c + 1) * (na + nb)
      assert(row.getLong(5) == num * l / ((na + nb) * (ncur + nb)))
    }

    // planted shift: reference mass low, current mass high -> major drift
    val shift = (0 until 300).map { i =>
      val ref = i < 150
      val v = if (ref) (i % 4) * 50.0 + 1 else 250.0 + (i % 4) * 50.0 + 1
      (i.toLong, i.toLong, "view", v, if (ref) "2024-01-05 00:00:00" else "2024-01-20 00:00:00")
    }
    val s = StatQueries.psiDriftOf(mkEvents(shift)).collect()
    assert(s.forall(_.getString(6) == "major"), s.map(_.getString(6)).toSeq.toString)
  }

  // --------------------------------------------------------------- AdaBoost

  /** Local exact AdaBoost on a (bucket -> (pos, neg)) histogram, the
    * brute-force mirror of [[StatQueries.adaboostSql]]. */
  private def adaBrute(hist: Map[Long, (Long, Long)])
      : (Seq[(Long, Long, Long, Long, Long, Long, Long)], BigInt) = {
    val buckets = hist.keys.toSeq.sorted
    val thrs = buckets.tail
    val n = hist.values.map(v => v._1 + v._2).sum
    val np = hist.values.map(_._1).sum; val nn = n - np
    def left(t: Long) = buckets.filter(_ < t)
    def wrong1(t: Long, pol: Long): Long = {
      val lp = left(t).map(hist(_)._1).sum; val ln = left(t).map(hist(_)._2).sum
      if (pol == 1) ln + (np - lp) else lp + (nn - ln)
    }
    val (e, t1, p1) = (for (t <- thrs; p <- Seq(1L, -1L)) yield (wrong1(t, p), t, p))
      .minBy(c => (c._1, c._2, -c._3))
    def pred(t: Long, pol: Long, b: Long) = if (b < t) pol else -pol
    def score2(t: Long, pol: Long): Long = {
      var a = 0L; var b2 = 0L
      for ((b, (pos, neg)) <- hist; (yy, c) <- Seq((1L, pos), (-1L, neg))) {
        val ok1 = pred(t1, p1, b) == yy
        if (pred(t, pol, b) != yy) { if (ok1) a += c else b2 += c }
      }
      a * e + b2 * (n - e)
    }
    val (num, t2, p2) = (for (t <- thrs; p <- Seq(1L, -1L)) yield (score2(t, p), t, p))
      .minBy(c => (c._1, c._2, -c._3))
    val den = 2 * e * (n - e)
    var nc = 0L
    for ((b, (pos, neg)) <- hist; (yy, c) <- Seq((1L, pos), (-1L, neg))) {
      val (q1, q2) = (pred(t1, p1, b), pred(t2, p2, b))
      val pr = if (q1 == q2) q1
        else if (BigInt(e) * den < BigInt(num) * n) q1 else q2
      if (pr == yy) nc += c
    }
    def alpha(numer: Long, denom: Long): Long =
      math.round(500000.0 * math.log((denom - numer).toDouble / numer.toDouble))
    // re-weighting identity: h1's own round-2 weighted error is exactly 1/2
    val selfScore = BigInt(score2(t1, p1))
    (Seq(
      (1L, t1, p1, e, n, alpha(e, n), n - e),
      (2L, t2, p2, num, den, alpha(num, den), nc)), selfScore)
  }

  private def histOf(rows: Seq[(Long, Long, String, Double, String)]) =
    rows.groupBy(r => (math.floor(r._4 / 10) * 10).toLong).view.mapValues { g =>
      (g.count(_._3 == "purchase").toLong, g.count(_._3 != "purchase").toLong)
    }.toMap

  test("adaboost_stumps: exact local replay on the fixture; reweight identity") {
    val ev = graft.Tables.events(spark, sfDir)
      .select($"event_type", $"value").as[(String, Double)].collect()
    val hist = ev.groupBy(e => (math.floor(e._2 / 10) * 10).toLong).view.mapValues { g =>
      (g.count(_._1 == "purchase").toLong, g.count(_._1 != "purchase").toLong)
    }.toMap
    val (expect, selfScore) = adaBrute(hist)
    val got = StatQueries.adaboostStumps(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == expect)
    // weak-learnability held both rounds
    val Seq(r1, r2) = expect
    assert(r1._4 * 2 < r1._5 && r2._4 * 2 < r2._5, s"eps >= 1/2: $expect")
    // the identity the whole construction rests on: under the round-2
    // weights, h1's own weighted error is exactly 1/2 (num/den == 1/2)
    val den = BigInt(2) * r1._4 * (r1._5 - r1._4)
    assert(selfScore * 2 == den, s"self $selfScore den $den")
  }

  test("adaboost_stumps: planted histogram — h2 complements h1 under reweighting") {
    // region <100: mostly positive; 100..200: all negative; >=200: mixed.
    val rows =
      (0 until 160).map(i => (i.toLong, 0L, "purchase", (i % 10) * 10.0, "2024-01-05 00:00:00")) ++
      (0 until 40).map(i => (200L + i, 0L, "view", (i % 10) * 10.0, "2024-01-05 00:00:00")) ++
      (0 until 100).map(i => (300L + i, 0L, "view", 100.0 + (i % 10) * 10.0, "2024-01-05 00:00:00")) ++
      (0 until 110).map(i => (500L + i, 0L, "purchase", 200.0 + (i % 10) * 10.0, "2024-01-05 00:00:00")) ++
      (0 until 90).map(i => (700L + i, 0L, "view", 200.0 + (i % 10) * 10.0, "2024-01-05 00:00:00"))
    val (expect, _) = adaBrute(histOf(rows.map(r => (r._1, r._2, r._3, r._4, r._5))))
    val got = StatQueries.adaboostStumpsOf(mkEvents(rows)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == expect)
    // the two rounds picked different stumps (reweighting moved the argmin)
    assert((got(0)._2, got(0)._3) != (got(1)._2, got(1)._3))
  }

  // -------------------------------------------------------------- IPS / OPE

  test("ips_policy_eval: exact replay; IPS equals propensity-weighted direct") {
    val ev = graft.Tables.events(spark, sfDir)
      .select(($"user_id" % 3).as("x"), $"event_type", ($"value" > 250).cast("long").as("r"))
      .as[(Long, String, Long)].collect()
    val target = Map(0L -> "purchase", 1L -> "view", 2L -> "click")
    val n = ev.length.toLong
    val got = StatQueries.ipsPolicyEval(spark, sfDir).collect()
    assert(got.length == 3)
    for (row <- got) {
      val x = row.getLong(0)
      val seg = ev.filter(_._1 == x)
      val matched = seg.filter(_._2 == target(x))
      val (nx, c, sr) = (seg.length.toLong, matched.length.toLong, matched.map(_._3).sum)
      assert(row.getString(1) == target(x))
      assert(row.getLong(2) == nx && row.getLong(3) == c)
      assert(row.getLong(4) == c * 1000000L / nx)
      assert(row.getLong(5) == sr * 1000000L / c)
      assert(row.getLong(6) == BigInt(sr) * nx * 1000000 / (BigInt(c) * n))
      // Horvitz-Thompson identity for a deterministic target policy:
      // contribution == direct mean weighted by the segment share
      val ident = BigInt(sr) * 1000000 / c * nx / n
      assert((BigInt(row.getLong(6)) - ident).abs <= 1)
    }
  }

  // ------------------------------------------------------------ Holt linear

  test("holt_linear: exact local fold; trend tracks a planted drift") {
    // fixture replay: fold the coupled recurrence locally
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(to_date($"ts").as("day"))
      .agg(sum(expr("CAST(round(value*100) AS BIGINT)")).as("y"))
      .as[(java.sql.Date, Long)].collect().sortBy(_._1.toLocalDate.toEpochDay)
    var (l, b) = (daily.head._2, 0L)
    // Scala Long / truncates toward zero — the same convention as Spark
    // div and DuckDB // on the (possibly negative) trend
    val expect = (daily.head._1 -> ((l, b, l + b))) +: daily.tail.map { case (d, y) =>
      val l2 = (y + l + b) / 2
      val b2 = (b + (l2 - l)) / 2
      l = l2; b = b2; d -> (l, b, l + b)
    }
    val got = StatQueries.holtLinear(spark, sfDir).collect()
      .map(r => r.getDate(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expect.toSeq)

    // planted linear drift: one event per day, value 100 + 10t
    val simple = (0 until 30).map(t =>
      (t.toLong, 1L, "view", 100.0 + t * 10.0, f"2024-03-${t + 1}%02d 05:00:00"))
    val out = StatQueries.holtLinearOf(mkEvents(simple)).collect()
    val lastTrend = out.last.getLong(3)
    // slope is 1000 e2/day; the coupled filter at alpha=beta=1/2 settles
    // near it (within floor noise)
    assert(math.abs(lastTrend - 1000L) <= 3L, s"trend=$lastTrend")
  }

  test("holt folds stay LINEAR: a 50k-step series runs in seconds") {
    // the retired HOF array_append form was O(steps²) element copies —
    // ~1.25e9 interpreted struct copies at 50k steps (minutes); the
    // linear-state expressions walk once (round-11 verdict #2)
    val series = spark.range(50000).select(
      expr("timestamp(date_add(DATE '1970-01-01', CAST(id AS INT)))").as("ts"),
      expr("100.0 + CAST(id % 97 AS DOUBLE) - 48").as("value"))
    val t0 = System.nanoTime()
    val hl = StatQueries.holtLinearOf(series)
    assert(hl.count() == 50000)
    val hw = StatQueries.holtWintersOf(series)
    assert(hw.count() == 50000)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 30.0, s"fold took $sec s — quadratic regression?")
    // spot-check the recursion is still the exact integer chain at the
    // far end (a local replay of the last few steps would need full
    // state; instead pin the conserved first element and types)
    val h0 = hl.orderBy($"day").first()
    assert(h0.getLong(2) == h0.getLong(1) && h0.getLong(3) == 0L)
  }

  // ------------------------------------------------------------- gini split

  test("gini_split: planted signal splits at the boundary; argmax unique") {
    // below 250 → 90% purchase, at/above 250 → 10%: best threshold = 250
    val rows = (0L until 400L).map { i =>
      val lo = i < 200
      val v = if (lo) (i % 25) * 10.0 + 1.0 else 250.0 + (i % 24) * 10.0 + 1.0
      val pos = if (lo) i % 10 != 0 else i % 10 == 0
      (i, i, if (pos) "purchase" else "view", v, "2024-01-05 00:00:00")
    }
    val got = StatQueries.giniSplitOf(mkEvents(rows)).collect()
    val best = got.filter(_.getLong(7) == 1L)
    assert(best.length == 1, "argmax must be unique")
    assert(best.head.getLong(0) == 250L)
    // every candidate has both sides populated
    assert(got.forall(r => r.getLong(1) > 0 && r.getLong(3) > 0))
  }

  test("gini_split: scores are the exact rationals; best beats all rivals") {
    val got = StatQueries.giniSplit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    for ((thr, nl, pl, nr, pr, num, den, _) <- got) {
      val ql = nl - pl; val qr = nr - pr
      assert(BigInt(num) == (BigInt(pl) * pl + BigInt(ql) * ql) * nr
        + (BigInt(pr) * pr + BigInt(qr) * qr) * nl, s"num at $thr")
      assert(den == nl * nr)
    }
    val best = got.filter(_._8 == 1L)
    assert(best.length == 1)
    val b = best.head
    for (o <- got if o._1 != b._1)
      assert(BigInt(b._6) * o._7 > BigInt(o._6) * b._7
        || (BigInt(b._6) * o._7 == BigInt(o._6) * b._7 && b._1 < o._1))
  }

  test("k_anonymity: exact replay; coarsening raises k; planted unique row") {
    // fixture replay of both levels
    val rows = graft.Tables.customer(spark, sfDir)
      .select($"c_nationkey", $"c_mktsegment",
        expr("CAST(round(c_acctbal*100) AS BIGINT)").as("b"))
      .as[(Long, String, Long)].collect()
    def audit(groups: Map[_, Int]) = (groups.size.toLong,
      groups.values.min.toLong,
      groups.values.count(_ < 5).toLong,
      groups.values.filter(_ < 5).map(_.toLong).sum)
    val fine = audit(rows.groupBy(r => (r._1, r._2, (r._3 + 100000) / 10000)).view.mapValues(_.length).toMap)
    val coarse = audit(rows.groupBy(r => (r._2, (r._3 + 100000) / 100000)).view.mapValues(_.length).toMap)
    val got = StatQueries.kAnonymity(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("fine") == fine && got("coarse") == coarse)
    // coarsening cannot lower k
    assert(got("coarse")._2 >= got("fine")._2)

    // planted table: 50 clones + one unique outlier row — fine min_k = 1
    // (the outlier), coarse absorbs it only if its band merges; keep the
    // outlier extreme so it stays alone at BOTH levels: min_k = 1 twice
    val planted = (0 until 50).map(i => (i.toLong, "SEG_A", 100.0)) :+ (99L, "SEG_Z", 9999.0)
    val df = planted.toDF("c_custkey", "c_mktsegment", "c_acctbal")
      .withColumn("c_nationkey", lit(1L))
    val p = StatQueries.kAnonymityOf(df).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(p("fine") == 1L && p("coarse") == 1L)
  }

  test("holt_winters: exact local fold; planted weekly bump lands in seasonal") {
    // fixture replay of the seven-column recursion
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(to_date($"ts").as("day"))
      .agg(sum(expr("CAST(round(value*100) AS BIGINT)")).as("y"))
      .as[(java.sql.Date, Long)].collect().sortBy(_._1.toLocalDate.toEpochDay)
    var (l, b) = (daily.head._2, 0L)
    val s = Array.fill(7)(0L)
    def dow(d: java.sql.Date) = math.floorMod(d.toLocalDate.toEpochDay, 7L).toInt
    val expect = (daily.head._1, l, b, 0L) +: daily.tail.map { case (d, y) =>
      val k = dow(d)
      val l2 = (y - s(k) + l + b) / 2
      val b2 = (b + (l2 - l)) / 2
      s(k) = (y - l2 + s(k)) / 2
      l = l2; b = b2
      (d, l, b, s(k))
    }
    val got = StatQueries.holtWinters(spark, sfDir).collect()
      .map(r => (r.getDate(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expect.toSeq)

    // planted: flat 1000 with +300 every Wednesday-slot -> the bump is
    // absorbed by its seasonal slot, trend stays near zero at the end
    val rows = (1 to 28).map { d =>
      val date = f"2024-03-$d%02d"
      val epochDow = java.time.LocalDate.parse(date).toEpochDay % 7
      val v = if (epochDow == 3) 13.0 else 10.0
      (d.toLong, 1L, "view", v, s"$date 05:00:00")
    }
    val out = StatQueries.holtWintersOf(mkEvents(rows)).collect()
    val last = out.last
    assert(math.abs(last.getLong(3)) <= 20L, s"trend=${last.getLong(3)}")
    // the bump slot's seasonal component approaches +300 e2-units scaled:
    // values are e2 (13.00 - 10.00 = 300); slot seasonal > half the bump
    val bumpRows = out.filter(r => math.floorMod(
      r.getDate(0).toLocalDate.toEpochDay, 7L) == 3L)
    assert(bumpRows.last.getLong(4) > 150L, s"seasonal=${bumpRows.last.getLong(4)}")
  }

  test("simpson_paradox: the textbook reversal flags; a consistent table does not") {
    // classic treatment-paradox cell counts: both strata favor the
    // exposed arm, the pooled table favors the unexposed one
    def plant(h1: (Int, Int, Int, Int), h2: (Int, Int, Int, Int)) = {
      var id = 0L
      def rows(c: (Int, Int, Int, Int), day: String) = {
        val (n11, n10, n01, n00) = c
        def mk(k: Int, even: Boolean, purchase: Boolean) = (1 to k).map { _ =>
          id += 1
          (id, if (even) id * 2 else id * 2 + 1,
            if (purchase) "purchase" else "view", 1.0, s"$day 08:00:00")
        }
        mk(n11, even = true, purchase = true) ++
          mk(n10, even = true, purchase = false) ++
          mk(n01, even = false, purchase = true) ++
          mk(n00, even = false, purchase = false)
      }
      mkEvents(rows(h1, "2024-01-05") ++ rows(h2, "2024-01-20"))
    }
    val p = StatQueries.simpsonParadoxOf(
      plant((81, 6, 234, 36), (192, 71, 55, 25))).collect()
      .map(r => (r.getString(0), r.getLong(5), r.getLong(6))).toSeq
    assert(p == Seq(("h1", 1L, 1L), ("h2", 1L, 1L), ("overall", -1L, 1L)), p)
    // consistent direction everywhere: no flag
    val q = StatQueries.simpsonParadoxOf(
      plant((90, 10, 50, 50), (80, 20, 40, 60))).collect()
      .map(r => (r.getString(0), r.getLong(5), r.getLong(6))).toSeq
    assert(q.forall(_._2 == 1L) && q.forall(_._3 == 0L), q)
  }

  test("hhi_concentration: monopoly and uniform closed forms are exact") {
    import spark.implicits._
    val mono = StatQueries.hhiOf(
      Seq((1L, 1000L)).toDF("s", "rev")).head()
    assert(mono.getLong(1) == 1000000L && mono.getLong(3) == 1000000L)
    assert(mono.getLong(2) == 1000L, s"equiv=${mono.getLong(2)}")
    val uni = StatQueries.hhiOf(
      (1L to 8L).map(i => (i, 500L)).toDF("s", "rev")).head()
    assert(uni.getLong(0) == 8L && uni.getLong(1) == 125000L)
    assert(uni.getLong(2) == 8000L && uni.getLong(3) == 125000L)
  }

  test("dispersion_index: constant series scores 0; a planted spike the closed form") {
    def plant(counts: Seq[Int]) = mkEvents(counts.zipWithIndex.flatMap {
      case (c, d) => (1 to c).map(i =>
        ((d * 1000 + i).toLong, 1L, "view", 1.0, f"2024-03-${d + 1}%02d 08:00:00"))
    })
    val flat = StatQueries.dispersionIndexOf(plant(Seq(10, 10, 10, 10))).head()
    assert(flat.getLong(1) == 4L && flat.getLong(2) == 10L &&
      flat.getLong(3) == 0L && flat.getLong(4) == 0L)
    // counts (10,10,10,30): mean 15, sample var 100 -> D = 100/15, cv = 10/15
    val burst = StatQueries.dispersionIndexOf(plant(Seq(10, 10, 10, 30))).head()
    assert(burst.getLong(2) == 15L)
    assert(burst.getLong(3) == 66667L, s"D=${burst.getLong(3)}")
    assert(burst.getLong(4) == 6667L, s"cv=${burst.getLong(4)}")
  }

  test("ols_features: planted exact linear data recovers the coefficients") {
    // y = 500 + 3*x1 + 7*x2 exactly (clicks x1, errors x2, purchase
    // revenue y) — betas must come back to the plant at e4 and R2 = 1.
    // Non-collinear plant: x1 ramps, x2 alternates.
    val rows = (1 to 20).flatMap { d =>
      val date = f"2024-03-$d%02d"
      val x1 = d
      val x2 = 2 + (d % 3)
      val y = 500 + 3 * x1 + 7 * x2
      val clicks = (1 to x1).map(i =>
        (d * 10000L + i, 1L, "click", 1.0, s"$date 05:00:00"))
      val errors = (1 to x2).map(i =>
        (d * 20000L + i, 1L, "error", 1.0, s"$date 06:00:00"))
      // one purchase carrying the whole day's revenue (value is e2-scaled
      // by the query: y cents = y/100 value units)
      val buy = Seq((d * 30000L, 1L, "purchase", y / 100.0, s"$date 07:00:00"))
      clicks ++ errors ++ buy
    }
    val r = StatQueries.olsFeaturesOf(mkEvents(rows)).head()
    assert(r.getLong(0) == 20L)
    assert(r.getLong(1) == 500L * 10000, s"beta0=${r.getLong(1)}")
    assert(r.getLong(2) == 3L * 10000, s"beta1=${r.getLong(2)}")
    assert(r.getLong(3) == 7L * 10000, s"beta2=${r.getLong(3)}")
    assert(r.getLong(4) == 1000000L, s"r2=${r.getLong(4)}")
  }
}
