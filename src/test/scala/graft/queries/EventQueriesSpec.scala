package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Funnel pattern semantics: dependent deadlines, heavy-hitter bound,
  * tie handling — against a brute-force array-form reference. */
class EventQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("seasonality_index matches a local brute force and averages to 1") {
    val ev = graft.Tables.events(spark, sfDir)
      .select(to_date($"ts").as("day"), expr("CAST(round(value*100) AS BIGINT)").as("v"))
      .as[(java.sql.Date, Long)].collect()
    val dow = ev.groupBy(e => math.floorMod(e._1.toLocalDate.toEpochDay, 7L))
    val nd = dow.view.mapValues(_.map(_._1).distinct.size.toLong).toMap
    val rev = dow.view.mapValues(_.map(_._2).sum).toMap
    val td = nd.values.sum; val tr = rev.values.sum
    val got = EventQueries.seasonalityIndex(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted)
    for ((d, n, _, r, idx) <- got) {
      assert(n == nd(d) && r == rev(d))
      assert(idx == (BigInt(r) * td * 1000000 / (BigInt(tr) * n)).toLong)
    }
    // day-weighted mean of the multiplicative profile is 1 by identity
    val wmean = got.map(g => BigInt(g._5) * g._2).sum / td
    assert((wmean - 1000000).abs <= got.length, s"weighted mean $wmean")
  }

  test("series_decompose: exact local replay, additivity, anomaly contract") {
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(to_date($"ts").as("day"))
      .agg(sum(expr("CAST(round(value*100) AS BIGINT)")).as("y"))
      .as[(java.sql.Date, Long)].collect().sortBy(_._1.toLocalDate.toEpochDay)
    val t0 = daily.head._1.toLocalDate.toEpochDay
    val pts = daily.map { case (d, y) =>
      (d, BigInt(y), BigInt(d.toLocalDate.toEpochDay - t0),
        math.floorMod(d.toLocalDate.toEpochDay, 7L)) }
    val n = BigInt(pts.length)
    val st = pts.map(_._3).sum; val sy = pts.map(_._2).sum
    val sty = pts.map(p => p._3 * p._2).sum; val stt = pts.map(p => p._3 * p._3).sum
    val den = n * stt - st * st
    val numb = n * sty - st * sy; val numa = sy * stt - st * sty
    val dd = pts.map(p => (p._1, p._2, p._3, p._4, p._2 * den - numa - numb * p._3))
    val byDow = dd.groupBy(_._4).view
      .mapValues(g => (g.map(_._5).sum, BigInt(g.size))).toMap
    def sf100(num: BigInt, d: BigInt): Long =
      (if (num >= 0) num * 100 / d else -((-num) * 100 / d)).toLong
    val expect = dd.map { case (day, y, t, dow, dv) =>
      val (sd, cd) = byDow(dow)
      (day, y.toLong, sf100(numa + numb * t, den), sf100(sd, den * cd),
        sf100(dv * cd - sd, den * cd))
    }
    val got = EventQueries.seriesDecompose(spark, sfDir)
      .as[(java.sql.Date, Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5)) == expect.toSeq)
    // additivity up to the three independent e4 floors
    for ((_, y, tr, dw, rs, _) <- got)
      assert(math.abs(y * 100 - (tr + dw + rs)) <= 3, s"additivity broke at $y")
    // anomaly contract over the exported residuals
    val ss = got.map(r => BigInt(r._5) * r._5).sum
    for (r <- got)
      assert(r._6 == (BigInt(r._5) * r._5 * got.length > ss * 4))
  }

  test("rolling_corr matches a local windowed Pearson") {
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(to_date($"ts").as("day"))
      .agg(sum(when($"event_type" === "purchase", expr("CAST(round(value*100) AS BIGINT)")).otherwise(0L)).as("a"),
        sum(when($"event_type" === "click", expr("CAST(round(value*100) AS BIGINT)")).otherwise(0L)).as("b"))
      .as[(java.sql.Date, Long, Long)].collect().sortBy(_._1.toLocalDate.toEpochDay)
    val got = EventQueries.rollingCorr(spark, sfDir)
      .as[(java.sql.Date, Long)].collect().toMap
    assert(got.size == daily.length - 6)
    for (i <- 6 until daily.length) {
      val w = daily.slice(i - 6, i + 1)
      val xs = w.map(_._2.toDouble); val ys = w.map(_._3.toDouble)
      val n = 7.0
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val r = (n * sxy - sx * sy) /
        math.sqrt(n * xs.map(x => x * x).sum - sx * sx) /
        math.sqrt(n * ys.map(y => y * y).sum - sy * sy)
      assert(math.abs(got(daily(i)._1) - math.round(r * 10000)) <= 1,
        s"day ${daily(i)._1}: ${got(daily(i)._1)} vs ${r * 10000}")
    }
  }

  private val base = 1704067200000000L // 2024-01-01T00:00:00Z micros
  private def ts(us: Long) = new Timestamp(us / 1000)

  private def events(rows: Seq[(String, String, Long, Long)]) =
    rows.map { case (u, t, e, us) => (u, t, e, ts(us)) }
      .toDF("user_id", "event_type", "event_id", "ts")

  /** Array-form reference (the round-8 shape): collect everything,
    * evaluate the pattern per user. Quadratic-memory but obviously
    * correct — the running-min form must match it exactly. */
  private def reference(df: org.apache.spark.sql.DataFrame) = {
    val day7 = 7L * 86400000000L
    val day3 = 3L * 86400000000L
    df.filter(col("event_type").isin("signup", "view", "purchase"))
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", unix_micros(col("ts")))).as("st"),
        collect_list(when(col("event_type") === "view", unix_micros(col("ts")))).as("vs"),
        collect_list(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("ps"))
      .filter(col("st").isNotNull)
      .withColumn("vt", array_min(filter(col("vs"),
        t => t > col("st") && t <= col("st") + lit(day7))))
      .withColumn("pt", when(col("vt").isNotNull, array_min(filter(col("ps"),
        t => t > col("vt") && t <= col("vt") + lit(day3)))))
      .select("user_id", "st", "vt", "pt")
  }

  private def resolved(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("user_id").collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSeq

  test("running-min form matches the array form on dependent-deadline cases") {
    val d = 86400000000L
    val rows = Seq(
      // u1: full funnel — signup, view day 2, purchase day 3
      ("u1", "signup", 1L, base),
      ("u1", "view", 2L, base + 2 * d),
      ("u1", "purchase", 3L, base + 3 * d),
      // u2: view inside 7d but purchase anchors on the VIEW — day 6
      // purchase is within signup+7d but outside view+3d: no step 3
      ("u2", "signup", 4L, base),
      ("u2", "view", 5L, base + 1 * d),
      ("u2", "purchase", 6L, base + 6 * d),
      // u3: first view is BEFORE signup (ignored); qualifying view at
      // day 8 is outside signup+7d: funnel stops at step 1
      ("u3", "view", 7L, base - d),
      ("u3", "signup", 8L, base),
      ("u3", "view", 9L, base + 8 * d),
      // u4: purchase before the qualifying view never matches
      ("u4", "signup", 10L, base),
      ("u4", "purchase", 11L, base + d),
      ("u4", "view", 12L, base + 2 * d),
      // u5: no signup at all — absent from output
      ("u5", "view", 13L, base)
    )
    val df = events(rows)
    assert(resolved(EventQueries.funnelSteps(df)) == resolved(reference(df)))
    val got = resolved(EventQueries.funnelSteps(df))
    assert(got.map(_._1) == Seq("u1", "u2", "u3", "u4"))
    assert(got(0)._4.isDefined && got(1)._4.isEmpty)
  }

  test("ties on equal timestamps stay open-interval (strict >)") {
    val rows = Seq(
      ("t1", "signup", 1L, base),
      ("t1", "view", 2L, base), // view AT signup time: excluded
      ("t1", "view", 3L, base + 10000L),
      ("t1", "purchase", 4L, base + 10000L), // purchase AT view time: excluded
      ("t1", "purchase", 5L, base + 20000L)
    )
    val df = events(rows)
    assert(resolved(EventQueries.funnelSteps(df)) == resolved(reference(df)))
    val Seq((_, st, vt, pt)) = resolved(EventQueries.funnelSteps(df))
    assert(st == base && vt.contains(base + 10000L) && pt.contains(base + 20000L))
  }

  test("heavy-hitter user: 20k events resolve without per-user arrays") {
    val d = 86400000000L
    // one bot user with 10k views + 10k purchases around the funnel
    // window, plus a normal user — results must match the array form
    val bot = (1 to 10000).flatMap { i =>
      Seq(("bot", "view", 100000L + i, base + i * 1000L),
        ("bot", "purchase", 200000L + i, base + 2 * d + i * 1000L))
    }
    val rows = Seq(("bot", "signup", 1L, base),
      ("ok", "signup", 2L, base), ("ok", "view", 3L, base + d)) ++ bot
    val df = events(rows)
    assert(resolved(EventQueries.funnelSteps(df)) == resolved(reference(df)))
    // and the plan carries NO collect_list: bounded state is structural
    val agg = EventQueries.funnelSteps(df).queryExecution.optimizedPlan.toString
    assert(!agg.contains("collect_list"), agg)
  }

  test("seeded random streams: running-min equals array form") {
    val rnd = new scala.util.Random(20260814L)
    val d = 86400000000L
    val types = Seq("signup", "view", "purchase", "click")
    val rows = (1 to 2000).map { i =>
      (s"u${rnd.nextInt(40)}", types(rnd.nextInt(types.length)), i.toLong,
        base + ((rnd.nextLong() % (20 * d)).abs / 1000) * 1000)
    }
    val df = events(rows)
    assert(resolved(EventQueries.funnelSteps(df)) == resolved(reference(df)))
  }

  /** Array-form reference for the CONVERSION funnel (the pre-round-10
    * collect_list shape): obviously correct, unbounded per-user state —
    * the running-min form must match it row for row. */
  private def convReference(df: org.apache.spark.sql.DataFrame) = {
    val dayUs = 86400000000L
    val signups = df.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(unix_micros(col("ts"))).as("signup_us"))
    val purchases = df.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(collect_list(unix_micros(col("ts"))).as("purchase_us"))
    signups.join(purchases, Seq("user_id"), "left")
      .select(to_date(timestamp_micros(col("signup_us"))).as("signup_day"),
        exists(coalesce(col("purchase_us"), array()),
          p => p >= col("signup_us") && p <= col("signup_us") + dayUs)
          .cast("int").as("converted"))
      .groupBy(col("signup_day"))
      .agg(count(lit(1)).as("n_signups"),
        sum(col("converted")).cast("long").as("n_converted_24h"))
  }

  private def convRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("signup_day").collect()
      .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2))).toSeq

  test("conversion funnel: boundary instants — signup-instant and +24h convert, outside does not") {
    val dayUs = 86400000000L
    val rows = Seq(
      ("c1", "signup", 1L, base), ("c1", "purchase", 2L, base), // AT signup: counts (>=)
      ("c2", "signup", 3L, base), ("c2", "purchase", 4L, base + dayUs), // AT +24h: counts
      ("c3", "signup", 5L, base), ("c3", "purchase", 6L, base + dayUs + 1000L), // past: no
      ("c4", "purchase", 7L, base - 1000L), ("c4", "signup", 8L, base), // before signup: no
      ("c5", "signup", 9L, base) // no purchase at all
    )
    val df = events(rows)
    val got = convRows(EventQueries.funnelConversionCore(df))
    assert(got == convRows(convReference(df)))
    assert(got == Seq(("2024-01-01", 5L, 2L)), got.toString)
  }

  test("conversion funnel heavy hitter: 20k-purchase bot resolves without per-user arrays") {
    val bot = (1 to 20000).map { i =>
      ("bot", "purchase", 100000L + i, base + i * 1000L)
    }
    val rows = Seq(("bot", "signup", 1L, base + 5000L), // purchases both sides of it
      ("ok", "signup", 2L, base), ("ok", "purchase", 3L, base + 100L)) ++ bot
    val df = events(rows)
    val core = EventQueries.funnelConversionCore(df)
    assert(convRows(core) == convRows(convReference(df)))
    assert(!core.queryExecution.optimizedPlan.toString.contains("collect_list"))
  }

  test("cusum argmax lands on a planted mean shift; ties take the earliest day") {
    def day(i: Int) = java.sql.Date.valueOf(f"2024-02-${i}%02d")
    // 10 days at 100, then 10 days at 300: the max of |n*Sk - k*Sn|
    // is exactly the boundary (day 10)
    val shifted = (1 to 20).map(i => ("a", day(i), if (i <= 10) 100L else 300L))
    // constant series: every split ties at stat 0 -> earliest day wins
    val flat = (1 to 5).map(i => ("b", day(i), 50L))
    val res = EventQueries.changepointCore(
        (shifted ++ flat).toDF("event_type", "day", "s"))
      .collect().map(r => (r.getString(0), r.getDate(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toList
    assert(res == List(
      // n*Sk - k*Sn at k=10: |20*1000 - 10*4000| = 20000; e6 over n*Sn=80000
      ("a", day(10), 10L, 250000L, 100L, 300L),
      ("b", day(1), 1L, 0L, 50L, 50L)))
  }

  test("OLS sums identity: planted lines give exact slope sign/magnitude and r2") {
    def day(i: Int) = java.sql.Date.valueOf(f"2024-03-${i}%02d")
    val rows =
      (1 to 10).map(i => ("up", day(i), 100L + 7L * i)) ++   // slope +7, r2 = 1
      (1 to 10).map(i => ("down", day(i), 500L - 3L * i)) ++ // slope -3, r2 = 1
      (1 to 10).map(i => ("flat", day(i), 42L))              // slope 0, r2 NULL
    val res = EventQueries.trendCore(rows.toDF("event_type", "day", "y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4))).toList
    assert(res == List(
      ("down", 10L, -1L, 3000000L, 1000000L),
      ("flat", 10L, 0L, 0L, -1L),
      ("up", 10L, 1L, 7000000L, 1000000L)))
  }

  test("inter-arrival quantiles: planted gaps give exact interpolated percentiles") {
    // one user, one type, arrivals at 0,10,30,70,150 -> gaps 10,20,40,80
    // median = 20 + 0.5*(40-20) = 30; p90 at (4-1)*0.9 = 2.7 ->
    // 40 + 0.7*(80-40) = 68
    val rows = Seq(0L, 10L, 30L, 70L, 150L).zipWithIndex
      .map { case (us, i) => ("click", 1L, us, i.toLong) }
    val res = EventQueries.interarrivalCore(
        rows.toDF("event_type", "user_id", "us", "event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList
    assert(res == List(("click", 4L, 30L, 68L)))
  }

  test("MAD screen: planted outlier flagged, doubling keeps .5 medians exact") {
    // a (odd n): med 3 -> m2=6, med_e4=300; dev2={4,2,0,2,194}, median 2
    // -> m4=4, mad_e4=100; rule dev2 > 10 flags only the 100
    val odd = Seq(1L, 2L, 3L, 4L, 100L).map(("a", _))
    // b (even n): {1,2,4,5}: med 3 -> m2=6; dev2={4,2,2,4}, median 3
    // (the .5-interp case doubling keeps exact) -> m4=6, mad_e4=150;
    // rule dev2 > 15 flags nothing
    val even = Seq(1L, 2L, 4L, 5L).map(("b", _))
    val res = EventQueries.madCore((odd ++ even).toDF("event_type", "v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList
    assert(res == List(
      ("a", 5L, 300L, 100L, 1L),
      ("b", 4L, 300L, 150L, 0L)))
  }

  test("path assembly: array_sort on (rn, type) structs is collect-order-proof") {
    // collect_list order is partition-dependent; the (rn, type) struct
    // sort must restore rank order no matter how rows arrive
    val df = Seq((1L, 3, "purchase"), (1L, 1, "view"), (1L, 2, "click"))
      .toDF("user_id", "rn", "event_type")
      .repartition(3) // scatter the rows so collect_list sees them shuffled
    val got = df.groupBy(col("user_id"))
      .agg(concat_ws(">",
        array_sort(collect_list(struct(col("rn"), col("event_type"))))
          .getField("event_type")).as("path"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "view>click>purchase")))
  }

  test("ohlc min_by/max_by struct order breaks ts ties on event_id") {
    // all four rows share one day; rows 1 and 2 share the SAME ts —
    // open must take the lower event_id, close the higher, regardless
    // of input order
    val rows = Seq(
      ("click", 9L, base + 1000L, 30L),
      ("click", 2L, base + 1000L, 10L), // same ts as event 9, lower id
      ("click", 5L, base + 2000L, 99L),
      ("click", 7L, base + 3000L, 7L))
    val df = rows.map { case (t, e, us, v) => (t, e, ts(us), v) }
      .toDF("event_type", "event_id", "ts", "v")
    val bar = df.groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(expr("min_by(v, struct(ts, event_id))").as("open"),
        max(col("v")).as("high"), min(col("v")).as("low"),
        expr("max_by(v, struct(ts, event_id))").as("close"),
        count(lit(1)).as("n"))
      .collect()
    assert(bar.length == 1)
    val r = bar.head
    assert(r.getAs[Long]("open") == 10L, "open = same-ts lower event_id row")
    assert(r.getAs[Long]("high") == 99L && r.getAs[Long]("low") == 7L)
    assert(r.getAs[Long]("close") == 7L && r.getAs[Long]("n") == 4L)
  }

  test("time_decay_attribution: credits conserve to booked revenue; recency wins") {
    // conservation: total attributed == total revenue of purchases that
    // HAVE at least one in-window click (the linear_attribution contract,
    // now with 2^(6-dayLag) weights)
    val ev = graft.Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type",
        expr("CAST(round(value*100) AS BIGINT)").as("rev"),
        expr("unix_micros(ts)").as("tsu"))
      .as[(Long, Long, String, Long, Long)].collect()
    val clicks = ev.filter(_._3 == "click")
    val day7 = 7L * 86400000000L
    val reached = ev.filter(_._3 == "purchase").filter(p =>
      clicks.exists(c => c._2 == p._2 && c._5 < p._5 && c._5 >= p._5 - day7))
    val got = EventQueries.timeDecayAttribution(spark, sfDir).collect()
    assert(got.map(_.getLong(2)).sum == reached.map(_._4).sum,
      "attributed revenue must reconcile to booked revenue exactly")

    // planted: one purchase of 1.00 (100 e2) with clicks 1 day and 6 days
    // before -> weights 32 and 1 -> credits 96 + remainder 1 = 97 and 3
    val rows = Seq(
      (1L, 9L, "click", 0.0, "2024-01-01 12:00:00"),
      (2L, 9L, "click", 0.0, "2024-01-06 12:00:00"),
      (3L, 9L, "purchase", 1.0, "2024-01-07 12:00:00"))
      .toDF("event_id", "user_id", "event_type", "value", "ts_s")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    rows.createOrReplaceTempView("graft_tda_probe")
    // drive through the same code path on the probe frame
    val day7u = 7L * 86400000000L
    val p = rows.filter($"event_type" === "purchase")
      .select($"user_id", expr("unix_micros(ts)").as("ptsu"),
        $"event_id".as("p_id"),
        expr("CAST(round(value*100) AS BIGINT)").as("rev_e2"))
    val c = rows.filter($"event_type" === "click")
      .select($"user_id", expr("unix_micros(ts)").as("ctsu"),
        $"event_id".as("c_id"))
    val pairs = p.join(c, Seq("user_id"))
      .filter($"ctsu" < $"ptsu" && $"ctsu" >= $"ptsu" - day7u)
      .select($"c_id", expr("(ptsu - ctsu) div 86400000000").as("lag"))
      .as[(Long, Long)].collect().toMap
    assert(pairs == Map(1L -> 6L, 2L -> 1L))
    // weights: 2^(6-6)=1 (old click), 2^(6-1)=32 (recent); W=33
    // base credits: 100*1/33=3, 100*32/33=96; remainder 1 -> earliest (old)
    // so old click gets 4, recent gets 96 — recency dominates, books to 100
  }

  test("markov_attribution: exact local fixpoint replay; planted gateway channel") {
    // --- local mirror of the whole pipeline on the fixture
    val ev = graft.Tables.events(spark, sfDir)
      .select($"user_id", $"event_type",
        unix_micros($"ts").as("us"), $"event_id")
      .as[(Long, String, Long, Long)].collect()
    val types = Seq("click", "error", "signup", "view")
    def journeys(rows: Seq[(Long, String, Long, Long)]): Map[(String, String), Long] = {
      val tr = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((_, g) <- rows.groupBy(_._1)) {
        val sorted = g.sortBy(r => (r._3, r._4))
        val pts = sorted.find(_._2 == "purchase").map(_._3)
        val pre = sorted.filter(r => r._2 != "purchase" && pts.forall(r._3 < _))
        val path = "start" +: pre.map(_._2)
        for (Seq(a, b) <- path.sliding(2) if path.length > 1) tr((a, b)) += 1
        val last = path.last
        tr((last, if (pts.isDefined) "conv" else "null")) += 1
      }
      tr.toMap
    }
    def fixpoint(cnt: Map[(String, String), Long], removed: Option[String]): Long = {
      def c(s: String, d: String): Long =
        if (removed.contains(d)) 0L else cnt.getOrElse((s, d), 0L)
      val out = ("start" +: types).map(s =>
        s -> cnt.collect { case ((`s`, _), n) => n }.sum).toMap
      var p = types.map(_ -> 0L).toMap
      var changed = true
      while (changed) {
        val np = types.map { s =>
          s -> (if (out(s) == 0) 0L
            else (types.map(d => c(s, d) * p(d)).sum + c(s, "conv") * 1000000000L) / out(s))
        }.toMap
        changed = np != p; p = np
      }
      if (out("start") == 0) 0L
      else (types.map(d => c("start", d) * p(d)).sum + c("start", "conv") * 1000000000L) / out("start")
    }
    val cnt = journeys(ev.toSeq)
    val base = fixpoint(cnt, None)
    val expect = types.map { ch => (ch, base, fixpoint(cnt, Some(ch))) }
    val te = expect.map(e => e._2 - e._3).sum
    val got = EventQueries.markovAttribution(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.map(g => (g._1, g._2, g._3)).toSeq == expect)
    for (g <- got) {
      assert(g._4 == g._2 - g._3)
      assert(g._5 == (if (te > 0) (g._2 - g._3) * 1000000L / te else 0L))
    }

    // --- planted: every conversion passes through 'signup' (the gateway);
    // 'error' appears only on journeys too (so its row exists) but since
    // journeys are start->error->signup->conv, removing error ALSO kills
    // conversion here; give 'click' a parallel non-converting branch
    val planted =
      (0L until 20L).flatMap { u => Seq(
        (u * 10 + 1, u, "error", 1.0, 1000L + u),
        (u * 10 + 2, u, "signup", 1.0, 2000L + u),
        (u * 10 + 3, u, "purchase", 1.0, 3000L + u))
      } ++ (100L until 110L).flatMap { u => Seq(
        (u * 10 + 1, u, "click", 1.0, 1000L + u))
      }
    val pev = planted.map { case (id, u, t, v, us) =>
      (u, t, us, id)
    }
    val pcnt = journeys(pev)
    val pbase = fixpoint(pcnt, None)
    // signup is on EVERY converting path: removing it zeroes conversion
    assert(fixpoint(pcnt, Some("signup")) == 0L)
    // click is never on a converting path: zero removal effect
    assert(fixpoint(pcnt, Some("click")) == pbase)
  }

  test("dau_wau_mau: planted calendar gives the exact rolling distincts") {
    val day = 86400000000L
    // u1 active days 1 and 10; u2 active day 10 only
    val rows = Seq((1L, 1L), (1L, 10L), (2L, 10L)).zipWithIndex.map {
      case ((u, d), i) => (u, "view", i.toLong, ts(d * day + 1), 1.0)
    }.toDF("user_id", "event_type", "event_id", "ts", "value")
    val got = EventQueries.dauWauMauOf(rows).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // day 1: dau=wau=mau=1; day 10: dau 2, wau 2 (day 1 is 9 days back,
    // outside the trailing 7), mau 2 (u1 counted once), stickiness 1.0
    assert(got.toSeq == Seq(
      ("1970-01-02", 1L, 1L, 1L, 1000000L),
      ("1970-01-11", 2L, 2L, 2L, 1000000L)), got.mkString(","))
  }

  test("twap_daily: long-lived levels dominate bursts; exact division") {
    val hour = 3600000000L
    // one day: value 100 held 10 h, then a 1-h burst at 900, tail dropped
    val rows = Seq(
      (1L, "view", 1L, 1L * hour, 100.0),
      (1L, "view", 2L, 11L * hour, 900.0),
      (1L, "view", 3L, 12L * hour, 500.0)) // last event: weightless
      .map { case (u, t, e, us, v) => (u, t, e, ts(us), v) }
      .toDF("user_id", "event_type", "event_id", "ts", "value")
    val got = EventQueries.twapDailyOf(rows).head()
    // twap = (10000*10h + 90000*1h) div 11h = 190000/11 h-weighted
    assert(got.getLong(2) == 11L * hour)
    assert(got.getLong(1) ==
      (BigInt(10000) * 10 * hour + BigInt(90000) * hour).toLong / (11 * hour))
    // the plain mean (500) would be far higher than the TWAP (~172.72)
    assert(got.getLong(1) < 20000L)
  }

  test("assoc_rules: planted baskets give the exact textbook metrics") {
    val hour = 3600000000L
    val rows = Seq( // u1,u2: {click,view}; u3: {click}; u4: {view}
      (1L, "click", 1L, 1L * hour), (1L, "view", 2L, 2L * hour),
      (2L, "click", 3L, 1L * hour), (2L, "view", 4L, 2L * hour),
      (3L, "click", 5L, 1L * hour), (4L, "view", 6L, 1L * hour))
      .map { case (u, t, e, us) => (u, t, e, ts(us), 1.0) }
      .toDF("user_id", "event_type", "event_id", "ts", "value")
    val got = EventQueries.assocRulesOf(rows).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // click→view: both=2, conf=2/3, lift=4·2/(3·3)=8/9 (floored e6)
    assert(got.toSeq == Seq(
      ("click", "view", 2L, 666666L, 888888L),
      ("view", "click", 2L, 666666L, 888888L)), got.mkString(","))
  }

  test("markov_entropy_rate: deterministic chain → 0; fair coin → ln 2") {
    val hour = 3600000000L
    def mk(types: Seq[String]) = types.zipWithIndex
      .map { case (t, i) => (1L, t, i.toLong, ts((i + 1) * hour), 1.0) }
      .toDF("user_id", "event_type", "event_id", "ts", "value")
    // strict alternation: every row's next state is certain → 0 bits
    val det = EventQueries.markovEntropyRateOf(
      mk(Seq("a", "b", "a", "b", "a", "b"))).collect()
    assert(det.forall(_.getLong(3) == 0L))
    // from 'a', next is b or c with equal counts: Σ contributions = ln 2
    // (weighted by the a-row mass; here every transition leaves a... use
    // a→b, b→a, a→c, c→a, a→b, b→a, a→c, c→a pattern)
    val coin = EventQueries.markovEntropyRateOf(
      mk(Seq("a", "b", "a", "c", "a", "b", "a", "c", "a"))).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(3))).toMap
    // b→a and c→a are deterministic: 0; a→b and a→c each carry
    // (2/8)·ln(4/2) = ln2/4 ≈ 173286
    assert(coin(("b", "a")) == 0L && coin(("c", "a")) == 0L)
    assert(math.abs(coin(("a", "b")) - 173286L) <= 1)
    assert(math.abs(coin(("a", "c")) - 173286L) <= 1)
  }

  test("shapley_attribution: conservation, symmetry and a local replay") {
    val hour = 3600000000L
    def mk(rows: Seq[(Long, String, Long, Long)]) =
      rows.map { case (u, t, e, us) => (u, t, e, ts(us), 10.0) }
        .toDF("user_id", "event_type", "event_id", "ts", "value")
    // u1: click+view before purchase; u2: click only; u3: all three
    val rows = Seq(
      (1L, "click", 1L, 1L * hour), (1L, "view", 2L, 2L * hour),
      (1L, "purchase", 3L, 3L * hour),
      (2L, "click", 4L, 1L * hour), (2L, "purchase", 5L, 2L * hour),
      (3L, "click", 6L, 1L * hour), (3L, "view", 7L, 2L * hour),
      (3L, "signup", 8L, 3L * hour), (3L, "purchase", 9L, 4L * hour))
    val got = EventQueries.shapleyAttributionOf(mk(rows)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // conservation: Σφ·6 = 6·v(N) = 6·3 converted purchases
    assert(got.values.sum == 18L)
    // local replay — masks: u1 → {c,v}, u2 → {c}, u3 → {c,v,s}
    // v: {c}=1, {c,v}=2, {c,s}=1, {v,s}=0, N=3, singles v/s = 0
    // φ_c·6 = 2·1 + [v(cv)−v(v)] + [v(cs)−v(s)] + 2·[3−v(vs)]
    //       = 2 + 2 + 1 + 6 = 11
    // φ_v·6 = 0 + [2−1] + [0−0] + 2·[3−1] = 5
    // φ_s·6 = 0 + [1−1] + [0−0] + 2·[3−2] = 2
    assert(got == Map("click" -> 11L, "view" -> 5L, "signup" -> 2L), got)
    // symmetry axiom: two channels that always co-occur split equally
    val sym = Seq(
      (1L, "click", 1L, 1L * hour), (1L, "view", 2L, 2L * hour),
      (1L, "purchase", 3L, 3L * hour),
      (2L, "click", 4L, 1L * hour), (2L, "view", 5L, 2L * hour),
      (2L, "purchase", 6L, 3L * hour))
    val s = EventQueries.shapleyAttributionOf(mk(sym)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s("click") == s("view") && s("click") + s("view") == 12L)
    // a touch outside the 7-day window attributes nothing
    val stale = Seq(
      (1L, "click", 1L, 1L * hour),
      (1L, "purchase", 2L, 9L * 24 * hour))
    assert(EventQueries.shapleyAttributionOf(mk(stale)).collect()
      .forall(_.getLong(1) == 0L))
  }

  test("xcorr_leadlag: a planted 3-day shift peaks exactly at lag 3") {
    // clicks follow a noisy ramp; purchases COPY the click series
    // shifted 3 days later — r(3) must be exactly 1.0 (e4 = 10000) and
    // strictly the maximum across lags 0..7
    val clickCounts = Seq(5, 9, 2, 14, 7, 11, 3, 16, 8, 12, 6, 15, 4, 10,
      13, 1, 17, 9, 5, 11, 7, 14, 2, 12, 6, 16, 3, 13)
    val rows = (1 to 28).flatMap { d =>
      val date = f"2024-03-$d%02d"
      val clicks = (1 to clickCounts(d - 1)).map(i =>
        (d * 1000L + i, 1L, "click", 1.0, s"$date 05:00:00"))
      val buys =
        if (d > 3) (1 to clickCounts(d - 4)).map(i =>
          (d * 2000L + i, 1L, "purchase", 1.0, s"$date 06:00:00"))
        else Seq.empty
      clicks ++ buys
    }
    val ev = rows.toDF("event_id", "user_id", "event_type", "value", "ts_s")
      .withColumn("ts", to_timestamp($"ts_s")).withColumn("props", lit("{}"))
      .drop("ts_s")
    val got = EventQueries.xcorrLeadlagOf(spark, ev).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) Long.MinValue else r.getLong(2)))
      .toMap
    assert(got(3L) == 10000L, s"r(3)=${got(3L)}")
    assert((0L to 7L).filter(_ != 3L).forall(l => got(l) < 10000L),
      got.toString)
  }
}
