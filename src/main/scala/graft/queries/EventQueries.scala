package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Event-stream analytics over the `events` table — the batch shapes of the
  * reference's only stream-like structure (the append-only chat log,
  * /root/reference/app.py:436-443), generalized to the windowed/sessionized
  * analytics a chat-log table needs at scale. The same aggregations run
  * under Structured Streaming in graft.streaming (watermark + window);
  * declared here in batch form because the oracle is batch DuckDB.
  *
  * Scale notes: hourly rollup is a partial-aggregated groupBy on
  * (hour, type) — shuffle volume is the distinct-key count, not the event
  * count; sessionization shuffles once on user_id and every window below
  * reuses that single partitioning.
  */
object EventQueries {

  private def dec(c: Column): Column = c.cast("decimal(18,6)")

  /** JSON access: pull a typed value out of the free-form `props` JSON
    * column (the reference's transient request/response dicts,
    * SURVEY.md §1.1). */
  def jsonProps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_id") < 300)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        col("event_type"))
      .orderBy(col("event_id"))

  /** Time-series gap fill + forward fill: the sparse daily rollup of
    * high-value events (value > 250 — ~1/3 of (type, day) cells occupied)
    * is densified onto the full type × calendar grid; missing days get
    * count 0 and carry the last observed daily total forward (null until
    * a type's first observation). The resample/interpolate primitive
    * behind dashboard continuity and model-feature regularization.
    *
    * Shape: the calendar is metadata (min/max day × |types| — tiny,
    * broadcast), the observation side is one partial-aggregated groupBy,
    * and the forward fill is CHUNKED: a window partitioned only by type
    * funnels 1/|types| of the whole table through one reducer (the
    * enum-key scale trap PlanSpec guards against), so the running
    * `last(ignoreNulls)` partitions by (type, week) — partition count
    * grows with the calendar — and month-boundary continuity comes from
    * a carry-in computed over the per-chunk SUMMARY frame (one row per
    * chunk, bounded by chunk count not table size: the standard chunked-
    * scan ffill decomposition; at 100 TB the chunk is whatever bounds a
    * task, the summary pass is unchanged). The oracle forward-fills
    * GLOBALLY — matching proves the decomposition exact. Sums are
    * DECIMAL(18,6)-exact, exported at e6 as integers. */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val obs = ev.filter(col("value") > 250)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("total"))
    val bounds = ev.agg(min(to_date(col("ts"))).as("lo"), max(to_date(col("ts"))).as("hi"))
    val grid = ev.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
    val g = grid.join(obs, Seq("event_type", "day"), "left")
      .withColumn("chunk", date_trunc("week", col("day")))
    val wIn = Window.partitionBy(col("event_type"), col("chunk"))
      .orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // per-chunk latest observation (max over (day, total) structs —
    // days are unique within a chunk, so this is "last non-null by day")
    val chunkLast = g.groupBy(col("event_type"), col("chunk"))
      .agg(max(when(col("total").isNotNull,
        struct(col("day"), col("total")))).as("cl"))
    // carry-in = latest observation of any EARLIER chunk; the window
    // runs over the chunk-count-bounded summary frame, not the grid
    val wCarry = Window.partitionBy(col("event_type")).orderBy(col("chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = chunkLast
      .withColumn("carry_in", last(col("cl.total"), ignoreNulls = true).over(wCarry))
      .select(col("event_type"), col("chunk"), col("carry_in"))
    g.join(broadcast(carry), Seq("event_type", "chunk"))
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        (coalesce(last(col("total"), ignoreNulls = true).over(wIn),
          col("carry_in")) * 1000000).cast("long").as("filled_e6"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Incremental aggregate maintenance (materialized-view refresh): the
    * per-type profile of the first 20 days is aggregated ONCE and
    * STORED ([[graft.scale.ShingleStore.stored]]); arrival of the tail
    * days refreshes the view by aggregating ONLY the delta and merging
    * partials — count/sum/min/max form a commutative monoid, so
    * merge(agg(base), agg(delta)) == agg(base ∪ delta) exactly, which
    * is what the oracle (a full recompute) checks. Refresh cost is
    * O(delta) + O(|groups|), never a base rescan — at 100 TB this is
    * the difference between a nightly view refresh reading one day and
    * re-reading the corpus. Sums are DECIMAL-exact, exported e6. */
  def incrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    def partials(d: DataFrame): DataFrame = d
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("total"),
        min(col("value")).as("vmin"), max(col("value")).as("vmax"))
    val cut = to_date(lit("2024-01-21"))
    val base = graft.scale.ShingleStore.stored(spark, dir, "evagg-base") {
      partials(Tables.events(spark, dir).filter(to_date(col("ts")) < cut))
    }
    val delta = partials(Tables.events(spark, dir).filter(to_date(col("ts")) >= cut))
    base.unionByName(delta)
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n"),
        (sum(col("total")) * 1000000).cast("long").as("total_e6"),
        min(col("vmin")).as("vmin"), max(col("vmax")).as("vmax"))
      .orderBy(col("event_type"))
  }

  /** Sweep-line max concurrency: the peak number of simultaneously
    * active views per day (each view active for 10 minutes, clipped to
    * its calendar day) — capacity planning's load-peak query, the
    * AGGREGATION sibling of `interval_join` (which enumerates pairs).
    * The sweep is ±1 boundary points with a running sum — O(n log n)
    * per partition, no pair enumeration ever. Day-clipping makes days
    * independent, so the window partitions by DAY (a key that grows
    * with the data, not an enum). Tie semantics are exact: at an equal
    * instant, ends (-1) sort before starts (+1), so touching intervals
    * never count as concurrent; permuting equal deltas at one instant
    * cannot change the running maximum, so the output is total-order-
    * independent and hash-stable. */
  def maxConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.events(spark, dir).filter(col("event_type") === "view")
      .select(col("ts"), date_trunc("day", col("ts")).as("d"))
    val starts = v.select(col("d"), col("ts").as("pt"), lit(1L).as("delta"))
    val ends = v.select(col("d"),
      least(col("ts") + expr("interval 10 minutes"),
        col("d") + expr("interval 1 day")).as("pt"),
      lit(-1L).as("delta"))
    val w = Window.partitionBy(col("d")).orderBy(col("pt").asc, col("delta").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    starts.unionByName(ends)
      .withColumn("c", sum(col("delta")).over(w))
      .groupBy(col("d").cast("date").as("day"))
      .agg(max(col("c")).as("max_concurrent"))
      .orderBy(col("day"))
  }

  /** Ordered multi-step funnel with per-step deadlines (the
    * MATCH_RECOGNIZE / CEP pattern query): signup → first view within
    * 7 days AFTER the signup → first purchase within 3 days after THAT
    * view, cohorted by signup day. Steps are dependent — each
    * deadline anchors on the previous step's matched event, which is
    * what plain per-type aggregates can't express.
    *
    * Shape: ONE user-keyed shuffle; each dependent step is a RUNNING
    * MIN over the user's time-ordered stream — `srun` (first signup so
    * far) qualifies view rows, whose running min `vrun` qualifies
    * purchase rows — then a per-user min aggregate closes the pattern.
    * All three Window operators share one (user) partitioning and one
    * sort, and the groupBy(user) reuses the same distribution, so no
    * operator ever materializes a per-user array: state per row is
    * three longs, immune to a heavy-hitter user with 10⁸ events (the
    * round-8 `collect_list` shape kept every view/purchase timestamp
    * per user and relied on upstream sessionization for its bound —
    * this form needs no such assumption; EventQueriesSpec pins a
    * heavy-hitter case and PlanSpec pins collect_list's absence).
    * Correctness of the running-min qualification: a purchase row at
    * time p sees `vrun` = min qualifying view with ts ≤ p, which
    * equals the global first qualifying view `vt` exactly when vt ≤ p
    * — and a purchase can only match with p > vt, so the two coincide
    * on every accepted row (strict > breaks ties on equal
    * timestamps, matching the array form's open interval).
    * Timestamps compare as exact micros — no float anywhere. */
  def sequenceFunnel(spark: SparkSession, dir: String): DataFrame =
    funnelSteps(Tables.events(spark, dir))
      .groupBy(to_date(timestamp_micros(col("st"))).as("cohort_day"))
      .agg(count(lit(1)).as("n_signup"),
        count(col("vt")).as("n_viewed_7d"),
        count(col("pt")).as("n_purchased_3d"))
      .orderBy(col("cohort_day"))

  /** Per-user funnel resolution (`user_id`, `st`, `vt`, `pt`) over an
    * events frame with (`user_id`, `event_type`, `event_id`, `ts`) —
    * the bounded-state core of [[sequenceFunnel]], separated so the
    * heavy-hitter spec can drive it on synthetic streams. */
  def funnelSteps(events: DataFrame): DataFrame = {
    val day7 = 7L * 86400000000L
    val day3 = 3L * 86400000000L
    val wRun = Window.partitionBy(col("user_id"))
      .orderBy(col("tsu").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .filter(col("event_type").isin("signup", "view", "purchase"))
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("tsu"))
      .withColumn("srun",
        min(when(col("event_type") === "signup", col("tsu"))).over(wRun))
      .withColumn("vcand", when(col("event_type") === "view" &&
        col("tsu") > col("srun") && col("tsu") <= col("srun") + lit(day7), col("tsu")))
      .withColumn("vrun", min(col("vcand")).over(wRun))
      .withColumn("pcand", when(col("event_type") === "purchase" &&
        col("tsu") > col("vrun") && col("tsu") <= col("vrun") + lit(day3), col("tsu")))
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("tsu"))).as("st"),
        min(col("vcand")).as("vt"),
        min(col("pcand")).as("pt"))
      .filter(col("st").isNotNull)
  }

  /** Tumbling-hour rollup by event type: count, exact sum, min/max. */
  def eventsHourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy(col("hour"), col("event_type"))

  /** Sessionization: 30-minute-gap sessions per user via lag() —
    * gaps-and-islands with integer (microsecond) arithmetic so the oracle
    * compare is exact. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("is_new", when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("is_new")).as("n_sessions"),
        max(col("gap_us")).as("max_gap_us"))
      .orderBy(col("user_id"))
  }

  /** Value histogram: fixed-width buckets with integer bounds — the
    * length/value distribution shape of corpus profiling (X4). */
  def valueHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy((floor(col("value") / 50) * 50).cast("long").as("bucket_lo"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket_lo"), col("event_type"))

  /** OHLC time-bar downsample: per (day, event_type) bar, the value at
    * the earliest event (open), max (high), min (low), value at the
    * latest event (close), and the bar count — the market-data
    * resampling shape, and the general "first/last reading per bucket"
    * telemetry rollup. AGGREGATE-ONLY: open/close come from
    * `min_by`/`max_by` ordered by the (ts, event_id) STRUCT — ties on
    * ts (possible at other SFs) break deterministically on event_id, so
    * the cross-engine hash is stable — with map-side partial merge, so
    * there is no window, no per-bucket sort, and ONE shuffle whose keys
    * (day × type) grow with the data. Values export as e2 fixed point
    * (house cross-engine discipline). */
  def ohlcBars(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"),
        col("ts"), col("event_id"))
      .groupBy(col("day"), col("event_type"))
      .agg(expr("min_by(v, struct(ts, event_id))").as("open_e2"),
        max(col("v")).as("high_e2"),
        min(col("v")).as("low_e2"),
        expr("max_by(v, struct(ts, event_id))").as("close_e2"),
        count(lit(1)).as("n"))
      .orderBy(col("day"), col("event_type"))

  /** CUSUM change-point detection: per event type, the split day k that
    * maximizes |n·S_k − k·S_n| over the daily revenue series — the
    * scaled-CUSUM statistic whose argmax is the maximum-likelihood
    * single change point under a mean-shift model (Page's test, exact
    * form). ALL integer: daily sums are e2 longs, the statistic's
    * products run in DECIMAL(38,0) (the chi2/value_moments >64-bit
    * discipline — at 10⁴ days × e2 sums the n·S products pass 10¹⁹),
    * and only the bounded e6-normalized statistic plus integer-div
    * segment means export. Plan shape: ONE daily aggregation (keys grow
    * with the calendar), a CALENDAR-BOUNDED self-join for the running
    * sums (the autocorr pattern — no enum-partitioned window; the
    * joined frame is days², not events²), then a deterministic
    * `max_by(payload, (stat, −k))` argmax — aggregate-only, earliest
    * day wins ties, same tie rule the oracle ranks by. */
  def changepointCusum(spark: SparkSession, dir: String): DataFrame =
    changepointCore(Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("s")))

  /** [[changepointCusum]]'s argmax over a caller-supplied daily series
    * (`event_type`, `day`, `s`) — split out so specs can plant a known
    * mean shift. */
  private[queries] def changepointCore(daily: DataFrame): DataFrame = {
    val d38 = "decimal(38,0)"
    val b = daily.select(col("event_type").as("bt"), col("day").as("bday"),
      col("s").as("bs"))
    val cum = daily.join(b,
        col("event_type") === col("bt") && col("bday") <= col("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("k"), sum(col("bs")).as("sk"))
    val tot = daily.groupBy(col("event_type").as("tt"))
      .agg(sum(col("s")).as("sn"), count(lit(1)).as("n"))
    cum.join(broadcast(tot), col("event_type") === col("tt"))
      .where(col("k") < col("n"))
      .withColumn("stat",
        expr(s"abs(CAST(n AS $d38) * sk - CAST(k AS $d38) * sn)"))
      .groupBy(col("event_type"))
      .agg(expr("max_by(struct(day, k, sk, sn, n, stat), struct(stat, -k))")
        .as("m"))
      .select(col("event_type"), col("m.day").as("change_day"),
        col("m.k").as("split_k"),
        expr(s"CAST((m.stat * 1000000) div (CAST(m.n AS $d38) * m.sn) AS BIGINT)")
          .as("stat_e6"),
        expr("m.sk div m.k").as("left_mean_e2"),
        expr("(m.sn - m.sk) div (m.n - m.k)").as("right_mean_e2"))
      .orderBy(col("event_type"))
  }

  /** Exact per-group OLS trend: slope and r² of daily revenue vs time,
    * per event type, from the closed-form sums identity
    * slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) — ONE aggregate pass
    * collecting the five sums (x = epoch day, no rank needed — pure
    * column arithmetic), then driver-free integer post-arithmetic in
    * DECIMAL(38,0) (num² reaches ~10²⁵; ×10⁶ ~10³¹ — the chi2
    * discipline). Exports are SIGN + NONNEGATIVE e6 quotients
    * (slope_abs_e6, r2_e6) because signed integer division is the one
    * op the engines disagree on (Spark `div` truncates toward zero,
    * DuckDB `//` floors — the round-10 landmine list) — sign and
    * magnitude separately are exact in both. */
  def trendRegression(spark: SparkSession, dir: String): DataFrame =
    trendCore(Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("y")))

  /** [[trendRegression]]'s sums identity over a caller-supplied daily
    * series (`event_type`, `day`, `y`) — split out so specs can plant
    * exact lines. A zero-variance (flat) series yields r² = NULL rather
    * than a division error (ANSI mode). */
  private[queries] def trendCore(dailyIn: DataFrame): DataFrame = {
    val d38 = "decimal(38,0)"
    val daily = dailyIn
      .withColumn("x", datediff(col("day"), lit("1970-01-01")).cast("long"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .where(col("n") >= 2)
      .withColumn("num", expr(s"CAST(n AS $d38) * sxy - CAST(sx AS $d38) * sy"))
      .withColumn("den", expr(s"CAST(n AS $d38) * sxx - CAST(sx AS $d38) * sx"))
      .withColumn("syyd", expr(s"CAST(n AS $d38) * syy - CAST(sy AS $d38) * sy"))
      .select(col("event_type"), col("n").as("n_days"),
        expr("CAST(signum(num) AS BIGINT)").as("slope_sign"),
        expr("CAST((1000000 * abs(num)) div den AS BIGINT)").as("slope_abs_e6"),
        expr("CASE WHEN syyd = 0 THEN NULL ELSE " +
          "CAST((1000000 * num * num) div (den * syyd) AS BIGINT) END").as("r2_e6"))
      .orderBy(col("event_type"))
  }

  /** Inter-arrival gap quantiles: per event type, the exact median and
    * p90 of the within-(user, type) consecutive-arrival gaps — the
    * arrival-process profile behind rate limiting, bot screening, and
    * capacity planning. Gaps come from one `lag` window partitioned by
    * (user_id, event_type) — keys that GROW with the data (the PlanSpec
    * guard's requirement), ordered by (ts, event_id) so same-timestamp
    * ties are deterministic — and the quantiles are Spark `percentile`
    * (exact (n−1)·q interpolation, digit-equal to DuckDB quantile_cont
    * — the group_quantiles precedent) over integer micros, rounded to
    * BIGINT for the export. */
  def interarrivalQuantiles(spark: SparkSession, dir: String): DataFrame =
    interarrivalCore(Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_id")))

  /** [[interarrivalQuantiles]] over a caller-supplied (`event_type`,
    * `user_id`, `us`, `event_id`) frame — split out so specs can plant
    * exact gap sequences. */
  private[queries] def interarrivalCore(evIn: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us").asc, col("event_id").asc)
    evIn
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .where(col("gap").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        expr("CAST(round(percentile(gap, 0.5)) AS BIGINT)").as("med_gap_us"),
        expr("CAST(round(percentile(gap, 0.9)) AS BIGINT)").as("p90_gap_us"))
      .orderBy(col("event_type"))
  }

  /** Robust outlier screen by MEDIAN ABSOLUTE DEVIATION — the
    * anomaly_zscore sibling that a heavy tail cannot poison (mean and
    * stddev both move with the outliers they are supposed to flag; the
    * median and MAD do not). Exact integers throughout via doubling:
    * m2 = 2·median(v) and m4 = 2·median(|2v − m2|) are integers even
    * when the (n−1)·q interpolation lands on .5, so the k=5 rule
    * |v − med| > 5·MAD becomes the pure-integer 2·|2v − m2| > 5·m4 and
    * the exports are the exact e4 rescalings (med_e4 = 50·m2,
    * mad_e4 = 25·m4). Two aggregation passes + two broadcast joins of
    * few-row per-type frames; the exact percentile is the
    * oracle-checkable twin of the KLL sketch path (X-family), which is
    * what runs at 100 TB. */
  def robustMad(spark: SparkSession, dir: String): DataFrame =
    madCore(Tables.events(spark, dir)
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("v")))

  /** [[robustMad]] over a caller-supplied (`event_type`, `v`) frame. */
  private[queries] def madCore(x: DataFrame): DataFrame = {
    val m = x.groupBy(col("event_type"))
      .agg(expr("CAST(round(2 * percentile(v, 0.5)) AS BIGINT)").as("m2"))
    val d = x.join(broadcast(m), "event_type")
      .withColumn("dev2", abs(lit(2L) * col("v") - col("m2")))
    val md = d.groupBy(col("event_type"))
      .agg(expr("CAST(round(2 * percentile(dev2, 0.5)) AS BIGINT)").as("m4"))
    d.join(broadcast(md), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        (max(col("m2")) * 50L).as("med_e4"),
        (max(col("m4")) * 25L).as("mad_e4"),
        sum(when(lit(2L) * col("dev2") > lit(5L) * col("m4"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** New-vs-returning daily actives + cumulative reach — the growth
    * dashboard's first row: per day, distinct actives, the split into
    * first-ever-seen vs returning users, and the running total of users
    * ever seen. All aggregate-only: per-user first day is one groupBy
    * min; the day rollups join actives to news on the day; the
    * cumulative reach folds over the CALENDAR-BOUNDED daily news frame
    * (self-join on day ≤ day — days², the autocorr pattern, never an
    * unpartitioned window over an unbounded child). */
  def newVsReturning(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val firstDay = ev.groupBy(col("user_id")).agg(min(col("day")).as("fday"))
    val daily = ev.distinct()
      .join(firstDay, "user_id")
      .groupBy(col("day"))
      // the input is already distinct (user, day) pairs, so a plain
      // count IS the distinct-actives count — no countDistinct expand
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("fday") === col("day"), 1L).otherwise(0L)).as("n_new"))
    val news = daily.select(col("day").as("nday"), col("n_new").as("nn"))
    daily.join(news, col("nday") <= col("day"))
      .groupBy(col("day"))
      .agg(max(col("n_active")).as("n_active"), max(col("n_new")).as("n_new"),
        sum(col("nn")).as("cum_users"))
      .select(col("day"), col("n_active"), col("n_new"),
        (col("n_active") - col("n_new")).as("n_returning"), col("cum_users"))
      .orderBy(col("day"))
  }

  /** Top event paths: each user's first 3 events (by ts, event_id)
    * concatenated into a path string, counted across users — the
    * Sankey/onboarding-flow feed. The per-user prefix is rank-bounded
    * BEFORE any aggregation (row_number ≤ 3 over the user_id-partitioned
    * window — keys grow with data, and the rank filter is exactly the
    * WindowGroupLimit pushdown shape), so the path assembly aggregates
    * at most 3 rows per user regardless of user history length — no
    * unbounded collect. */
  def eventPathsTop(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .groupBy(col("user_id"))
      .agg(concat_ws(">", array_sort(collect_list(struct(col("rn"), col("event_type"))))
        .getField("event_type")).as("path"),
        count(lit(1)).as("plen"))
      .where(col("plen") === 3)
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path").asc)
      .limit(15)
  }

  /** Market-basket lift over (user, day) sessions — the association-
    * rules screen (which behaviors co-occur beyond chance): for each
    * event-type pair, lift = P(both)/(P(a)·P(b)) as the exact integer
    * e6 quotient (cb·n·10⁶) div (ca·cb-counts), DECIMAL(38,0) product
    * (cb·n·10⁶ passes 64 bits at warehouse scale). Plan: ONE distinct
    * pass builds the session–type incidence, the pair counts come from
    * a session-keyed self-join (bounded per session by the type
    * alphabet, never all-pairs over rows), marginals and the session
    * total ride broadcast few-row frames. The fixture reads ~0.86–0.93
    * across all pairs — the synthetic independence it should find. */
  def basketLift(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    // the incidence frame feeds three consumers (total, marginals, the
    // self-join's both sides) — cache it so the distinct runs once
    val s = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
      .distinct().cache()
    val n = s.select(col("user_id"), col("day")).distinct()
      .agg(count(lit(1)).as("ns"))
    val t = s.groupBy(col("event_type")).agg(count(lit(1)).as("c"))
    val pairs = s.select(col("user_id"), col("day"), col("event_type").as("ta"))
      .join(s.select(col("user_id"), col("day"), col("event_type").as("tb")),
        Seq("user_id", "day"))
      .where(col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("cb"))
    pairs
      .join(broadcast(t.select(col("event_type").as("ta"), col("c").as("ca"))), "ta")
      .join(broadcast(t.select(col("event_type").as("tb"), col("c").as("cbm"))), "tb")
      .crossJoin(broadcast(n))
      .select(col("ta"), col("tb"), col("cb"), col("ns"),
        expr(s"CAST((CAST(cb AS $d38) * ns * 1000000) div " +
          s"(CAST(ca AS $d38) * cbm) AS BIGINT)").as("lift_e6"))
      .orderBy(col("ta"), col("tb"))
  }

  /** Pivot: daily event counts, one column per event type. */
  def pivotEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("day"))

  /** Pivot round-trip: melt the pivoted day×type matrix back to long form
    * with `Dataset.unpivot` (zero-count cells dropped to mirror the
    * original). unpivot is a map-only generator — rows multiply by the
    * value-column count with no shuffle, so the plan is the pivot's one
    * aggregation plus a free reshape. */
  def unpivotEvents(spark: SparkSession, dir: String): DataFrame =
    pivotEvents(spark, dir)
      .unpivot(Array(col("day")), "event_type", "n")
      .filter(col("n") > 0)
      .orderBy(col("day"), col("event_type"))

  /** Journey analysis: each user's first 8 event types in time order as
    * one path string, counted per distinct path. A rank-≤-8 window
    * (WindowGroupLimit — map-side pre-trim) bounds the per-user state to
    * 8 rows BEFORE any collect, so a skewed key can't materialize its
    * whole history in one aggregation buffer; the ≤8-element array is
    * then sorted post-collect because collect_list order is
    * partition-dependent. */
  def userPaths(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 8)
      .groupBy(col("user_id"))
      .agg(collect_list(struct(
        unix_micros(col("ts")).as("us"), col("event_id"), col("event_type"))).as("evs"))
      .select(array_join(
        transform(array_sort(col("evs")), e => e("event_type")), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
  }

  /** Trailing-window z-score anomaly flags: each event's value against
    * the mean/stddev of the SAME user's previous 20 events. The window
    * sums are exact decimals; mean/variance/threshold run in one
    * closed-form double expression — the spend_corr determinism recipe
    * applied per-row, so the flag is reproducible at any parallelism
    * (built-in stddev over doubles is not). One (user)×(ts,id) sort. */
  def anomalyZscore(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-20, -1)
    def d(c: Column) = c.cast("double")
    val scored = Tables.events(spark, dir)
      .filter(col("user_id") < 50)
      .withColumn("xd", col("value").cast("decimal(18,6)"))
      .withColumn("n", count(col("xd")).over(w))
      .withColumn("sx", sum(col("xd")).over(w))
      .withColumn("sxx", sum((col("xd") * col("xd")).cast("decimal(38,12)")).over(w))
    val nD = d(col("n"))
    // division guarded by the warmup branch: ANSI mode leaves double
    // division to IEEE (0/0 → NaN, not an error), and NaN ordering /
    // propagation differs across engines — the lazy CASE keeps the n<=1
    // rows on a deterministic sentinel instead
    val varS = when(col("n") >= 5,
      (nD * d(col("sxx")) - d(col("sx")) * d(col("sx"))) / (nD * (nD - 1.0)))
      .otherwise(lit(-1.0))
    val anomaly = varS > 0.0 &&
      abs(d(col("xd")) - d(col("sx")) / nD) > sqrt(varS) * 2.0
    scored
      .withColumn("is_anomaly", when(anomaly, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("is_anomaly")).as("n_anomalies"))
      .orderBy(col("user_id"))
  }

  /** RANGE window frame: per event, how many events the same user produced
    * in the preceding 5 minutes (frame bounds in integer microseconds —
    * exact cross-engine). */
  def rangeWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-300000000L, -1L)
    Tables.events(spark, dir)
      .filter(col("user_id") < 30)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("n_prev_5min", count(lit(1)).over(w))
      .select(col("event_id"), col("user_id"), col("n_prev_5min"))
      .orderBy(col("event_id"))
  }

  /** Cohort retention matrix: users grouped by first-activity day, then
    * distinct active users per (cohort day, days-since-cohort) cell — the
    * standard product-analytics retention triangle. Two shuffles at any
    * scale: the per-user cohort aggregation (user-keyed) and the final
    * cell aggregation; the cohort side joins back broadcast-or-shuffled
    * by AQE on user_id. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cohorts = ev.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    ev.select(col("user_id"), to_date(col("ts")).as("day"))
      .join(cohorts, "user_id")
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Signup→purchase conversion funnel by signup day: how many of each
    * day's first-time signups made a purchase within 24 hours of that
    * first signup.
    *
    * Shape: the [[funnelSteps]] running-window recipe — `srun` (running
    * min signup so far in the user's time-ordered stream) qualifies each
    * purchase row in-plan, so per-row state is one long and a user with
    * 10⁸ purchase events costs nothing extra (the previous form kept a
    * per-user `collect_list` of every purchase timestamp — exactly the
    * unbounded heavy-hitter state `sequence_funnel` abandoned in round
    * 9; PlanSpec's collect_list guard now covers this query too). The
    * window, the per-user aggregate, and nothing else share ONE
    * user-keyed shuffle; the day rollup is tiny. Tie-break: purchases
    * count from the signup INSTANT (`>=`), so on an equal timestamp the
    * signup must sort first — `kind` 0/1 orders it before the purchase
    * and the running min already covers it. A purchase at p sees
    * `srun` = min signup with ts ≤ p = the user's first signup whenever
    * that signup is ≤ p, which is the only case the interval
    * [signup, signup+24h] admits — same argument as [[funnelSteps]]. */
  def funnelConversion(spark: SparkSession, dir: String): DataFrame =
    funnelConversionCore(Tables.events(spark, dir))

  /** The bounded-state core of [[funnelConversion]] over any events frame
    * with (`user_id`, `event_type`, `event_id`, `ts`) — separated so the
    * heavy-hitter spec can drive it on synthetic streams. */
  def funnelConversionCore(events: DataFrame): DataFrame = {
    val dayUs = 86400000000L
    val wRun = Window.partitionBy(col("user_id"))
      .orderBy(col("tsu").asc, col("kind").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .filter(col("event_type").isin("signup", "purchase"))
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("tsu"),
        when(col("event_type") === "signup", 0).otherwise(1).as("kind"))
      .withColumn("srun",
        min(when(col("event_type") === "signup", col("tsu"))).over(wRun))
      .withColumn("pcand", when(col("event_type") === "purchase" &&
        col("tsu") >= col("srun") && col("tsu") <= col("srun") + lit(dayUs), lit(1)))
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "signup", col("tsu"))).as("signup_us"),
        max(coalesce(col("pcand"), lit(0))).as("converted"))
      .filter(col("signup_us").isNotNull)
      .groupBy(to_date(timestamp_micros(col("signup_us"))).as("signup_day"))
      .agg(count(lit(1)).as("n_signups"),
        sum(col("converted")).cast("long").as("n_converted_24h"))
      .orderBy(col("signup_day"))
  }

  /** Sliding event-time windows (2-hour window, 1-hour slide) — the
    * overlapping-window streaming semantic exercised through the unified
    * batch path, via the SAME Streams.windowedCounts helper that backs
    * stream_windowed (so the streaming twin exists for free): Spark's
    * `window()` assigns each event to BOTH containing windows; the
    * oracle reproduces the assignment by exploding each event to its two
    * window starts. */
  def slidingWindow(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.Streams
      .windowedCounts(Tables.events(spark, dir), "2 hours", slide = Some("1 hour"))
      .orderBy(col("window_start"), col("event_type"))

  /** SCD type-2 dimension history from an event stream: per user, each
    * run of consecutive equal `event_type` collapses to one versioned row
    * with [valid_from, valid_to) micros and an is_current flag — the
    * lag-to-find-change-points / lead-to-close-intervals composition.
    * Scale shape: two windows over the SAME (user_id)×(ts, event_id)
    * partitioning-ordering, so Catalyst plans one sort + one shuffle; no
    * self-join against the history. */
  def scd2Build(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val changes = Tables.events(spark, dir)
      .filter(col("user_id") < 50)
      .withColumn("prev_attr", lag(col("event_type"), 1).over(w))
      .filter(col("prev_attr").isNull || col("prev_attr") =!= col("event_type"))
    changes
      .withColumn("valid_to_us", lead(unix_micros(col("ts")), 1).over(w))
      .select(col("user_id"), col("event_type").as("attr"),
        unix_micros(col("ts")).as("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.cast("int").as("is_current"))
      // (attr, valid_to) complete the total order: same-microsecond
      // flip-flops (a-b-a) make bare (user, valid_from) tie, and the
      // driver's compare needs a total order. NULLS LAST matches DuckDB's
      // ASC default.
      .orderBy(col("user_id"), col("valid_from_us"), col("attr"),
        col("valid_to_us").asc_nulls_last)
  }

  /** TEMPORAL (point-in-time) join against the SCD2 dimension — the
    * warehouse "dimension lookup at event time": each purchase joins
    * the [[scd2Build]] history version whose [valid_from, valid_to)
    * interval contains the purchase timestamp, answering "what state
    * was the user in when they bought". Scale shape: equi-join on
    * user_id with the interval test as a cheap residual — SCD2 versions
    * per key are few by construction (runs of change points), so this
    * never degrades toward a range join's pair blow-up; versions
    * partition time per user (zero-width same-microsecond flip-flop
    * intervals match nothing), so each fact matches EXACTLY one
    * version, which the oracle's replay pins. Revenue e2-fixed. */
  def scd2TemporalJoin(spark: SparkSession, dir: String): DataFrame = {
    // the dimension tracks the user's ACTIVITY state (non-purchase
    // events); built from the fact stream itself the join would be
    // vacuous — every purchase would start (and land in) its own
    // 'purchase' run
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val dim = Tables.events(spark, dir)
      .filter(col("user_id") < 50 && col("event_type") =!= "purchase")
      .withColumn("prev_attr", lag(col("event_type"), 1).over(w))
      .filter(col("prev_attr").isNull || col("prev_attr") =!= col("event_type"))
      .withColumn("valid_to_us", lead(unix_micros(col("ts")), 1).over(w))
      .select(col("user_id"), col("event_type").as("attr"),
        unix_micros(col("ts")).as("valid_from_us"), col("valid_to_us"))
    val facts = Tables.events(spark, dir)
      .filter(col("user_id") < 50 && col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("ets"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"))
    facts.join(dim,
        facts("user_id") === dim("user_id") &&
          col("ets") >= col("valid_from_us") &&
          (col("valid_to_us").isNull || col("ets") < col("valid_to_us")))
      .groupBy(col("attr"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("v")).as("rev_e2"))
      .orderBy(col("attr"))
  }

  /** Distinct users per event type through the KMV sketch at a lossless
    * parameterization (k=4096 ≥ the fixture's 150 users ⇒ exact, hence
    * the COUNT(DISTINCT) oracle). At 100 TB the same plan runs with
    * k ≪ n: constant 8k bytes per group instead of a distinct-shuffle of
    * every (type, user) pair — KmvSketchSpec pins that regime's error. */
  def kmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    val kmv = udaf(new graft.core.KmvDistinct(4096),
      org.apache.spark.sql.Encoders.scalaLong)
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(kmv(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))
  }

  /** Trailing-7-day distinct users per day by KMV SKETCH ALGEBRA over
    * time — the dashboard query ("rolling weekly actives") that naive
    * SQL answers with a 7× self-join or a 7-day re-scan per day:
    * instead, ONE corpus pass builds a per-day sketch
    * ([[graft.core.KmvSketchBuffer]], the `source_overlap` machinery
    * pointed at the time axis), and each window's distinct count is a
    * driver-side merge of ≤ 7 day-sketches — bounded by the calendar
    * (30 summaries × k longs), never by event volume. Incremental by
    * construction: a new day appends one sketch, the previous 29 never
    * recompute. Lossless here (k = 4096 ≥ 150 users ⇒ the COUNT
    * (DISTINCT) oracle matches exactly); k ≪ n at scale inherits KMV's
    * envelope. */
  def slidingDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 4096
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(udaf(new graft.core.KmvSketchBuffer(k),
        org.apache.spark.sql.Encoders.scalaLong)(col("user_id")).as("sk"))
      .as[(java.sql.Date, Seq[Long])].collect().sortBy(_._1.getTime)
    val est = new graft.core.KmvDistinct(k)
    val out = daily.indices.map { i =>
      val (day, _) = daily(i)
      val lo = day.getTime - 6L * 86400000L
      val window = daily.filter { case (d, _) =>
        d.getTime >= lo && d.getTime <= day.getTime }
      val merged = window.map(_._2).reduce(est.merge)
      (day, window.length, est.finish(merged))
    }
    out.toDF("day", "n_days", "n_users_7d").orderBy(col("day"))
  }

  /** EXACT two-sample Kolmogorov–Smirnov drift statistic between the
    * click and purchase value distributions — the distribution-shift
    * alarm a training pipeline runs between corpus snapshots, here in
    * its exact integer form: with counts on the e2 (cent) grid, the KS
    * numerator max_c |F₁(c)·N₂ − F₂(c)·N₁| is pure long arithmetic and
    * the statistic exports as `ks_num / (N₁·N₂)` e6-fixed — no float
    * CDF anywhere, so the oracle replays it digit-for-digit (the KL
    * sibling `source_kl` measures density drift; KS measures the CDF
    * sup-gap and needs no binning choice).
    *
    * Shape: one partial-aggregated groupBy on the cent grid (≤ 49k
    * rows — the VALUE DOMAIN, not the event count), then the running
    * CDFs via the chunked-cumulative decomposition (windows partition
    * by `c div 2500` — ~20 chunks growing with the domain; carry-ins
    * come from the chunk-summary frame, collected driver-side bounded
    * by the same domain parameterization). The final max+argmax is one
    * struct-max aggregate. */
  def ksDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(expr("CAST(round(value * 100) AS BIGINT)").as("c"),
        when(col("event_type") === "click", 1L).otherwise(0L).as("ia"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("ib"))
      .groupBy(col("c"))
      .agg(sum(col("ia")).as("na"), sum(col("ib")).as("nb"))
      .withColumn("chunk", expr("c div 2500"))
    // chunk totals: ≤ 20 rows (value domain / 2500) — driver-bounded
    val totals = g.groupBy(col("chunk"))
      .agg(sum(col("na")).as("cna"), sum(col("nb")).as("cnb"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val n1 = totals.map(_._2).sum
    val n2 = totals.map(_._3).sum
    // an empty class makes the sup-gap undefined (and the e6 export
    // would divide by zero) — fail with the class named, not a NULL row
    require(n1 > 0, "ks_drift: no 'click' events in the input — CDF undefined")
    require(n2 > 0, "ks_drift: no 'purchase' events in the input — CDF undefined")
    val carryA = totals.scanLeft(0L)(_ + _._2).init
    val carryB = totals.scanLeft(0L)(_ + _._3).init
    val carry = totals.indices
      .map(i => (totals(i)._1, carryA(i), carryB(i)))
      .toDF("chunk", "carry_a", "carry_b")
    val wIn = Window.partitionBy(col("chunk")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.join(broadcast(carry), Seq("chunk"))
      .withColumn("fa", col("carry_a") + sum(col("na")).over(wIn))
      .withColumn("fb", col("carry_b") + sum(col("nb")).over(wIn))
      .withColumn("diff", abs(col("fa") * lit(n2) - col("fb") * lit(n1)))
      .agg(max(struct(col("diff"), (-col("c")).as("negc"))).as("m"))
      .select(lit(n1).as("n_click"), lit(n2).as("n_purchase"),
        col("m.diff").as("ks_num"),
        expr(s"(m.diff * 1000000) div (${n1}L * ${n2}L)").as("ks_e6"),
        (-col("m.negc")).as("at_cent"))
  }

  /** Bitmap-index membership algebra ([[graft.core.BitsetAgg]] — the
    * warehouse bitmap-index / Roaring dense-container primitive): ONE
    * pass folds "users with a high-value event of this type" into a
    * per-type bit array (OR-monoid, partial-aggregated map-side like
    * any sketch), then every pairwise AND/OR cardinality — the
    * "segment overlap" audience questions — is a word-wise popcount
    * over five 8 KB summaries, never a fact-table re-join. EXACT,
    * unlike the KMV family, because the user domain is enumerable; at
    * a larger id domain the same algebra runs on Roaring containers.
    * Oracle: pairwise COUNT DISTINCT joins over the same membership. */
  def bitmapOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nBits = 1 << 16 // covers user_id < 65536 at every fixture SF
    val bitmaps = Tables.events(spark, dir)
      .filter(col("value") > 200)
      .groupBy(col("event_type"))
      .agg(udaf(new graft.core.BitsetAgg(nBits),
        org.apache.spark.sql.Encoders.scalaLong)(col("user_id")).as("bm"))
      .as[(String, Array[Long])].collect().sortBy(_._1)
    val out = for {
      i <- bitmaps.indices
      j <- (i + 1) until bitmaps.length
    } yield {
      val (ta, ba) = bitmaps(i)
      val (tb, bb) = bitmaps(j)
      (ta, tb, graft.core.Bitset.popcount(ba), graft.core.Bitset.popcount(bb),
        graft.core.Bitset.andCount(ba, bb), graft.core.Bitset.orCount(ba, bb))
    }
    out.toDF("type_a", "type_b", "n_a", "n_b", "n_and", "n_or")
      .orderBy(col("type_a"), col("type_b"))
  }

  /** The SAME membership algebra through the large-domain container
    * ([[graft.core.RoaringAgg]] — array/bitmap dual containers per 2¹⁶
    * block, the Roaring design the [[bitmapOps]] doc names for ids past
    * enumerable domains): per-group memory sizes with the member SET,
    * not the id domain, so the identical query runs against a 10⁹-id
    * space where [[graft.core.BitsetAgg]] would allocate 125 MB per
    * group. Same oracle as bitmap_ops — the two containers must agree
    * bit for bit (BitsetSpec additionally pins equality and the memory
    * bound on a synthetic sparse domain). */
  def bitmapOpsSparse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bitmaps = Tables.events(spark, dir)
      .filter(col("value") > 200)
      .groupBy(col("event_type"))
      .agg(udaf(new graft.core.RoaringAgg,
        org.apache.spark.sql.Encoders.scalaLong)(col("user_id")).as("bm"))
      .as[(String, Array[Byte])].collect().sortBy(_._1)
    val out = for {
      i <- bitmaps.indices
      j <- (i + 1) until bitmaps.length
    } yield {
      val (ta, ba) = bitmaps(i)
      val (tb, bb) = bitmaps(j)
      (ta, tb, graft.core.Roaring.popcount(ba), graft.core.Roaring.popcount(bb),
        graft.core.Roaring.andCount(ba, bb), graft.core.Roaring.orCount(ba, bb))
    }
    out.toDF("type_a", "type_b", "n_a", "n_b", "n_and", "n_or")
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Count-Min point-query frequencies: fold ALL events into ONE
    * depth-4 × width-2048 counter matrix (the shuffle carries one
    * matrix per partition — 64 KB — regardless of event count), then
    * answer per-user point queries against the broadcast summary. The
    * driver-side material is the sketch itself (8192 longs) plus the
    * width-sized estimate vector derived from it — both fixed by the
    * depth×width parameterization, never by data volume. Width ≥ the user-id domain at every
    * fixture SF makes row 0 collision-free, so the min-over-rows
    * estimate is EXACT and the row hash-matches plain GROUP BY counts —
    * the same lossless-parameterization oracle regime as
    * kmv_distinct/heavy_hitters/quantile_sketch; CmsSpec pins the
    * ≥-true upper-bound property and the 2n/w error envelope at small
    * widths where the sketch actually approximates. */
  def cmsCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val depth = 4
    val width = 2048
    val agg = new graft.core.CountMinAgg(depth, width)
    val sketch = Tables.events(spark, dir)
      .select(col("user_id")).as[Long]
      .select(agg.toColumn).head()
    val ids = Tables.events(spark, dir).select(col("user_id")).distinct()
    // the exact-oracle regime needs row 0 collision-free: ids in
    // [0, width). A fixture whose id domain outgrows the width must fail
    // HERE with a clear message, not surface as a silent oracle
    // hash-mismatch downstream
    val dom = ids.agg(min(col("user_id")).as("lo"), max(col("user_id")).as("hi")).head()
    require(dom.isNullAt(0) || (dom.getLong(0) >= 0 && dom.getLong(1) < width),
      s"cms_counts exact regime needs user_id in [0, $width); fixture has " +
        s"[${dom.getLong(0)}, ${dom.getLong(1)}] — widen the sketch or drop the oracle")
    // probe via a literal estimate vector, not a per-row Scala UDF: the
    // exact regime pins user_id ∈ [0, width), so the width-sized vector
    // est[u] = min-over-rows(u) is bounded by the PARAMETERIZATION (2048
    // longs), never by the data — element_at on an array literal stays
    // inside whole-stage codegen
    val est = Array.tabulate(width)(u =>
      graft.core.CountMin.estimate(sketch, depth, width, u.toLong))
    ids.withColumn("n_events",
        element_at(typedlit(est), col("user_id").cast("int") + 1))
      .orderBy(col("user_id"))
  }

  /** Native session_window aggregation (one row per session with its
    * [start, last_event + gap) bounds) through the SAME
    * Streams.sessionWindowCounts helper a streaming job would use — the
    * third sessionization form next to the batch gap-window rollup
    * (sessionize) and the mapGroupsWithState twin (StreamsSpec). */
  def sessionWindowAgg(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.Streams
      .sessionWindowCounts(Tables.events(spark, dir).filter(col("user_id") < 30))
      .orderBy(col("user_id"), col("session_start_us"))

  /** Recency-decayed user activity score (exponential smoothing): EWMA
    * of each user's LAST 16 event values at α = 1/2. Half-life weights
    * are exact powers of two, so every per-row product is an exact
    * decimal scaling and the aggregation is an exact decimal sum —
    * order-free at any parallelism — leaving ONE closed-form double
    * division at the end (the spend_corr determinism recipe). Users
    * with n < 16 events smooth over their n available weights. The
    * rn ≤ 16 trim compiles to WindowGroupLimit (map-side per-user
    * top-k before the single shuffle, no global sort) — the same scale
    * shape as stratified_sample; this is the streaming-free way to keep
    * a per-entity freshness/decay feature over an unbounded log. */
  def expSmooth(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 16)
      .withColumn("wgt", expr("shiftleft(CAST(1 AS BIGINT), 16 - rn)").cast("decimal(6,0)"))
      .withColumn("contrib", (col("value").cast("decimal(18,6)") * col("wgt")).cast("decimal(38,6)"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("contrib")).as("s_scaled"),
        sum(col("wgt")).as("w_sum"))
      .select(col("user_id"), col("n_events"),
        round(col("s_scaled").cast("double") / col("w_sum").cast("double") * 1e6)
          .cast("long").as("ewma_e6"))
      .orderBy(col("user_id"))
  }

  /** Per-user linear trend + one-step forecast by exact least squares
    * over the last 16 events: with x = recency rank re-indexed so the
    * newest event is x = n, slope and intercept come from the four
    * classic sums (Σx, Σy, Σxy, Σx²) — all accumulated as EXACT decimals
    * (x is a small integer, y scaled to fixed point), so the aggregation
    * is order-free at any parallelism, and the slope/intercept/forecast
    * divisions are one closed-form double expression per row. Flat or
    * single-event histories short-circuit to the mean (the denominator
    * n·Σx² − (Σx)² is 0 at n = 1). The rn ≤ 16 trim is WindowGroupLimit
    * map-side, same as exp_smooth — per-entity trend features over an
    * unbounded log without a streaming job. */
  def trendForecast(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    def d(c: Column) = c.cast("double")
    val base = Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 16)
      .withColumn("x", (lit(17) - col("rn")).cast("long")) // newest = largest x
      .withColumn("y", col("value").cast("decimal(18,6)"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).cast("decimal(18,0)").as("sx"),
        sum(col("y")).as("sy"),
        sum(col("y") * col("x").cast("decimal(4,0)")).cast("decimal(38,6)").as("sxy"),
        sum(col("x") * col("x")).cast("decimal(18,0)").as("sxx"))
    val nD = d(col("n"))
    val den = nD * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val slope = when(col("n") <= 1, lit(0.0))
      .otherwise((nD * d(col("sxy")) - d(col("sx")) * d(col("sy"))) / den)
    val intercept = (d(col("sy")) - slope * d(col("sx"))) / nD
    // forecast at x = 17 (one step past the newest observation)
    base.select(col("user_id"), col("n").as("n_events"),
        round(slope * 10000).cast("long").as("slope_e4"),
        round((intercept + slope * 17) * 10000).cast("long").as("forecast_e4"))
      .orderBy(col("user_id"))
  }

  /** First-order Markov transition matrix over each user's event
    * sequence: counts of consecutive (from_type → to_type) steps under
    * the per-user (ts, id) order, plus the per-from transition
    * probability as an integer-ratio e4 (count/row-total — both engines
    * compute identical doubles from identical longs). One
    * user-partitioned lead window (keys scale with users) + a tiny
    * 25-row aggregate joined back broadcast — no enum-keyed window. The
    * product-analytics companion to user_paths/funnel: "after a click,
    * what happens next?". */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val steps = Tables.events(spark, dir)
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = steps.groupBy(col("from_type"))
      .agg(sum(col("n")).cast("long").as("n_from"))
    steps.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("n_from") * 10000).cast("long").as("p_e4"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Last-touch marketing attribution: each purchase credits the user's
    * most recent click strictly before it and within a 7-day lookback —
    * the ad-spend accounting query every growth team runs, and the
    * dependent-join shape ([[graft.queries.JoinQueries.asofJoin]]'s
    * sibling) done without a join: ONE user-keyed shuffle unions tagged
    * clicks and purchases, a running `max` window carries the last
    * click's micros (purchases sort BEFORE clicks at equal timestamps,
    * so "strictly before" is structural, like [[nearestEventJoin]]'s
    * tie rule), and the lookback test plus the day rollup are map-side.
    * Revenue exports e2-fixed (value has 2 decimals — integer sums,
    * order-free). At 100 TB: no per-pair join, no per-user arrays,
    * state per row is one long. */
  def touchAttribution(spark: SparkSession, dir: String): DataFrame = {
    val day7 = 7L * 86400000000L
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("tsu"),
        col("value"), lit(0).as("tag"), lit(null).cast("long").as("ctsu"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("tsu"),
        lit(null).cast("double").as("value"), lit(1).as("tag"),
        unix_micros(col("ts")).as("ctsu"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tsu").asc, col("tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(clicks)
      .withColumn("last_click", max(col("ctsu")).over(w))
      .filter(col("tag") === 0)
      .withColumn("attr",
        col("last_click").isNotNull && col("last_click") >= col("tsu") - lit(day7))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(when(col("attr"), 1L).otherwise(0L)).as("n_attributed"),
        sum(when(col("attr"),
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L)).as("attr_rev_e2"))
      .orderBy(col("day"))
  }

  /** Exact lag-k autocorrelation of the daily event-count series (lags
    * 1 and 7 — day-over-day persistence and weekly seasonality, the
    * standard series diagnostics next to [[trendForecast]]'s slope and
    * [[expSmooth]]'s level). INTEGER arithmetic throughout: with
    * x̄ = S/n rational, every term scales by n — the centered value is
    * c_t = n·x_t − S (a long), the lag-k numerator Σ c_t·c_{t+k} and
    * denominator Σ c_t² are order-free long sums, and the e6 ratio
    * exports through a sign-safe truncating division (Spark `div`
    * truncates toward zero, DuckDB `//` floors — they agree only on
    * non-negative operands, so the sign is factored out first).
    *
    * Shape: the daily rollup is one partial-aggregated groupBy bounded
    * by the CALENDAR, not the event count; the lag pairing is an
    * equi-join of that bounded series against its own k-shifted copy
    * (a window would need a total order over an unbounded-looking
    * frame — PlanSpec's unpartitioned-window guard exists precisely to
    * forbid that shape); n, S, and the denominator ride a broadcast
    * 1-row frame. */
  def autocorr(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("x"))
    val stats = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val c = daily.crossJoin(broadcast(stats))
      .select(col("day"), (col("n") * col("x") - col("s")).as("c"))
    val den = c.agg(sum(col("c") * col("c")).as("den"))
    val rows = Seq(1, 7).map { k =>
      val shifted = c.select(date_sub(col("day"), k).as("day"), col("c").as("ck"))
      c.join(shifted, "day")
        .agg(sum(col("c") * col("ck")).as("num"))
        .select(lit(k.toLong).as("lag"), col("num"))
    }
    rows.reduce(_.unionByName(_))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("num"), col("den"),
        when(col("num") >= 0, expr("(num * 1000000) div den"))
          .otherwise(-expr("((-num) * 1000000) div den")).as("r_e6"))
      .orderBy(col("lag"))
  }

  /** EXACT additive series decomposition — daily revenue split into
    * OLS trend + day-of-week effect + residual, with 2σ residual
    * anomaly flags: the STL-shaped diagnostic that tells "is this day
    * odd, or just a Monday on a growing series?". Everything before
    * the fixed-point exports is INTEGER: with den = n·Σt²−(Σt)², the
    * den-scaled detrended value D_t = y_t·den − num_a − num_b·t is a
    * long; the dow effect is S_d/(den·c_d) with S_d a per-dow sum of
    * D_t; the (den·c_d)-scaled residual N_t = D_t·c_d − S_d is exact.
    * The anomaly contract is defined ON the exported e4 residuals
    * (resid² · n > 4·Σresid² — σ over the published numbers), which
    * sidesteps every mixed-denominator comparison; squares run in
    * DECIMAL(38,0)/HUGEINT (a residual e4 square brushes past 2⁶³ at
    * sf0.1 already). Plan: one calendar-bounded daily rollup, then
    * broadcast 1-row/7-row frames — no shuffle grows with data. */
  def seriesDecompose(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    // sign-factored ×100 integral division as a SQL fragment — `div` on
    // positive longs == DuckDB `//`; doubles would lose exactness past
    // 2^53, which resid·100 crosses at sf0.1
    def sfdiv100(num: String, den: String): String =
      s"CASE WHEN ($num) >= 0 THEN (($num) * 100) div ($den) " +
        s"ELSE -(((-($num)) * 100) div ($den)) END"
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("y"))
    val withT = daily
      .crossJoin(broadcast(daily.agg(min(col("day")).as("dmin"))))
      .select(col("day"), col("y"),
        datediff(col("day"), col("dmin")).cast("long").as("t"),
        pmod(datediff(col("day"), lit("1970-01-01").cast("date")), lit(7)).as("dow"))
    val ols = withT.agg(count(lit(1)).as("n"),
      sum(col("t")).as("st"), sum(col("y")).as("sy"),
      sum(col("t") * col("y")).as("sty"), sum(col("t") * col("t")).as("stt"))
    val detr = withT.crossJoin(broadcast(ols))
      .withColumn("den", col("n") * col("stt") - col("st") * col("st"))
      .withColumn("numb", col("n") * col("sty") - col("st") * col("sy"))
      .withColumn("numa", col("sy") * col("stt") - col("st") * col("sty"))
      .withColumn("dd", col("y") * col("den") - col("numa") - col("numb") * col("t"))
    val byDow = detr.groupBy(col("dow"))
      .agg(sum(col("dd")).as("sd"), count(lit(1)).as("cd"))
    val rows = detr.join(broadcast(byDow), "dow")
      .withColumn("nt", col("dd") * col("cd") - col("sd"))
      .withColumn("trend_e4", expr(sfdiv100("numa + numb * t", "den")))
      .withColumn("dow_eff_e4", expr(sfdiv100("sd", "den * cd")))
      .withColumn("resid_e4", expr(sfdiv100("nt", "den * cd")))
    val tot = rows.agg(
      sum(expr(s"CAST(resid_e4 AS $d38) * resid_e4")).as("ss"),
      count(lit(1)).as("n2"))
    rows.crossJoin(broadcast(tot))
      .select(col("day"), col("y").as("rev_e2"), col("trend_e4"),
        col("dow_eff_e4"), col("resid_e4"),
        (expr(s"CAST(resid_e4 AS $d38) * resid_e4 * n2") >
          expr(s"CAST(ss AS $d38) * 4")).as("anomaly"))
      .orderBy(col("day"))
  }

  /** Day-of-week seasonality index of event revenue — the multiplicative
    * seasonal profile (index 1.0 = an average day) every forecast/
    * anomaly pipeline factors out before trend fitting. Weekday is the
    * portable `epoch-day mod 7` (Spark's `dayofweek` counts Sunday=1,
    * DuckDB's Sunday=0 — a cross-engine label trap this formula
    * sidesteps entirely). index = (rev_dow · total_days) / (total_rev ·
    * days_dow) as the exact e6 integer quotient; products run in
    * DECIMAL(38,0) (rev·days·10⁶ passes 64 bits at warehouse scale).
    * Plan: one partial-aggregated groupBy over (dow) for the profile,
    * one 1-row broadcast for the totals — calendar-bounded output (≤ 7
    * rows) at any data size. */
  def seasonalityIndex(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val dowed = Tables.events(spark, dir)
      .select(pmod(datediff(to_date(col("ts")), lit("1970-01-01").cast("date")),
          lit(7)).as("dow"),
        to_date(col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v_e2"))
    val byDow = dowed.groupBy(col("dow"))
      .agg(countDistinct(col("day")).as("nd"),
        count(lit(1)).as("n_events"),
        sum(col("v_e2")).as("rev_e2"))
    val tot = byDow.agg(sum(col("nd")).as("td"), sum(col("rev_e2")).as("tr"))
    byDow.crossJoin(broadcast(tot))
      .select(col("dow").cast("long").as("dow"), col("nd"), col("n_events"),
        col("rev_e2"),
        expr(s"CAST((CAST(rev_e2 AS $d38) * td * 1000000) div " +
          s"(CAST(tr AS $d38) * nd) AS BIGINT)").as("idx_e6"))
      .orderBy(col("dow"))
  }

  /** Rolling 7-day Pearson correlation between two daily series (purchase
    * revenue vs click revenue) — the co-movement diagnostic behind
    * metric-pair drift alerts ("did these decouple this week?"), the
    * windowed sibling of the global spend_corr. The daily rollup is one
    * partial-aggregated groupBy bounded by the CALENDAR; the trailing
    * window is an explicit date-range self-join of that bounded frame
    * (the autocorr pattern — a window function would need a total order
    * over an unbounded-looking input, and the range join on a ≤
    * days-sized frame broadcasts). Component sums are exact longs
    * (values e2-fixed at source); only the final closed form runs in
    * double (the spend_corr determinism recipe). Windows shorter than 7
    * days (the leading edge) are dropped, so n is the literal 7 on both
    * engines. */
  def rollingCorr(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        sum(when(col("event_type") === "purchase",
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L)).as("a"),
        sum(when(col("event_type") === "click",
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L)).as("b"))
    val w = daily.select(col("day").as("d2"), col("a").as("x"), col("b").as("y"))
    val comps = daily.select(col("day")).join(broadcast(w),
        col("d2") >= date_sub(col("day"), 6) && col("d2") <= col("day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .filter(col("n") === 7)
    def d(c: Column) = c.cast("double")
    val dxx = d(lit(7)) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val dyy = d(lit(7)) * d(col("syy")) - d(col("sy")) * d(col("sy"))
    comps.select(col("day"),
      when(dxx > 0 && dyy > 0,
        round((d(lit(7)) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
          sqrt(dxx) / sqrt(dyy) * 10000).cast("long"))
        .as("r_e4"))
      .orderBy(col("day"))
  }

  /** HyperLogLog distinct users per event type ([[graft.core.HllAgg]],
    * p=10 ⇒ 1 KB per group), cross-checked IN the declared row against
    * exact COUNT DISTINCT: `est_ok` asserts the estimate lands inside
    * the 3σ envelope (3·1.04/√1024 ≈ 9.75% relative), so the oracle—
    * which replays the exact count and expects est_ok = true — fails if
    * the sketch ever drifts out of contract (the same self-oracle
    * regime as table_stats_sketch, for the estimator that is NEVER
    * exact and therefore can't use the lossless-k trick). At fixture
    * cardinalities the estimator sits in its linear-counting regime;
    * HllSpec pins the envelope at 100k-scale cardinalities where the
    * raw bias-corrected path takes over, plus merge associativity. */
  def hllDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = 10
    val perType = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_exact"),
        udaf(new graft.core.HllAgg(p),
          org.apache.spark.sql.Encoders.scalaLong)(col("user_id")).as("regs"))
      .as[(String, Long, Array[Byte])]
    perType.map { case (t, exact, regs) =>
      val est = graft.core.Hll.estimate(regs)
      (t, exact, math.abs(est - exact) <= 3.0 * 1.04 / math.sqrt(1 << p) * exact)
    }.toDF("event_type", "n_exact", "est_ok")
      .orderBy(col("event_type"))
  }

  /** Mergeable EXACT moment summary per event type — the power sums
    * (n, Σv, Σv², Σv³, Σv⁴) every two-pass statistic (variance, skew,
    * kurtosis, covariance-free drift checks) derives from, kept as
    * integers so re-aggregation across partitions/backfills is
    * bit-exact and order-free (the property streaming/incremental
    * variance recipes like Welford trade away). Per-row powers stay in
    * LONG (v ≤ 49000 e2-cents ⇒ v⁴ ≤ 5.8·10¹⁸ < 2⁶³); the Σv³/Σv⁴
    * accumulators and the variance numerator n·Σv² − (Σv)² exceed 64
    * bits at scale, so they accumulate in DECIMAL(38,0) and export as
    * STRINGS (the one cross-engine-stable carrier for >64-bit exact
    * integers — DuckDB sums to HUGEINT). One partial-aggregated pass. */
  def valueMoments(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    Tables.events(spark, dir)
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .withColumn("v2", col("v") * col("v"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("v")).as("s1"),
        sum(col("v2")).as("s2"),
        sum((col("v2") * col("v")).cast(d38)).as("s3d"),
        sum((col("v2") * col("v2")).cast(d38)).as("s4d"))
      .select(col("event_type"), col("n"), col("s1"), col("s2"),
        col("s3d").cast(d38).cast("string").as("s3"),
        col("s4d").cast(d38).cast("string").as("s4"),
        (col("n").cast(d38) * col("s2").cast(d38) -
          col("s1").cast(d38) * col("s1").cast(d38))
          .cast(d38).cast("string").as("var_num"))
      .orderBy(col("event_type"))
  }

  /** Benford first-digit audit over order totals — the classic
    * fabricated-numbers screen (Benford 1938; Nigrini's audit use,
    * public): naturally-occurring multi-scale amounts put digit d first
    * with probability log10(1+1/d); uniform-ish synthetic values (the
    * fixture's) do NOT, and the per-digit deviation surfaces exactly
    * that. The expected shares ride as e6 integer LITERALS (601 = the
    * rounded log10 table) — computing log10 at query time would hang
    * cross-engine hashing on last-bit libm agreement. Output per digit:
    * observed count, expected count e6 (n·share), and the absolute
    * deviation e6 — all integer arithmetic. One aggregate pass; the
    * digit extraction is a string head over a positive integer cast. */
  def benfordAudit(spark: SparkSession, dir: String): DataFrame = {
    // round(log10(1+1/d) * 1e6) for d = 1..9 — fixed public constants
    val shareE6 = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
      66947L, 57992L, 51153L, 45757L)
    // explicit floor: a bare double→int cast TRUNCATES in Spark but
    // ROUNDS in DuckDB — floor is the one both engines agree on
    val digits = Tables.orders(spark, dir)
      .select(substring(floor(col("o_totalprice")).cast("bigint").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .filter(col("digit") >= 1) // totals are positive; guard anyway
    val counts = digits.groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val n = digits.count()
    val expected = shareE6.zipWithIndex
      .map { case (s, i) => ((i + 1).toLong, s) }
    import spark.implicits._
    counts.join(broadcast(expected.toDF("digit", "share_e6")), Seq("digit"), "right")
      .select(col("digit").cast("long").as("digit"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        (lit(n) * col("share_e6")).as("expected_e6"),
        abs(coalesce(col("n_obs"), lit(0L)) * lit(1000000L) -
          lit(n) * col("share_e6")).as("abs_dev_e6"))
      .orderBy(col("digit"))
  }

  /** Window NAVIGATION family (lag/lead, first/nth/last value, and the
    * distribution ranks) in one partitioned pass — the remaining window
    * functions the `window_funcs`/`window_ranks`/`range_window` trio
    * doesn't cover. The full-extent functions (nth/last) use an explicit
    * unbounded-both-ways frame (their DEFAULT running frame would make
    * last_value ≡ current row — the classic window gotcha, pinned here
    * cross-engine); percent_rank/cume_dist export as e6 INTEGERS derived
    * from row_number and the partition count — under this query's total
    * order they equal the built-ins, and integer division is the only
    * formulation two engines hash-agree on. One user-keyed
    * sort+shuffle serves every column (same spec ⇒ one Window node). */
  def windowNavigation(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tsu").asc, col("event_id").asc)
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(spark, dir)
      .filter(col("user_id") < 30)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsu"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .withColumn("prev_v", lag(col("v"), 1).over(w))
      .withColumn("next_v", lead(col("v"), 1).over(w))
      .withColumn("first_v", first(col("v")).over(w))
      .withColumn("second_v", nth_value(col("v"), 2).over(wAll))
      .withColumn("last_v", last(col("v")).over(wAll))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .select(col("user_id"), col("event_id"), col("v"),
        col("prev_v"), col("next_v"), col("first_v"), col("second_v"), col("last_v"),
        when(col("n") > 1, expr("((rn - 1) * 1000000) div (n - 1)"))
          .otherwise(lit(0L)).as("pct_rank_e6"),
        expr("(rn * 1000000) div n").as("cume_dist_e6"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** INTERVAL UNION length per user — total covered time when each
    * event opens a 30-minute activity window and overlaps must not
    * double-count (billing/uptime/SLA coverage; the measure-theoretic
    * sibling of [[maxConcurrency]]'s counting sweep). Gaps-and-islands
    * with a RUNNING MAX END: an interval starts a new island exactly
    * when its start exceeds the max end of every earlier interval
    * (touching intervals merge); island id = running sum of starts;
    * union length = Σ (island max end − island min start) — all exact
    * integer micros. One user-keyed sort serves both windows and the
    * island rollup reuses the same distribution; per-row state is one
    * long, heavy-hitter-immune like every windowed operator here. */
  def intervalCoverage(spark: SparkSession, dir: String): DataFrame = {
    val lenUs = 1800000000L // each event covers [ts, ts + 30 min)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tsu").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsu"))
      .withColumn("end_us", col("tsu") + lenUs)
      .withColumn("prev_max_end",
        max(col("end_us")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ni", when(col("prev_max_end").isNull ||
        col("tsu") > col("prev_max_end"), 1L).otherwise(0L))
      .withColumn("island", sum(col("ni"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("tsu")).as("s"), max(col("end_us")).as("e"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"), sum(col("e") - col("s")).as("covered_us"))
      .orderBy(col("user_id"))
  }

  /** LINEAR (multi-touch) attribution — the credit-splitting sibling of
    * [[touchAttribution]]'s last-touch: each purchase's e2 revenue
    * splits EQUALLY across its qualifying clicks (same user, click
    * strictly before the purchase, within 7 days), in EXACT integer
    * arithmetic: every qualifying click gets rev div k and the division
    * remainder goes to the EARLIEST click (deterministic, and the
    * per-purchase credits always sum back to the full revenue — the
    * invariant float splits silently violate). Rolled up to attributed
    * revenue per click day.
    *
    * Shape: a user-keyed equi-join with the 7-day interval residual
    * (clicks per purchase are bounded by the window — the scd2/interval
    * join argument, never a blow-up toward cross product), one
    * per-purchase count+min window over the matched pairs sharing the
    * join's distribution, then a small day rollup. */
  /** Data-driven (Markov removal-effect) attribution — Anderl et al.
    * 2016, the model the touch heuristics (linear_attribution /
    * touch_attribution) approximate: user journeys (event types strictly
    * before the first purchase, start-anchored, conv/null-terminated)
    * become a first-order transition matrix; a channel's credit is its
    * REMOVAL EFFECT — how much absorption probability into `conv` is
    * lost when every transition into that channel is redirected to
    * `null` — normalized into shares.
    *
    * Exactness: the absorption fixpoint p_s = (Σ c_sd·p_d +
    * c_s,conv·10⁹) div out_s runs as an INTEGER recursion under
    * `WITH RECURSIVE` on both engines — the transition matrix rides the
    * recursion as 30 wide columns (matrix-vector product = column
    * arithmetic; a join or GROUP BY inside the recursive step is
    * disallowed/slow on both engines), values are monotone
    * non-decreasing bounded integers, so the fixpoint is EXACT and the
    * recursion self-terminates when a step changes nothing (no iteration
    * constant to tune; ~25-35 steps at the fixture's ~3-hop journeys).
    * All five scenarios (base + 4 removals) iterate side by side as
    * rows of one recursion. Spark runs the journey/matrix stage once and
    * collects its 5 scenario rows; the fixpoint iterates that bounded
    * state on the driver (identical arithmetic — see
    * [[MarkovAttr.fixpointLocal]]); the share arithmetic runs over the
    * local fixpoint rows. DuckDB runs the identical generated text
    * inline, recursion included. */
  def markovAttribution(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir).createOrReplaceTempView("graft_mka_events")
    // stage 1 (the only data-sized pass) runs in Spark and collects its 5
    // scenario rows; stage 2's fixpoint iterates those 30 bounded integer
    // columns on the DRIVER ([[MarkovAttr.fixpointLocal]] — bit-identical
    // to the recursive SQL the oracle runs, without UnionLoop's one
    // driver-bound job per step); stage 3 is the same shared share text.
    val fin = MarkovAttr.fixpointLocal(spark,
      spark.sql(MarkovAttr.matrixSql("graft_mka_events")).collect())
    fin.createOrReplaceTempView("graft_mka_fin")
    spark.sql(MarkovAttr.shareSql("graft_mka_fin", "div"))
  }

  def linearAttribution(spark: SparkSession, dir: String): DataFrame = {
    val day7 = 7L * 86400000000L
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("ptsu"),
        col("event_id").as("p_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("rev_e2"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("ctsu"),
        col("event_id").as("c_id"))
    val pairs = purchases.join(clicks, Seq("user_id"))
      .filter(col("ctsu") < col("ptsu") && col("ctsu") >= col("ptsu") - day7)
    val wP = Window.partitionBy(col("user_id"), col("p_id"))
    val credited = pairs
      .withColumn("k", count(lit(1)).over(wP))
      .withColumn("rn", row_number().over(
        wP.orderBy(col("ctsu").asc, col("c_id").asc)))
      .withColumn("credit_e2",
        expr("rev_e2 div k") +
          when(col("rn") === 1, expr("rev_e2 % k")).otherwise(lit(0L)))
    credited
      .groupBy(expr("ctsu div 86400000000").as("day_idx"))
      .agg(count(lit(1)).as("n_credits"),
        sum(col("credit_e2")).as("attr_rev_e2"))
      .orderBy(col("day_idx"))
  }

  /** Time-decay multi-touch attribution (X232) — the third member of
    * the attribution family (linear X154 splits evenly, Markov X215
    * uses removal effects; this one weights recency): a click Δ whole
    * days before its purchase earns weight 2^(6−Δ) (Δ ∈ [0,6] inside
    * the 7-day window), so yesterday's click earns 64× last week's —
    * the half-life-per-day convention. Weights are exact powers of two,
    * the per-purchase split is the conserved integer division
    * credit = (rev·w) div W with the total remainder assigned to the
    * EARLIEST click (linear_attribution's conservation recipe: credits
    * sum to rev exactly, so daily attributed revenue reconciles to
    * booked revenue to the cent). Windows partition on p_id — one key
    * per purchase, growing with data. */
  def timeDecayAttribution(spark: SparkSession, dir: String): DataFrame = {
    val day7 = 7L * 86400000000L
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("ptsu"),
        col("event_id").as("p_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("rev_e2"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("ctsu"),
        col("event_id").as("c_id"))
    val pairs = purchases.join(clicks, Seq("user_id"))
      // STRICT lower bound: a click at exactly 7 days would floor to
      // Δ = 7 and earn weight 2^-1 → 0, which zeroes tw when it is a
      // purchase's only click (NULL credit here, div-by-zero in the
      // oracle — ADVICE r11); strict keeps Δ ∈ [0,6], weights ≥ 1
      .filter(col("ctsu") < col("ptsu") && col("ctsu") > col("ptsu") - day7)
      .withColumn("w",
        expr("CAST(pow(2, 6 - (ptsu - ctsu) div 86400000000) AS BIGINT)"))
    val wP = Window.partitionBy(col("p_id"))
    val credited = pairs
      .withColumn("tw", sum(col("w")).over(wP))
      .withColumn("rn", row_number().over(
        wP.orderBy(col("ctsu").asc, col("c_id").asc)))
      .withColumn("base", expr("(rev_e2 * w) div tw"))
      .withColumn("rem",
        col("rev_e2") - sum(expr("(rev_e2 * w) div tw")).over(wP))
      .withColumn("credit_e2",
        col("base") + when(col("rn") === 1, col("rem")).otherwise(lit(0L)))
    credited
      .groupBy(expr("ctsu div 86400000000").as("day_idx"))
      .agg(count(lit(1)).as("n_credits"),
        sum(col("credit_e2")).as("attr_rev_e2"))
      .orderBy(col("day_idx"))
  }

  /** Exact χ² independence audit over the (event type × high-value)
    * contingency table — "does conversion value depend on event type",
    * the categorical-drift / A-B sanity screen next to [[ksDrift]]'s
    * continuous one. All INTEGER arithmetic on the classic identity:
    * the per-cell contribution (O − E)²/E with E = R·C/n scales by n to
    * (n·O − R·C)² / (n·R·C), whose numerator can reach ~10²² — so the
    * squaring runs in DECIMAL(38,0) and only the bounded e6 quotient
    * exports (same >64-bit discipline as value_moments). The grid is
    * DENSIFIED before scoring (rows × cols left-joined to the observed
    * cells): a structurally-zero cell still contributes (0−E)²/E = RC/n,
    * and omitting those understates χ² exactly when the association is
    * strong (round-11 fix — sf0.001 genuinely lacks some hi cells).
    * Shape: ONE partial-aggregated pass builds the cells; rows/cols/
    * total are broadcast 1-to-a-few-row frames derived from the cells,
    * never a re-scan. */
  def chi2Independence(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = Tables.events(spark, dir)
      .select(col("event_type"), (col("value") > 250).cast("int").as("hi"))
      .groupBy(col("event_type"), col("hi"))
      .agg(count(lit(1)).as("o"))
    val rows = cells.groupBy(col("event_type")).agg(sum(col("o")).as("r"))
    val cols = cells.groupBy(col("hi")).agg(sum(col("o")).as("c"))
    val total = cells.agg(sum(col("o")).as("n"))
    // densify: a structurally-zero cell still contributes (0−E)²/E =
    // RC/n — omitting it understates χ² exactly when association is
    // strong (at sf0.001 some hi cells are genuinely unobserved)
    rows.crossJoin(broadcast(cols))
      .join(cells, Seq("event_type", "hi"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(total))
      .select(col("event_type"), col("hi").cast("long").as("hi"), col("o"),
        expr("(r * c) div n").as("expected"),
        expr(s"CAST((CAST(n AS $d38) * o - CAST(r AS $d38) * c) *" +
          s" (CAST(n AS $d38) * o - CAST(r AS $d38) * c) * 1000000" +
          s" div (CAST(n AS $d38) * r * c) AS BIGINT)").as("chi2_contrib_e6"))
      .orderBy(col("event_type"), col("hi"))
  }

  /** Exact SHAPLEY multi-touch attribution (X251) — the fourth member of
    * the attribution family (linear X154 splits evenly, time-decay X232
    * weights recency, Markov X215 uses removal effects; Shapley is the
    * axiomatically-fair split from cooperative game theory — Shapley
    * 1953, the standard the ad-measurement literature benchmarks
    * against). Channels are the three non-purchase touch types (click /
    * view / signup) inside the 7-day pre-purchase window; each converted
    * purchase contributes its observed channel-SET (a 3-bit mask), and
    * the coalition value v(S) counts conversions whose touch set ⊆ S
    * (the containment convention of Zhao et al. 2018). With 3 channels
    * the Shapley weights are exact sixths, so φᵢ·6 =
    * 2·v({i}) + Σ_j [v({i,j})−v({j})] + 2·[v(N)−v(N∖i)] is an exact
    * INTEGER — conserved: Σφᵢ = v(N) (every attributed conversion splits
    * fully). Shape: ONE windowed join builds per-purchase masks
    * (purchase-keyed partial agg), then ALL coalition math runs on the
    * ≤8-row mask histogram — broadcast-trivial at any fact volume. */
  def shapleyAttribution(spark: SparkSession, dir: String): DataFrame =
    shapleyAttributionOf(Tables.events(spark, dir))

  def shapleyAttributionOf(ev: DataFrame): DataFrame = {
    val spark = ev.sparkSession
    val day7 = 7L * 86400000000L
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("ptsu"),
        col("event_id").as("p_id"))
    val touches = ev.filter(col("event_type").isin("click", "view", "signup"))
      .select(col("user_id"), unix_micros(col("ts")).as("ctsu"),
        col("event_type").as("ch"))
    val masks = purchases.join(touches, Seq("user_id"))
      .filter(col("ctsu") < col("ptsu") && col("ctsu") > col("ptsu") - day7)
      .groupBy(col("p_id"))
      .agg(expr("""max(CASE WHEN ch = 'click' THEN 1 ELSE 0 END)
        |+ 2 * max(CASE WHEN ch = 'view' THEN 1 ELSE 0 END)
        |+ 4 * max(CASE WHEN ch = 'signup' THEN 1 ELSE 0 END)"""
        .stripMargin.replace("\n", " ")).as("mask"))
    val hist = masks.groupBy(col("mask"))
      .agg(count(lit(1)).as("c")).localCheckpoint(false) // ≤ 7 rows
    val coalitions = spark.range(0, 8).toDF("s")
      .join(broadcast(hist), expr("(mask & s) = mask"), "left")
      .groupBy(col("s")).agg(coalesce(sum(col("c")), lit(0L)).as("v"))
    val channels = spark.range(0, 3).toDF("b")
      .select(expr("CAST(pow(2, b) AS BIGINT)").as("bit"),
        expr("element_at(array('click','view','signup'), CAST(b + 1 AS INT))")
          .as("channel"))
    channels
      .join(broadcast(coalitions.select(col("s"), col("v"))),
        expr("(s & bit) = 0"))
      .join(broadcast(coalitions.select(col("s").as("s2"), col("v").as("v2"))),
        expr("s2 = (s | bit)"))
      .groupBy(col("channel"))
      .agg(sum(expr("""CASE WHEN s = 0 THEN 2 WHEN s = 7 - bit THEN 2
        |ELSE 1 END * (v2 - v)""".stripMargin.replace("\n", " ")))
        .as("phi_x6"))
      .crossJoin(broadcast(coalitions.filter(col("s") === 7)
        .select(col("v").as("v_all"))))
      .select(col("channel"), col("phi_x6"),
        // zero attributed conversions (no windowed touch at all) → every
        // share is 0, not a divide-by-zero
        expr("CASE WHEN v_all = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (phi_x6 * 1000000) div (6 * v_all) END").as("share_e6"))
      .orderBy(col("channel"))
  }

  /** Association rules over per-user behavior baskets (X260) — classic
    * market-basket mining (Agrawal & Srikant 1994's support/confidence
    * plus lift) on the "which event types does a user exhibit" basket:
    * for every DIRECTED type pair a→b, how often do a-users also do b,
    * and is that more than independence predicts. All three metrics are
    * EXACT integer ratios (counts of distinct users; e6 floor exports).
    * Shape: one distinct (user, type) projection (user-keyed partial
    * agg), one self-join on user whose output is bounded by
    * |types|²·|users| pair instances collapsing immediately to the
    * ≤20-row rule grid — at open type cardinality the same pipeline
    * df-caps types first (the postings stop-list discipline). */
  def assocRules(spark: SparkSession, dir: String): DataFrame =
    assocRulesOf(Tables.events(spark, dir))

  def assocRulesOf(ev: DataFrame): DataFrame = {
    val u = ev.select(col("user_id"), col("event_type").as("t")).distinct()
    val perType = u.groupBy(col("t")).agg(count(lit(1)).as("ut"))
    val n = u.select(col("user_id")).distinct().agg(count(lit(1)).as("n"))
    u.as("a").join(u.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.t") =!= col("b.t"))
      .groupBy(col("a.t").as("ante"), col("b.t").as("conseq"))
      .agg(count(lit(1)).as("n_both"))
      .join(broadcast(perType.select(col("t").as("ante"), col("ut").as("ua"))),
        "ante")
      .join(broadcast(perType.select(col("t").as("conseq"), col("ut").as("ub"))),
        "conseq")
      .crossJoin(broadcast(n))
      .select(col("ante"), col("conseq"), col("n_both"),
        // user counts widen before the e6 scale-up: n · n_both · 10^6
        // wraps BIGINT past ~3e6 users (ADVICE r12); quotients are ≤ 10^6
        // (confidence) / bounded lift, so BIGINT exports stay exact
        expr("CAST((CAST(n_both AS decimal(38,0)) * 1000000) div ua" +
          " AS BIGINT)").as("confidence_e6"),
        expr("CAST((CAST(n AS decimal(38,0)) * n_both * 1000000)" +
          " div (CAST(ua AS decimal(38,0)) * ub) AS BIGINT)").as("lift_e6"))
      .orderBy(col("ante"), col("conseq"))
  }

  /** Empirical entropy rate of the per-user event-type Markov chain
    * (X261) — how predictable is the NEXT action given the current one
    * (Shannon 1948's source entropy on the [[eventTransitions]]
    * transition counts): Σᵢⱼ (cᵢⱼ/T)·ln(rᵢ/cᵢⱼ), exported per cell so
    * there is no cross-engine sum-order ambiguity. The ratio inside the
    * one ln is EXACT (row count over cell count); weights quantize at
    * e6. Transitions come from a lag window PARTITIONED on user_id (a
    * key that grows with data), ordered (ts, event_id) for tie
    * determinism; the cell grid is |types|²-bounded. */
  def markovEntropyRate(spark: SparkSession, dir: String): DataFrame =
    markovEntropyRateOf(Tables.events(spark, dir))

  def markovEntropyRateOf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val cells = ev
      .select(col("user_id"), col("event_type").as("nxt"),
        lag(col("event_type"), 1).over(w).as("prv"))
      .filter(col("prv").isNotNull)
      .groupBy(col("prv"), col("nxt")).agg(count(lit(1)).as("c"))
    val rows = cells.groupBy(col("prv")).agg(sum(col("c")).as("r"))
    val total = cells.agg(sum(col("c")).as("tt"))
    cells.join(broadcast(rows), "prv").crossJoin(broadcast(total))
      .select(col("prv"), col("nxt"), col("c"),
        expr("""CAST(round(CAST(c AS DOUBLE) / tt
          |* ln(CAST(r AS DOUBLE) / c) * 1000000) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("h_contrib_e6"))
      .orderBy(col("prv"), col("nxt"))
  }

  /** DAU / WAU / MAU + stickiness (X266) — the canonical
    * product-analytics active-user scorecard: per day, distinct users
    * that day, in the trailing 7, and in the trailing 30, plus
    * DAU/MAU stickiness as an exact e6 ratio. Shape: ONE distinct
    * (day, user) projection (user-keyed partial agg), then the ≤31-row
    * calendar broadcasts against it — the trailing-window multiplicity
    * is calendar-bounded (≤30×) however large the corpus, and each
    * day's three distinct counts fold in one aggregation. */
  def dauWauMau(spark: SparkSession, dir: String): DataFrame =
    dauWauMauOf(Tables.events(spark, dir))

  def dauWauMauOf(events: DataFrame): DataFrame = {
    val ud = events.select(to_date(col("ts")).as("uday"), col("user_id"))
      .distinct()
    val days = ud.select(col("uday").as("day")).distinct()
    days.join(ud,
        col("uday") <= col("day") && col("uday") > date_sub(col("day"), 30))
      .groupBy(col("day"))
      .agg(
        countDistinct(when(col("uday") === col("day"), col("user_id")))
          .as("dau"),
        countDistinct(when(col("uday") > date_sub(col("day"), 7),
          col("user_id"))).as("wau"),
        countDistinct(col("user_id")).as("mau"))
      .select(col("day"), col("dau"), col("wau"), col("mau"),
        expr("(dau * 1000000) div mau").as("stickiness_e6"))
      .orderBy(col("day"))
  }

  /** Time-weighted average value per day (X267 — the TWAP of finance
    * telemetry, the honest "average level" when observations arrive
    * irregularly: each event's value weighs by the micros until the
    * NEXT event that day, so a burst of cheap events can't drown a
    * long-lived expensive level). Weights and the weighted sum are
    * exact integers (DECIMAL(38,0) accumulation — value·gap products
    * overflow BIGINT at day scale); the export is one exact integer
    * division. Window partitions on day (grows with data), (ts,
    * event_id) tie order; each day's last event carries no weight on
    * both engines. */
  def twapDaily(spark: SparkSession, dir: String): DataFrame =
    twapDailyOf(Tables.events(spark, dir))

  def twapDailyOf(events: DataFrame): DataFrame = {
    val d38 = "decimal(38,0)"
    val w = Window.partitionBy(col("day"))
      .orderBy(col("tsu").asc, col("event_id").asc)
    events
      .select(to_date(col("ts")).as("day"), unix_micros(col("ts")).as("tsu"),
        col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .withColumn("nxt", lead(col("tsu"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("day"))
      .agg(expr(s"SUM(CAST(v AS $d38) * (nxt - tsu))").as("num"),
        sum(col("nxt") - col("tsu")).as("den"))
      .select(col("day"), expr("CAST(num div den AS BIGINT)").as("twap_e2"),
        col("den").as("span_us"))
      .orderBy(col("day"))
  }

  /** Lead-lag cross-correlation (X281 — the lagged form of Pearson's r,
    * Box-Jenkins CCF): r(lag) between the daily CLICK count series and
    * the PURCHASE count series shifted `lag` days forward, lag 0..7 —
    * "do clicks lead purchases, and by how many days?", the
    * cadence-discovery pass before any transfer-function/adstock model.
    * The daily rollup is the only data-sized pass (one partial-agg
    * shuffle); the lag alignment is a ≤31-row calendar frame self-joined
    * under a broadcast 8-row lag grid, so the quadratic part is bounded
    * by the CALENDAR, never the events. Per-lag component sums
    * accumulate DECIMAL(38,0) (daily counts at 100 TB put x·y past
    * BIGINT); r is the fixed-order double chain over those exact
    * integers (the degree_assortativity recipe), e4-rounded once, NULL
    * when either lagged window is constant. */
  def xcorrLeadlag(spark: SparkSession, dir: String): DataFrame =
    xcorrLeadlagOf(spark, Tables.events(spark, dir))

  def xcorrLeadlagOf(spark: SparkSession, events: DataFrame): DataFrame = {
    val d38 = "decimal(38,0)"
    val daily = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
    val lags = spark.range(0, 8).toDF("lag")
    daily.select(col("day"), col("x"))
      .crossJoin(broadcast(lags))
      .join(daily.select(col("day").as("day2"), col("y")),
        expr("day2 = date_add(day, CAST(lag AS INT))"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(expr(s"CAST(x AS $d38)")).as("sx"),
        sum(expr(s"CAST(y AS $d38)")).as("sy"),
        sum(expr(s"CAST(x AS $d38) * CAST(y AS $d38)")).as("sxy"),
        sum(expr(s"CAST(x AS $d38) * CAST(x AS $d38)")).as("sxx"),
        sum(expr(s"CAST(y AS $d38) * CAST(y AS $d38)")).as("syy"))
      .select(col("lag"), col("n"),
        expr(
          """CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
            |     AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
            |       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
            |THEN CAST(round(
            |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            |  / sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            |  / sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
            |         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
            |  * 10000) AS BIGINT) END""".stripMargin).as("r_e4"))
      .orderBy(col("lag"))
  }

  /** Mann-Kendall trend test (X294 — Mann 1945 / Kendall 1975, the
    * standard nonparametric "is this series trending?" screen, the
    * hypothesis-test companion of theil_sen's slope): S = Σ_{i<j}
    * sign(rev_j − rev_i) over the daily revenue series, variance from
    * the closed form n(n−1)(2n+5)/18 with the exact tie correction,
    * and the continuity-corrected Z. S and the two variance components
    * are pure integers over the calendar-bounded daily frame (≤ one
    * row per day — the O(days²) pair join is constant work after one
    * partial-aggregated rollup, the theil_sen shape); Z is one
    * fixed-order double chain, e4-rounded. */
  def mannKendall(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(expr("CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)")
        .as("rev"))
    val s = daily.as("a").join(daily.as("b"), col("a.day") < col("b.day"))
      .agg(sum(signum(col("b.rev") - col("a.rev")).cast("long")).as("s"),
        count(lit(1)).as("n_pairs"))
    val ties = daily.groupBy(col("rev")).agg(count(lit(1)).as("t"))
      .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie18"),
        count(lit(1)).as("n_vals"))
    val n = daily.agg(count(lit(1)).as("n"))
    s.crossJoin(broadcast(n)).crossJoin(broadcast(ties))
      .select(col("n").as("n_days"), col("s"),
        expr("n * (n - 1) * (2 * n + 5) - coalesce(tie18, 0)").as("var18"),
        expr(
          """CASE WHEN s = 0 OR n < 2 THEN 0
            |ELSE CAST(round(
            |  (CAST(s AS DOUBLE) - CAST(sign(s) AS DOUBLE))
            |  / sqrt(CAST(n * (n - 1) * (2 * n + 5)
            |              - coalesce(tie18, 0) AS DOUBLE) / 18.0)
            |  * 10000) AS BIGINT) END""".stripMargin).as("z_e4"))
  }

  /** Score-calibration table (X318 — the reliability diagram behind
    * every "is this score a probability?" audit, and the model-free
    * complement of `classifier_auc`'s rank view: AUC says the ORDER is
    * right, calibration says the LEVELS are): users scored by first-
    * half activity (event count through Jan 15 — the features a churn/
    * conversion model would see), outcome = any second-half purchase.
    * Buckets are score div 5 — a pure function of the score, so the
    * bucketing is a bounded-key groupBy, never a global-sort ntile —
    * and per-bucket observed rate vs mean score export as exact
    * integer quotients. A well-calibrated score shows monotone
    * pos_rate across buckets; the declared rows ARE the curve. */
  def scoreCalibration(spark: SparkSession, dir: String): DataFrame = {
    val split = lit("2024-01-15").cast("date")
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        sum(when(to_date(col("ts")) <= split, 1L).otherwise(0L)).as("score"),
        max(when(col("event_type") === "purchase" && to_date(col("ts")) > split,
          1L).otherwise(0L)).as("y"))
    perUser
      .groupBy(expr("score div 5").as("bucket"))
      .agg(count(lit(1)).as("n_users"), sum(col("y")).as("n_pos"),
        sum(col("score")).as("sum_score"))
      .select(col("bucket"), col("n_users"), col("n_pos"),
        expr("(sum_score * 10000) div n_users").as("mean_score_e4"),
        expr("(n_pos * 1000000) div n_users").as("pos_rate_e6"))
      .orderBy(col("bucket"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mann_kendall" -> (mannKendall _),
    "score_calibration" -> (scoreCalibration _),
    "xcorr_leadlag" -> (xcorrLeadlag _),
    "dau_wau_mau" -> (dauWauMau _),
    "twap_daily" -> (twapDaily _),
    "assoc_rules" -> (assocRules _),
    "markov_entropy_rate" -> (markovEntropyRate _),
    "shapley_attribution" -> (shapleyAttribution _),
    "autocorr" -> (autocorr _),
    "seasonality_index" -> (seasonalityIndex _),
    "rolling_corr" -> (rollingCorr _),
    "series_decompose" -> (seriesDecompose _),
    "hll_distinct" -> (hllDistinct _),
    "value_moments" -> (valueMoments _),
    "benford_audit" -> (benfordAudit _),
    "window_navigation" -> (windowNavigation _),
    "interval_coverage" -> (intervalCoverage _),
    "linear_attribution" -> (linearAttribution _),
    "time_decay_attribution" -> (timeDecayAttribution _),
    "markov_attribution" -> (markovAttribution _),
    "chi2_independence" -> (chi2Independence _),
    "sequence_funnel" -> (sequenceFunnel _),
    "touch_attribution" -> (touchAttribution _),
    "sliding_distinct" -> (slidingDistinct _),
    "ks_drift" -> (ksDrift _),
    "bitmap_ops" -> (bitmapOps _),
    "bitmap_ops_sparse" -> (bitmapOpsSparse _),
    "max_concurrency" -> (maxConcurrency _),
    "incremental_agg" -> (incrementalAgg _),
    "gap_fill" -> (gapFill _),
    "event_transitions" -> (eventTransitions _),
    "trend_forecast" -> (trendForecast _),
    "exp_smooth" -> (expSmooth _),
    "pivot_events" -> (pivotEvents _),
    "range_window" -> (rangeWindow _),
    "json_props" -> (jsonProps _),
    "events_hourly" -> (eventsHourly _),
    "sessionize" -> (sessionize _),
    "value_histogram" -> (valueHistogram _),
    "ohlc_bars" -> (ohlcBars _),
    "changepoint_cusum" -> (changepointCusum _),
    "trend_regression" -> (trendRegression _),
    "interarrival_quantiles" -> (interarrivalQuantiles _),
    "robust_mad" -> (robustMad _),
    "new_vs_returning" -> (newVsReturning _),
    "event_paths_top" -> (eventPathsTop _),
    "basket_lift" -> (basketLift _),
    "cohort_retention" -> (cohortRetention _),
    "funnel_conversion" -> (funnelConversion _),
    "sliding_window" -> (slidingWindow _),
    "scd2_build" -> (scd2Build _),
    "scd2_temporal_join" -> (scd2TemporalJoin _),
    "kmv_distinct" -> (kmvDistinct _),
    "cms_counts" -> (cmsCounts _),
    "session_window_agg" -> (sessionWindowAgg _),
    "unpivot_events" -> (unpivotEvents _),
    "user_paths" -> (userPaths _),
    "anomaly_zscore" -> (anomalyZscore _)
  )

  val oracles: Map[String, String] = Map(
    "score_calibration" ->
      """WITH u AS (
        |  SELECT user_id,
        |    SUM(CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15'
        |      THEN 1 ELSE 0 END) AS score,
        |    MAX(CASE WHEN event_type = 'purchase'
        |      AND CAST(ts AS DATE) > DATE '2024-01-15' THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY user_id)
        |SELECT CAST(score // 5 AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(y) AS BIGINT) AS n_pos,
        |  CAST((SUM(score) * 10000) // COUNT(*) AS BIGINT) AS mean_score_e4,
        |  CAST((SUM(y) * 1000000) // COUNT(*) AS BIGINT) AS pos_rate_e6
        |FROM u GROUP BY 1 ORDER BY bucket""".stripMargin,
    // exact pair signs + tie-corrected variance, Z replayed in order
    "mann_kendall" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM events GROUP BY 1),
        |s AS (
        |  SELECT CAST(SUM(CAST(sign(b.rev - a.rev) AS BIGINT)) AS BIGINT) AS s
        |  FROM daily a JOIN daily b ON a.day < b.day),
        |t AS (
        |  SELECT CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18
        |  FROM (SELECT COUNT(*) AS t FROM daily GROUP BY rev)),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily)
        |SELECT n AS n_days, s,
        |  CAST(n * (n - 1) * (2 * n + 5) - COALESCE(tie18, 0) AS BIGINT) AS var18,
        |  CASE WHEN s = 0 OR n < 2 THEN 0
        |  ELSE CAST(round(
        |    (CAST(s AS DOUBLE) - CAST(sign(s) AS DOUBLE))
        |    / sqrt(CAST(n * (n - 1) * (2 * n + 5)
        |                - COALESCE(tie18, 0) AS DOUBLE) / 18.0)
        |    * 10000) AS BIGINT) END AS z_e4
        |FROM s, t, n""".stripMargin,
    // same daily rollup + lag self-join + fixed-order r chain
    "xcorr_leadlag" ->
      """WITH d AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |lags AS (SELECT UNNEST(generate_series(0, 7)) AS lag),
        |p AS (SELECT l.lag, a.x, b.y
        |      FROM lags l, d a JOIN d b ON b.day = a.day + CAST(l.lag AS INTEGER)),
        |c AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
        |        CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
        |        CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
        |        CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
        |      FROM p GROUP BY lag)
        |SELECT CAST(lag AS BIGINT) AS lag, n,
        |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        |       AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
        |  THEN CAST(round(
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    / sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
        |    * 10000) AS BIGINT) END AS r_e4
        |FROM c ORDER BY lag""".stripMargin,
    // generated from the same three stage texts the Spark side runs
    "markov_attribution" -> MarkovAttr.oracleSql("events"),
    // integer-scaled centered series: c_t = n*x_t - S; sign-safe e6 export
    // den-scaled integers end-to-end; anomaly σ is defined over the
    // EXPORTED e4 residuals so no mixed-denominator compare exists;
    // HUGEINT squares (resid_e4² passes 2⁶³ at sf0.1)
    "series_decompose" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |dmin AS (SELECT MIN(day) AS dmin FROM daily),
        |wt AS (SELECT day, y, CAST(day - (SELECT dmin FROM dmin) AS BIGINT) AS t,
        |         (CAST(day - DATE '1970-01-01' AS INT) % 7) AS dow
        |       FROM daily),
        |ols AS (SELECT COUNT(*) AS n, CAST(SUM(t) AS BIGINT) AS st,
        |          CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(t*y) AS BIGINT) AS sty,
        |          CAST(SUM(t*t) AS BIGINT) AS stt FROM wt),
        |detr AS (SELECT day, y, t, dow,
        |    n*stt - st*st AS den, n*sty - st*sy AS numb, sy*stt - st*sty AS numa,
        |    y*(n*stt - st*st) - (sy*stt - st*sty) - (n*sty - st*sy)*t AS dd
        |  FROM wt, ols),
        |bydow AS (SELECT dow, CAST(SUM(dd) AS BIGINT) AS sd, COUNT(*) AS cd
        |          FROM detr GROUP BY 1),
        |r AS (SELECT d.day, d.y, d.t, d.den, d.numa, d.numb, b.sd, b.cd,
        |        d.dd * b.cd - b.sd AS nt
        |      FROM detr d JOIN bydow b USING (dow)),
        |e AS (SELECT day, y,
        |    CASE WHEN (numa + numb*t) >= 0 THEN ((numa + numb*t) * 100) // den
        |         ELSE -(((-(numa + numb*t)) * 100) // den) END AS trend_e4,
        |    CASE WHEN sd >= 0 THEN (sd * 100) // (den * cd)
        |         ELSE -(((-sd) * 100) // (den * cd)) END AS dow_eff_e4,
        |    CASE WHEN nt >= 0 THEN (nt * 100) // (den * cd)
        |         ELSE -(((-nt) * 100) // (den * cd)) END AS resid_e4
        |  FROM r),
        |tot AS (SELECT CAST(SUM(CAST(resid_e4 AS HUGEINT) * resid_e4) AS HUGEINT) AS ss,
        |          COUNT(*) AS n2 FROM e)
        |SELECT day, y AS rev_e2, CAST(trend_e4 AS BIGINT) AS trend_e4,
        |  CAST(dow_eff_e4 AS BIGINT) AS dow_eff_e4,
        |  CAST(resid_e4 AS BIGINT) AS resid_e4,
        |  (CAST(resid_e4 AS HUGEINT) * resid_e4 * n2) > (ss * 4) AS anomaly
        |FROM e, tot ORDER BY day""".stripMargin,
    // epoch-day mod 7 sidesteps the engines' different Sunday labels
    "seasonality_index" ->
      """WITH d AS (
        |  SELECT (CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS INT) % 7) AS dow,
        |    CAST(ts AS DATE) AS day, CAST(round(value * 100) AS BIGINT) AS v_e2
        |  FROM events),
        |bd AS (
        |  SELECT dow, COUNT(DISTINCT day) AS nd, COUNT(*) AS n_events,
        |    CAST(SUM(v_e2) AS BIGINT) AS rev_e2
        |  FROM d GROUP BY 1),
        |t AS (SELECT CAST(SUM(nd) AS BIGINT) AS td, CAST(SUM(rev_e2) AS BIGINT) AS tr FROM bd)
        |SELECT CAST(dow AS BIGINT) AS dow, nd, n_events, rev_e2,
        |  -- HUGEINT keeps `//` a true integer floor (DECIMAL // rounds)
        |  CAST(CAST(rev_e2 AS HUGEINT) * td * 1000000 //
        |    (CAST(tr AS HUGEINT) * nd) AS BIGINT) AS idx_e6
        |FROM bd, t ORDER BY dow""".stripMargin,
    // closed form mirrors the engine expression op for op; windows
    // shorter than 7 days are dropped so n is literally 7 both sides
    "rolling_corr" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN event_type = 'click'
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS b
        |  FROM events GROUP BY 1),
        |win AS (
        |  SELECT d1.day, COUNT(*) AS n,
        |    CAST(SUM(d2.a) AS BIGINT) AS sx, CAST(SUM(d2.b) AS BIGINT) AS sy,
        |    CAST(SUM(d2.a * d2.b) AS BIGINT) AS sxy,
        |    CAST(SUM(d2.a * d2.a) AS BIGINT) AS sxx,
        |    CAST(SUM(d2.b * d2.b) AS BIGINT) AS syy
        |  FROM daily d1 JOIN daily d2 ON d2.day BETWEEN d1.day - 6 AND d1.day
        |  GROUP BY 1 HAVING COUNT(*) = 7),
        |f AS (
        |  SELECT day,
        |    CAST(7 AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS dxx,
        |    CAST(7 AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS dyy,
        |    CAST(7 AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS dxy
        |  FROM win)
        |SELECT day, CASE WHEN dxx > 0 AND dyy > 0
        |  THEN CAST(round(dxy / sqrt(dxx) / sqrt(dyy) * 10000) AS BIGINT)
        |  ELSE NULL END AS r_e4
        |FROM f ORDER BY day""".stripMargin,
    "autocorr" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s FROM daily),
        |c AS (SELECT day, n * x - s AS c FROM daily, st),
        |dn AS (SELECT CAST(SUM(c * c) AS BIGINT) AS den FROM c),
        |nums AS (
        |  SELECT CAST(1 AS BIGINT) AS lag, CAST(SUM(a.c * b.c) AS BIGINT) AS num
        |  FROM c a JOIN c b ON b.day = a.day + 1
        |  UNION ALL
        |  SELECT CAST(7 AS BIGINT), CAST(SUM(a.c * b.c) AS BIGINT)
        |  FROM c a JOIN c b ON b.day = a.day + 7)
        |SELECT lag, num, dn.den AS den,
        |  CASE WHEN num >= 0 THEN CAST((num * 1000000) // dn.den AS BIGINT)
        |       ELSE -CAST(((-num) * 1000000) // dn.den AS BIGINT) END AS r_e6
        |FROM nums, dn ORDER BY lag""".stripMargin,
    // same scaled identity in HUGEINT; non-negative operands make // and
    // div agree
    "chi2_independence" ->
      """WITH base AS (
        |  SELECT event_type, CASE WHEN value > 250 THEN 1 ELSE 0 END AS hi
        |  FROM events),
        |cells AS (
        |  SELECT event_type, hi, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM base GROUP BY 1, 2),
        |rr AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
        |cc AS (SELECT hi, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
        |nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
        |dense AS (
        |  SELECT rr.event_type, rr.r, cc.hi, cc.c, COALESCE(cells.o, 0) AS o
        |  FROM rr CROSS JOIN cc
        |  LEFT JOIN cells ON cells.event_type = rr.event_type
        |    AND cells.hi = cc.hi)
        |SELECT dense.event_type, CAST(dense.hi AS BIGINT) AS hi,
        |  CAST(dense.o AS BIGINT) AS o,
        |  CAST((dense.r * dense.c) // nn.n AS BIGINT) AS expected,
        |  CAST(((CAST(nn.n AS HUGEINT) * o - CAST(dense.r AS HUGEINT) * dense.c)
        |     * (CAST(nn.n AS HUGEINT) * o - CAST(dense.r AS HUGEINT) * dense.c) * 1000000)
        |    // (CAST(nn.n AS HUGEINT) * dense.r * dense.c) AS BIGINT) AS chi2_contrib_e6
        |FROM dense, nn
        |ORDER BY event_type, hi""".stripMargin,
    // same integer split: rev div k per click, remainder to the earliest
    "linear_attribution" ->
      """WITH p AS (
        |  SELECT user_id, epoch_us(ts) AS ptsu, event_id AS p_id,
        |    CAST(round(value * 100) AS BIGINT) AS rev
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, epoch_us(ts) AS ctsu, event_id AS c_id
        |  FROM events WHERE event_type = 'click'),
        |pairs AS (
        |  SELECT p.user_id, p.p_id, p.ptsu, p.rev, c.ctsu, c.c_id
        |  FROM p JOIN c ON c.user_id = p.user_id
        |    AND c.ctsu < p.ptsu AND c.ctsu >= p.ptsu - 604800000000),
        |ranked AS (
        |  SELECT *, CAST(COUNT(*) OVER (PARTITION BY p_id) AS BIGINT) AS k,
        |    row_number() OVER (PARTITION BY p_id ORDER BY ctsu, c_id) AS rn
        |  FROM pairs),
        |credited AS (
        |  SELECT ctsu,
        |    (rev // k) + CASE WHEN rn = 1 THEN rev % k ELSE 0 END AS credit
        |  FROM ranked)
        |SELECT CAST(ctsu // 86400000000 AS BIGINT) AS day_idx,
        |  CAST(COUNT(*) AS BIGINT) AS n_credits,
        |  CAST(SUM(credit) AS BIGINT) AS attr_rev_e2
        |FROM credited GROUP BY 1 ORDER BY 1""".stripMargin,
    // same conserved integer split, recency-weighted by powers of two
    "time_decay_attribution" ->
      """WITH p AS (
        |  SELECT user_id, epoch_us(ts) AS ptsu, event_id AS p_id,
        |    CAST(round(value * 100) AS BIGINT) AS rev
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, epoch_us(ts) AS ctsu, event_id AS c_id
        |  FROM events WHERE event_type = 'click'),
        |pairs AS (
        |  SELECT p.p_id, p.rev, c.ctsu, c.c_id,
        |    CAST(pow(2, 6 - (p.ptsu - c.ctsu) // 86400000000) AS BIGINT) AS w
        |  FROM p JOIN c ON c.user_id = p.user_id
        |    AND c.ctsu < p.ptsu AND c.ctsu > p.ptsu - 604800000000),
        |ranked AS (
        |  SELECT *, CAST(SUM(w) OVER (PARTITION BY p_id) AS BIGINT) AS tw,
        |    row_number() OVER (PARTITION BY p_id ORDER BY ctsu, c_id) AS rn
        |  FROM pairs),
        |credited AS (
        |  SELECT ctsu,
        |    ((rev * w) // tw)
        |    + CASE WHEN rn = 1 THEN
        |        rev - CAST(SUM((rev * w) // tw) OVER (PARTITION BY p_id)
        |          AS BIGINT)
        |      ELSE 0 END AS credit
        |  FROM ranked)
        |SELECT CAST(ctsu // 86400000000 AS BIGINT) AS day_idx,
        |  CAST(COUNT(*) AS BIGINT) AS n_credits,
        |  CAST(SUM(credit) AS BIGINT) AS attr_rev_e2
        |FROM credited GROUP BY 1 ORDER BY 1""".stripMargin,
    // trailing windows by calendar join; three distincts in one pass
    "dau_wau_mau" ->
      """WITH ud AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS uday, user_id FROM events),
        |days AS (SELECT DISTINCT uday AS day FROM ud),
        |agg AS (
        |  SELECT d.day,
        |    CAST(COUNT(DISTINCT CASE WHEN u.uday = d.day
        |      THEN u.user_id END) AS BIGINT) AS dau,
        |    CAST(COUNT(DISTINCT CASE WHEN u.uday > d.day - 7
        |      THEN u.user_id END) AS BIGINT) AS wau,
        |    CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS mau
        |  FROM days d JOIN ud u
        |    ON u.uday <= d.day AND u.uday > d.day - 30
        |  GROUP BY d.day)
        |SELECT day, dau, wau, mau,
        |  CAST((dau * 1000000) // mau AS BIGINT) AS stickiness_e6
        |FROM agg ORDER BY day""".stripMargin,
    // same lead-weighted integer chain; last event of a day weightless
    "twap_daily" ->
      """WITH e AS (
        |  SELECT CAST(ts AS DATE) AS day, epoch_us(ts) AS tsu,
        |    CAST(round(value * 100) AS BIGINT) AS v,
        |    lead(epoch_us(ts)) OVER (PARTITION BY CAST(ts AS DATE)
        |      ORDER BY epoch_us(ts), event_id) AS nxt
        |  FROM events)
        |SELECT day,
        |  CAST(SUM(CAST(v AS HUGEINT) * (nxt - tsu)) // SUM(nxt - tsu)
        |    AS BIGINT) AS twap_e2,
        |  CAST(SUM(nxt - tsu) AS BIGINT) AS span_us
        |FROM e WHERE nxt IS NOT NULL GROUP BY day ORDER BY day""".stripMargin,
    // distinct-user baskets; all three metrics exact integer ratios
    "assoc_rules" ->
      """WITH u AS (SELECT DISTINCT user_id, event_type AS t FROM events),
        |pt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS ut FROM u GROUP BY t),
        |n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM u),
        |pairs AS (
        |  SELECT a.t AS ante, b.t AS conseq, CAST(COUNT(*) AS BIGINT) AS n_both
        |  FROM u a JOIN u b ON a.user_id = b.user_id AND a.t <> b.t
        |  GROUP BY 1, 2)
        |SELECT p.ante, p.conseq, p.n_both,
        |  CAST((CAST(p.n_both AS HUGEINT) * 1000000) // ua.ut AS BIGINT)
        |    AS confidence_e6,
        |  CAST((CAST(n.n AS HUGEINT) * p.n_both * 1000000)
        |    // (CAST(ua.ut AS HUGEINT) * ub.ut) AS BIGINT) AS lift_e6
        |FROM pairs p
        |JOIN pt ua ON ua.t = p.ante
        |JOIN pt ub ON ub.t = p.conseq
        |CROSS JOIN n
        |ORDER BY p.ante, p.conseq""".stripMargin,
    // lag-window transitions, exact row/cell ratio inside the one ln
    "markov_entropy_rate" ->
      """WITH tr AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prv,
        |    event_type AS nxt
        |  FROM events),
        |cells AS (SELECT prv, nxt, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM tr WHERE prv IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT prv, CAST(SUM(c) AS BIGINT) AS r FROM cells GROUP BY prv),
        |t AS (SELECT CAST(SUM(c) AS BIGINT) AS tt FROM cells)
        |SELECT cells.prv, cells.nxt, cells.c,
        |  CAST(round(CAST(cells.c AS DOUBLE) / t.tt
        |    * ln(CAST(r.r AS DOUBLE) / cells.c) * 1000000) AS BIGINT)
        |    AS h_contrib_e6
        |FROM cells JOIN r ON r.prv = cells.prv CROSS JOIN t
        |ORDER BY cells.prv, cells.nxt""".stripMargin,
    // exact sixths: with 3 channels every Shapley weight is k/6
    "shapley_attribution" ->
      """WITH p AS (
        |  SELECT user_id, epoch_us(ts) AS ptsu, event_id AS p_id
        |  FROM events WHERE event_type = 'purchase'),
        |t AS (
        |  SELECT user_id, epoch_us(ts) AS ctsu, event_type AS ch
        |  FROM events WHERE event_type IN ('click', 'view', 'signup')),
        |m AS (
        |  SELECT p.p_id,
        |    MAX(CASE WHEN ch = 'click' THEN 1 ELSE 0 END)
        |    + 2 * MAX(CASE WHEN ch = 'view' THEN 1 ELSE 0 END)
        |    + 4 * MAX(CASE WHEN ch = 'signup' THEN 1 ELSE 0 END) AS mask
        |  FROM p JOIN t ON t.user_id = p.user_id
        |    AND t.ctsu < p.ptsu AND t.ctsu > p.ptsu - 604800000000
        |  GROUP BY p.p_id),
        |h AS (SELECT mask, COUNT(*) AS c FROM m GROUP BY mask),
        |co AS (
        |  SELECT g.s, COALESCE(SUM(h.c), 0) AS v
        |  FROM generate_series(0, 7) g(s)
        |  LEFT JOIN h ON (h.mask & g.s) = h.mask
        |  GROUP BY g.s),
        |ch AS (SELECT 1 AS bit, 'click' AS channel
        |  UNION ALL SELECT 2, 'view' UNION ALL SELECT 4, 'signup'),
        |phi AS (
        |  SELECT ch.channel,
        |    CAST(SUM((CASE WHEN a.s = 0 THEN 2 WHEN a.s = 7 - ch.bit THEN 2
        |      ELSE 1 END) * (b.v - a.v)) AS BIGINT) AS phi_x6
        |  FROM ch JOIN co a ON (a.s & ch.bit) = 0
        |  JOIN co b ON b.s = (a.s | ch.bit)
        |  GROUP BY ch.channel)
        |SELECT channel, phi_x6,
        |  CASE WHEN (SELECT v FROM co WHERE s = 7) = 0 THEN CAST(0 AS BIGINT)
        |    ELSE CAST((phi_x6 * 1000000)
        |      // (6 * (SELECT v FROM co WHERE s = 7)) AS BIGINT)
        |  END AS share_e6
        |FROM phi ORDER BY channel""".stripMargin,
    // same running-max-end islands in integer micros
    "interval_coverage" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tsu,
        |    epoch_us(ts) + 1800000000 AS end_us
        |  FROM events),
        |m AS (
        |  SELECT *, max(end_us) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |  FROM e),
        |f AS (SELECT *, CASE WHEN pme IS NULL OR tsu > pme THEN 1 ELSE 0 END AS ni FROM m),
        |g AS (
        |  SELECT *, SUM(ni) OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM f),
        |i AS (SELECT user_id, island, min(tsu) AS s, max(end_us) AS e
        |      FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
        |  CAST(SUM(e - s) AS BIGINT) AS covered_us
        |FROM i GROUP BY user_id ORDER BY user_id""".stripMargin,
    // identical navigation + integer rank derivation; nth/last under the
    // explicit unbounded frame
    "window_navigation" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tsu,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE user_id < 30),
        |win AS (
        |  SELECT user_id, event_id, v,
        |    lag(v, 1) OVER w AS prev_v,
        |    lead(v, 1) OVER w AS next_v,
        |    first_value(v) OVER w AS first_v,
        |    nth_value(v, 2) OVER wall AS second_v,
        |    last_value(v) OVER wall AS last_v,
        |    row_number() OVER w AS rn,
        |    CAST(COUNT(*) OVER wall AS BIGINT) AS n
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id),
        |    wall AS (PARTITION BY user_id ORDER BY tsu, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT user_id, event_id, v, prev_v, next_v, first_v, second_v, last_v,
        |  CASE WHEN n > 1 THEN ((rn - 1) * 1000000) // (n - 1) ELSE 0 END AS pct_rank_e6,
        |  (rn * 1000000) // n AS cume_dist_e6
        |FROM win ORDER BY user_id, event_id""".stripMargin,
    // power sums replayed in HUGEINT; >64-bit values compare as strings
    "value_moments" ->
      """WITH e AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(v) AS BIGINT) AS s1,
        |  CAST(SUM(v * v) AS BIGINT) AS s2,
        |  CAST(CAST(SUM(CAST(v AS HUGEINT) * v * v) AS HUGEINT) AS VARCHAR) AS s3,
        |  CAST(CAST(SUM(CAST(v AS HUGEINT) * v * v * v) AS HUGEINT) AS VARCHAR) AS s4,
        |  CAST(COUNT(*) * SUM(CAST(v AS HUGEINT) * v)
        |    - SUM(CAST(v AS HUGEINT)) * SUM(v) AS VARCHAR) AS var_num
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    // same e6 literal share table; pure integer deviation
    "benford_audit" ->
      """WITH d AS (
        |  SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM orders),
        |dd AS (SELECT digit FROM d WHERE digit >= 1),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dd),
        |obs AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM dd GROUP BY digit),
        |exp AS (SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
        |  (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153),
        |  (9, 45757)) AS t(digit, share_e6))
        |SELECT CAST(exp.digit AS BIGINT) AS digit,
        |  COALESCE(obs.n_obs, 0) AS n_obs,
        |  CAST(n.n * exp.share_e6 AS BIGINT) AS expected_e6,
        |  CAST(abs(COALESCE(obs.n_obs, 0) * 1000000 - n.n * exp.share_e6) AS BIGINT) AS abs_dev_e6
        |FROM exp LEFT JOIN obs ON obs.digit = exp.digit, n
        |ORDER BY digit""".stripMargin,
    // exact distinct replay; est_ok is the sketch's own 3-sigma contract,
    // which must hold for the row to hash-match
    "hll_distinct" ->
      """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
        |  TRUE AS est_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // trailing-7-day exact distinct; the sketch runs lossless so the
    // algebra must reproduce COUNT(DISTINCT) digit-for-digit
    "sliding_distinct" ->
      """WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
        |SELECT d.day,
        |  CAST((SELECT COUNT(DISTINCT CAST(e.ts AS DATE)) FROM events e
        |        WHERE CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day) AS INT) AS n_days,
        |  (SELECT COUNT(DISTINCT e.user_id) FROM events e
        |   WHERE CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day) AS n_users_7d
        |FROM d ORDER BY d.day""".stripMargin,
    // pairwise exact membership algebra over the same value>200 predicate;
    // the dense (bitmap_ops) and roaring (bitmap_ops_sparse) containers
    // share it — both must reproduce the COUNT DISTINCT joins exactly
    "bitmap_ops_sparse" ->
      """WITH m AS (
        |  SELECT DISTINCT event_type, user_id FROM events WHERE value > 200),
        |c AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM m GROUP BY 1),
        |i AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb, CAST(COUNT(*) AS BIGINT) AS n_and
        |  FROM m a JOIN m b ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT ca.event_type AS type_a, cb.event_type AS type_b,
        |  ca.n AS n_a, cb.n AS n_b,
        |  COALESCE(i.n_and, 0) AS n_and,
        |  ca.n + cb.n - COALESCE(i.n_and, 0) AS n_or
        |FROM c ca JOIN c cb ON ca.event_type < cb.event_type
        |LEFT JOIN i ON i.ta = ca.event_type AND i.tb = cb.event_type
        |ORDER BY type_a, type_b""".stripMargin,
    "bitmap_ops" ->
      """WITH m AS (
        |  SELECT DISTINCT event_type, user_id FROM events WHERE value > 200),
        |c AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM m GROUP BY 1),
        |i AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb, CAST(COUNT(*) AS BIGINT) AS n_and
        |  FROM m a JOIN m b ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT ca.event_type AS type_a, cb.event_type AS type_b,
        |  ca.n AS n_a, cb.n AS n_b,
        |  COALESCE(i.n_and, 0) AS n_and,
        |  ca.n + cb.n - COALESCE(i.n_and, 0) AS n_or
        |FROM c ca JOIN c cb ON ca.event_type < cb.event_type
        |LEFT JOIN i ON i.ta = ca.event_type AND i.tb = cb.event_type
        |ORDER BY type_a, type_b""".stripMargin,
    // same integer KS arithmetic: cent-grid counts, cumulative longs,
    // max |F1*N2 - F2*N1|, e6 floor-div export, min-cent argmax tie
    "ks_drift" ->
      """WITH a AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS c,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ib
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |g AS (SELECT c, SUM(ia) AS na, SUM(ib) AS nb FROM a GROUP BY c),
        |t AS (SELECT CAST(SUM(na) AS BIGINT) AS n1, CAST(SUM(nb) AS BIGINT) AS n2 FROM g),
        |cum AS (
        |  SELECT c,
        |    CAST(SUM(na) OVER (ORDER BY c) AS BIGINT) AS fa,
        |    CAST(SUM(nb) OVER (ORDER BY c) AS BIGINT) AS fb
        |  FROM g),
        |d AS (SELECT c, abs(fa * (SELECT n2 FROM t) - fb * (SELECT n1 FROM t)) AS diff FROM cum)
        |SELECT (SELECT n1 FROM t) AS n_click, (SELECT n2 FROM t) AS n_purchase,
        |  CAST((SELECT max(diff) FROM d) AS BIGINT) AS ks_num,
        |  CAST(((SELECT max(diff) FROM d) * 1000000)
        |    // ((SELECT n1 FROM t) * (SELECT n2 FROM t)) AS BIGINT) AS ks_e6,
        |  (SELECT min(c) FROM d WHERE diff = (SELECT max(diff) FROM d)) AS at_cent""".stripMargin,
    // correlated lookup of the last strictly-preceding click within 7d;
    // e2-fixed revenue keeps the sum integer on both engines
    "touch_attribution" ->
      """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |a AS (
        |  SELECT p.ts, p.value,
        |    (SELECT max(c.ts) FROM events c
        |     WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |       AND c.ts < p.ts AND c.ts >= p.ts - INTERVAL 7 DAY) AS ct
        |  FROM p)
        |SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_purchases,
        |  CAST(COUNT(ct) AS BIGINT) AS n_attributed,
        |  CAST(COALESCE(SUM(CASE WHEN ct IS NOT NULL
        |    THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT) AS attr_rev_e2
        |FROM a GROUP BY 1 ORDER BY 1""".stripMargin,
    // the correlated form: each step's min anchored on the previous
    // step's match; boundaries strict-after / inclusive-deadline both
    // engines; naive timestamps make interval adds exact micros
    "sequence_funnel" ->
      """WITH s AS (
        |  SELECT user_id, MIN(ts) AS st FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |v AS (
        |  SELECT s.user_id, s.st, MIN(e.ts) AS vt
        |  FROM s LEFT JOIN events e
        |    ON e.user_id = s.user_id AND e.event_type = 'view'
        |    AND e.ts > s.st AND e.ts <= s.st + INTERVAL 7 DAY
        |  GROUP BY s.user_id, s.st),
        |p AS (
        |  SELECT v.user_id, v.st, v.vt, MIN(e.ts) AS pt
        |  FROM v LEFT JOIN events e
        |    ON e.user_id = v.user_id AND e.event_type = 'purchase'
        |    AND v.vt IS NOT NULL
        |    AND e.ts > v.vt AND e.ts <= v.vt + INTERVAL 3 DAY
        |  GROUP BY v.user_id, v.st, v.vt)
        |SELECT CAST(date_trunc('day', st) AS DATE) AS cohort_day,
        |  COUNT(*) AS n_signup,
        |  CAST(COUNT(vt) AS BIGINT) AS n_viewed_7d,
        |  CAST(COUNT(pt) AS BIGINT) AS n_purchased_3d
        |FROM p GROUP BY 1 ORDER BY cohort_day""".stripMargin,
    // same ±1 sweep; ends-before-starts at equal instants via delta asc
    "max_concurrency" ->
      """WITH v AS (
        |  SELECT ts, date_trunc('day', ts) AS d FROM events
        |  WHERE event_type = 'view'),
        |pts AS (
        |  SELECT d, ts AS pt, 1 AS delta FROM v
        |  UNION ALL
        |  SELECT d, least(ts + INTERVAL 10 MINUTE, d + INTERVAL 1 DAY), -1 FROM v),
        |run AS (
        |  SELECT d, SUM(delta) OVER (PARTITION BY d ORDER BY pt, delta
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        |  FROM pts)
        |SELECT CAST(d AS DATE) AS day, CAST(MAX(c) AS BIGINT) AS max_concurrent
        |FROM run GROUP BY d ORDER BY day""".stripMargin,
    // the oracle recomputes over the FULL table — matching proves the
    // partial-merge algebra, not just the delta arithmetic
    "incremental_agg" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS total_e6,
        |  MIN(value) AS vmin, MAX(value) AS vmax
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // calendar grid from events' own min/max day; DECIMAL sums make the
    // forward-filled total exact; last_value IGNORE NULLS == Spark's
    // last(ignoreNulls) over the same running frame
    "gap_fill" ->
      """WITH obs AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,6))) AS total
        |  FROM events WHERE value > 250 GROUP BY 1, 2),
        |bounds AS (
        |  SELECT CAST(MIN(date_trunc('day', ts)) AS DATE) AS lo,
        |         CAST(MAX(date_trunc('day', ts)) AS DATE) AS hi
        |  FROM events),
        |grid AS (
        |  SELECT t.event_type, CAST(unnest(generate_series(b.lo, b.hi,
        |    INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM (SELECT DISTINCT event_type FROM events) t, bounds b)
        |SELECT g.event_type, g.day,
        |  CAST(COALESCE(o.n, 0) AS BIGINT) AS n,
        |  CAST(last_value(o.total IGNORE NULLS) OVER (
        |    PARTITION BY g.event_type ORDER BY g.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000
        |    AS BIGINT) AS filled_e6
        |FROM grid g LEFT JOIN obs o
        |  ON o.event_type = g.event_type AND o.day = g.day
        |ORDER BY g.event_type, g.day""".stripMargin,
    "event_transitions" ->
      """WITH s AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (
        |  SELECT from_type, to_type, COUNT(*) AS n FROM s
        |  WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
        |t AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from FROM c GROUP BY from_type)
        |SELECT c.from_type, c.to_type, c.n,
        |  CAST(round(CAST(c.n AS DOUBLE) / CAST(t.n_from AS DOUBLE) * 10000) AS BIGINT) AS p_e4
        |FROM c JOIN t ON c.from_type = t.from_type
        |ORDER BY c.from_type, c.to_type""".stripMargin,
    "trend_forecast" ->
      """WITH r AS (
        |  SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |t AS (
        |  SELECT user_id, (17 - rn) AS x, CAST(value AS DECIMAL(18,6)) AS y
        |  FROM r WHERE rn <= 16),
        |a AS (
        |  SELECT user_id, COUNT(*) AS n,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(y * CAST(x AS DECIMAL(4,0))) AS DOUBLE) AS sxy,
        |    CAST(SUM(x * x) AS DOUBLE) AS sxx
        |  FROM t GROUP BY user_id),
        |b AS (
        |  SELECT user_id, n, sx, sy,
        |    CASE WHEN n <= 1 THEN 0.0
        |      ELSE (CAST(n AS DOUBLE) * sxy - sx * sy)
        |           / (CAST(n AS DOUBLE) * sxx - sx * sx) END AS slope
        |  FROM a)
        |SELECT user_id, n AS n_events,
        |  CAST(round(slope * 10000) AS BIGINT) AS slope_e4,
        |  CAST(round(((sy - slope * sx) / CAST(n AS DOUBLE) + slope * 17) * 10000) AS BIGINT) AS forecast_e4
        |FROM b ORDER BY user_id""".stripMargin,
    "cms_counts" ->
      """SELECT user_id, COUNT(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "exp_smooth" ->
      """WITH r AS (
        |  SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |t AS (
        |  SELECT user_id,
        |    CAST(value AS DECIMAL(18,6)) * CAST((CAST(1 AS BIGINT) << (16 - rn)) AS DECIMAL(6,0)) AS contrib,
        |    CAST((CAST(1 AS BIGINT) << (16 - rn)) AS DECIMAL(6,0)) AS wgt
        |  FROM r WHERE rn <= 16)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(round(CAST(SUM(contrib) AS DOUBLE) / CAST(SUM(wgt) AS DOUBLE) * 1e6) AS BIGINT) AS ewma_e6
        |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin,
    "pivot_events" ->
      """SELECT date_trunc('day', ts) AS day,
        |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (WHERE event_type = 'view') AS "view"
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "range_window" ->
      """SELECT event_id, user_id,
        |  COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 300000000 PRECEDING AND 1 PRECEDING) AS n_prev_5min
        |FROM events WHERE user_id < 30 ORDER BY event_id""".stripMargin,
    "json_props" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k, event_type
        |FROM events WHERE event_id < 300 ORDER BY event_id""".stripMargin,
    "events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |  MIN(value) AS min_value, MAX(value) AS max_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "sessionize" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(ts) - lag(epoch_us(ts), 1) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  MAX(gap_us) AS max_gap_us
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "value_histogram" ->
      """SELECT CAST(floor(value / 50) * 50 AS BIGINT) AS bucket_lo, event_type, COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY bucket_lo, event_type""".stripMargin,
    // same incidence/self-join/marginal shape; e6 lift quotient
    "basket_lift" ->
      """WITH s AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
        |           FROM events),
        |n AS (SELECT COUNT(DISTINCT (user_id, day)) AS ns FROM s),
        |t AS (SELECT event_type, COUNT(*) AS c FROM s GROUP BY 1),
        |p AS (SELECT a.event_type AS ta, b.event_type AS tb, COUNT(*) AS cb
        |      FROM s a JOIN s b
        |        ON a.user_id = b.user_id AND a.day = b.day
        |        AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT ta, tb, CAST(cb AS BIGINT) AS cb,
        |  CAST((SELECT ns FROM n) AS BIGINT) AS ns,
        |  CAST((cb * (SELECT ns FROM n) * 1000000) // (x.c * y.c) AS BIGINT)
        |    AS lift_e6
        |FROM p JOIN t x ON x.event_type = p.ta JOIN t y ON y.event_type = p.tb
        |ORDER BY ta, tb""".stripMargin,
    // actives/new from the first-day join; cumulative via correlated sum
    // over the bounded daily frame
    "new_vs_returning" ->
      """WITH ev AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |f AS (SELECT user_id, MIN(day) AS fday FROM ev GROUP BY 1),
        |d AS (SELECT day, COUNT(DISTINCT ev.user_id) AS n_active,
        |    SUM(CASE WHEN fday = day THEN 1 ELSE 0 END) AS n_new
        |  FROM ev JOIN f USING (user_id) GROUP BY 1)
        |SELECT day, CAST(n_active AS BIGINT) AS n_active,
        |  CAST(n_new AS BIGINT) AS n_new,
        |  CAST(n_active - n_new AS BIGINT) AS n_returning,
        |  CAST((SELECT SUM(d2.n_new) FROM d d2 WHERE d2.day <= d.day)
        |    AS BIGINT) AS cum_users
        |FROM d ORDER BY day""".stripMargin,
    // same (rn <= 3) prefix, same '>'-joined path, same tie rule
    "event_paths_top" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path,
        |    COUNT(*) AS plen
        |  FROM r WHERE rn <= 3 GROUP BY user_id)
        |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM p WHERE plen = 3
        |GROUP BY 1 ORDER BY n_users DESC, path ASC LIMIT 15""".stripMargin,
    // doubled-median integers: m2/m4 are exact even at .5 interpolation
    "robust_mad" ->
      """WITH x AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |m AS (
        |  SELECT event_type, CAST(round(2 * quantile_cont(v, 0.5)) AS BIGINT) AS m2
        |  FROM x GROUP BY 1),
        |d AS (
        |  SELECT x.event_type, v, abs(2 * v - m2) AS dev2, m2
        |  FROM x JOIN m USING (event_type)),
        |md AS (
        |  SELECT event_type, CAST(round(2 * quantile_cont(dev2, 0.5)) AS BIGINT) AS m4
        |  FROM d GROUP BY 1)
        |SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(MAX(m2) * 50 AS BIGINT) AS med_e4,
        |  CAST(MAX(m4) * 25 AS BIGINT) AS mad_e4,
        |  CAST(SUM(CASE WHEN 2 * dev2 > 5 * m4 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM d JOIN md USING (event_type) GROUP BY 1 ORDER BY 1""".stripMargin,
    // same lag partition/order, same (n-1)*q interpolation
    "interarrival_quantiles" ->
      """WITH g AS (
        |  SELECT event_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |      PARTITION BY user_id, event_type
        |      ORDER BY epoch_us(ts), event_id) AS gap
        |  FROM events)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
        |  CAST(round(quantile_cont(gap, 0.5)) AS BIGINT) AS med_gap_us,
        |  CAST(round(quantile_cont(gap, 0.9)) AS BIGINT) AS p90_gap_us
        |FROM g WHERE gap IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,
    // five-sums OLS identity; sign exported separately from the
    // nonnegative e6 magnitudes (signed int-div semantics differ)
    "trend_regression" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    SUM(CAST(round(value * 100) AS BIGINT)) AS y
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    SUM(day - DATE '1970-01-01') AS sx, SUM(y) AS sy,
        |    SUM((day - DATE '1970-01-01') * y) AS sxy,
        |    SUM(CAST(day - DATE '1970-01-01' AS BIGINT)
        |      * (day - DATE '1970-01-01')) AS sxx,
        |    SUM(y * y) AS syy
        |  FROM daily GROUP BY 1),
        |f AS (
        |  SELECT event_type, n, n * sxy - sx * sy AS num,
        |    n * sxx - sx * sx AS den, n * syy - sy * sy AS syyd
        |  FROM s WHERE n >= 2)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days,
        |  CAST(sign(num) AS BIGINT) AS slope_sign,
        |  CAST((1000000 * abs(num)) // den AS BIGINT) AS slope_abs_e6,
        |  CAST((1000000 * num * num) // (den * syyd) AS BIGINT) AS r2_e6
        |FROM f ORDER BY event_type""".stripMargin,
    // rank on the EXACT statistic (ties → earliest k, both engines),
    // export only the e6-normalized statistic and integer-div means
    "changepoint_cusum" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    SUM(CAST(round(value * 100) AS BIGINT)) AS s
        |  FROM events GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, day,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS k,
        |    SUM(s) OVER (PARTITION BY event_type ORDER BY day) AS sk,
        |    SUM(s) OVER (PARTITION BY event_type) AS sn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM daily),
        |st AS (
        |  SELECT event_type, day, k, n, sk, sn, abs(n * sk - k * sn) AS stat
        |  FROM cum WHERE k < n)
        |SELECT event_type, day AS change_day, CAST(k AS BIGINT) AS split_k,
        |  CAST((stat * 1000000) // (n * sn) AS BIGINT) AS stat_e6,
        |  CAST(sk // k AS BIGINT) AS left_mean_e2,
        |  CAST((sn - sk) // (n - k) AS BIGINT) AS right_mean_e2
        |FROM st
        |QUALIFY row_number() OVER (PARTITION BY event_type
        |  ORDER BY stat DESC, k ASC) = 1
        |ORDER BY event_type""".stripMargin,
    // open/close via rank-1 rows ordered by (ts, event_id) both ways —
    // the deterministic-tie-break twin of Spark's min_by/max_by struct
    "ohlc_bars" ->
      """WITH v AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS v,
        |    row_number() OVER (PARTITION BY CAST(ts AS DATE), event_type
        |      ORDER BY ts, event_id) AS ra,
        |    row_number() OVER (PARTITION BY CAST(ts AS DATE), event_type
        |      ORDER BY ts DESC, event_id DESC) AS rd
        |  FROM events)
        |SELECT day, event_type,
        |  MAX(CASE WHEN ra = 1 THEN v END) AS open_e2,
        |  MAX(v) AS high_e2, MIN(v) AS low_e2,
        |  MAX(CASE WHEN rd = 1 THEN v END) AS close_e2,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM v GROUP BY day, event_type ORDER BY day, event_type""".stripMargin,
    "cohort_retention" ->
      """WITH c AS (
        |  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        |  FROM events GROUP BY user_id)
        |SELECT c.cohort_day,
        |  CAST(datediff('day', c.cohort_day, CAST(e.ts AS DATE)) AS INT) AS day_offset,
        |  COUNT(DISTINCT e.user_id) AS n_active
        |FROM events e JOIN c ON e.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,
    "funnel_conversion" ->
      """WITH s AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS signup_us
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id)
        |SELECT CAST(make_timestamp(signup_us) AS DATE) AS signup_day,
        |  COUNT(*) AS n_signups,
        |  CAST(SUM(CASE WHEN EXISTS (
        |    SELECT 1 FROM events p
        |    WHERE p.user_id = s.user_id AND p.event_type = 'purchase'
        |      AND epoch_us(p.ts) BETWEEN s.signup_us AND s.signup_us + 86400000000)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_converted_24h
        |FROM s GROUP BY 1 ORDER BY signup_day""".stripMargin,
    "sliding_window" ->
      """WITH assigned AS (
        |  SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
        |                 date_trunc('hour', ts)]) AS window_start,
        |    event_type, value
        |  FROM events)
        |SELECT window_start, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM assigned GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    // each purchase hits exactly one history version; revenue e2
    "scd2_temporal_join" ->
      """WITH e AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_attr
        |  FROM events WHERE user_id < 50 AND event_type <> 'purchase'),
        |c AS (
        |  SELECT user_id, event_type AS attr, ts, event_id FROM e
        |  WHERE prev_attr IS NULL OR prev_attr <> event_type),
        |dim AS (
        |  SELECT user_id, attr, epoch_us(ts) AS f,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
        |  FROM c),
        |facts AS (
        |  SELECT user_id, epoch_us(ts) AS ets, CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE user_id < 50 AND event_type = 'purchase')
        |SELECT d.attr, COUNT(*) AS n_purchases, CAST(SUM(fc.v) AS BIGINT) AS rev_e2
        |FROM facts fc JOIN dim d
        |  ON d.user_id = fc.user_id AND fc.ets >= d.f
        | AND (d.t IS NULL OR fc.ets < d.t)
        |GROUP BY d.attr ORDER BY d.attr""".stripMargin,
    "scd2_build" ->
      """WITH e AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_attr
        |  FROM events WHERE user_id < 50),
        |c AS (
        |  SELECT user_id, event_type AS attr, ts, event_id FROM e
        |  WHERE prev_attr IS NULL OR prev_attr <> event_type)
        |SELECT user_id, attr, epoch_us(ts) AS valid_from_us,
        |  lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_us,
        |  CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS INT) AS is_current
        |FROM c ORDER BY user_id, valid_from_us, attr, valid_to_us""".stripMargin,
    "kmv_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // gap EXACTLY equal to 30 min starts a new session (>=): Spark merges
    // session windows only when they strictly overlap
    "session_window_agg" ->
      """WITH o AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              >= 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events WHERE user_id < 30),
        |s AS (
        |  SELECT user_id, us,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM o)
        |SELECT user_id, MIN(us) AS session_start_us,
        |  MAX(us) + 1800000000 AS session_end_us, COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sess ORDER BY user_id, session_start_us""".stripMargin,
    // melt(pivot(x)) minus zero cells == the plain long-form counts over
    // the pivoted type set
    "unpivot_events" ->
      """SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS n
        |FROM events
        |WHERE event_type IN ('click', 'error', 'purchase', 'signup', 'view')
        |GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "user_paths" ->
      """WITH p AS (
        |  SELECT user_id,
        |    array_to_string(list_slice(
        |      list(event_type ORDER BY ts, event_id), 1, 8), '>') AS path
        |  FROM events GROUP BY user_id)
        |SELECT path, COUNT(*) AS n_users
        |FROM p GROUP BY path ORDER BY n_users DESC, path""".stripMargin,
    // (19,6): int128-backed so DuckDB's x*x doesn't overflow int64
    "anomaly_zscore" ->
      """WITH s AS (
        |  SELECT user_id, CAST(value AS DECIMAL(19,6)) AS xd,
        |    COUNT(CAST(value AS DECIMAL(19,6))) OVER w AS n,
        |    SUM(CAST(value AS DECIMAL(19,6))) OVER w AS sx,
        |    SUM(CAST(CAST(value AS DECIMAL(19,6)) * CAST(value AS DECIMAL(19,6)) AS DECIMAL(38,12))) OVER w AS sxx
        |  FROM events WHERE user_id < 50
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |v AS (
        |  SELECT user_id, xd, n, sx,
        |    CASE WHEN n >= 5 THEN
        |      (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
        |    ELSE -1.0 END AS var_s
        |  FROM s),
        |z AS (
        |  SELECT user_id,
        |    CASE WHEN var_s > 0.0
        |      AND abs(CAST(xd AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) >
        |          sqrt(var_s) * 2.0
        |      THEN 1 ELSE 0 END AS is_anomaly
        |  FROM v)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(is_anomaly) AS BIGINT) AS n_anomalies
        |FROM z GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
