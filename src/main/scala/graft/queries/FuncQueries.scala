package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Function-family breadth (SURVEY.md §2.2 absence list): CUBE grouping
  * sets with grouping_id, exact interpolated percentiles, the date/time
  * scalar family, and array functions over both word lists and embedding
  * vectors. All oracle-checked; e4 fixed-point emission wherever
  * interpolation or float→double widening could differ in low bits
  * across engines.
  */
object FuncQueries {

  private def dsum(c: Column): Column = sum(c.cast("decimal(18,6)")).cast("double")
  private def e4(c: Column): Column = round(c.cast("double") * 10000).cast("long")

  /** CUBE over (status, priority): all four grouping sets in one pass,
    * disambiguated by grouping_id — one shuffle, partial aggregation per
    * set. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("total"))
      .select(col("gid"), col("o_orderstatus"), col("o_orderpriority"), col("n"), col("total"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** Explicit GROUPING SETS — the asymmetric set list cube/rollup cannot
    * express (both single-column margins, no grand total, no pair cell).
    * Plans as the same single-shuffle Expand as cube: each input row fans
    * to one row per set, partial-aggregated before the shuffle. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_gsets")
    spark.sql(
      """SELECT grouping_id() AS gid, o_orderstatus, o_orderpriority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders_gsets
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST,
        |  o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** ntile quartiles per segment: equal-frequency bucketing for
    * curriculum tiers / AB-split strata. Total window order ((bal, key))
    * so the bucket boundaries are engine-independent; rolled up so the
    * output is the bucket profile, not a row per customer.
    *
    * Boundaries-then-assign, NOT `ntile(4) OVER (PARTITION BY segment)`:
    * c_mktsegment has 5 values, so the window form funnels each
    * segment's ENTIRE customer population through one reducer's sort —
    * the per-partition volume grows linearly with the table. Here pass 1
    * computes per-segment quartile boundary keys with a partial-
    * aggregated sketch ([[graft.core.NtileBoundaries]]: exact below its
    * cap, hence the unchanged DuckDB ntile oracle; KLL-bounded state
    * above it), and pass 2 assigns buckets map-side from the broadcast
    * 3-key arrays — no per-segment sort anywhere at any scale. The sort
    * key packs (acctbal, custkey) into one long (two exact decimals ×
    * 2^20 + key; custkey < 2^20 holds through sf1 and the aggregator
    * rejects overflow), preserving the window version's total order. */
  def ntileBuckets(spark: SparkSession, dir: String): DataFrame = {
    val bounds = udaf(new graft.core.NtileBoundaries(4, 8192),
      org.apache.spark.sql.Encoders.scalaLong)
    val keyed = Tables.customer(spark, dir).withColumn("okey",
      round(col("c_acctbal") * 100).cast("long") * lit(1L << 20) + col("c_custkey"))
    val bs = keyed.groupBy(col("c_mktsegment")).agg(bounds(col("okey")).as("bs"))
    keyed.join(broadcast(bs), "c_mktsegment")
      .withColumn("quartile",
        size(filter(col("bs"), b => b < col("okey"))) + lit(1))
      .groupBy(col("c_mktsegment"), col("quartile"))
      .agg(count(lit(1)).as("n"),
        dsum(col("c_acctbal")).as("total_bal"),
        min(col("c_custkey")).as("first_key"))
      .orderBy(col("c_mktsegment"), col("quartile"))
  }

  /** Pearson correlation computed from EXACT decimal component sums
    * (n, Σx, Σy, Σxy, Σx², Σy²) with the float arithmetic confined to one
    * final closed-form expression — the built-in `corr` accumulates in
    * doubles whose order varies with partitioning, so its low bits are
    * not reproducible; this form is, at any parallelism, and it is the
    * same single partial-aggregated pass. */
  def spendCorr(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,6)")).as("spend"))
    val joined = Tables.customer(spark, dir)
      .join(o, col("c_custkey") === col("o_custkey"))
    // operand widths chosen so every product fits decimal exactly in BOTH
    // engines (DuckDB multiplies at p1+p2 and refuses to widen past 38):
    // x ≤ 9999.99 → (12,6); y ≤ ~1e7 → (18,6); products ≤ (30..36, 12)
    val x = col("c_acctbal").cast("decimal(12,6)")
    val y = col("spend").cast("decimal(18,6)")
    // scale-12 products are the EXACT width of a (·,6)×(·,6) multiply, so
    // no engine-specific decimal rounding ever fires; the closed form
    // then runs wholly in double, where every op is correctly-rounded
    // IEEE and the op order is fixed by the expression
    val comps = joined.agg(
      count(lit(1)).as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum((x * y).cast("decimal(38,12)")).as("sxy"),
      sum((x * x).cast("decimal(38,12)")).as("sxx"),
      sum((y * y).cast("decimal(38,12)")).as("syy"))
    def d(c: Column) = c.cast("double")
    val nD = d(col("n"))
    val dxx = nD * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val dyy = nD * d(col("syy")) - d(col("sy")) * d(col("sy"))
    // zero-variance input makes r undefined (0/0): emit NULL explicitly —
    // letting NaN flow differs per engine (Spark casts NaN→0, DuckDB errors)
    comps.select(col("n"),
      when(dxx > 0 && dyy > 0,
        round((nD * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
          sqrt(dxx) / sqrt(dyy) * 10000).cast("long"))
        .as("corr_e4"))
  }

  /** Exact (interpolating) percentiles per group — Spark's `percentile`
    * sorts within the group; the single-pass mergeable swap-in at scale
    * is [[graft.core.KllQuantile]] (see quantileSketch below, the SAME
    * numbers from O(k·log n) state per group instead of a group sort).
    * Emitted e4: the linear interpolation arithmetic is not guaranteed
    * bit-identical across engines. */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(expr("percentile(o_totalprice, array(0.25D, 0.5D, 0.75D))").as("ps"),
        min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"))
      .select(col("o_orderstatus"),
        e4(element_at(col("ps"), 1)).as("p25_e4"),
        e4(element_at(col("ps"), 2)).as("p50_e4"),
        e4(element_at(col("ps"), 3)).as("p75_e4"),
        e4(col("mn")).as("min_e4"),
        e4(col("mx")).as("max_e4"))
      .orderBy(col("o_orderstatus"))

  /** Per-nation account-balance quartiles through the mergeable KLL
    * sketch at a LOSSLESS parameterization (k=4096 ≥ the largest nation's
    * customer count at every fixture scale ⇒ the buffer never compacts
    * and finish() is the exact quantile_cont interpolation — hence the
    * DuckDB oracle). At 100 TB the same plan runs with k ≪ group size:
    * one partial-aggregated pass with O(k·log n) state per group where
    * `percentile` needs each group fully sorted on one reducer —
    * QuantileSketchSpec pins that regime's rank-error envelope. */
  def quantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val kll = udaf(
      new graft.core.KllQuantile(4096, Seq(0.25, 0.5, 0.75)),
      org.apache.spark.sql.Encoders.scalaDouble)
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"))
      .agg(kll(col("c_acctbal").cast("double")).as("ps"),
        count(lit(1)).as("n"))
      .select(col("c_nationkey"),
        e4(element_at(col("ps"), 1)).as("p25_e4"),
        e4(element_at(col("ps"), 2)).as("p50_e4"),
        e4(element_at(col("ps"), 3)).as("p75_e4"),
        col("n"))
      .orderBy(col("c_nationkey"))
  }

  /** Date/time scalar family in one pass over orders. */
  def dateMath(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") < 300)
      .select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("order_date"),
        quarter(col("o_orderdate")).as("qtr"),
        dayofweek(col("o_orderdate")).as("dow"),
        last_day(col("o_orderdate")).as("month_end"),
        date_add(to_date(col("o_orderdate")), 30).as("plus_30d"),
        add_months(to_date(col("o_orderdate")), 2).as("plus_2m"),
        datediff(to_date(lit("1998-01-01")), to_date(col("o_orderdate"))).as("days_to_98"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        // o_orderdate is TIMESTAMP_NTZ; the UTC session tz makes the cast
        // a pure reinterpretation, matching DuckDB's epoch_us
        unix_micros(col("o_orderdate").cast("timestamp")).as("epoch_us"))
      .orderBy(col("o_orderkey"))

  /** Array functions over word lists (documents) and embedding vectors
    * (same-keyed join, broadcast-eligible): size, distinct, contains,
    * element access, min/max over array<float>. */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    val words = split(col("text"), " ")
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 300)
      .select(col("doc_id"),
        size(words).as("n_words"),
        size(array_distinct(words)).as("n_distinct_words"),
        array_contains(words, "table").cast("int").as("has_table"),
        element_at(words, 1).as("first_word"))
    val emb = Tables.embeddings(spark, dir).filter(col("vec_id") < 300)
      .select(col("vec_id"),
        size(col("embedding")).as("n_dim"),
        e4(array_min(col("embedding"))).as("vmin_e4"),
        e4(array_max(col("embedding"))).as("vmax_e4"),
        e4(element_at(col("embedding"), 1)).as("v0_e4"))
    docs.join(emb, col("doc_id") === col("vec_id"))
      .drop("vec_id")
      .orderBy(col("doc_id"))
  }

  /** NOT IN with nullable subquery values — SQL's tri-state trap, planned
    * by Spark as a null-aware anti join: against the clean set the anti
    * join filters normally; one NULL in the set makes NOT IN unknowable
    * for every row, so the poisoned variant must return a zero count.
    * The NULL is planted on the MINIMUM negative-balance key, so it
    * exists at every scale factor (a modulo plant was vacuous at
    * sf0.001). Declared through spark.sql (the DataFrame API has no
    * NOT IN). */
  def notInAntijoin(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    Tables.customer(spark, dir).createOrReplaceTempView("customer_v")
    spark.sql(
      """WITH keys AS (
        |  SELECT CASE WHEN c_custkey = (SELECT MIN(c_custkey) FROM customer_v WHERE c_acctbal < 0)
        |         THEN NULL ELSE c_custkey END AS k
        |  FROM customer_v WHERE c_acctbal < 0),
        |clean AS (
        |  SELECT 'clean_set' AS variant, COUNT(*) AS n FROM orders_v
        |  WHERE o_custkey NOT IN (SELECT k FROM keys WHERE k IS NOT NULL)),
        |poisoned AS (
        |  SELECT 'null_poisoned' AS variant, COUNT(*) AS n FROM orders_v
        |  WHERE o_custkey NOT IN (SELECT k FROM keys))
        |SELECT variant, n FROM clean UNION ALL SELECT variant, n FROM poisoned
        |ORDER BY variant""".stripMargin)
  }

  /** Rank-family window breadth: dense_rank / percent_rank / cume_dist /
    * first / last / nth_value / lead over each customer's orders by
    * price. percent_rank and cume_dist are rational ranks — identical
    * integer ratios finished in one double op on both engines, e4
    * rounded; the (price, orderkey) order is total so every rank and
    * positional value is deterministic. Value-frame functions run over
    * the explicit full-partition ROWS frame (engines default that frame
    * differently). Per-customer partitions grow with the customer count,
    * not the table — the scale-safe window key. */
  def windowRanks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir).filter(col("o_custkey") < 80)
      .select(col("o_custkey"), col("o_orderkey"),
        dense_rank().over(w).as("drank"),
        round(percent_rank().over(w) * 10000).cast("long").as("prank_e4"),
        round(cume_dist().over(w) * 10000).cast("long").as("cdist_e4"),
        first(col("o_orderkey")).over(full).as("cheapest_order"),
        last(col("o_orderkey")).over(full).as("priciest_order"),
        nth_value(col("o_orderkey"), 2).over(full).as("second_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "window_ranks" -> (windowRanks _),
    "cube_agg" -> (cubeAgg _),
    "grouping_sets" -> (groupingSets _),
    "ntile_buckets" -> (ntileBuckets _),
    "spend_corr" -> (spendCorr _),
    "percentiles" -> (percentiles _),
    "quantile_sketch" -> (quantileSketch _),
    "date_math" -> (dateMath _),
    "array_funcs" -> (arrayFuncs _),
    "not_in_antijoin" -> (notInAntijoin _)
  )

  val oracles: Map[String, String] = Map(
    "window_ranks" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(dense_rank() OVER w AS INT) AS drank,
        |  CAST(round(percent_rank() OVER w * 10000) AS BIGINT) AS prank_e4,
        |  CAST(round(cume_dist() OVER w * 10000) AS BIGINT) AS cdist_e4,
        |  first_value(o_orderkey) OVER wf AS cheapest_order,
        |  last_value(o_orderkey) OVER wf AS priciest_order,
        |  nth_value(o_orderkey, 2) OVER wf AS second_order,
        |  lead(o_orderkey, 1) OVER w AS next_order
        |FROM orders WHERE o_custkey < 80
        |WINDOW
        |  w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "cube_agg" ->
      """SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
        |  o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "grouping_sets" ->
      """SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
        |  o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "ntile_buckets" ->
      """WITH q AS (
        |  SELECT c_mktsegment, c_acctbal, c_custkey,
        |    ntile(4) OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal, c_custkey) AS quartile
        |  FROM customer)
        |SELECT c_mktsegment, CAST(quartile AS INT) AS quartile, COUNT(*) AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal,
        |  MIN(c_custkey) AS first_key
        |FROM q GROUP BY 1, 2 ORDER BY c_mktsegment, quartile""".stripMargin,
    "spend_corr" ->
      """WITH o AS (
        |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS spend
        |  FROM orders GROUP BY o_custkey),
        |j AS (
        |  -- (19,6): int128-backed so DuckDB's multiply doesn't overflow
        |  -- int64, and 19+19 = 38 stays inside its width cap; the values
        |  -- are identical to the engine's (12,6)/(18,6) operands
        |  SELECT CAST(c_acctbal AS DECIMAL(19,6)) AS x,
        |    CAST(spend AS DECIMAL(19,6)) AS y
        |  FROM customer JOIN o ON c_custkey = o_custkey),
        |c AS (
        |  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(CAST(x * y AS DECIMAL(38,12))) AS sxy,
        |    SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx,
        |    SUM(CAST(y * y AS DECIMAL(38,12))) AS syy
        |  FROM j),
        |d AS (
        |  SELECT n,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS dxx,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS dyy,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS dxy
        |  FROM c)
        |SELECT n,
        |  CASE WHEN dxx > 0 AND dyy > 0
        |    THEN CAST(round(dxy / sqrt(dxx) / sqrt(dyy) * 10000) AS BIGINT)
        |    ELSE NULL END AS corr_e4
        |FROM d""".stripMargin,
    "percentiles" ->
      """SELECT o_orderstatus,
        |  CAST(round(quantile_cont(o_totalprice, 0.25) * 10000) AS BIGINT) AS p25_e4,
        |  CAST(round(quantile_cont(o_totalprice, 0.5) * 10000) AS BIGINT) AS p50_e4,
        |  CAST(round(quantile_cont(o_totalprice, 0.75) * 10000) AS BIGINT) AS p75_e4,
        |  CAST(round(min(o_totalprice) * 10000) AS BIGINT) AS min_e4,
        |  CAST(round(max(o_totalprice) * 10000) AS BIGINT) AS max_e4
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "quantile_sketch" ->
      """SELECT c_nationkey,
        |  CAST(round(quantile_cont(c_acctbal, 0.25) * 10000) AS BIGINT) AS p25_e4,
        |  CAST(round(quantile_cont(c_acctbal, 0.5) * 10000) AS BIGINT) AS p50_e4,
        |  CAST(round(quantile_cont(c_acctbal, 0.75) * 10000) AS BIGINT) AS p75_e4,
        |  COUNT(*) AS n
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "date_math" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(quarter(o_orderdate) AS INT) AS qtr,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |  last_day(o_orderdate) AS month_end,
        |  CAST(o_orderdate AS DATE) + 30 AS plus_30d,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus_2m,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INT) AS days_to_98,
        |  strftime(o_orderdate, '%Y-%m') AS ym,
        |  epoch_us(o_orderdate) AS epoch_us
        |FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""".stripMargin,
    "array_funcs" ->
      """SELECT d.doc_id,
        |  CAST(len(string_split(d.text, ' ')) AS INT) AS n_words,
        |  CAST(len(list_distinct(string_split(d.text, ' '))) AS INT) AS n_distinct_words,
        |  CAST(list_contains(string_split(d.text, ' '), 'table') AS INT) AS has_table,
        |  string_split(d.text, ' ')[1] AS first_word,
        |  CAST(len(e.embedding) AS INT) AS n_dim,
        |  CAST(round(CAST(list_min(e.embedding) AS DOUBLE) * 10000) AS BIGINT) AS vmin_e4,
        |  CAST(round(CAST(list_max(e.embedding) AS DOUBLE) * 10000) AS BIGINT) AS vmax_e4,
        |  CAST(round(CAST(e.embedding[1] AS DOUBLE) * 10000) AS BIGINT) AS v0_e4
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |WHERE d.doc_id < 300 ORDER BY d.doc_id""".stripMargin,
    "not_in_antijoin" ->
      """WITH keys AS (
        |  SELECT CASE WHEN c_custkey = (SELECT MIN(c_custkey) FROM customer WHERE c_acctbal < 0)
        |         THEN NULL ELSE c_custkey END AS k
        |  FROM customer WHERE c_acctbal < 0),
        |clean AS (
        |  SELECT 'clean_set' AS variant, COUNT(*) AS n FROM orders
        |  WHERE o_custkey NOT IN (SELECT k FROM keys WHERE k IS NOT NULL)),
        |poisoned AS (
        |  SELECT 'null_poisoned' AS variant, COUNT(*) AS n FROM orders
        |  WHERE o_custkey NOT IN (SELECT k FROM keys))
        |SELECT variant, n FROM clean UNION ALL SELECT variant, n FROM poisoned
        |ORDER BY variant""".stripMargin
  )
}
