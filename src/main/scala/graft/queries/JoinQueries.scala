package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Join-shape coverage beyond equi-joins (SURVEY.md §2.2 lists every join
  * family as absent from the reference): as-of join, inequality/range
  * join, and Delta-style MERGE semantics — each expressed in the form that
  * survives 100 TB, with a DuckDB oracle.
  */
object JoinQueries {

  /** As-of join: for every purchase event, the most recent signup event of
    * the same user at-or-before the purchase timestamp.
    *
    * Spark has no ASOF JOIN operator; the naive range join explodes to
    * |purchases| × |signups| per user before filtering. This is the
    * scalable composition: union both sides tagged, ONE shuffle on
    * user_id, and a running `last(..., ignoreNulls)` window carries the
    * latest signup forward onto each purchase row — O(n log n) in the
    * partition, no pair blow-up. Tie-break: right rows sort before left
    * rows at equal ts (<= semantics), and among simultaneous signups the
    * larger event_id wins (deterministic).
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("is_left"),
        lit(null).cast("long").as("r_id"), lit(null).cast("timestamp").as("r_ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("is_left"),
        col("event_id").as("r_id"), col("ts").as("r_ts"))
    // right rows first at equal ts; event_id ascending so the LAST
    // simultaneous signup (max event_id) is what `last` picks up
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("is_left").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionAll(signups)
      .withColumn("asof_id", last(col("r_id"), ignoreNulls = true).over(w))
      .withColumn("asof_ts", last(col("r_ts"), ignoreNulls = true).over(w))
      .filter(col("is_left") === 1)
      .select(col("event_id"), col("user_id"),
        col("asof_id"),
        (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("micros_since_signup"))
      .orderBy(col("event_id"))
  }

  /** Inequality (range) join: parts priced into hand-set, non-uniform
    * price bands. The band table is tiny and broadcast, so the plan is a
    * BroadcastNestedLoopJoin — the correct physical choice for a
    * small-dim × huge-fact inequality join at any scale (the fact side
    * streams, never shuffles). Were the band list itself large, the
    * rewrite is bucketize-both-sides + equi-join on bucket. */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      ("b1_budget", 900.0, 920.0),
      ("b2_mid", 920.0, 960.0),
      ("b3_upper", 960.0, 985.0),
      ("b4_premium", 985.0, 1000.0)
    ).toDF("band", "lo", "hi")
    Tables.part(spark, dir)
      .join(broadcast(bands),
        col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("n_parts"),
        sum(col("p_retailprice").cast("decimal(18,6)")).cast("double").as("total_price"))
      .orderBy(col("band"))
  }

  /** Delta-style MERGE (upsert) semantics via one full-outer join — the
    * engine-level form of "MERGE INTO target USING updates": matched rows
    * take the update, unmatched-source rows insert, unmatched-target rows
    * survive. The store-mutation upgrade path (SURVEY.md §7.4 risk 6)
    * would push exactly this plan into a table format's commit protocol;
    * the join itself shuffles both sides on the merge key once.
    *
    * Updates are fabricated deterministically from the customer table:
    * every 5th key raises its balance by 100, every key ≡ 3 (mod 7)
    * inserts a shadow customer under key+1_000_000. */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val target = cust.select(col("c_custkey"), col("c_acctbal"))
    val updates = cust.filter(col("c_custkey") % 5 === 0)
      .select(col("c_custkey").as("u_key"), (col("c_acctbal") + lit(100.0)).as("new_bal"))
      .unionAll(
        cust.filter(col("c_custkey") % 7 === 3)
          .select((col("c_custkey") + lit(1000000L)).as("u_key"), lit(500.0).as("new_bal")))
    target.join(updates, col("c_custkey") === col("u_key"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("u_key")).as("key"),
        coalesce(col("new_bal"), col("c_acctbal")).as("balance"),
        when(col("c_custkey").isNotNull && col("u_key").isNotNull, "update")
          .when(col("c_custkey").isNull, "insert")
          .otherwise("keep").as("action"))
      .orderBy(col("key"))
  }

  /** Bloom-pruned semi join: orders of high-balance customers. The bloom
    * probe drops most fact rows at the scan (codegen'd, before any
    * shuffle); the exact semi join then removes the false positives, so
    * the result — and the DuckDB oracle — is a plain IN-subquery.
    * Aggregated per priority so the output stays small and sums stay
    * decimal-exact. */
  def bloomSemijoin(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.customer(spark, dir).filter(col("c_acctbal") > 9000)
    val pruned = graft.scale.BloomJoin.prunedSemiJoin(
      Tables.orders(spark, dir), dim, "o_custkey", "c_custkey",
      expectedItems = 1L << 16)
    pruned.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,6)")).cast("double").as("total_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** Bucketized interval-overlap self-join — the large×large rewrite the
    * range_join Scaladoc promises: when NEITHER interval side fits a
    * broadcast, explode each interval into the hour buckets it covers and
    * equi-join on (day, bucket) — overlapping intervals always share the
    * bucket of any common instant, so the equi-join is a complete
    * candidate generator and the exact overlap predicate rides along as a
    * join residual. Pairs counted after a distinct (an interval pair can
    * meet in several buckets). Shuffle is bucket-keyed — never the
    * all-pairs product a naive inequality join plans. Here: per day, how
    * many user pairs had overlapping [first, last]-event activity spans. */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600000000L
    val iv = Tables.events(spark, dir).filter(col("user_id") < 40)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(min(unix_micros(col("ts"))).as("lo"), max(unix_micros(col("ts"))).as("hi"))
    val b = iv.withColumn("bucket",
      explode(sequence(floor(col("lo") / hourUs), floor(col("hi") / hourUs))))
    b.as("a")
      .join(b.as("b"),
        col("a.day") === col("b.day") && col("a.bucket") === col("b.bucket") &&
          col("a.user_id") < col("b.user_id") &&
          col("a.lo") <= col("b.hi") && col("b.lo") <= col("a.hi"))
      .select(col("a.day").as("day"),
        col("a.user_id").as("u1"), col("b.user_id").as("u2"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("day"))
  }

  /** Record linkage (entity resolution): a dirty registry — customer
    * names through an OCR-style corruption (confusables 0→O, 1→I, 8→B
    * plus a non-invertible smudge 9→g) — matched back to the clean
    * registry as MULTI-KEY BLOCK → SCORE → BEST-MATCH, the production
    * linkage shape. Two redundant blocking keys, each a per-block
    * equi-join, unioned then deduped: K1 = (nation, segment) attribute
    * key, K2 = confusable-folded name suffix (last 4 chars) — a record
    * missed by one key family is usually caught by the other, which is
    * why real pipelines (Fellegi-Sunter practice) never block on a
    * single key. Scoring is OCR-aware: primary = Levenshtein on
    * confusable-FOLDED names (O/I/B fold back to 0/1/8 on both sides —
    * only the unfoldable smudges cost an edit), tie-broken by raw
    * Levenshtein then candidate id, all codegen'd built-ins, no UDF.
    * Best-match-per-record is one row_number window. `hit` marks
    * whether the true identity won — the 9→g smudge keeps it
    * non-vacuous (a same-block neighbor can still out-score a truth
    * whose name is 9-heavy): 146/150 at sf0.01 vs 136/150 for the
    * round-8 single-key unfolded form. */
  def entityMatch(spark: SparkSession, dir: String): DataFrame =
    entityBestLinks(spark, dir)
      .select(col("d_id"), col("m_id"), col("flev").cast("long").as("flev"),
        col("lev").cast("long").as("lev"),
        (col("d_id") === col("m_id")).as("hit"))
      .orderBy(col("d_id"))

  /** Best match per dirty record (`d_id`, `m_id`, `flev`, `lev`) — the
    * linkage core of [[entityMatch]], shared by [[goldenRecord]]'s
    * survivorship stage. */
  private def entityBestLinks(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val dirty = cust.filter(col("c_custkey") % 10 === 3)
      .select(col("c_custkey").as("d_id"),
        translate(col("c_name"), "0189", "OIBg").as("dirty_name"),
        col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"))
    val k1 = dirty
      .join(cust, col("c_nationkey") === col("nk") &&
        col("c_mktsegment") === col("seg"))
      .select(col("d_id"), col("c_custkey").as("m_id"))
    val k2 = dirty
      .join(cust, substring(translate(col("dirty_name"), "OIB", "018"), -4, 4)
        === substring(col("c_name"), -4, 4))
      .select(col("d_id"), col("c_custkey").as("m_id"))
    k1.unionByName(k2).distinct()
      // r17: explicit partition count for the scoring stage — AQE sizes
      // the post-distinct stage by its ~MB of int pairs and ran the
      // Levenshtein pass (2 edit distances × ~300k candidate pairs at
      // sf0.1) in ONE task (measured 1.2 s of a 1.75 s query). The key
      // is d_id, which the best-match window below partitions by, so
      // this exchange REPLACES the window's — no extra shuffle.
      .repartition(spark.sparkContext.defaultParallelism, col("d_id"))
      .join(dirty.select(col("d_id"), col("dirty_name")), "d_id")
      .join(cust.select(col("c_custkey").as("m_id"), col("c_name")), "m_id")
      .select(col("d_id"), col("m_id"),
        levenshtein(translate(col("dirty_name"), "OIB", "018"), col("c_name")).as("flev"),
        levenshtein(col("dirty_name"), col("c_name")).as("lev"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("d_id")).orderBy(col("flev"), col("lev"), col("m_id"))))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter 1969,
    * JASA) over the [[entityMatch]] candidate pairs — the SCORING MODEL
    * production linkage runs where entity_match's Levenshtein rank is the
    * heuristic: each pair gets a comparison vector over four fields
    * (folded-name exact, nation, segment, 10-currency balance band), per
    * field m = P(agree|match) and u = P(agree|non-match) are estimated
    * from the candidates themselves (ground truth is known by
    * construction: the dirty registry is derived from the master, so
    * d_id = m_id labels the true pairs — in production this is the
    * clerical-review sample), Laplace-smoothed so no log sees 0, and the
    * pair weight is Σ log(m/u) over agreeing fields + Σ log((1−m)/(1−u))
    * over disagreeing ones. Output: the weight-band histogram
    * (band = ⌊w⌋, pair/true/false counts) with the link / possible /
    * non-link decision per band — the reviewable artifact an ER pipeline
    * thresholds.
    *
    * Exactness: agreements and m/u numerators/denominators are pure
    * integer counts; each of the 8 log-odds is ln of one fixed double
    * ratio chain, e6-quantized ONCE in the 1-row model frame (the DSIR
    * per-word-ln precedent — ≤ 8 distinct libm calls on the whole gate,
    * not one per row), so every pair weight is an integer SUM of
    * broadcast longs; the band floors an exact small double. Scale
    * shape: candidate generation is the same dual-blocked equi-join
    * entity_match bounds; the model is ONE single-row aggregate over it
    * (in production, over a sample); application is map-side against the
    * broadcast 1-row model. */
  def fsLinkage(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val dirty = cust.filter(col("c_custkey") % 10 === 3)
      .select(col("c_custkey").as("d_id"),
        translate(col("c_name"), "0189", "OIBg").as("dn"),
        col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("dbal"))
    val master = cust.select(col("c_custkey").as("m_id"), col("c_name"),
      col("c_nationkey").as("mnk"), col("c_mktsegment").as("mseg"),
      expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("mbal"))
    val k1 = dirty.join(master,
        col("mnk") === col("nk") && col("mseg") === col("seg"))
      .select(col("d_id"), col("m_id"))
    val k2 = dirty.join(master,
        substring(translate(col("dn"), "OIB", "018"), -4, 4)
          === substring(col("c_name"), -4, 4))
      .select(col("d_id"), col("m_id"))
    // comparison vectors; reused by the model aggregate AND the apply
    // pass — cache so the blocked join runs once
    val pairs = k1.unionByName(k2).distinct()
      // r17: same scoring-stage parallelism guard as entityBestLinks
      .repartition(spark.sparkContext.defaultParallelism, col("d_id"))
      .join(dirty, "d_id").join(master, "m_id")
      .select(col("d_id"), col("m_id"),
        (levenshtein(translate(col("dn"), "OIB", "018"), col("c_name")) === 0)
          .cast("long").as("a_name"),
        (col("nk") === col("mnk")).cast("long").as("a_nation"),
        (col("seg") === col("mseg")).cast("long").as("a_seg"),
        (expr("(dbal + 100000) div 1000") === expr("(mbal + 100000) div 1000"))
          .cast("long").as("a_band"),
        (col("d_id") === col("m_id")).cast("long").as("is_true"))
      .cache()
    val fields = Seq("name", "nation", "seg", "band")
    val modelCols =
      sum(col("is_true")).as("nt") +:
      (count(lit(1)) - sum(col("is_true"))).as("nf") +:
      fields.flatMap(f => Seq(
        sum(when(col("is_true") === 1, col(s"a_$f")).otherwise(0L)).as(s"t_$f"),
        sum(when(col("is_true") === 0, col(s"a_$f")).otherwise(0L)).as(s"f_$f")))
    val model = pairs.agg(modelCols.head, modelCols.tail: _*)
    // 8 e6-quantized log-odds, one ln per (field, agree/disagree) level
    val weights = model.select(
      fields.flatMap(f => Seq(
        expr(
          s"""CAST(round(ln(
             |  (CAST(t_$f + 1 AS DOUBLE) / CAST(nt + 2 AS DOUBLE))
             |  / (CAST(f_$f + 1 AS DOUBLE) / CAST(nf + 2 AS DOUBLE)))
             |  * 1000000) AS BIGINT)""".stripMargin).as(s"wa_$f"),
        expr(
          s"""CAST(round(ln(
             |  (CAST(nt + 1 - t_$f AS DOUBLE) / CAST(nt + 2 AS DOUBLE))
             |  / (CAST(nf + 1 - f_$f AS DOUBLE) / CAST(nf + 2 AS DOUBLE)))
             |  * 1000000) AS BIGINT)""".stripMargin).as(s"wd_$f"))): _*)
    pairs.crossJoin(broadcast(weights))
      .select(col("is_true"),
        fields.map(f => col(s"a_$f") * col(s"wa_$f")
          + (lit(1L) - col(s"a_$f")) * col(s"wd_$f"))
          .reduce(_ + _).as("w_e6"))
      .select(col("is_true"),
        floor(col("w_e6").cast("double") / 1e6).cast("long").as("w_band"))
      .groupBy(col("w_band"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("is_true")).as("n_true"))
      .select(col("w_band"), col("n_pairs"), col("n_true"),
        (col("n_pairs") - col("n_true")).as("n_false"),
        when(col("w_band") >= 2L, "link")
          .when(col("w_band") >= 0L, "possible")
          .otherwise("nonlink").as("decision"))
      .orderBy(col("w_band"))
  }

  /** DuckDB mirror of [[fsLinkage]] — same blocking, counts, smoothed
    * log-odds (ln at e6, the DSIR precedent), band floor. */
  private def fsLinkageSql: String = {
    val fields = Seq("name", "nation", "seg", "band")
    val tf = fields.map(f =>
      s"""CAST(SUM(CASE WHEN is_true = 1 THEN a_$f ELSE 0 END) AS BIGINT) AS t_$f,
         |    CAST(SUM(CASE WHEN is_true = 0 THEN a_$f ELSE 0 END) AS BIGINT) AS f_$f""".stripMargin)
      .mkString(",\n    ")
    val ws = fields.map(f =>
      s"""CAST(round(ln(
         |      (CAST(t_$f + 1 AS DOUBLE) / CAST(nt + 2 AS DOUBLE))
         |      / (CAST(f_$f + 1 AS DOUBLE) / CAST(nf + 2 AS DOUBLE)))
         |      * 1000000) AS BIGINT) AS wa_$f,
         |    CAST(round(ln(
         |      (CAST(nt + 1 - t_$f AS DOUBLE) / CAST(nt + 2 AS DOUBLE))
         |      / (CAST(nf + 1 - f_$f AS DOUBLE) / CAST(nf + 2 AS DOUBLE)))
         |      * 1000000) AS BIGINT) AS wd_$f""".stripMargin)
      .mkString(",\n    ")
    val wsum = fields.map(f => s"p.a_$f * w.wa_$f + (1 - p.a_$f) * w.wd_$f")
      .mkString(" + ")
    s"""WITH dirty AS (
       |  SELECT c_custkey AS d_id, translate(c_name, '0189', 'OIBg') AS dn,
       |    c_nationkey AS nk, c_mktsegment AS seg,
       |    CAST(round(c_acctbal * 100) AS BIGINT) AS dbal
       |  FROM customer WHERE c_custkey % 10 = 3),
       |master AS (
       |  SELECT c_custkey AS m_id, c_name, c_nationkey AS mnk,
       |    c_mktsegment AS mseg,
       |    CAST(round(c_acctbal * 100) AS BIGINT) AS mbal
       |  FROM customer),
       |k1 AS (SELECT d_id, m_id FROM dirty JOIN master ON mnk = nk AND mseg = seg),
       |k2 AS (SELECT d_id, m_id FROM dirty JOIN master
       |  ON substring(translate(dn, 'OIB', '018'), -4) = substring(c_name, -4)),
       |cand AS (SELECT DISTINCT * FROM (SELECT * FROM k1 UNION ALL SELECT * FROM k2)),
       |pairs AS MATERIALIZED (
       |  SELECT c.d_id, c.m_id,
       |    CASE WHEN levenshtein(translate(d.dn, 'OIB', '018'), m.c_name) = 0
       |      THEN 1 ELSE 0 END AS a_name,
       |    CASE WHEN d.nk = m.mnk THEN 1 ELSE 0 END AS a_nation,
       |    CASE WHEN d.seg = m.mseg THEN 1 ELSE 0 END AS a_seg,
       |    CASE WHEN (d.dbal + 100000) // 1000 = (m.mbal + 100000) // 1000
       |      THEN 1 ELSE 0 END AS a_band,
       |    CASE WHEN c.d_id = c.m_id THEN 1 ELSE 0 END AS is_true
       |  FROM cand c JOIN dirty d USING (d_id) JOIN master m USING (m_id)),
       |model AS (
       |  SELECT CAST(SUM(is_true) AS BIGINT) AS nt,
       |    CAST(COUNT(*) - SUM(is_true) AS BIGINT) AS nf,
       |    $tf
       |  FROM pairs),
       |w AS (
       |  SELECT $ws
       |  FROM model),
       |banded AS (
       |  SELECT p.is_true,
       |    CAST(floor(CAST($wsum AS DOUBLE) / 1e6) AS BIGINT) AS w_band
       |  FROM pairs p CROSS JOIN w)
       |SELECT w_band, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(SUM(is_true) AS BIGINT) AS n_true,
       |  CAST(COUNT(*) - SUM(is_true) AS BIGINT) AS n_false,
       |  CASE WHEN w_band >= 2 THEN 'link'
       |    WHEN w_band >= 0 THEN 'possible' ELSE 'nonlink' END AS decision
       |FROM banded GROUP BY w_band ORDER BY w_band""".stripMargin
  }

  /** Golden-record SURVIVORSHIP over the [[entityMatch]] links — the
    * step after linkage in every MDM/entity-resolution pipeline: each
    * (dirty CRM import, matched master) pair collapses to ONE record
    * with field-wise precedence rules rather than row-wise wins. The
    * simulated import carries a corrupted name, a NULL market segment, a
    * re-captured region code, and a newer balance; the rules then mix
    * both sides — master wins on name (authority), first-non-null on
    * segment (completeness), newest source on region code (recency), max
    * on balance (monotone facts) — so every rule is exercised
    * non-vacuously.
    * Balance survives in e2 integer cents (rounded BEFORE the compare,
    * so both engines order identical integers). Scale shape: the
    * linkage is the blocked equi-join [[entityMatch]] already bounds;
    * survivorship itself is a row-local projection over the links
    * joined to both record sides — no new shuffle beyond two key joins. */
  def goldenRecord(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val imports = cust.filter(col("c_custkey") % 10 === 3)
      .select(col("c_custkey").as("d_id"),
        lit(null).cast("string").as("i_segment"),
        concat(lit("NK-"), col("c_nationkey").cast("string")).as("i_region"),
        (expr("CAST(round(c_acctbal * 100) AS BIGINT)") + 5000L).as("i_bal_e2"))
    val master = cust.select(col("c_custkey").as("m_id"), col("c_name"),
      col("c_mktsegment"),
      expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("m_bal_e2"))
    entityBestLinks(spark, dir)
      .join(imports, "d_id")
      .join(master, "m_id")
      .select(col("d_id"), col("m_id"),
        col("c_name").as("name"), // authority: master wins
        coalesce(col("i_segment"), col("c_mktsegment")).as("mktsegment"), // completeness
        col("i_region").as("region_code"), // recency: newest source wins
        greatest(col("i_bal_e2"), col("m_bal_e2")).as("acctbal_e2")) // monotone max
      .orderBy(col("d_id"))
  }

  /** SALTED skew join — the standard remedy when one join key carries a
    * disproportionate share of the fact rows and a plain shuffle join
    * sends that whole key to ONE reducer: the small side replicates
    * `nSalts` times (one row per salt), the fact side stamps a
    * deterministic salt from a high-cardinality column, and the join
    * runs on (key, salt) so the hot key's rows spread over `nSalts`
    * reducers. The skew here is synthesized (users < 100 collapse to
    * key 0, ~2/3 of all events); results are salt-invariant by
    * construction, which the plain-join oracle pins. AQE's skew-join
    * split handles sort-merge cases adaptively; explicit salting stays
    * the portable form (it also covers aggregations and works when AQE
    * can't split, e.g. broadcast-ineligible skewed build sides). */
  def skewJoinSalted(spark: SparkSession, dir: String): DataFrame = {
    val nSalts = 8
    val fact = Tables.events(spark, dir)
      .select(when(col("user_id") < 100, 0L).otherwise(col("user_id")).as("k"),
        col("event_id"), expr("CAST(round(value * 100) AS BIGINT)").as("v_e2"))
    val dim = fact.select(col("k")).distinct()
      .withColumn("label", concat(lit("seg_"), (col("k") % 5).cast("string")))
    val saltedDim = dim.withColumn("salt",
      explode(array((0 until nSalts).map(s => lit(s)): _*)))
    val saltedFact = fact.withColumn("salt", (col("event_id") % nSalts).cast("int"))
    saltedFact.join(saltedDim, Seq("k", "salt"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), sum(col("v_e2")).as("rev_e2"))
      .orderBy(col("label"))
  }

  /** Nearest-event temporal join with tolerance: each purchase matched
    * to its CLOSEST error event of the same user within ±30 min — the
    * bidirectional sibling of [[asofJoin]] (incident correlation,
    * sensor alignment). Same scalable composition: union both sides
    * tagged, ONE shuffle on user_id, then two running windows — last
    * error at-or-before (ts asc) and first error strictly-after (ts
    * desc) — and a row-local pick of the nearer candidate. No range
    * join, no pair blow-up, cost O(n log n) per user partition.
    *
    * Tie-breaks are total: at equal |Δt| the smaller event_id wins
    * (including the prev-vs-next equidistant case); among same-ts
    * errors each window's secondary sort (event_id desc under last())
    * surfaces the SMALLEST id, matching the oracle's (|Δt|, event_id)
    * ordering. Same-ts errors count as "before" (Δt = 0). */
  def nearestEventJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("is_left"),
        lit(null).cast("long").as("e_id"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("is_left"),
        col("event_id").as("e_id"))
    val all = purchases.unionAll(errors)
    // prev: iterate ts asc; same-ts errors BEFORE the purchase (is_left
    // asc), event_id desc so last() == min id among same-ts errors
    val wPrev = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("is_left").asc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // next: iterate ts desc; same-ts purchases BEFORE errors (is_left
    // desc) so a same-ts error is NOT seen as "after"
    val wNext = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("is_left").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tolUs = 1800L * 1000000L
    val dPrev = unix_micros(col("ts")) - unix_micros(col("prev_ts"))
    val dNext = unix_micros(col("next_ts")) - unix_micros(col("ts"))
    all
      .withColumn("prev_id", last(col("e_id"), ignoreNulls = true).over(wPrev))
      .withColumn("prev_ts", last(when(col("is_left") === 0, col("ts")), ignoreNulls = true).over(wPrev))
      .withColumn("next_id", last(col("e_id"), ignoreNulls = true).over(wNext))
      .withColumn("next_ts", last(when(col("is_left") === 0, col("ts")), ignoreNulls = true).over(wNext))
      .filter(col("is_left") === 1)
      .withColumn("prev_ok", col("prev_id").isNotNull && dPrev <= tolUs)
      .withColumn("next_ok", col("next_id").isNotNull && dNext <= tolUs)
      .select(col("event_id"), col("user_id"),
        when(col("prev_ok") && (!col("next_ok") || dPrev < dNext ||
            (dPrev === dNext && col("prev_id") < col("next_id"))), col("prev_id"))
          .when(col("next_ok"), col("next_id")).as("near_id"),
        when(col("prev_ok") && (!col("next_ok") || dPrev < dNext ||
            (dPrev === dNext && col("prev_id") < col("next_id"))), -dPrev)
          .when(col("next_ok"), dNext).as("delta_us"))
      .orderBy(col("event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nearest_event_join" -> (nearestEventJoin _),
    "entity_match" -> (entityMatch _),
    "fs_linkage" -> (fsLinkage _),
    "golden_record" -> (goldenRecord _),
    "skew_join_salted" -> (skewJoinSalted _),
    "asof_join" -> (asofJoin _),
    "range_join" -> (rangeJoin _),
    "merge_upsert" -> (mergeUpsert _),
    "bloom_semijoin" -> (bloomSemijoin _),
    "interval_join" -> (intervalJoin _)
  )

  val oracles: Map[String, String] = Map(
    "fs_linkage" -> fsLinkageSql,
    // the entity_match linkage CTE + field-wise survivorship rules
    "golden_record" ->
      """WITH dirty AS (
        |  SELECT c_custkey AS d_id, translate(c_name, '0189', 'OIBg') AS dn,
        |    c_nationkey AS nk,
        |    c_mktsegment AS seg
        |  FROM customer WHERE c_custkey % 10 = 3),
        |k1 AS (
        |  SELECT d_id, c_custkey AS m_id
        |  FROM dirty JOIN customer ON c_nationkey = nk AND c_mktsegment = seg),
        |k2 AS (
        |  SELECT d_id, c_custkey AS m_id
        |  FROM dirty JOIN customer
        |    ON substring(translate(dn, 'OIB', '018'), -4) = substring(c_name, -4)),
        |cand AS (SELECT DISTINCT * FROM (SELECT * FROM k1 UNION ALL SELECT * FROM k2)),
        |scored AS (
        |  SELECT c.d_id, c.m_id,
        |    levenshtein(translate(d.dn, 'OIB', '018'), cu.c_name) AS flev,
        |    levenshtein(d.dn, cu.c_name) AS lev
        |  FROM cand c
        |  JOIN dirty d ON d.d_id = c.d_id
        |  JOIN customer cu ON cu.c_custkey = c.m_id),
        |best AS (
        |  SELECT *, row_number() OVER (PARTITION BY d_id ORDER BY flev, lev, m_id) AS rn
        |  FROM scored)
        |SELECT b.d_id, b.m_id,
        |  m.c_name AS name,
        |  COALESCE(CAST(NULL AS VARCHAR), m.c_mktsegment) AS mktsegment,
        |  'NK-' || CAST(i.c_nationkey AS VARCHAR) AS region_code,
        |  GREATEST(CAST(round(i.c_acctbal * 100) AS BIGINT) + 5000,
        |    CAST(round(m.c_acctbal * 100) AS BIGINT)) AS acctbal_e2
        |FROM best b
        |JOIN customer i ON i.c_custkey = b.d_id
        |JOIN customer m ON m.c_custkey = b.m_id
        |WHERE b.rn = 1 ORDER BY b.d_id""".stripMargin,
    // salt-invariant by construction: the oracle is the PLAIN join
    "skew_join_salted" ->
      """WITH f AS (
        |  SELECT CASE WHEN user_id < 100 THEN 0 ELSE user_id END AS k,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events),
        |d AS (SELECT DISTINCT k FROM f),
        |d2 AS (SELECT k, 'seg_' || CAST(k % 5 AS VARCHAR) AS label FROM d)
        |SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(f.v) AS BIGINT) AS rev_e2
        |FROM f JOIN d2 USING (k) GROUP BY label ORDER BY label""".stripMargin,
    // nearest = min over (|Δt|, event_id); same-ts errors give Δt = 0 on
    // the "before" side, matching the engine's window semantics
    "nearest_event_join" ->
      """SELECT p.event_id, p.user_id,
        |  (SELECT e.event_id FROM events e
        |   WHERE e.user_id = p.user_id AND e.event_type = 'error'
        |     AND abs(epoch_us(e.ts) - epoch_us(p.ts)) <= 1800000000
        |   ORDER BY abs(epoch_us(e.ts) - epoch_us(p.ts)), e.event_id
        |   LIMIT 1) AS near_id,
        |  (SELECT epoch_us(e.ts) - epoch_us(p.ts) FROM events e
        |   WHERE e.user_id = p.user_id AND e.event_type = 'error'
        |     AND abs(epoch_us(e.ts) - epoch_us(p.ts)) <= 1800000000
        |   ORDER BY abs(epoch_us(e.ts) - epoch_us(p.ts)), e.event_id
        |   LIMIT 1) AS delta_us
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin,
    // DuckDB's translate/levenshtein match Spark's (plain edit distance,
    // char-map translate); the tie-break (lev, m_id) is total
    "entity_match" ->
      """WITH dirty AS (
        |  SELECT c_custkey AS d_id, translate(c_name, '0189', 'OIBg') AS dn,
        |    c_nationkey AS nk,
        |    c_mktsegment AS seg
        |  FROM customer WHERE c_custkey % 10 = 3),
        |k1 AS (
        |  SELECT d_id, c_custkey AS m_id
        |  FROM dirty JOIN customer ON c_nationkey = nk AND c_mktsegment = seg),
        |k2 AS (
        |  SELECT d_id, c_custkey AS m_id
        |  FROM dirty JOIN customer
        |    ON substring(translate(dn, 'OIB', '018'), -4) = substring(c_name, -4)),
        |cand AS (SELECT DISTINCT * FROM (SELECT * FROM k1 UNION ALL SELECT * FROM k2)),
        |scored AS (
        |  SELECT c.d_id, c.m_id,
        |    levenshtein(translate(d.dn, 'OIB', '018'), cu.c_name) AS flev,
        |    levenshtein(d.dn, cu.c_name) AS lev
        |  FROM cand c
        |  JOIN dirty d ON d.d_id = c.d_id
        |  JOIN customer cu ON cu.c_custkey = c.m_id),
        |best AS (
        |  SELECT *, row_number() OVER (PARTITION BY d_id ORDER BY flev, lev, m_id) AS rn
        |  FROM scored)
        |SELECT d_id, m_id, CAST(flev AS BIGINT) AS flev, CAST(lev AS BIGINT) AS lev,
        |  d_id = m_id AS hit
        |FROM best WHERE rn = 1 ORDER BY d_id""".stripMargin,
    "asof_join" ->
      """SELECT l.event_id, l.user_id,
        |  (SELECT r.event_id FROM events r
        |   WHERE r.user_id = l.user_id AND r.event_type = 'signup' AND r.ts <= l.ts
        |   ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS asof_id,
        |  epoch_us(l.ts) -
        |  (SELECT epoch_us(r.ts) FROM events r
        |   WHERE r.user_id = l.user_id AND r.event_type = 'signup' AND r.ts <= l.ts
        |   ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS micros_since_signup
        |FROM events l WHERE l.event_type = 'purchase'
        |ORDER BY l.event_id""".stripMargin,
    "range_join" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('b1_budget', 900.0, 920.0), ('b2_mid', 920.0, 960.0),
        |  ('b3_upper', 960.0, 985.0), ('b4_premium', 985.0, 1000.0))
        |SELECT band, COUNT(*) AS n_parts,
        |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
        |FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,
    "merge_upsert" ->
      """WITH updates AS (
        |  SELECT c_custkey AS u_key, c_acctbal + 100.0 AS new_bal
        |  FROM customer WHERE c_custkey % 5 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 500.0 FROM customer WHERE c_custkey % 7 = 3)
        |SELECT COALESCE(t.c_custkey, u.u_key) AS key,
        |  COALESCE(u.new_bal, t.c_acctbal) AS balance,
        |  CASE WHEN t.c_custkey IS NOT NULL AND u.u_key IS NOT NULL THEN 'update'
        |       WHEN t.c_custkey IS NULL THEN 'insert' ELSE 'keep' END AS action
        |FROM customer t FULL JOIN updates u ON t.c_custkey = u.u_key
        |ORDER BY key""".stripMargin,
    "bloom_semijoin" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // the oracle is the NAIVE quadratic overlap join — at oracle scale
    // that's fine; the engine side is the one that must bucketize
    "interval_join" ->
      """WITH iv AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
        |  FROM events WHERE user_id < 40 GROUP BY 1, 2)
        |SELECT a.day, COUNT(*) AS n_pairs
        |FROM iv a JOIN iv b
        |  ON a.day = b.day AND a.user_id < b.user_id
        |  AND a.lo <= b.hi AND b.lo <= a.hi
        |GROUP BY a.day ORDER BY a.day""".stripMargin
  )
}
