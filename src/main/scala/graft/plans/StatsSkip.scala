package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference,
  EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan,
  LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  InMemoryFileIndex, LogicalRelation}

/** Automatic manifest-stats data skipping — the (c)-tier Catalyst
  * extension point as an OPTIMIZER rule (vs TopKPerGroup's planner
  * strategy): [[graft.store.Versioned.analyzeStats]] records per-file
  * [min, max] column stats in the table manifest (X157); this rule makes
  * the skipping AUTOMATIC. A frame opened with
  * [[graft.store.Versioned.table]] carries `graft.table`/`graft.version`
  * reader options; when the optimized plan holds a Filter directly over
  * such a relation, the rule extracts the conjuncts' integer range
  * bounds per column (`>=`, `>`, `<=`, `<`, `=`, either operand order),
  * consults the manifest — ONE driver-side metadata read, zero parquet
  * footer opens — and rebuilds the relation's file index with only the
  * files whose stats can intersect the predicate. The Filter stays on
  * top for row-level evaluation, exactly like parquet row-group skipping
  * one level up. Unrecognized conjuncts are simply ignored (they prune
  * nothing, never wrongly); files without stats are conservatively kept;
  * non-graft relations are never touched.
  *
  * Where this wins at 100 TB: the same place Delta's log-level stats do
  * — file selection happens at PLANNING from one small manifest instead
  * of opening 10⁵ parquet footers (or listing directories) per query,
  * and a `user_id BETWEEN a AND b` over range-landed data scans only
  * the overlapping files. The rewritten relation is tagged
  * (`graft.statsPruned`) so the fixpoint optimizer applies it once.
  *
  * Registered by [[graft.core.GraftExtensions]] (build-time path) or
  * idempotently via `spark.experimental.extraOptimizations` (after-the-
  * fact path the specs and declared query use — `attach(spark)`).
  */
object StatsSkip {

  /** Idempotently attach the rule to an already-built session. */
  def attach(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[SkipRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SkipRule(spark)

  case class SkipRule(spark: SparkSession) extends Rule[LogicalPlan] {

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case f @ Filter(cond, l: LogicalRelation) =>
        l.relation match {
          case rel: HadoopFsRelation if rel.options.contains("graft.table") &&
              !rel.options.contains("graft.statsPruned") =>
            val bounds = rangeBounds(cond)
            if (bounds.isEmpty) f
            else {
              val table = rel.options("graft.table")
              val version = rel.options("graft.version").toInt
              val all = rel.location.inputFiles.toSeq
              val byStats =
                graft.store.Versioned.pruneByStats(table, version, all, bounds)
              // an equality bound additionally consults the per-file Bloom
              // filters — the skip min/max can never make on keys landed in
              // arrival order rather than range-clustered
              val keep = bounds.foldLeft(byStats) {
                case (fs, (c, (lo, hi))) if lo == hi =>
                  graft.store.Versioned.pruneByBloom(table, version, fs, c,
                    lo.toString)
                case (fs, _) => fs
              }
              if (keep.size == all.size) f
              else {
                val newIndex = new InMemoryFileIndex(spark,
                  keep.map(new Path(_)), rel.options, Some(rel.dataSchema))
                val newRel = rel.copy(location = newIndex,
                  options = rel.options + ("graft.statsPruned" -> "true"))(spark)
                Filter(cond, l.copy(relation = newRel))
              }
            }
          case _ => f
        }
    }

    /** Per-column [lo, hi] bounds implied by `cond`'s integer-comparison
      * conjuncts; columns without a recognized bound are absent. */
    private def rangeBounds(cond: Expression): Map[String, (Long, Long)] = {
      def conjuncts(e: Expression): Seq[Expression] = e match {
        case And(a, b) => conjuncts(a) ++ conjuncts(b)
        case x => Seq(x)
      }
      def longOf(v: Any): Option[Long] = v match {
        case i: Int => Some(i.toLong)
        case l: Long => Some(l)
        case s: Short => Some(s.toLong)
        case b: Byte => Some(b.toLong)
        case _ => None
      }
      // (column, lo-or-None, hi-or-None) per recognized conjunct
      val pieces = conjuncts(cond).flatMap {
        case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) =>
          longOf(v).map(x => (a.name, Some(x), None))
        case GreaterThan(a: AttributeReference, Literal(v, _)) =>
          longOf(v).map(x => (a.name, Some(x + 1), None))
        case LessThanOrEqual(a: AttributeReference, Literal(v, _)) =>
          longOf(v).map(x => (a.name, None, Some(x)))
        case LessThan(a: AttributeReference, Literal(v, _)) =>
          longOf(v).map(x => (a.name, None, Some(x - 1)))
        case EqualTo(a: AttributeReference, Literal(v, _)) =>
          longOf(v).map(x => (a.name, Some(x), Some(x)))
        case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) =>
          longOf(v).map(x => (a.name, None, Some(x)))
        case GreaterThan(Literal(v, _), a: AttributeReference) =>
          longOf(v).map(x => (a.name, None, Some(x - 1)))
        case LessThanOrEqual(Literal(v, _), a: AttributeReference) =>
          longOf(v).map(x => (a.name, Some(x), None))
        case LessThan(Literal(v, _), a: AttributeReference) =>
          longOf(v).map(x => (a.name, Some(x + 1), None))
        case EqualTo(Literal(v, _), a: AttributeReference) =>
          longOf(v).map(x => (a.name, Some(x), Some(x)))
        case _ => None
      }
      pieces.groupBy(_._1).map { case (colName, ps) =>
        val lo = ps.flatMap(_._2).foldLeft(Long.MinValue)(math.max)
        val hi = ps.flatMap(_._3).foldLeft(Long.MaxValue)(math.min)
        colName -> (lo, hi)
      }
    }
  }
}
