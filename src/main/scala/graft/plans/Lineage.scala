package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{ExprId, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage from the ANALYZED Catalyst plan — the
  * governance/audit answer ("which source columns can reach this output
  * column, and which columns decided the rows?") computed from plan
  * metadata alone: zero data IO, so it costs the same on a 100 TB table
  * as on a fixture (the reference keeps no lineage at all; this is the
  * provenance layer a training-data pipeline needs for takedown/consent
  * tracing back from any derived artifact).
  *
  * Two relationship kinds, the OpenLineage direct/indirect split:
  *  - `data`: the source column's VALUES flow into the output column
  *    (through projections, aggregates, window functions, generators,
  *    Expand projections, positional Union merges);
  *  - `filter`: the source column decided WHICH rows exist (Filter
  *    conditions and Join keys) — row provenance is plan-global through
  *    inner joins, so filter sources apply to every output column.
  *
  * The walk is a single bottom-up pass building ExprId → {(table,
  * column)} maps; attribute identity (ExprId) makes self-join
  * disambiguation free (the analyzer re-aliases the duplicate side).
  * Leaves resolve to the catalog table name when one exists, else the
  * file-relation root path's basename — the fixture's `<table>.parquet`.
  */
object Lineage {

  /** A source column: (table, column). */
  type Src = (String, String)

  private def tableNameOf(lr: LogicalRelation): String =
    lr.catalogTable.map(_.identifier.table).getOrElse {
      lr.relation match {
        case h: HadoopFsRelation =>
          val base = h.location.rootPaths.headOption.map(_.getName).getOrElse("unknown")
          base.replaceAll("\\.[A-Za-z0-9]+$", "")
        case _ => "unknown"
      }
    }

  /** Bottom-up: (attr ExprId → leaf sources, indirect row-deciding sources). */
  private def walk(p: LogicalPlan): (Map[ExprId, Set[Src]], Set[Src]) = p match {
    case lr: LogicalRelation =>
      val t = tableNameOf(lr)
      (lr.output.map(a => a.exprId -> Set((t, a.name))).toMap, Set.empty)
    case lr: LocalRelation =>
      (lr.output.map(a => a.exprId -> Set(("local", a.name))).toMap, Set.empty)
    case u: Union =>
      val kids = u.children.map(walk)
      val merged = kids.map(_._1).reduce(_ ++ _)
      val byPos = u.output.zipWithIndex.map { case (a, i) =>
        a.exprId -> u.children
          .flatMap(c => merged.getOrElse(c.output(i).exprId, Set.empty)).toSet
      }.toMap
      (merged ++ byPos, kids.map(_._2).reduce(_ ++ _))
    case _ =>
      val kids = p.children.map(walk)
      val cm = kids.map(_._1).foldLeft(Map.empty[ExprId, Set[Src]])(_ ++ _)
      // subquery expressions (ScalarSubquery / Exists / InSubquery) carry
      // whole plans: their OUTPUT columns' sources flow as values wherever
      // the expression sits (data in a Project, row-deciding in a Filter),
      // and their INTERNAL filter/join sources are always row-deciding —
      // without this, a column referenced only through a subquery is
      // invisible to takedown tracing (ADVICE r10)
      def subPlans(e: Expression): Seq[LogicalPlan] = e.collect {
        case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression => s.plan
      }
      val subInd = p.expressions.flatMap(subPlans).flatMap(sp => walk(sp)._2).toSet
      val ind0 = kids.map(_._2).foldLeft(Set.empty[Src])(_ ++ _) ++ subInd
      def deps(e: Expression): Set[Src] =
        e.references.toSeq.flatMap(a => cm.getOrElse(a.exprId, Set.empty[Src])).toSet ++
          subPlans(e).flatMap { sp =>
            val (m, _) = walk(sp)
            sp.output.flatMap(a => m.getOrElse(a.exprId, Set.empty[Src]))
          }.toSet
      p match {
        case pr: Project =>
          (cm ++ pr.projectList.map(ne => ne.toAttribute.exprId -> deps(ne)), ind0)
        case ag: Aggregate =>
          (cm ++ ag.aggregateExpressions.map(ne => ne.toAttribute.exprId -> deps(ne)), ind0)
        case w: Window =>
          (cm ++ w.windowExpressions.map(ne => ne.toAttribute.exprId -> deps(ne)), ind0)
        case g: Generate =>
          (cm ++ g.generatorOutput.map(a => a.exprId -> deps(g.generator)), ind0)
        case e: Expand =>
          val byPos = e.output.zipWithIndex.map { case (a, i) =>
            a.exprId -> e.projections.flatMap(pr => deps(pr(i))).toSet
          }.toMap
          (cm ++ byPos, ind0)
        case f: Filter => (cm, ind0 ++ deps(f.condition))
        case j: Join => (cm, ind0 ++ j.condition.map(deps).getOrElse(Set.empty[Src]))
        case _ => (cm, ind0) // pass-through: Sort/Limit/SubqueryAlias/hints/…
      }
  }

  /** Lineage rows `(out_column, kind, src_table, src_column)`, sorted. */
  def of(df: DataFrame): Seq[(String, String, String, String)] = {
    val plan = df.queryExecution.analyzed
    val (m, indirect) = walk(plan)
    val direct = plan.output.flatMap(a =>
      m.getOrElse(a.exprId, Set.empty[Src]).toSeq
        .map { case (t, c) => (a.name, "data", t, c) })
    val ind = plan.output.flatMap(a =>
      indirect.toSeq.map { case (t, c) => (a.name, "filter", t, c) })
    (direct ++ ind).distinct.sorted
  }
}
