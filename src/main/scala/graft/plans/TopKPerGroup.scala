package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo,
  Expression, GenericInternalRow, IntegerLiteral, JoinedRow, LessThan,
  LessThanOrEqual, RowNumber, SortOrder, SpecifiedWindowFrame, UnsafeProjection,
  WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples,
  ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Whole-operator top-k-per-group — the (c)-tier Catalyst extension
  * point (custom pattern → SparkStrategy → custom SparkPlan, injected
  * through [[graft.core.GraftExtensions]]): the ubiquitous
  *
  *   row_number() OVER (PARTITION BY g ORDER BY o) AS rn … WHERE rn <= k
  *
  * idiom plans, by default, as Sort + WindowExec. Spark's own
  * InferWindowGroupLimit (3.5+) already prunes rows early — it inserts
  * partial/final WindowGroupLimit nodes that drop beyond-rank rows —
  * but the FINISHING step stays a full per-partition Sort feeding
  * WindowExec. This operator replaces that finishing step: a bounded
  * per-group HEAP ranks the survivors in O(n log k) heap comparisons
  * with NO sort operator and no window machinery, composing ON TOP of
  * the built-in pushdown (whose partial mode still trims rows before
  * the exchange — the two are complementary, which the physical plan
  * shows: WindowGroupLimit Partial → Exchange → this). The classic
  * "top-N per key" physical operator warehouses special-case,
  * recognized from the logical pattern so USER QUERIES DON'T CHANGE:
  * the rewrite is a planning concern, exactly where Catalyst wants it.
  *
  * Scope and honesty: the strategy fires only on the exact pattern —
  * a single row_number window expression with the default running row
  * frame, filtered by `rn <= k` / `rn < k` / `rn = 1` with literal k —
  * and only when `spark.graft.topkPerGroup.enabled` is set (off by
  * default: the sort-based WindowExec spills gracefully when the GROUP
  * COUNT per partition explodes, this operator keeps one k-row heap
  * per group in memory — the right trade when rows-per-group is the
  * large factor, which is the top-N-per-key workload by definition).
  * Correctness needs a deterministic order to be meaningful, same as
  * row_number itself; TopKPerGroupSpec pins equality against WindowExec
  * on random data, ties, k ≥ group size, and cross-partition groups
  * (the exec declares ClusteredDistribution, so the planner inserts
  * the same hash exchange the window would get). */
object TopKPerGroup {

  val EnabledKey = "spark.graft.topkPerGroup.enabled"

  /** The physical operator: one bounded heap per group per partition. */
  case class TopKPerGroupExec(partitionSpec: Seq[Expression],
      orderSpec: Seq[SortOrder], k: Int, rnAttr: Attribute,
      child: SparkPlan) extends SparkPlan {

    override def children: Seq[SparkPlan] = child :: Nil
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[SparkPlan]): SparkPlan =
      copy(child = newChildren.head)

    override def output: Seq[Attribute] = child.output :+ rnAttr

    // rn is born here, not read from the child
    override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
      org.apache.spark.sql.catalyst.expressions.AttributeSet(rnAttr)

    override def requiredChildDistribution: Seq[Distribution] =
      if (partitionSpec.isEmpty) AllTuples :: Nil
      else ClusteredDistribution(partitionSpec) :: Nil

    override protected def doExecute(): RDD[InternalRow] = {
      val childOutput = child.output
      val part = partitionSpec
      val order = orderSpec
      val limit = k
      child.execute().mapPartitions({ it =>
        val grouping = UnsafeProjection.create(part, childOutput)
        val ordering = new LazilyGeneratedOrdering(order, childOutput)
        // max-heap of the kept k (head = current worst): a new row enters
        // only when it beats the worst, evicting it — O(log k) per row
        val heaps = new java.util.HashMap[InternalRow,
          java.util.PriorityQueue[InternalRow]]()
        val revCmp = new java.util.Comparator[InternalRow] {
          override def compare(a: InternalRow, b: InternalRow): Int =
            ordering.compare(b, a)
        }
        while (it.hasNext) {
          val row = it.next()
          val key = grouping(row) // reused buffer — copy only on first sight
          var heap = heaps.get(key)
          if (heap == null) {
            heap = new java.util.PriorityQueue[InternalRow](limit + 1, revCmp)
            heaps.put(key.copy(), heap)
          }
          if (heap.size() < limit) heap.add(row.copy())
          else if (ordering.compare(row, heap.peek()) < 0) {
            heap.poll()
            heap.add(row.copy())
          }
        }
        val toUnsafe = UnsafeProjection.create(output, output)
        import scala.jdk.CollectionConverters._
        heaps.values().iterator().asScala.flatMap { heap =>
          val arr = heap.toArray(new Array[InternalRow](heap.size()))
          java.util.Arrays.sort(arr, ordering)
          arr.iterator.zipWithIndex.map { case (r, i) =>
            val rn = new GenericInternalRow(Array[Any](i + 1))
            toUnsafe(new JoinedRow(r, rn)).copy(): InternalRow
          }
        }
      }, preservesPartitioning = true)
    }
  }

  /** Recognize Filter(rn ≤ k, Window(row_number() …)) with the default
    * running row frame and a literal bound. */
  case class Strategy(session: SparkSession) extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case Filter(cond,
          Window(Seq(alias @ Alias(
            WindowExpression(_: RowNumber,
              WindowSpecDefinition(ps, os, _: SpecifiedWindowFrame)), _)),
            _, _, child, _))
          if session.conf.get(EnabledKey, "false") == "true" && os.nonEmpty =>
        val rn = alias.toAttribute
        val bound: Option[Int] = cond match {
          case LessThanOrEqual(a: Attribute, IntegerLiteral(k))
            if a.exprId == rn.exprId && k >= 1 => Some(k)
          case LessThan(a: Attribute, IntegerLiteral(k))
            if a.exprId == rn.exprId && k >= 2 => Some(k - 1)
          case EqualTo(a: Attribute, IntegerLiteral(1))
            if a.exprId == rn.exprId => Some(1)
          case _ => None
        }
        bound match {
          case Some(k) =>
            TopKPerGroupExec(ps, os, k, rn, planLater(child)) :: Nil
          case None => Nil
        }
      case _ => Nil
    }
  }
}
