package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL `CREATE [OR REPLACE] VIEW` / `DROP VIEW` / view reads for the
  * graft catalog (X278), wired the way Delta/Iceberg wire their SQL
  * surface: a DELEGATING PARSER injected through
  * `SparkSessionExtensions.injectParser`. Spark ships the `ViewCatalog`
  * connector API but its own analyzer still routes every view statement
  * to the SESSION catalog (`ResolveSessionCatalog` throws
  * MISSING_CATALOG_ABILITY.VIEWS for any other catalog — checked against
  * the 4.1 analyzer), so the statements must be claimed BEFORE analysis:
  *
  *  - `CREATE VIEW <cat>.v AS <query>` → [[GraftCreateViewCommand]]
  *    (persists the ORIGINAL query text through the catalog's
  *    [[graft.sources.GraftCatalog.createView]] — one put-if-absent
  *    metadata file; racing CREATEs serialize, loser fails loudly);
  *  - `DROP VIEW <cat>.v` → [[GraftDropViewCommand]];
  *  - any `<cat>.v` RELATION whose name matches a stored view expands at
  *    parse time into the stored definition (SubqueryAlias over the
  *    re-parsed text — nested view references expand recursively because
  *    the expansion runs through this same parser).
  *
  * Everything else passes through the delegate untouched; names shorter
  * or longer than `<catalog>.<view>`, non-graft catalogs, and temp views
  * are never claimed. */
class GraftViewParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  // recursion guard: a self/mutually-referential stored definition would
  // otherwise expand forever (Spark's session catalog rejects recursive
  // views; this parser must fail as loudly, not StackOverflow)
  private val expandDepth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }
  private val MaxViewDepth = 16

  private def graftCatalog(name: String): Boolean =
    spark.conf.getOption(s"spark.sql.catalog.$name")
      .contains("graft.sources.GraftCatalog")

  private def rootOf(name: String): java.io.File =
    new java.io.File(spark.conf.get(s"spark.sql.catalog.$name.root"))
      .getAbsoluteFile

  private def viewText(cat: String, view: String): Option[String] =
    if (!graftCatalog(cat)) None
    else graft.sources.GraftViewsBridge.queryText(rootOf(cat), view)

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case cv: CreateView => cv.child match {
      case UnresolvedIdentifier(Seq(cat, v), _) if graftCatalog(cat) =>
        GraftCreateViewCommand(cat, v,
          cv.originalText.getOrElse(throw new IllegalArgumentException(
            s"CREATE VIEW $cat.$v: missing original query text")),
          cv.query, cv.allowExisting, cv.replace)
      case _ => cv
    }
    case dv: DropView => dv.child match {
      case UnresolvedIdentifier(Seq(cat, v), _) if graftCatalog(cat) =>
        GraftDropViewCommand(cat, v, dv.ifExists)
      case _ => dv
    }
    case u: UnresolvedRelation if u.multipartIdentifier.length == 2 =>
      val Seq(cat, v) = u.multipartIdentifier
      viewText(cat, v) match {
        // recursive: the stored text re-parses through THIS parser, so a
        // view over a view expands all the way down — bounded, so a
        // cyclic definition errors instead of overflowing the stack
        case Some(sql) =>
          val d = expandDepth.get().intValue()
          require(d < MaxViewDepth,
            s"view expansion exceeded depth $MaxViewDepth at $cat.$v — " +
              "recursive view definition?")
          expandDepth.set(d + 1)
          try SubqueryAlias(v, parsePlan(sql))
          finally expandDepth.set(d)
        case None => u
      }
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    rewrite(delegate.parsePlan(sqlText))
  override def parsePlanWithParameters(sqlText: String,
      ctx: ParameterContext): LogicalPlan =
    rewrite(delegate.parsePlanWithParameters(sqlText, ctx))
  override def parseQuery(sqlText: String): LogicalPlan =
    rewrite(delegate.parseQuery(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** `CREATE [OR REPLACE] VIEW <cat>.<view> AS <query>`: analyzes the
  * query for its schema, then persists the ORIGINAL text through the
  * catalog (put-if-absent — the replace path drops first, so REPLACE is
  * last-writer-wins while plain CREATE races stay loud). */
case class GraftCreateViewCommand(catalogName: String, viewName: String,
    sql: String, query: LogicalPlan, allowExisting: Boolean, replace: Boolean)
    extends LeafRunnableCommand {

  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] =
    Seq(query)

  /** Unqualified (single-part) relation names in `plan` NOT covered by a
    * CTE alias that is actually IN SCOPE at the reference — a scope-stack
    * walk, not a global collect: a CTE defined inside an unrelated
    * subquery must not whitelist an OUTER reference sharing its name
    * (VERDICT r13 — that reference re-resolves in each reader's session,
    * the silent-wrong-rows case the guard exists to prevent). Scope
    * rules mirror the analyzer: each CTE definition sees the aliases
    * declared before it (plus its own name, for the recursive form), the
    * WITH body sees them all; subquery EXPRESSIONS (IN/EXISTS/scalar)
    * are walked under the scope of the node holding them. */
  private def unscopedUnqualified(plan: LogicalPlan,
      scope: Set[String]): Seq[String] = plan match {
    case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
      val (defRefs, bodyScope) =
        w.cteRelations.foldLeft((Seq.empty[String], scope)) {
          case ((acc, sc), rel) =>
            val (name, sub) = (rel._1, rel._2)
            // a definition sees its OWN name only under WITH RECURSIVE —
            // in the plain form `WITH t AS (SELECT * FROM t)` the inner t
            // is an OUTER reference that would re-resolve in each
            // reader's session (ADVICE r14: whitelisting it
            // unconditionally let exactly that silent-wrong-rows case
            // through the guard)
            val defScope = if (w.allowRecursion) sc + name else sc
            (acc ++ unscopedUnqualified(sub, defScope), sc + name)
        }
      defRefs ++ unscopedUnqualified(w.child, bodyScope)
    case u: UnresolvedRelation if u.multipartIdentifier.length == 1 =>
      if (scope(u.multipartIdentifier.head)) Seq.empty
      else Seq(u.multipartIdentifier.head)
    case other =>
      val exprSubs = other.expressions.flatMap(_.collect {
        case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
          s.plan
      })
      (other.children ++ exprSubs).flatMap(c => unscopedUnqualified(c, scope))
  }

  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[graft.sources.GraftCatalog]
    val ident = Identifier.of(Array.empty, viewName)
    // a persistent definition re-parses in the READER's session, so an
    // unqualified (single-part) table reference would silently resolve
    // against whatever catalog/database/temp-view the reader has current
    // — wrong rows, no error. Reject at CREATE (the SQL-standard "views
    // bind at definition" contract, enforced the loud way); CTE aliases
    // IN SCOPE at the reference stay legal.
    val unqualified = unscopedUnqualified(query, Set.empty).distinct
    require(unqualified.isEmpty,
      s"CREATE VIEW $catalogName.$viewName: unqualified table reference(s) " +
        s"${unqualified.mkString(", ")} — persistent view definitions must " +
        "catalog-qualify every table (they re-resolve in each reader's session)")
    if (allowExisting && cat.viewExists(ident)) return Seq.empty
    val schema = session.sessionState.executePlan(query).analyzed.schema
    val cm = session.sessionState.catalogManager
    val info = new ViewInfo(ident, sql, cm.currentCatalog.name(),
      cm.currentNamespace, schema, schema.fieldNames,
      Array.empty[String], Array.empty[String],
      java.util.Collections.emptyMap[String, String]())
    // REPLACE is one atomic swap (stage + rename — readers never observe
    // a missing view, a crash leaves the old definition); plain CREATE
    // stays put-if-absent with a loud loser
    if (replace) cat.replaceView(info)
    else cat.createView(info)
    Seq.empty
  }
}

/** `DROP VIEW [IF EXISTS] <cat>.<view>`. */
case class GraftDropViewCommand(catalogName: String, viewName: String,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[graft.sources.GraftCatalog]
    val ident = Identifier.of(Array.empty, viewName)
    if (!cat.dropView(ident) && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    Seq.empty
  }
}
