package graft.sources

import java.io.File
import java.util

import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier, NamespaceChange, ProcedureCatalog, StagedTable, StagingTableCatalog, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.UnboundFunction
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.store.Versioned

/** `TableCatalog` plugin resolving NAMES to versioned-store paths — the
  * open-a-collection-by-name UX (the reference's Chroma
  * `get_or_create_collection(name)`, `app.py:73-76`) lifted to pure SQL:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
  * spark.conf.set("spark.sql.catalog.graft.root", "/data/graft")
  * CREATE TABLE graft.chunks (id BIGINT, text STRING)
  * INSERT INTO graft.chunks SELECT ...
  * SELECT * FROM graft.chunks VERSION AS OF 3      -- time travel
  * SELECT * FROM graft.chunks TIMESTAMP AS OF '...'
  * DELETE FROM graft.chunks WHERE id < 10          -- file-pruned rewrite
  * DROP TABLE graft.chunks
  * }}}
  *
  * Resolution is one directory convention (`<root>/<table name>` — a
  * table IS its manifest dir, so the catalog keeps NO state of its own
  * and any number of sessions/clusters share it through the store's own
  * optimistic-commit protocol). `CREATE TABLE` publishes version 1 as a
  * schema-marker-only manifest ([[Versioned.initTable]]), so empty
  * tables are immediately readable and INSERT-able; `VERSION AS OF`
  * resolves through [[TableCatalog.loadTable(Identifier, String)]] and
  * `TIMESTAMP AS OF` through the epoch-micros overload onto the
  * manifest-mtime rule of [[Versioned.versionAsOf]]. Namespaces are flat
  * (the store has no schema levels) — the empty namespace is the only
  * one, mirroring a Chroma server's flat collection list. */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with FunctionCatalog with StagingTableCatalog with ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.ViewCatalog {

  private var catalogName: String = _
  private var root: File = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val r = Option(options.get("root")).getOrElse(sys.error(
      s"GraftCatalog '$name' requires spark.sql.catalog.$name.root=<dir>"))
    root = new File(r).getAbsoluteFile
    root.mkdirs(): Unit
  }

  override def name(): String = catalogName

  private def requireFlat(ns: Array[String]): Unit =
    if (ns.nonEmpty) throw new NoSuchNamespaceException(ns)

  private def pathOf(ident: Identifier): String = {
    requireFlat(ident.namespace())
    require(!ident.name.contains("/") && !ident.name.startsWith("."),
      s"illegal table name ${ident.name}")
    new File(root, ident.name).getAbsolutePath
  }

  private def existsAt(path: String): Boolean =
    Versioned.currentVersion(path) > 0

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    requireFlat(namespace)
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && new File(d, "_manifests").isDirectory &&
        // hidden dirs are CTAS staging areas (`.ctas-*`), never tables —
        // pathOf rejects leading '.' so they are unaddressable anyway
        !d.getName.startsWith("."))
      .map(d => Identifier.of(Array.empty, d.getName))
      .sortBy(_.name)
  }

  override def loadTable(ident: Identifier): Table =
    loadVersion(ident, None)

  /** `VERSION AS OF <n>` — pins the read to manifest version n. */
  override def loadTable(ident: Identifier, version: String): Table =
    loadVersion(ident,
      Some(scala.util.Try(version.trim.toInt).getOrElse(
        throw new NoSuchTableException(ident))))

  /** `TIMESTAMP AS OF <ts>` — Spark hands epoch MICROseconds; the store
    * resolves by manifest publish time (millis). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    loadVersion(ident, Some(
      Versioned.versionAsOf(pathOf(ident), timestampMicros / 1000L)))

  private def loadVersion(ident: Identifier, version: Option[Int]): Table = {
    val path = pathOf(ident)
    if (!existsAt(path)) throw new NoSuchTableException(ident)
    // hand the marker StructType down VERBATIM: column DEFAULT metadata
    // (X259) lives in field metadata, which the MessageType round-trip
    // inside footerSchema strips
    new VersionedTable(path, version, VersionedV2.footerSchema(path, version),
      Versioned.schemaOf(path, version))
  }

  override def tableExists(ident: Identifier): Boolean =
    existsAt(pathOf(ident))

  /** Declares ANSI-constraint support (routes `ALTER TABLE ... ADD/DROP
    * CONSTRAINT` to [[alterTable]], X257) and column DEFAULT support
    * (X259 — `CREATE TABLE (c BIGINT DEFAULT 42)` records the default
    * expression in the schema-marker field metadata; INSERTs omitting
    * the column fill it analyzer-side from [[loadTable]]'s schema). */
  override def capabilities()
      : util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    util.EnumSet.of(
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = pathOf(ident)
    if (existsAt(path)) throw new TableAlreadyExistsException(ident)
    // the name space is shared with VIEWS (the parser expands a matching
    // view BEFORE analysis): a table created under a view's name would be
    // silently shadowed and unreachable
    require(!GraftViews.exists(root, ident.name),
      s"a view named ${ident.name} exists — drop it first")
    require(partitions.isEmpty,
      "graft catalog: partition transforms are not supported — the store " +
        "skips by manifest stats/bloom markers, not directory layout")
    Versioned.initTable(path, schema): Unit
    loadTable(ident)
  }

  /** `ALTER TABLE ... ADD COLUMN` — a metadata-only schema-marker
    * replacement ([[Versioned.replaceSchemaMarker]]); existing files
    * serve NULL for the new column under the recorded-schema read (the
    * append-time evolution contract, now reachable from SQL). Other
    * ALTER shapes stay out of scope (renameColumn/addConstraint are the
    * library routes). */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val path = pathOf(ident)
    if (!existsAt(path)) throw new NoSuchTableException(ident)
    changes.foreach {
      case add: TableChange.AddColumn if add.fieldNames().length == 1 =>
        val name = add.fieldNames().head
        // any `DEFAULT <expr>` on the added column must land in the
        // field METADATA the analyzer reads back (the same
        // CURRENT_DEFAULT/EXISTS_DEFAULT keys CREATE TABLE records) —
        // dropping it silently fills NULL on later INSERTs while the
        // ALTER reported success (ADVICE r12). Spark's own V2-column
        // conversion builds the metadata, so round-trip through it.
        val field = org.apache.spark.sql.graftbridge.ColumnBridge
          .v2ColumnToStructField(
            org.apache.spark.sql.connector.catalog.Column.create(
              name, add.dataType(), true, add.comment(),
              add.defaultValue(), null))
        // the widen function re-runs inside the retry loop against each
        // attempt's CURRENT marker, so a concurrently added column is
        // carried into the new marker instead of silently dropped
        Versioned.replaceSchemaMarker(path, markerOpt => {
          val cur = markerOpt.getOrElse(
            VersionedV2.sparkSchema(VersionedV2.footerSchema(path, None)))
          require(!cur.fieldNames.contains(name),
            s"column $name already exists in ${ident.name}")
          cur.add(field)
        }): Unit
      // `ALTER TABLE ... DROP COLUMN c` — zero-rewrite logical drop
      // ([[Versioned.dropColumn]]): metadata-only marker swap plus a
      // tombstone that blocks same-name re-adds (no field IDs)
      case del: TableChange.DeleteColumn if del.fieldNames().length == 1 =>
        Versioned.dropColumn(
          org.apache.spark.sql.SparkSession.active, path,
          del.fieldNames().head): Unit
      // `ALTER TABLE ... ALTER COLUMN c TYPE bigint` — zero-rewrite
      // lossless numeric widening ([[Versioned.widenColumn]]): narrow
      // files stay as written, the scan upcasts them
      case wide: TableChange.UpdateColumnType if wide.fieldNames().length == 1 =>
        Versioned.widenColumn(
          org.apache.spark.sql.SparkSession.active, path,
          wide.fieldNames().head, wide.newDataType()): Unit
      // ANSI SQL `ALTER TABLE ... ADD CONSTRAINT ck CHECK (expr)` (X257)
      // onto the store's validated CHECK markers: existing rows are
      // validated FIRST (a violated constraint is rejected, Delta's
      // contract) and every subsequent write re-validates — the store's
      // own commit gate, not a Spark-side best-effort
      case add: TableChange.AddConstraint =>
        add.constraint() match {
          case ck: org.apache.spark.sql.connector.catalog.constraints.Check =>
            Versioned.addConstraint(
              org.apache.spark.sql.SparkSession.active, path,
              ck.name(), ck.predicateSql()): Unit
          case other => throw new UnsupportedOperationException(
            s"graft catalog: only CHECK constraints are enforced, got " +
              s"${other.toDDL} — unique/pk/fk are informational-only " +
              "concepts this store does not record")
        }
      case drop: TableChange.DropConstraint =>
        Versioned.dropConstraint(path, drop.name()): Unit
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER TABLE change $other — only " +
          "top-level ADD/DROP COLUMN, ALTER COLUMN TYPE (lossless " +
          "widening), and CHECK constraints are supported " +
          "(rename goes through Versioned.renameColumn)")
    }
    loadTable(ident)
  }

  /** CLONE CONTRACT (the Delta shallow-clone rule): a shallow clone
    * references this table's data files by ABSOLUTE path, so dropping a
    * clone SOURCE breaks every clone of it — exactly as Delta documents
    * (`VACUUM`/`DROP` on the source invalidates shallow clones). Drop is
    * still allowed (the clones were free; re-clone or
    * [[Versioned.restore]] from a deep copy), but see [[renameTable]]
    * for the rename-side guard. */
  override def dropTable(ident: Identifier): Boolean = {
    val path = pathOf(ident)
    if (!existsAt(path)) return false
    def rm(f: File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    rm(new File(path))
    true
  }

  /** Renames the table DIRECTORY (zero data movement). CLONE CONTRACT:
    * a shallow clone references the source's files by absolute path, so
    * renaming a clone SOURCE would silently break every clone — unlike
    * drop (above, Delta's documented contract), a rename looks harmless,
    * so this one is GUARDED: sibling tables under the same root are
    * scanned for manifest lines referencing the old absolute prefix and
    * the rename fails loudly if any clone would dangle. (Clones
    * elsewhere on the filesystem are undetectable — documented gap, same
    * as Delta's.) */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = pathOf(oldIdent)
    val to = pathOf(newIdent)
    if (!existsAt(from)) throw new NoSuchTableException(oldIdent)
    if (existsAt(to)) throw new TableAlreadyExistsException(newIdent)
    val dependents = listTables(Array.empty)
      .map(i => pathOf(i)).filter(_ != from)
      .filter(p => Versioned.referencesPrefix(p, from))
    require(dependents.isEmpty,
      s"rename ${oldIdent.name} -> ${newIdent.name}: ${dependents.size} " +
        s"sibling table(s) shallow-clone it by absolute path " +
        s"(${dependents.map(new File(_).getName).mkString(", ")}) — " +
        "renaming would dangle their references; drop or re-clone them first")
    require(new File(from).renameTo(new File(to)),
      s"rename $from -> $to failed")
  }

  // -------------------------------------- FunctionCatalog: SQL retrieval

  /** Vector-distance functions by catalog name ([[CatalogVecFunctions]]) — a
    * fresh SQL session can phrase the reference's k-NN retrieval
    * (`collection.query`, app.py:409) with zero pre-registered Scala:
    * `ORDER BY <cat>.vec_squared_l2(embedding, <query>) LIMIT k`. */
  override def listFunctions(namespace: Array[String]): Array[Identifier] = {
    requireFlat(namespace)
    CatalogVecFunctions.names.map(n => Identifier.of(Array.empty, n)).toArray
  }

  override def loadFunction(ident: Identifier): UnboundFunction = {
    requireFlat(ident.namespace())
    CatalogVecFunctions.load(ident.name).getOrElse(
      throw new NoSuchFunctionException(ident))
  }

  // --------------------------------- StagingTableCatalog: atomic CTAS

  /** Atomic `CREATE TABLE AS SELECT`: data stages invisibly and
    * publishes WITH the schema as one version-1 manifest commit
    * ([[GraftStagedTable]]); an aborted CTAS leaves nothing behind. */
  override def stageCreate(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable = {
    val path = pathOf(ident)
    if (existsAt(path)) throw new TableAlreadyExistsException(ident)
    require(!GraftViews.exists(root, ident.name),
      s"a view named ${ident.name} exists — drop it first")
    require(partitions.isEmpty,
      "graft catalog: partition transforms are not supported — the store " +
        "skips by manifest stats/bloom markers, not directory layout")
    new GraftStagedTable(ident, path, schema)
  }

  // ---------------------------------- ProcedureCatalog: maintenance SQL

  /** `CALL <cat>.system.<proc>(...)` — optimize / compact_small /
    * analyze_stats / analyze_bloom / vacuum ([[GraftProcedures]]). */
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.names.map(n => Identifier.of(Array("system"), n)).toArray

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    def notFound() = new RuntimeException(
      s"graft catalog: no procedure $ident — available: " +
        GraftProcedures.names.map(n => s"system.$n").mkString(", "))
    if (!(ident.namespace().isEmpty ||
        ident.namespace().toSeq == Seq("system"))) throw notFound()
    GraftProcedures.load(ident.name,
        name => pathOf(Identifier.of(Array.empty, name)))
      .getOrElse(throw notFound())
  }

  // ------------------------------------------- ViewCatalog: CREATE VIEW

  /** `CREATE [OR REPLACE] VIEW <cat>.v AS SELECT ...` / `DROP VIEW` /
    * `SHOW VIEWS` (X278 — [[GraftViews]]): a view is one metadata file
    * under the hidden `<root>/.views/` dir, published put-if-absent so
    * racing CREATEs serialize with a loud loser. Views compose with the
    * whole surface — time travel, the catalog's vector functions,
    * other views. */
  override def listViews(namespace: String*): Array[Identifier] = {
    requireFlat(namespace.toArray)
    GraftViews.list(root).map(n => Identifier.of(Array.empty, n)).toArray
  }

  override def loadView(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.View = {
    requireFlat(ident.namespace())
    GraftViews.load(root, ident.name).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident))
  }

  override def viewExists(ident: Identifier): Boolean =
    ident.namespace().isEmpty && GraftViews.exists(root, ident.name)

  override def createView(
      info: org.apache.spark.sql.connector.catalog.ViewInfo)
      : org.apache.spark.sql.connector.catalog.View = {
    requireFlat(info.ident().namespace())
    require(!info.ident().name.contains("/") &&
      !info.ident().name.startsWith("."),
      s"illegal view name ${info.ident().name}")
    if (existsAt(pathOf(info.ident())))
      throw new TableAlreadyExistsException(info.ident())
    if (!GraftViews.create(root, info))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(info.ident())
    loadView(info.ident())
  }

  /** Atomic CREATE OR REPLACE VIEW ([[GraftViews.replace]]): the new
    * definition stages fully-written, then ONE atomic rename swaps it in
    * — concurrent readers see old or new, never NoSuchView, and a crash
    * before the swap leaves the old definition intact (the previous
    * drop-then-create had both holes). Not part of the `ViewCatalog`
    * interface (Spark routes view DDL to the session catalog — see
    * [[graft.plans.GraftViewParser]]); called by the injected command. */
  def replaceView(info: org.apache.spark.sql.connector.catalog.ViewInfo)
      : org.apache.spark.sql.connector.catalog.View = {
    requireFlat(info.ident().namespace())
    require(!info.ident().name.contains("/") &&
      !info.ident().name.startsWith("."),
      s"illegal view name ${info.ident().name}")
    if (existsAt(pathOf(info.ident())))
      throw new TableAlreadyExistsException(info.ident())
    GraftViews.replace(root, info)
    loadView(info.ident())
  }

  override def alterView(ident: Identifier,
      changes: org.apache.spark.sql.connector.catalog.ViewChange*)
      : org.apache.spark.sql.connector.catalog.View =
    throw new UnsupportedOperationException(
      "graft catalog: ALTER VIEW property changes are not supported — " +
        "use CREATE OR REPLACE VIEW")

  override def dropView(ident: Identifier): Boolean =
    ident.namespace().isEmpty && GraftViews.drop(root, ident.name)

  override def renameView(oldIdent: Identifier, newIdent: Identifier): Unit = {
    requireFlat(oldIdent.namespace()); requireFlat(newIdent.namespace())
    if (!GraftViews.exists(root, oldIdent.name))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(oldIdent)
    if (!GraftViews.rename(root, oldIdent.name, newIdent.name))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(newIdent)
  }

  // ------------------------------------------------ flat namespace surface

  override def listNamespaces(): Array[Array[String]] = Array(Array.empty)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    requireFlat(namespace)
    Array.empty
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] = {
    requireFlat(namespace)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: the namespace is flat")

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: the namespace is flat")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(
      "graft catalog: the namespace is flat")
}
