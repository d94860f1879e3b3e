package graft.sources

import java.io.File
import java.util

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
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
class GraftCatalog extends TableCatalog with SupportsNamespaces {

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
      .filter(d => d.isDirectory && new File(d, "_manifests").isDirectory)
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
    new VersionedTable(path, version, VersionedV2.footerSchema(path, version))
  }

  override def tableExists(ident: Identifier): Boolean =
    existsAt(pathOf(ident))

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = pathOf(ident)
    if (existsAt(path)) throw new TableAlreadyExistsException(ident)
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
        val cur = Versioned.schemaOf(path).getOrElse(
          VersionedV2.sparkSchema(VersionedV2.footerSchema(path, None)))
        val name = add.fieldNames().head
        require(!cur.fieldNames.contains(name),
          s"column $name already exists in ${ident.name}")
        Versioned.replaceSchemaMarker(path,
          cur.add(org.apache.spark.sql.types.StructField(
            name, add.dataType(), nullable = true))): Unit
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER TABLE change $other — only " +
          "top-level ADD COLUMN is supported (rename/constraints go " +
          "through Versioned.renameColumn/addConstraint)")
    }
    loadTable(ident)
  }

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

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = pathOf(oldIdent)
    val to = pathOf(newIdent)
    if (!existsAt(from)) throw new NoSuchTableException(oldIdent)
    if (existsAt(to)) throw new TableAlreadyExistsException(newIdent)
    require(new File(from).renameTo(new File(to)),
      s"rename $from -> $to failed")
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
