package graft.sources

import java.io.File
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{Identifier, StagedTable, SupportsWrite, TableCapability}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.store.Versioned

/** SQL-reachable vector-distance functions served by the
  * [[GraftCatalog]]'s `FunctionCatalog` surface — the retrieval call the
  * reference makes by library name (`collection.query`, app.py:409)
  * phrasable as PURE SQL on a fresh session with nothing pre-registered:
  *
  * {{{
  * SELECT id FROM graft.chunks
  * ORDER BY graft.vec_squared_l2(embedding, array(...)), id LIMIT 13
  * }}}
  *
  * Each binds to a `ScalarFunction` carrying the MAGIC `invoke` method
  * (Spark compiles the call to a direct `Invoke` — no InternalRow boxing,
  * stays inside whole-stage codegen). Numerics are the house contract
  * (graft.core.FloatVecFold): every element widened to double, strict
  * left-to-right accumulation, length mismatch folds the shorter prefix —
  * bit-identical to the Catalyst expressions and the DuckDB oracle. */
private[sources] object CatalogVecFunctions {

  val names: Seq[String] = Seq("vec_squared_l2", "vec_cosine_sim", "vec_dot")

  def load(name: String): Option[UnboundFunction] = name match {
    case "vec_squared_l2" => Some(new VecUnbound(name, new VecSquaredL2Fn))
    case "vec_cosine_sim" => Some(new VecUnbound(name, new VecCosineSimFn))
    case "vec_dot" => Some(new VecUnbound(name, new VecDotFn))
    case _ => None
  }

  class VecUnbound(fname: String, bound: BoundFunction)
      extends UnboundFunction {
    override def name(): String = fname
    override def description(): String =
      s"$fname(array<float>, array<float>) -> double"
    override def bind(inputType: StructType): BoundFunction = {
      def vec(t: DataType) = t match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }
      require(inputType.fields.length == 2 &&
        inputType.fields.forall(f => vec(f.dataType)),
        s"$fname expects (array<float>, array<float>), got " +
          inputType.fields.map(_.dataType.catalogString).mkString(", "))
      bound
    }
  }

  // classes are PUBLIC: whole-stage codegen calls the magic invoke from a
  // generated class in another package — a private nested class would
  // fail Janino accessibility and silently fall back to interpreted eval
  abstract class VecFn(fname: String)
      extends ScalarFunction[java.lang.Double] {
    override def name(): String = fname
    override def canonicalName(): String = s"graft.$fname"
    override def inputTypes(): Array[DataType] =
      Array(ArrayType(FloatType), ArrayType(FloatType))
    override def resultType(): DataType = DoubleType
    override def isResultNullable: Boolean = false
    // the magic method Spark's resolver compiles to a direct Invoke
    def invoke(a: ArrayData, b: ArrayData): Double
    override def produceResult(input: InternalRow): java.lang.Double =
      invoke(input.getArray(0), input.getArray(1))
  }

  class VecSquaredL2Fn extends VecFn("vec_squared_l2") {
    override def invoke(a: ArrayData, b: ArrayData): Double = {
      val n = math.min(a.numElements(), b.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
        acc += d * d
        i += 1
      }
      acc
    }
  }

  class VecCosineSimFn extends VecFn("vec_cosine_sim") {
    override def invoke(a: ArrayData, b: ArrayData): Double = {
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0; var aa = 0.0; var bb = 0.0
      var i = 0
      while (i < n) {
        val x = a.getFloat(i).toDouble
        val y = b.getFloat(i).toDouble
        dot += x * y; aa += x * x; bb += y * y
        i += 1
      }
      dot / (math.sqrt(aa) * math.sqrt(bb))
    }
  }

  class VecDotFn extends VecFn("vec_dot") {
    override def invoke(a: ArrayData, b: ArrayData): Double = {
      val n = math.min(a.numElements(), b.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
      acc
    }
  }
}

/** Atomic `CREATE TABLE AS SELECT` (`StagingTableCatalog`): tasks stage
  * uniquely-named parquet files under the would-be table dir (referenced
  * by NO manifest — invisible), and `commitStagedChanges` publishes
  * schema marker AND data lines as ONE version-1 manifest commit
  * ([[Versioned.initTableWithFiles]]). A failed/aborted CTAS deletes the
  * staged files and leaves NO table behind — unlike create-then-insert,
  * which strands an observable empty table on insert failure. The
  * first-write-creates semantics of the reference's
  * `Chroma(documents=…)` (multiple_document_upload.py:161-166). */
private[sources] class GraftStagedTable(ident: Identifier, path: String,
    tableSchema: StructType) extends StagedTable with SupportsWrite {

  /** Each CTAS stages into its OWN hidden sibling directory
    * (`.ctas-<name>-<uuid>` — table names may not start with '.', so no
    * collision with a real table, and the catalog's listing skips
    * hidden dirs). Two concurrent CTAS to the same name therefore never
    * share a staging area: the loser's abort removes only ITS dir, and
    * publication is one atomic directory rename — the winner's
    * just-published manifest can no longer be destroyed by a racing
    * abort (ADVICE r12). Manifests reference data files by RELATIVE
    * path, so the rename moves the fully-formed table wholesale. */
  private val staging = new File(new File(path).getParentFile,
    s".ctas-${ident.name}-${java.util.UUID.randomUUID().toString.take(8)}")

  @volatile private var stagedRel: Seq[String] = Seq.empty

  override def name(): String = s"graft.${ident.name}"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write =
        new StagedCreateWrite(staging.getAbsolutePath, info.schema(),
          rel => stagedRel = rel)
    }

  /** Publish = commit the version-1 manifest INSIDE the staging dir (the
    * table is fully formed but invisible — its name is not a legal table
    * name), then ONE atomic rename into place. A concurrent CTAS that
    * won the race leaves the target existing and the rename fails — this
    * loser cleans up its own staging dir and reports the conflict; the
    * winner's table is untouched. */
  override def commitStagedChanges(): Unit = {
    val stagingPath = staging.getAbsolutePath
    if (stagedRel.isEmpty) Versioned.initTable(stagingPath, tableSchema)
    else Versioned.initTableWithFiles(stagingPath, tableSchema, stagedRel)
    if (!staging.renameTo(new File(path))) {
      abortStagedChanges()
      throw new IllegalStateException(
        s"CTAS commit conflict: ${ident.name} was created concurrently — " +
          "this write's staged data has been discarded")
    }
  }

  /** Abort = remove THIS write's private staging directory, nothing
    * else. Deleting only the job-abort message list is NOT enough:
    * tasks that finished before the failing one leave committed staged
    * files the job-level abort may never see (plus .crc sidecars) — but
    * the blast radius stays confined to our own uuid-suffixed dir, so a
    * concurrently-published winner at the REAL path is never touched. */
  override def abortStagedChanges(): Unit = {
    def rm(f: File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    // the failing job KILLS its sibling tasks asynchronously — a task
    // interrupted mid-write can recreate the staging dir (the lazy
    // writer's mkdirs + a .crc sidecar) AFTER a single sweep. Re-sweep
    // until the dir stays gone; bounded so a wedged executor can't hang
    // the abort (leftovers are invisible-by-name and vacuumable).
    rm(staging)
    var tries = 0
    while (staging.exists() && tries < 50) {
      Thread.sleep(100); rm(staging); tries += 1
    }
  }
}

/** The staged-CTAS write: the normal task-level staging machinery
  * ([[VersionedWriterFactory]] — unique file per non-empty task), but
  * job commit only RECORDS the staged file list; publication is deferred
  * to the catalog's `commitStagedChanges` so schema and data land in one
  * atomic manifest commit. */
private[sources] class StagedCreateWrite(table: String, schema: StructType,
    onCommit: Seq[String] => Unit) extends Write with BatchWrite {

  private val batchDir =
    s"ctas-${java.util.UUID.randomUUID().toString.take(8)}"
  private val msgString = VersionedV2.messageType(schema).toString

  override def toBatch: BatchWrite = this
  override def useCommitCoordinator(): Boolean = true

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    VersionedWriterFactory(new File(table).getAbsolutePath, batchDir,
      schema, msgString)

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    onCommit(messages.flatMap {
      case VersionedCommitMessage(fs) => fs
      case other => sys.error(s"unexpected commit message $other")
    }.toSeq)

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case VersionedCommitMessage(fs) =>
        fs.foreach { r =>
          val f = new File(table, r)
          f.delete(): Unit
          new File(f.getParentFile, s".${f.getName}.crc").delete(): Unit
          f.getParentFile.delete(): Unit // batch dir, only when emptied
        }
      case _ => ()
    }
}

/** SQL maintenance verbs (`ProcedureCatalog`) — the background jobs that
  * keep a 100 TB table healthy, each one `CALL` away with no Scala:
  *
  * {{{
  * CALL graft.system.optimize('ev', 'user_id', 'v_e2')   -- ZORDER rewrite
  * CALL graft.system.compact_small('ev')                 -- small-file sweep
  * CALL graft.system.analyze_stats('ev', 'user_id')      -- min/max markers
  * CALL graft.system.analyze_bloom('ev', 'event_id')     -- bloom markers
  * CALL graft.system.vacuum('ev', 2, 0)                  -- reclaim files
  * }}}
  *
  * Each delegates to the existing engine ([[Versioned.optimize]] /
  * [[Versioned.compactSmall]] / [[Versioned.analyzeStats]] /
  * [[Versioned.analyzeBloom]] / [[Versioned.vacuum]]) and returns a
  * one-row result scan so the caller sees the landed version / reclaim
  * count. This is the Delta `OPTIMIZE`/`VACUUM`/`ANALYZE` surface over
  * the manifest store. */
private[sources] object GraftProcedures {

  val names: Seq[String] =
    Seq("optimize", "compact_small", "analyze_stats", "analyze_bloom",
      "vacuum", "restore", "clone", "delete_mor", "fsck")

  def load(name: String, resolve: String => String): Option[UnboundProcedure] =
    name match {
      case "optimize" => Some(proc(name,
        Seq(p("table", StringType), p("x", StringType), p("y", StringType)),
        out = Seq("version" -> LongType),
        (spark, in) => Seq(Versioned.optimize(spark, resolve(str(in, 0)),
          str(in, 1), str(in, 2)).toLong)))
      case "compact_small" => Some(proc(name,
        Seq(p("table", StringType)),
        out = Seq("version" -> LongType),
        (spark, in) => Seq(Versioned.compactSmall(spark,
          resolve(str(in, 0))).toLong)))
      case "analyze_stats" => Some(proc(name,
        Seq(p("table", StringType), p("column", StringType)),
        out = Seq("version" -> LongType),
        (spark, in) => Seq(Versioned.analyzeStats(spark, resolve(str(in, 0)),
          str(in, 1)).toLong)))
      case "analyze_bloom" => Some(proc(name,
        Seq(p("table", StringType), p("column", StringType)),
        out = Seq("version" -> LongType),
        (spark, in) => Seq(Versioned.analyzeBloom(spark, resolve(str(in, 0)),
          str(in, 1)).toLong)))
      case "vacuum" => Some(proc(name,
        Seq(p("table", StringType), p("keep_versions", IntegerType),
          p("min_age_ms", LongType)),
        out = Seq("deleted_files" -> LongType),
        (spark, in) => Seq(Versioned.vacuum(resolve(str(in, 0)),
          in.getInt(1), in.getLong(2)).toLong)))
      // Delta's RESTORE: republish an old version's manifest as the new
      // head — pure metadata (works only while the target's files
      // survive vacuum, the documented contract)
      case "restore" => Some(proc(name,
        Seq(p("table", StringType), p("to_version", IntegerType)),
        out = Seq("version" -> LongType),
        (spark, in) => Seq(Versioned.restore(resolve(str(in, 0)),
          in.getInt(1)).toLong)))
      // zero-copy shallow clone into a sibling table of the same catalog
      case "clone" => Some(proc(name,
        Seq(p("source", StringType), p("target", StringType)),
        out = Seq("version" -> LongType),
        (spark, in) => Seq(Versioned.shallowClone(resolve(str(in, 0)),
          resolve(str(in, 1))).toLong)))
      // merge-on-read DELETE (X271 as SQL): positions to sidecars, no
      // file rewrites — contrast `DELETE FROM`, the copy-on-write route
      case "delete_mor" => Some(proc(name,
        Seq(p("table", StringType), p("predicate", StringType)),
        out = Seq("version" -> LongType),
        (spark, in) => Seq(Versioned.deleteWhereMor(spark, resolve(str(in, 0)),
          org.apache.spark.sql.functions.expr(str(in, 1))).toLong)))
      // store integrity audit (X285): metadata + listing only, no data IO
      case "fsck" => Some(proc(name,
        Seq(p("table", StringType)),
        out = Seq("checked_versions" -> LongType,
          "checked_files" -> LongType, "missing_files" -> LongType,
          "missing_sidecars" -> LongType, "orphan_files" -> LongType,
          "dangling_markers" -> LongType),
        (spark, in) => {
          val r = Versioned.fsck(resolve(str(in, 0)))
          Seq(r.checkedVersions.toLong, r.checkedFiles, r.missingFiles,
            r.missingSidecars, r.orphanFiles, r.danglingMarkers)
        }))
      case _ => None
    }

  private def p(n: String, t: DataType): ProcedureParameter =
    ProcedureParameter.in(n, t).build()

  private def str(in: InternalRow, i: Int): String =
    in.getUTF8String(i).toString

  private def proc(procName: String, params: Seq[ProcedureParameter],
      out: Seq[(String, DataType)],
      run: (SparkSession, InternalRow) => Seq[Any]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = s"graft maintenance: $procName"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String = s"graft maintenance: $procName"
          override def parameters(): Array[ProcedureParameter] = params.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): util.Iterator[Scan] = {
            val vals = run(SparkSession.active, input).map {
              case s: String => UTF8String.fromString(s)
              case other => other
            }.toArray
            val resultSchema = StructType(out.map { case (n, t) =>
              StructField(n, t, nullable = false) })
            util.Collections.singletonList(new LocalScan {
              override def rows(): Array[InternalRow] =
                Array(new GenericInternalRow(vals))
              override def readSchema(): StructType = resultSchema
            }: Scan).iterator()
          }
        }
    }
}


/** Cross-package accessor for the view-SQL parser rule
  * ([[graft.plans.GraftViewParser]] — it lives with the other plan-level
  * machinery, outside this package's private scope). */
object GraftViewsBridge {
  def queryText(root: File, view: String): Option[String] =
    GraftViews.load(root, view).map(_.query())
}

/** Connector-shaped staging for the STORE's own rewrite/append paths
  * (ADVICE r13): `array<float>` columns must land as the connector's
  * 2-level repeated-FLOAT parquet shape — Spark's native writer emits
  * 3-level LIST groups, which the V2 readers reject loudly, so a
  * compact / CoW delete / merge / MoR update staged natively on an
  * embedding-bearing catalog table would break every later V2 read of
  * the rewritten files. [[graft.store.Versioned]]'s staging helper
  * routes array-bearing frames here; scalar-only frames keep the native
  * vectorized writer (faster, and both readers accept its output).
  *
  * Null-array caveat, inherited from the shape itself: repeated-FLOAT
  * cannot distinguish absent from empty, so a NULL array staged through
  * this path reads back as the EMPTY array — the connector's documented
  * round-trip contract ([[VersionedV2.messageType]]). */
private[graft] object V2Shape {

  /** Does `schema` NEED connector-shaped staging (has a float-array
    * column) and CAN this writer carry it (every field in the
    * connector's scoped type set)? Frames with arrays but out-of-scope
    * siblings fall back to native staging — they were never V2-readable
    * to begin with. */
  def needsV2Staging(schema: StructType): Boolean =
    schema.fields.exists(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }) && schema.fields.forall(_.dataType match {
      case LongType | IntegerType | DoubleType | FloatType | BooleanType |
           StringType | TimestampType | DateType => true
      case dt: DecimalType => dt.precision <= 18
      case ArrayType(FloatType, _) => true
      case _ => false
    })

  /** Write `df` as connector-shaped parquet under `tableAbs/batchDir`,
    * one file per non-empty partition, and return the staged files'
    * table-relative paths. Task-attempt-unique names keep speculative /
    * retried attempts from colliding; losers' files are unreferenced
    * orphans exactly like an aborted append's (vacuum's problem, never
    * a manifest's). */
  def stage(df: org.apache.spark.sql.DataFrame, tableAbs: String,
      batchDir: String): Seq[String] = {
    val schema = df.schema
    val msgString = VersionedV2.messageType(schema).toString
    // whole-NULL arrays cannot ride this shape: repeated-FLOAT reads an
    // absent field back as the EMPTY array, so staging a NULL through
    // here would silently mutate it to [] — a data change from rewrite
    // operations (compact/optimize/merge) contracted to preserve the row
    // multiset. The DIRECT connector write path documents []-for-NULL as
    // its round-trip contract; the staging seam rejects instead, loudly,
    // mirroring the writer's null-ELEMENT check (ADVICE r14 medium).
    val arrayIdx = schema.fields.zipWithIndex.collect {
      case (f, i) if f.dataType.isInstanceOf[
        org.apache.spark.sql.types.ArrayType] => (f.name, i)
    }
    df.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(pid.toLong)
        val w = new VersionedDataWriter(tableAbs, batchDir, pid, attempt,
          schema, msgString)
        var ok = false
        try {
          while (it.hasNext) {
            val r = it.next()
            arrayIdx.foreach { case (name, i) =>
              require(!r.isNullAt(i),
                s"column $name: NULL arrays are not stageable through the " +
                  "connector shape (repeated-FLOAT reads NULL back as []) " +
                  "— coalesce or filter NULL arrays before a store rewrite")
            }
            w.write(r)
          }
          val rel = w.commit() match {
            case VersionedCommitMessage(fs) => fs
            case other => sys.error(s"unexpected commit message $other")
          }
          ok = true
          rel.iterator
        } finally if (!ok) w.abort()
      }
    }.collect().toSeq
  }
}

/** SQL view persistence for the catalog (`ViewCatalog`, X278): a view is
  * PURE METADATA — the defining SQL text plus the resolution context
  * Spark needs to re-expand it (current catalog/namespace, the analyzed
  * schema, column aliases/comments, properties). Each view is one
  * `java.util.Properties` file under the hidden `<root>/.views/` dir
  * (hidden names are unaddressable as tables, so no collision), and
  * CREATE publishes via the same temp-file + `link(2)` put-if-absent the
  * manifest commits use — two racing `CREATE VIEW v` serialize with the
  * loser failing loudly, never a torn half-written definition.
  *
  * Reference tie: the reference hardcodes its retrieval SQL in app code
  * (app.py:409); a catalog view is how a SQL user names that query once
  * and reuses it (`CREATE VIEW hot_chunks AS SELECT ... ORDER BY
  * vec_squared_l2(...)`). */
private[sources] object GraftViews {

  // array-element separator inside one value (unit separator — cannot
  // appear in SQL text or identifiers); NUL marks a null array slot
  private val Sep = '\u001f'
  private val NullMark = "\u0000"

  private def dir(root: File) = new File(root, ".views")
  private def fileOf(root: File, name: String) =
    new File(dir(root), s"$name.properties")

  def list(root: File): Seq[String] =
    Option(dir(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".properties"))
      .map(_.getName.stripSuffix(".properties")).toSeq.sorted

  def exists(root: File, name: String): Boolean = fileOf(root, name).exists()

  private def enc(a: Array[String]): String =
    Option(a).getOrElse(Array.empty)
      .map(v => if (v == null) NullMark else v).mkString(Sep.toString)
  private def dec(s: String): Array[String] =
    if (s == null || s.isEmpty) Array.empty
    else s.split(Sep).map(v => if (v == NullMark) null else v)

  /** Stage `info`'s definition as a fully-written temp file in the views
    * dir — the shared first half of [[create]] and [[replace]]. */
  private def stageDefinition(root: File,
      info: org.apache.spark.sql.connector.catalog.ViewInfo): File = {
    dir(root).mkdirs()
    val p = new java.util.Properties()
    p.setProperty("sql", info.sql())
    p.setProperty("currentCatalog", info.currentCatalog())
    p.setProperty("currentNamespace", enc(info.currentNamespace()))
    p.setProperty("schema", info.schema().json)
    p.setProperty("queryColumnNames", enc(info.queryColumnNames()))
    p.setProperty("columnAliases", enc(info.columnAliases()))
    p.setProperty("columnComments", enc(info.columnComments()))
    Option(info.properties()).foreach(_.forEach((k, v) =>
      p.setProperty(s"prop.$k", v)))
    val tmp = File.createTempFile(s".${info.ident().name()}-", ".tmp", dir(root))
    val out = new java.io.FileOutputStream(tmp)
    try p.store(out, null) finally out.close()
    tmp
  }

  /** Put-if-absent create: returns false when the name was taken (the
    * concurrent-CREATE loser). */
  def create(root: File,
      info: org.apache.spark.sql.connector.catalog.ViewInfo): Boolean = {
    val tmp = stageDefinition(root, info)
    try {
      java.nio.file.Files.createLink(
        fileOf(root, info.ident().name()).toPath, tmp.toPath)
      tmp.delete()
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => tmp.delete(); false
    }
  }

  /** Atomic create-or-replace: stage the new definition and swap it into
    * place with ONE atomic rename — a concurrent reader sees the old
    * definition or the new one, never a missing view, and a crash before
    * the swap leaves the old definition fully readable (the drop-then-
    * create form had both holes — VERDICT r13). Last-writer-wins between
    * racing REPLACEs, by design. */
  def replace(root: File,
      info: org.apache.spark.sql.connector.catalog.ViewInfo): Unit = {
    val tmp = stageDefinition(root, info)
    java.nio.file.Files.move(tmp.toPath,
      fileOf(root, info.ident().name()).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def drop(root: File, name: String): Boolean = fileOf(root, name).delete()

  /** RENAME with create's put-if-absent discipline: link(2) the source
    * under the target name (fails loudly with EEXIST if taken — the old
    * check-then-act + renameTo could silently clobber a concurrently
    * created target, ADVICE r13), then unlink the source. */
  def rename(root: File, from: String, to: String): Boolean = {
    val src = fileOf(root, from)
    if (!src.exists()) return false
    try {
      java.nio.file.Files.createLink(fileOf(root, to).toPath, src.toPath)
      src.delete()
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
      // source vanished between exists() and link(2) (concurrent DROP):
      // the view is gone, which is rename's boolean not-found outcome —
      // the renameTo-era contract — not an exception (ADVICE r14)
      case _: java.nio.file.NoSuchFileException => false
    }
  }

  def load(root: File, viewName: String)
      : Option[org.apache.spark.sql.connector.catalog.View] = {
    val f = fileOf(root, viewName)
    if (!f.exists()) return None
    val p = new java.util.Properties()
    val in = new java.io.FileInputStream(f)
    try p.load(in) finally in.close()
    val props = new util.HashMap[String, String]()
    p.stringPropertyNames().asScala.filter(_.startsWith("prop."))
      .foreach(k => props.put(k.stripPrefix("prop."), p.getProperty(k)))
    Some(new org.apache.spark.sql.connector.catalog.View {
      override def name(): String = viewName
      override def query(): String = p.getProperty("sql")
      override def currentCatalog(): String = p.getProperty("currentCatalog")
      override def currentNamespace(): Array[String] =
        dec(p.getProperty("currentNamespace"))
      override def schema(): StructType =
        DataType.fromJson(p.getProperty("schema")).asInstanceOf[StructType]
      override def queryColumnNames(): Array[String] =
        dec(p.getProperty("queryColumnNames"))
      override def columnAliases(): Array[String] =
        dec(p.getProperty("columnAliases"))
      override def columnComments(): Array[String] =
        dec(p.getProperty("columnComments"))
      override def properties(): util.Map[String, String] = props
    })
  }
}
