package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

import graft.{SparkSpec, Tables}
import graft.store.Versioned

/** Contract pins for the DataSource V2 connector: decode equality with
  * the native read, planning-time file pruning (stats + bloom), column
  * pruning / COUNT(*), versionAsOf, and null round-trips. */
class VersionedV2Spec extends SparkSpec {
  import spark.implicits._

  private def freshTable(name: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft-v2-$name-")
      .toFile.getAbsolutePath
    new java.io.File(p).delete()
    p
  }

  private def threeSliceTable(): String = {
    val path = freshTable("slices")
    val ev = Tables.events(spark, sfDir).select(col("event_id"),
      col("user_id"), col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("v_e2"))
    // sf0.001 has users 0..14 — slice inside that range so every file
    // is non-empty (empty files get no stats marker by design)
    Versioned.append(ev.filter(col("user_id") < 5).coalesce(1), path)
    Versioned.append(ev.filter(col("user_id").between(5, 9)).coalesce(1), path)
    Versioned.append(ev.filter(col("user_id") >= 10).coalesce(1), path)
    path
  }

  private def v2(path: String) =
    spark.read.format("graft-versioned").option("path", path).load()

  test("connector read equals the native Versioned read") {
    val path = threeSliceTable()
    val native = Versioned.read(spark, path)
      .select("event_id", "user_id", "event_type", "v_e2")
      .as[(Long, Long, String, Long)].collect().sorted
    val viaV2 = v2(path).select("event_id", "user_id", "event_type", "v_e2")
      .as[(Long, Long, String, Long)].collect().sorted
    assert(viaV2.length > 0 && viaV2.toSeq == native.toSeq)
  }

  test("stats pushdown prunes files at planning time") {
    val path = threeSliceTable()
    Versioned.analyzeStats(spark, path, "user_id")
    val unpruned = v2(path)
    assert(unpruned.rdd.getNumPartitions == 3, "one partition per file")
    val pruned = v2(path).filter(col("user_id").between(6, 8))
    assert(pruned.rdd.getNumPartitions == 1,
      "the [6,8] slice lives in exactly one file")
    // and the residual row filter still applies inside the kept file
    val want = Tables.events(spark, sfDir)
      .filter(col("user_id").between(6, 8)).count()
    assert(pruned.count() == want)
  }

  test("bloom pushdown prunes equality probes stats cannot") {
    val path = freshTable("bloom")
    // interleave a hash-like key so min/max envelopes all overlap
    val rows = (0L until 3000L).map(i => (i * 2654435761L % 4096, i))
    Versioned.append(rows.filter(_._2 % 3 == 0).toDF("k", "ord").coalesce(1), path)
    Versioned.append(rows.filter(_._2 % 3 == 1).toDF("k", "ord").coalesce(1), path)
    Versioned.append(rows.filter(_._2 % 3 == 2).toDF("k", "ord").coalesce(1), path)
    Versioned.analyzeStats(spark, path, "k")
    Versioned.analyzeBloom(spark, path, "k", bits = 65536)
    // a key living ONLY in the middle slice — its absence from the other
    // two files is what the blooms must prove
    val probe = rows.groupBy(_._1).collectFirst {
      case (k, vs) if vs.forall(_._2 % 3 == 1) => k
    }.get
    val statsOnly = Versioned.prunedFiles(path, "k", probe, probe)
    assert(statsOnly.size == 3, "overlapping envelopes: stats keep all files")
    val df = v2(path).filter(col("k") === probe)
    assert(df.rdd.getNumPartitions < 3, "bloom must beat stats here")
    assert(df.count() == rows.count(_._1 == probe))
  }

  test("column pruning and COUNT(*) survive an empty projection") {
    val path = threeSliceTable()
    val onlyType = v2(path).select("event_type")
    assert(onlyType.schema.fieldNames.toSeq == Seq("event_type"))
    assert(onlyType.distinct().count() == 5)
    assert(v2(path).count() == Tables.events(spark, sfDir).count())
  }

  test("versionAsOf serves the historical file list") {
    val path = threeSliceTable()
    val v1 = spark.read.format("graft-versioned").option("path", path)
      .option("versionAsOf", "1").load()
    val want = Tables.events(spark, sfDir).filter(col("user_id") < 5).count()
    assert(v1.count() == want)
  }

  test("scan statistics let the planner broadcast a small V2 table") {
    val path = threeSliceTable()
    val dim = v2(path).select(col("user_id")).distinct()
    val fact = Tables.events(spark, sfDir)
    val plan = fact.join(dim, "user_id").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"a KB-sized V2 table must broadcast, got:\n$plan")
  }

  test("V2 write appends through the manifest protocol, exactly once") {
    val path = freshTable("w")
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      .toDF("id", "s", "x")
    df.write.format("graft-versioned").option("path", path)
      .mode("append").save()
    assert(Versioned.currentVersion(path) == 1)
    val got = Versioned.read(spark, path).as[(Long, String, Double)]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)))

    // second append = second version; V2 read serves both
    Seq((4L, "d", 4.5)).toDF("id", "s", "x")
      .write.format("graft-versioned").option("path", path)
      .mode("append").save()
    assert(Versioned.currentVersion(path) == 2)
    assert(v2(path).count() == 4)

    // empty partitions publish no zero-row files: 8 tasks, 1 row
    val beforeFiles = Versioned.files(path).size
    Seq((5L, "e", 5.5)).toDF("id", "s", "x").repartition(8)
      .write.format("graft-versioned").option("path", path)
      .mode("append").save()
    assert(Versioned.files(path).size == beforeFiles + 1,
      "exactly one non-empty task publishes")
    assert(v2(path).count() == 5)
  }

  test("V2 write validates CHECK constraints before publishing") {
    val path = freshTable("wc")
    Seq((1L, 10L)).toDF("id", "v")
      .write.format("graft-versioned").option("path", path)
      .mode("append").save()
    Versioned.addConstraint(spark, path, "v_pos", "v > 0")
    val before = Versioned.currentVersion(path)
    val beforeFiles = Versioned.files(path).toSet
    intercept[Exception] {
      Seq((2L, -5L)).toDF("id", "v")
        .write.format("graft-versioned").option("path", path)
        .mode("append").save()
    }
    assert(Versioned.currentVersion(path) == before, "no version published")
    assert(Versioned.files(path).toSet == beforeFiles, "no files referenced")
    assert(Versioned.read(spark, path).count() == 1)
  }

  test("V2 streaming sink lands epochs exactly once through the ledger") {
    val path = freshTable("ws")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-v2-ckpt-").toString
    implicit val sq = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = in.toDF().toDF("id", "s").writeStream
      .format("graft-versioned").option("path", path)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      in.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
      in.addData((3L, "c")); q.processAllAvailable()
    } finally q.stop()
    val got = Versioned.read(spark, path).as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(Versioned.currentVersion(path) >= 2, "one version per epoch")

    // replayed epoch: the ledger recognizes the id and re-staged files sweep
    val before = Versioned.currentVersion(path)
    val v = Versioned.commitExternalFilesIdempotent(spark, path, Seq.empty, 0L)
    assert(v == before, "epoch 0 already in the ledger — no new version")
  }

  test("nulls round-trip; renamed tables are rejected until normalize") {
    val path = freshTable("nulls")
    Seq((1L, Option("a")), (2L, Option.empty[String]), (3L, Option("c")))
      .toDF("id", "s").coalesce(1).write.mode("overwrite").parquet(path + "_raw")
    Versioned.append(spark.read.parquet(path + "_raw"), path)
    val got = v2(path).as[(Long, Option[String])].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, Some("a")), (2L, None), (3L, Some("c"))))

    Versioned.renameColumn(spark, path, "s", "label")
    val e = intercept[IllegalArgumentException](v2(path).collect())
    assert(e.getMessage.contains("rename"))
  }

  test("aggregate pushdown answers COUNT/MIN/MAX from footers alone") {
    val path = threeSliceTable()
    val v2 = spark.read.format("graft-versioned").option("path", path).load()
    val agg = v2.agg(count(lit(1)).as("n"),
      min($"v_e2").as("mn"), max($"v_e2").as("mx"),
      min($"user_id").as("mu"), max($"user_id").as("xu"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("AGG-PUSHDOWN"), plan.take(3000))
    val got = agg.collect().head
    val raw = Tables.events(spark, sfDir).agg(count(lit(1)),
      min(expr("CAST(round(value*100) AS BIGINT)")),
      max(expr("CAST(round(value*100) AS BIGINT)")),
      min($"user_id"), max($"user_id")).collect().head
    assert((0 until 5).forall(i => got.get(i) == raw.get(i)), s"$got vs $raw")

    // group-by, filtered, or non-integral aggregates do NOT push down
    val grouped = v2.groupBy($"event_type").agg(count(lit(1)))
    assert(!grouped.queryExecution.executedPlan.toString.contains("AGG-PUSHDOWN"))
    val filtered = v2.filter($"user_id" > 5).agg(count(lit(1)))
    assert(!filtered.queryExecution.executedPlan.toString.contains("AGG-PUSHDOWN"))
    val str = v2.agg(min($"event_type"))
    assert(!str.queryExecution.executedPlan.toString.contains("AGG-PUSHDOWN"))

    // all-null column: footer has no non-null stats -> NULL min/max
    val nulls = freshTable("aggnull")
    Seq((1L, Option.empty[Long]), (2L, Option.empty[Long]))
      .toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(nulls + "-tmp")
    Versioned.append(spark.read.parquet(nulls + "-tmp"), nulls)
    val nv = spark.read.format("graft-versioned").option("path", nulls).load()
      .agg(count(lit(1)).as("n"), min($"v").as("mn"), max($"v").as("mx"))
    assert(nv.queryExecution.executedPlan.toString.contains("AGG-PUSHDOWN"))
    val nr = nv.collect().head
    assert(nr.getLong(0) == 2L && nr.isNullAt(1) && nr.isNullAt(2))
  }

  test("streaming source replays versions as batches, resumes, rejects rewrites") {
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory("graft-v2-stream-src-")
    val store = tmp.resolve("store").toString
    val out = tmp.resolve("out").toString
    val ev = Tables.events(spark, sfDir).select(col("event_id"),
      col("user_id"), col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("v_e2"))
    Versioned.append(ev.filter($"user_id" < 5).coalesce(1), store)
    Versioned.append(ev.filter($"user_id".between(5, 9)).coalesce(1), store)
    Versioned.append(ev.filter($"user_id" >= 10).coalesce(1), store)

    def drain() = {
      val q = spark.readStream.format("graft-versioned").option("path", store)
        .load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", s"$tmp/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(); q
    }
    val q1 = drain()
    // one micro-batch per manifest version (admission control)
    assert(q1.recentProgress.count(_.numInputRows > 0) == 3,
      q1.recentProgress.map(_.numInputRows).mkString(","))
    val n0 = ev.count()
    assert(spark.read.parquet(out).count() == n0)

    // checkpointed resume: a fourth version streams ALONE
    Versioned.append(ev.filter($"user_id" < 2)
      .withColumn("event_id", $"event_id" + 1000000L).coalesce(1), store)
    val q2 = drain()
    assert(q2.recentProgress.count(_.numInputRows > 0) == 1)
    assert(spark.read.parquet(out).count() == n0 + ev.filter($"user_id" < 2).count())

    // a file-REMOVING version (compaction) fails the append-only source
    Versioned.compactSmall(spark, store, targetBytes = 1L << 30)
    Versioned.append(ev.filter($"user_id" === 3)
      .withColumn("event_id", $"event_id" + 2000000L).coalesce(1), store)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft-versioned").option("path", store)
        .load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", s"$tmp/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(ex.getMessage.contains("append-only")
      || Option(ex.getCause).exists(_.getMessage.contains("append-only")), ex.getMessage)
  }

  test("empty batch write commits an observable marker-only version") {
    // saving an empty frame to a FRESH table must still create it —
    // schema readable, version advanced (the Delta empty-commit
    // contract; round-10 ADVICE: reads previously failed 'no committed
    // data')
    val path = freshTable("empty")
    Seq.empty[(Long, String)].toDF("id", "s")
      .write.format("graft-versioned").option("path", path)
      .mode("append").save()
    assert(Versioned.currentVersion(path) == 1)
    val df = v2(path)
    assert(df.schema.fieldNames.toSeq == Seq("id", "s"))
    assert(df.count() == 0)
    // and a later real write evolves normally
    Seq((1L, "a")).toDF("id", "s").write.format("graft-versioned")
      .option("path", path).mode("append").save()
    assert(v2(path).count() == 1)
  }

  test("open range bounds at Long extremes prune exactly, never wrap") {
    val path = freshTable("extremes")
    Versioned.append(Seq((Long.MaxValue, 1L), (0L, 2L)).toDF("k", "ord")
      .coalesce(1), path)
    Versioned.analyzeStats(spark, path, "k")
    // x > Long.MaxValue is unsatisfiable: the planner may keep zero files
    assert(v2(path).filter($"k" > Long.MaxValue).count() == 0)
    assert(v2(path).filter($"k" > Long.MaxValue).rdd.getNumPartitions == 0,
      "unsatisfiable bound must prune every file (the +1 wrap kept them all)")
    assert(v2(path).filter($"k" < Long.MinValue).rdd.getNumPartitions == 0)
    // satisfiable extremes still read
    assert(v2(path).filter($"k" >= Long.MaxValue).count() == 1)
  }

  private def catalogFor(name: String): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory(s"graft-cat-$name-")
      .toFile.getAbsolutePath
    val cat = s"gcat_$name"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  test("catalog: name->path resolution drives the full SQL journey") {
    val (cat, root) = catalogFor("journey")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, s STRING)")
    // CREATE publishes a schema-only v1: the empty table is readable
    assert(Versioned.currentVersion(s"$root/t") == 1)
    assert(spark.sql(s"SELECT * FROM $cat.t").count() == 0)
    intercept[Exception](spark.sql(s"CREATE TABLE $cat.t (id BIGINT)"))
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO $cat.t VALUES (3, 'c')")
    assert(spark.sql(s"SELECT * FROM $cat.t").count() == 3)
    // SQL time travel resolves through loadTable(ident, version)
    assert(spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 2").count() == 2)
    assert(spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 1").count() == 0)
    // TIMESTAMP AS OF rides the manifest publish times (epoch micros)
    val now = System.currentTimeMillis()
    Seq((1, 300L), (2, 200L), (3, 100L)).foreach { case (v, age) =>
      val f = new java.io.File(s"$root/t", f"_manifests/v$v%08d.list")
      assert(f.setLastModified(now - age * 1000))
    }
    val asOf = new java.sql.Timestamp(now - 150 * 1000)
    assert(spark.sql(s"SELECT * FROM $cat.t TIMESTAMP AS OF '$asOf'").count() == 2)
    // SHOW TABLES / rename / drop
    assert(spark.sql(s"SHOW TABLES IN $cat").collect()
      .map(_.getString(1)).contains("t"))
    spark.sql(s"ALTER TABLE $cat.t RENAME TO t2")
    assert(spark.sql(s"SELECT * FROM $cat.t2").count() == 3)
    assert(!new java.io.File(root, "t").exists())
    spark.sql(s"DROP TABLE $cat.t2")
    assert(spark.sql(s"SHOW TABLES IN $cat").isEmpty)
    intercept[Exception](spark.sql(s"SELECT * FROM $cat.t2").collect())
  }

  test("DELETE FROM rewrites only the files holding matching rows") {
    val (cat, root) = catalogFor("del")
    spark.sql(s"CREATE TABLE $cat.d (id BIGINT, grp BIGINT)")
    spark.sql(s"INSERT INTO $cat.d SELECT id, 0 FROM range(0, 100, 1, 1)")
    spark.sql(s"INSERT INTO $cat.d SELECT id, 1 FROM range(100, 200, 1, 1)")
    val before = Versioned.files(s"$root/d").toSet
    assert(before.size == 2)
    spark.sql(s"DELETE FROM $cat.d WHERE id < 10 AND grp = 0")
    val after = Versioned.files(s"$root/d").toSet
    // the grp=1 file is untouched (still referenced verbatim); the grp=0
    // file was rewritten
    assert(after.intersect(before).size == 1, s"$before -> $after")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.d").head.getLong(0) == 190)
    assert(spark.sql(s"SELECT MIN(id) FROM $cat.d WHERE grp = 0")
      .head.getLong(0) == 10)
    // nothing matching: version must not advance (deleteWhere no-ops)
    val v = Versioned.currentVersion(s"$root/d")
    spark.sql(s"DELETE FROM $cat.d WHERE id > 100000")
    assert(Versioned.currentVersion(s"$root/d") == v)
    // TRUNCATE-equivalent: delete-all still round-trips
    spark.sql(s"DELETE FROM $cat.d WHERE TRUE")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.d").head.getLong(0) == 0)
  }

  test("ALTER TABLE ADD COLUMN: metadata-only; old files serve NULL") {
    val (cat, root) = catalogFor("evolve")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.t SELECT id, id * 10 FROM range(0, 5, 1, 1)")
    val filesBefore = Versioned.files(s"$root/t").toSet
    spark.sql(s"ALTER TABLE $cat.t ADD COLUMN tag STRING")
    // metadata-only: no data files touched, one new version
    assert(Versioned.files(s"$root/t").toSet == filesBefore)
    // schema serves the new column; pre-evolution rows read NULL
    val r1 = spark.sql(s"SELECT id, v, tag FROM $cat.t ORDER BY id").collect()
    assert(r1.length == 5 && r1.forall(_.isNullAt(2)))
    // selecting ONLY the new column over old files keeps multiplicity
    assert(spark.sql(s"SELECT tag FROM $cat.t").count() == 5)
    assert(spark.sql(s"SELECT COUNT(tag) FROM $cat.t").head.getLong(0) == 0)
    // a post-evolution insert carries values; both eras read together
    spark.sql(s"INSERT INTO $cat.t VALUES (100, 1000, 'new')")
    val r2 = spark.sql(
      s"SELECT COUNT(*), COUNT(tag) FROM $cat.t").head
    assert(r2.getLong(0) == 6 && r2.getLong(1) == 1)
    // duplicate column rejected; dropping a column that does not exist
    // rejected loudly (DROP COLUMN itself is a supported zero-rewrite
    // evolution since X331 — its positive paths live in VersionedSpec
    // and the schema_drop_widen journey)
    intercept[Exception](spark.sql(s"ALTER TABLE $cat.t ADD COLUMN tag STRING"))
    intercept[Exception](spark.sql(s"ALTER TABLE $cat.t DROP COLUMN no_such_col"))
  }

  test("ALTER ADD COLUMN ... DEFAULT: old rows read the default, inserts fill it") {
    val (cat, _) = catalogFor("evodflt")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.t SELECT id FROM range(0, 4, 1, 1)")
    // the ALTER's DEFAULT must survive into the marker metadata (ADVICE
    // r12: it was silently dropped) AND apply to pre-existing rows (the
    // ANSI/Postgres contract — EXISTS_DEFAULT, not NULL)
    spark.sql(s"ALTER TABLE $cat.t ADD COLUMN score BIGINT DEFAULT 42")
    spark.sql(s"ALTER TABLE $cat.t ADD COLUMN tag STRING DEFAULT 'old'")
    val pre = spark.sql(s"SELECT score, tag FROM $cat.t")
      .as[(Long, String)].collect().toSeq
    assert(pre == Seq.fill(4)((42L, "old")), pre)
    // the columnar path serves the same constants (flat BIGINT
    // projection is vectorized; the old file lacks the column)
    val p = spark.sql(s"SELECT id, score FROM $cat.t")
      .queryExecution.executedPlan.toString
    assert(p.contains("ColumnarToRow"), p)
    // an INSERT omitting the column fills the default analyzer-side;
    // explicit values and explicit NULL still win
    spark.sql(s"INSERT INTO $cat.t (id) VALUES (10)")
    spark.sql(s"INSERT INTO $cat.t VALUES (11, 7, 'new')")
    spark.sql(s"INSERT INTO $cat.t VALUES (12, NULL, NULL)")
    val got = spark.sql(
      s"SELECT id, score, tag FROM $cat.t WHERE id >= 10 ORDER BY id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) "NULL" else r.getString(2))).toSeq
    assert(got == Seq((10L, 42L, "old"), (11L, 7L, "new"),
      (12L, -1L, "NULL")), got)
  }

  test("UPDATE rewrites only the affected groups; MERGE INTO upserts") {
    val (cat, root) = catalogFor("rlo")
    spark.sql(s"CREATE TABLE $cat.u (id BIGINT, grp BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.u SELECT id, 0, id * 10 FROM range(0, 100, 1, 1)")
    spark.sql(s"INSERT INTO $cat.u SELECT id, 1, id * 10 FROM range(100, 200, 1, 1)")
    Versioned.analyzeStats(spark, s"$root/u", "id")
    val before = Versioned.files(s"$root/u").toSet
    assert(before.size == 2)

    // UPDATE touching only the first group (stats prune the second)
    spark.sql(s"UPDATE $cat.u SET v = v + 1 WHERE id < 10")
    val after = Versioned.files(s"$root/u").toSet
    assert(after.intersect(before).size == 1,
      s"the id>=100 file must carry by reference: $before -> $after")
    assert(spark.sql(s"SELECT SUM(v) FROM $cat.u").head.getLong(0) ==
      (0L until 200L).map(_ * 10).sum + 10)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.u").head.getLong(0) == 200)

    // MERGE INTO: update two existing keys, insert one new
    Seq((5L, 777L), (150L, 888L), (500L, 999L)).toDF("id", "nv")
      .createOrReplaceTempView("rlo_src")
    spark.sql(
      s"""MERGE INTO $cat.u t USING rlo_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.nv
         |WHEN NOT MATCHED THEN INSERT (id, grp, v) VALUES (s.id, 9, s.nv)
         |""".stripMargin)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.u").head.getLong(0) == 201)
    val got = spark.sql(
      s"SELECT id, v FROM $cat.u WHERE id IN (5, 150, 500) ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((5L, 777L), (150L, 888L), (500L, 999L)))
    // pre-rewrite history stays time-travelable
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.u VERSION AS OF 3")
      .head.getLong(0) == 200)
  }

  test("runtime V2 filtering prunes the fact file list at execution") {
    val df = graft.queries.StoreQueries.queries("v2_dpp")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(plan.toString.contains("RuntimeFilters: [dynamicpruning"),
      plan.toString.take(3000))
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def scans(p: SparkPlan): Seq[BatchScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case b: BatchScanExec => Seq(b)
      case o => o.children.flatMap(scans)
    }
    val vs = scans(plan).map(_.scan).collectFirst { case v: VersionedScan => v }
    assert(vs.isDefined, plan.toString.take(3000))
    val hot = df.count()
    assert(vs.get.keptFiles == hot && hot < 4,
      s"kept ${vs.get.keptFiles} files for $hot hot bands")
  }

  test("medallion: silver versions mirror bronze commits; replay is a no-op") {
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory("graft-v2-med-")
    val bronze = tmp.resolve("bronze").toString
    val silver = tmp.resolve("silver").toString
    val ev = Tables.events(spark, sfDir).select(col("event_id"),
      col("user_id"), col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("v_e2"))
    Versioned.append(ev.filter($"user_id" < 5).coalesce(1), bronze)
    Versioned.append(ev.filter($"user_id" >= 5).coalesce(1), bronze)
    def run() = {
      val q = spark.readStream.format("graft-versioned").option("path", bronze)
        .load().filter($"event_type" === "purchase")
        .writeStream.format("graft-versioned").option("path", silver)
        .option("checkpointLocation", s"$tmp/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    // one silver version per bronze version (1 version = 1 micro-batch = 1 epoch)
    val vAfter = Versioned.currentVersion(silver)
    assert(vAfter == 2, s"silver at v$vAfter")
    val expect = ev.filter($"event_type" === "purchase").count()
    assert(Versioned.read(spark, silver).count() == expect)
    // re-running with the same checkpoint moves nothing
    run()
    assert(Versioned.currentVersion(silver) == vAfter)
    assert(Versioned.read(spark, silver).count() == expect)
  }

  test("runtime pruning consults the build-time snapshot, not the live manifest") {
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    def lit6 = Expressions.literal(6L)
    val path = threeSliceTable()
    Versioned.analyzeStats(spark, path, "user_id")
    // the file whose [min,max] admits user 6 — the middle slice
    val admits6 = Versioned.prunedFiles(path, "user_id", 6, 6)
    assert(admits6.size == 1)
    // plan the scan NOW (snapshot pins here)
    val msg = VersionedV2.footerSchema(path, None)
    val full = VersionedV2.sparkSchema(msg)
    val scan = new VersionedScanBuilder(path, None, msg, full)
      .build().asInstanceOf[VersionedScan]
    val planned = scan.currentFileList
    assert(planned.size == 3)
    // a concurrent rewrite lands BETWEEN planning and execution: it
    // retires the middle slice's file (and its stats marker line) from
    // the live manifest
    Versioned.deleteWhere(spark, path, col("user_id") === 7L)
    assert(!Versioned.files(path).contains(admits6.head),
      "rewrite must have retired the planned middle file")
    // the runtime IN-filter arrives at execution; pruning must act on
    // the PINNED snapshot — keeping the planned file that holds user 6,
    // not silently dropping it because the live manifest forgot it
    scan.filter(Array(new Predicate("IN",
      Array(Expressions.column("user_id"), lit6))))
    val kept = scan.currentFileList
    assert(kept.contains(admits6.head),
      s"planned file ${admits6.head} was dropped by stale-manifest pruning")
    assert(kept.size == 1, "snapshot stats must still prune the other slices")
  }

  test("array<float> round-trips the connector and the native reader") {
    val (cat, root) = catalogFor("vec")
    spark.sql(s"CREATE TABLE $cat.e (id BIGINT, emb ARRAY<FLOAT>)")
    Seq((0L, Seq(1.0f, 2.0f)), (1L, Seq(-3.5f, 0.25f)), (2L, Seq.empty[Float]))
      .toDF("id", "emb").createOrReplaceTempView("vec_src")
    spark.sql(s"INSERT INTO $cat.e SELECT * FROM vec_src")
    val viaV2 = spark.sql(s"SELECT id, emb FROM $cat.e ORDER BY id")
      .as[(Long, Seq[Float])].collect().toSeq
    assert(viaV2 == Seq((0L, Seq(1.0f, 2.0f)), (1L, Seq(-3.5f, 0.25f)),
      (2L, Seq.empty[Float])))
    // Spark's NATIVE parquet reader resolves the repeated-FLOAT shape too
    // (the parquet-avro 2-level compat rule) — deleteWhere etc. ride it
    val native = Versioned.read(spark, s"$root/e")
      .selectExpr("id", "emb").orderBy($"id")
      .as[(Long, Seq[Float])].collect().toSeq
    assert(native == viaV2)
    // NULL array ELEMENTS are unrepresentable in the repeated-FLOAT
    // shape — the writer must reject them loudly, never land 0.0f
    // (ADVICE r12: silent corruption)
    val before = spark.sql(s"SELECT COUNT(*) FROM $cat.e").head.getLong(0)
    val ex = intercept[Exception](spark.sql(
      s"INSERT INTO $cat.e VALUES (9, array(CAST(1 AS FLOAT), " +
        "CAST(NULL AS FLOAT)))"))
    assert(ex.getMessage != null || ex.getCause != null)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.e").head.getLong(0) == before)
  }

  test("FunctionCatalog: k-NN is pure SQL and stays in codegen") {
    val (cat, _) = catalogFor("knn")
    spark.sql(s"CREATE TABLE $cat.e (id BIGINT, emb ARRAY<FLOAT>)")
    (0L until 50L).map(i =>
        (i, Seq(math.sin(i.toDouble).toFloat, math.cos(i.toDouble).toFloat)))
      .toDF("id", "emb").createOrReplaceTempView("knn_src")
    spark.sql(s"INSERT INTO $cat.e SELECT * FROM knn_src")
    val df = spark.sql(
      s"""WITH q AS (SELECT emb AS qe FROM $cat.e WHERE id = 7)
         |SELECT e.id, $cat.vec_squared_l2(e.emb, q.qe) AS d
         |FROM $cat.e e CROSS JOIN q ORDER BY d, e.id LIMIT 5""".stripMargin)
    // library-route twin (the Catalyst expression) must agree bit-exactly
    graft.core.GraftFunctions.register(spark)
    val lib = spark.sql(
      s"""WITH q AS (SELECT emb AS qe FROM $cat.e WHERE id = 7)
         |SELECT e.id, vec_squared_l2(e.emb, q.qe) AS d
         |FROM $cat.e e CROSS JOIN q ORDER BY d, e.id LIMIT 5""".stripMargin)
    assert(df.as[(Long, Double)].collect().toSeq ==
      lib.as[(Long, Double)].collect().toSeq)
    assert(df.head().getLong(0) == 7L) // self-distance 0 wins
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // the magic invoke resolved (Invoke/StaticInvoke), not the
    // row-boxing ApplyFunctionExpression fallback
    val analyzed = df.queryExecution.optimizedPlan.toString
    assert(!analyzed.contains("ApplyFunctionExpression"), analyzed)
    // the other two functions evaluate with house numerics
    val r = spark.sql(
      s"SELECT $cat.vec_dot(array(CAST(1.5 AS FLOAT), CAST(2 AS FLOAT)), " +
        "array(CAST(4 AS FLOAT), CAST(0.5 AS FLOAT))) AS d, " +
        s"$cat.vec_cosine_sim(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)), " +
        "array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS c").head()
    assert(r.getDouble(0) == 7.0 && r.getDouble(1) == 1.0)
  }

  test("atomic CTAS: one commit publishes schema+data; abort leaves nothing") {
    val (cat, root) = catalogFor("ctas")
    spark.sql(s"CREATE TABLE $cat.src AS SELECT id, id * 2 AS v " +
      "FROM range(0, 100, 1, 4)")
    // ONE version: schema marker and data lines landed in a single commit
    assert(Versioned.currentVersion(s"$root/src") == 1)
    assert(spark.sql(s"SELECT SUM(v) FROM $cat.src").head.getLong(0) == 9900)
    // a failing CTAS must leave NO table behind — not even an empty one
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.boom AS " +
        "SELECT CASE WHEN id = 50 THEN CAST(raise_error('mid-write') AS BIGINT) " +
        "ELSE id END AS id FROM range(0, 100, 1, 4)")
    }
    assert(!spark.sql(s"SHOW TABLES IN $cat").collect()
      .map(_.getString(1)).contains("boom"))
    assert(!new java.io.File(root, "boom").exists(),
      "aborted CTAS must sweep the staged dir entirely")
    // CTAS into an existing name fails without touching the table
    intercept[Exception](
      spark.sql(s"CREATE TABLE $cat.src AS SELECT 1L AS id"))
    assert(Versioned.currentVersion(s"$root/src") == 1)
    // no staging debris after the journey: every .ctas-* dir swept.
    // Task kills are ASYNC — a straggler interrupted mid-write finishes
    // its own cleanup after the statement already returned, so poll to
    // the convergence point rather than asserting an instant
    def debris() = Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith(".ctas-"))
    val deadline = System.currentTimeMillis() + 30000
    while (debris().nonEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(200)
    assert(debris().isEmpty, debris().mkString(","))
  }

  test("CTAS race: the loser's abort never destroys the winner's table") {
    // ADVICE r12: two concurrent CTAS to one name both passed
    // stageCreate's existence check and staged into the SAME directory —
    // the loser's abort rm-rf'd the winner's just-published manifest.
    // Each staged write now owns a private .ctas-<uuid> dir and publishes
    // by atomic rename, so the loser fails loudly and cleans only itself.
    val (cat, root) = catalogFor("ctasrace")
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array.empty, "contested")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", org.apache.spark.sql.types.LongType)
    val path = s"$root/contested"
    // both writers pass the existence check before either publishes
    val a = new GraftStagedTable(ident, path, schema)
    val b = new GraftStagedTable(ident, path, schema)
    a.commitStagedChanges() // winner publishes
    assert(Versioned.currentVersion(path) == 1)
    // loser's commit conflicts loudly...
    val ex = intercept[IllegalStateException](b.commitStagedChanges())
    assert(ex.getMessage.contains("conflict"), ex.getMessage)
    // ...and the WINNER is fully intact (manifest + readability)
    assert(Versioned.currentVersion(path) == 1)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.contested").head.getLong(0) == 0)
    // a bare abort (job failure before commit) also touches only itself
    val c = new GraftStagedTable(ident, path, schema)
    c.abortStagedChanges()
    assert(Versioned.currentVersion(path) == 1)
    // zero staging debris left anywhere
    val debris = Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith(".ctas-"))
    assert(debris.isEmpty, debris.mkString(","))
    // hidden staging dirs never surface as tables mid-flight
    val d = new GraftStagedTable(ident, path, schema)
    assert(!spark.sql(s"SHOW TABLES IN $cat").collect()
      .map(_.getString(1)).exists(_.startsWith(".")))
    d.abortStagedChanges()
  }

  test("procedures: optimize/analyze/vacuum are one CALL away") {
    val (cat, root) = catalogFor("proc")
    spark.sql(s"CREATE TABLE $cat.m (id BIGINT, v BIGINT)")
    (0 until 3).foreach { s =>
      spark.sql(s"INSERT INTO $cat.m SELECT id, (id * 37) % 1000 AS v " +
        s"FROM range(${s * 1000}, ${(s + 1) * 1000}, 1, 1)"): Unit
    }
    val path = s"$root/m"
    assert(Versioned.files(path).size == 3)
    assert(spark.sql(s"CALL $cat.system.optimize('m', 'id', 'v')")
      .head.getLong(0) == 5)
    assert(spark.sql(s"CALL $cat.system.analyze_stats('m', 'v')")
      .head.getLong(0) == 6)
    assert(spark.sql(s"CALL $cat.system.analyze_bloom('m', 'id')")
      .head.getLong(0) == 7)
    // the skippable-file delta: a narrow v-box admits a strict subset
    val total = Versioned.files(path).size
    val kept = Versioned.prunedFiles(path, "v", 0L, 50L).size
    assert(kept < total, s"zorder+stats must skip: kept $kept of $total")
    // vacuum(keep 1) reclaims exactly the three pre-optimize inputs
    assert(spark.sql(s"CALL $cat.system.vacuum('m', 1, 0)")
      .head.getLong(0) == 3)
    // data intact after the full maintenance pass
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.m").head.getLong(0) == 3000)
    // compact_small exists and no-ops below two small files... with 16
    // fresh zordered files it rewrites them into fewer
    val v = spark.sql(s"CALL $cat.system.compact_small('m')").head.getLong(0)
    assert(v >= 7 && spark.sql(s"SELECT COUNT(*) FROM $cat.m")
      .head.getLong(0) == 3000)
    intercept[Exception](spark.sql(s"CALL $cat.system.nope('m')"))
  }

  test("TRUNCATE TABLE: metadata-only, time travel intact, table stays live") {
    val (cat, root) = catalogFor("trunc")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.t SELECT id FROM range(0, 100, 1, 1)")
    val files = Versioned.files(s"$root/t")
    spark.sql(s"TRUNCATE TABLE $cat.t")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head.getLong(0) == 0)
    // metadata-only: the data files still exist on disk for time travel
    assert(files.forall(f => new java.io.File(f).exists()))
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t VERSION AS OF 2")
      .head.getLong(0) == 100)
    // the empty table keeps its schema and accepts new inserts
    spark.sql(s"INSERT INTO $cat.t VALUES (7)")
    assert(spark.sql(s"SELECT * FROM $cat.t").as[Long].collect().toSeq == Seq(7L))
  }

  test("SQL CHECK constraints: validate-first, gate every commit, droppable") {
    val (cat, root) = catalogFor("ck")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 10), (2, 20)")
    spark.sql(s"ALTER TABLE $cat.t ADD CONSTRAINT pos CHECK (v > 0)")
    assert(Versioned.constraintsOf(s"$root/t").map(_._1) == Seq("pos"))
    // the gate fires through pure SQL writes
    intercept[Exception](spark.sql(s"INSERT INTO $cat.t VALUES (3, -5)"))
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head.getLong(0) == 2)
    // NULL passes (SQL CHECK: only FALSE rejects)
    spark.sql(s"INSERT INTO $cat.t VALUES (4, NULL)")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head.getLong(0) == 3)
    // retroactive violation rejected at ADD time
    intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.t ADD CONSTRAINT low CHECK (v < 15)"))
    assert(Versioned.constraintsOf(s"$root/t").map(_._1) == Seq("pos"))
    // DROP CONSTRAINT releases the gate
    spark.sql(s"ALTER TABLE $cat.t DROP CONSTRAINT pos")
    spark.sql(s"INSERT INTO $cat.t VALUES (5, -1)")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head.getLong(0) == 4)
    // non-CHECK constraint shapes reject loudly
    intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.t ADD CONSTRAINT u UNIQUE (id)"))
  }

  test("column DEFAULTs: CREATE-time defaults fill omitted INSERT columns") {
    val (cat, _) = catalogFor("dflt")
    spark.sql(s"CREATE TABLE $cat.t " +
      "(id BIGINT, tag STRING DEFAULT 'fresh', score BIGINT DEFAULT 100)")
    spark.sql(s"INSERT INTO $cat.t (id) VALUES (1)")
    spark.sql(s"INSERT INTO $cat.t (id, tag) VALUES (2, 'custom')")
    spark.sql(s"INSERT INTO $cat.t VALUES (3, 'full', 7)")
    spark.sql(s"INSERT INTO $cat.t (id, score) VALUES (4, DEFAULT)")
    val got = spark.sql(s"SELECT * FROM $cat.t ORDER BY id")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "fresh", 100L), (2L, "custom", 100L),
      (3L, "full", 7L), (4L, "fresh", 100L)), got)
  }

  test("procedures: clone freezes, restore rolls back, both pure metadata") {
    val (cat, root) = catalogFor("clres")
    spark.sql(s"CREATE TABLE $cat.s (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.s SELECT id FROM range(0, 100, 1, 1)")
    spark.sql(s"INSERT INTO $cat.s SELECT id FROM range(100, 150, 1, 1)")
    assert(spark.sql(s"CALL $cat.system.clone('s', 's2')").head.getLong(0) == 1)
    val dataBytes = Versioned.files(s"$root/s").map(f =>
      new java.io.File(f).length()).sum
    // zero-copy: the clone dir holds NO data bytes of its own
    val cloneLocal = Option(new java.io.File(s"$root/s2").listFiles())
      .getOrElse(Array.empty).filter(_.isFile)
    assert(cloneLocal.isEmpty && dataBytes > 0)
    spark.sql(s"DELETE FROM $cat.s WHERE id >= 100")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.s").head.getLong(0) == 100)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.s2").head.getLong(0) == 150)
    assert(spark.sql(s"CALL $cat.system.restore('s', 3)").head.getLong(0) == 5)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.s").head.getLong(0) == 150)
  }

  test("rename guard: a shallow-clone SOURCE refuses to rename") {
    val (cat, root) = catalogFor("ren")
    spark.sql(s"CREATE TABLE $cat.src AS SELECT id FROM range(0, 10, 1, 1)")
    Versioned.shallowClone(s"$root/src", s"$root/cl")
    // the clone references src's files absolutely: renaming src would
    // dangle them — must fail LOUDLY, with src untouched
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.src RENAME TO moved"))
    assert(e.getMessage.contains("shallow-clone"), e.getMessage)
    assert(new java.io.File(root, "src").exists())
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.cl").head.getLong(0) == 10)
    // renaming the CLONE (or any non-source) stays allowed
    spark.sql(s"ALTER TABLE $cat.cl RENAME TO cl2")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.cl2").head.getLong(0) == 10)
  }

  test("columnar scan: flat projections vectorize and equal the native read") {
    val path = threeSliceTable()
    val df = v2(path).select("event_id", "user_id", "event_type", "v_e2")
    // the plan reports a columnar scan (Spark inserts ColumnarToRow)
    assert(df.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      df.queryExecution.executedPlan.toString)
    val native = Versioned.read(spark, path)
      .select("event_id", "user_id", "event_type", "v_e2")
      .as[(Long, Long, String, Long)].collect().sorted.toSeq
    val viaV2 = df.as[(Long, Long, String, Long)].collect().sorted.toSeq
    assert(viaV2.nonEmpty && viaV2 == native)
    // row-filter + pruning still compose on the columnar path
    assert(v2(path).filter($"user_id" === 7 && $"event_type" === "purchase")
      .count() == native.count(r => r._2 == 7 && r._3 == "purchase"))
  }

  test("columnar scan: nulls, evolution-null columns and _graft_file") {
    val path = freshTable("colnull")
    Seq((1L, Some("a")), (2L, None), (3L, Some("c")))
      .toDF("id", "s").coalesce(1).write.parquet(s"$path/b1")
    Versioned.append(spark.read.parquet(s"$path/b1"), path)
    // evolve: second slice carries an extra column; slice-1 rows must
    // serve constant-null vectors for it
    Versioned.append(Seq((4L, "d", 40L), (5L, "e", 50L))
      .toDF("id", "s", "extra").coalesce(1), path)
    val got = v2(path).select("id", "s", "extra").orderBy($"id")
      .as[(Long, Option[String], Option[Long])].collect().toSeq
    assert(got == Seq((1L, Some("a"), None), (2L, None, None),
      (3L, Some("c"), None), (4L, Some("d"), Some(40L)),
      (5L, Some("e"), Some(50L))))
    // metadata column rides a constant vector alongside decoded ones
    val withFile = v2(path).select(col("id"), col("_graft_file"))
      .as[(Long, String)].collect()
    assert(withFile.length == 5 && withFile.forall(_._2.nonEmpty))
    assert(withFile.map(_._2).distinct.length == 2, "two serving files")
  }

  test("columnar scan: array<float> projections vectorize; counts go zero-IO") {
    val (cat, root) = catalogFor("colarr")
    spark.sql(s"CREATE TABLE $cat.e (id BIGINT, emb ARRAY<FLOAT>)")
    spark.sql(s"INSERT INTO $cat.e VALUES (1, array(CAST(1 AS FLOAT))), " +
      "(2, array(CAST(2 AS FLOAT), CAST(3 AS FLOAT)))")
    // the embedding projection — the vector store's defining scan — now
    // rides the vectorized path too (round-12 verdict ask #1)
    val arr = spark.sql(s"SELECT id, emb FROM $cat.e")
    assert(arr.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      arr.queryExecution.executedPlan.toString)
    assert(arr.as[(Long, Seq[Float])].collect().sortBy(_._1).toSeq ==
      Seq((1L, Seq(1f)), (2L, Seq(2f, 3f))))
    // scalar-only projection over the SAME table vectorizes
    val flat = spark.sql(s"SELECT id FROM $cat.e")
    assert(flat.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(flat.count() == 2)
    // COUNT(*) with a filter pruned to zero columns: footer-count reader
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.e").head.getLong(0) == 2)
    val big = freshTable("colcnt")
    Versioned.append(Tables.events(spark, sfDir)
      .select($"event_id", $"user_id").coalesce(1), big)
    assert(v2(big).count() == Tables.events(spark, sfDir).count())
  }

  test("columnar scan: embedding decode equals the row reader batch-for-batch") {
    val path = freshTable("colemb")
    // > one ColumnarBatch (Cap = 4096) across 2 files, ragged lengths
    // INCLUDING empty vectors (id % 7 == 0) — the repetition-level decode
    // must re-align on every record boundary and batch seam
    spark.range(0, 10000, 1, 2)
      .select($"id", expr("transform(array_repeat(id, CAST(id % 7 AS INT)), " +
        "(x, i) -> CAST(x + i * 0.25 AS FLOAT))").as("emb"))
      .write.format("graft-versioned").option("path", path)
      .mode("append").save()
    val proj = v2(path).select("id", "emb")
    assert(proj.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      proj.queryExecution.executedPlan.toString)
    val viaColumnar = proj.as[(Long, Seq[Float])].collect().sortBy(_._1).toSeq
    val viaRow =
      try {
        System.setProperty("graft.v2.columnar", "off")
        v2(path).select("id", "emb").as[(Long, Seq[Float])]
          .collect().sortBy(_._1).toSeq
      } finally System.clearProperty("graft.v2.columnar")
    assert(viaColumnar.size == 10000 && viaColumnar == viaRow)
    // spot-check content, not just reader agreement
    assert(viaColumnar(9L.toInt)._2 == Seq(9f, 9.25f),
      viaColumnar(9).toString)
    assert(viaColumnar.count(_._2.isEmpty) == 10000 / 7 + 1)
    // expression over the vector stays on the vectorized scan
    val dot = v2(path)
      .select($"id", expr("aggregate(emb, CAST(0 AS DOUBLE), " +
        "(acc, x) -> acc + x * x)").as("nrm"))
    assert(dot.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(dot.filter($"id" === 9).head.getDouble(1) == (81.0 + 9.25 * 9.25))
  }

  test("catalog views: persist, replace, compose, rename, race loudly") {
    val (cat, root) = catalogFor("views")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.t SELECT id, id * 10 FROM range(0, 100, 1, 2)")
    spark.sql(s"CREATE VIEW $cat.small AS SELECT id, v FROM $cat.t WHERE id < 50")
    assert(spark.sql(s"SELECT SUM(v) FROM $cat.small").head.getLong(0) ==
      (0L until 50L).map(_ * 10).sum)
    // definition is ON DISK: a brand-new session resolves it
    val s2 = spark.newSession()
    s2.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    s2.conf.set(s"spark.sql.catalog.$cat.root", root)
    assert(s2.sql(s"SELECT COUNT(*) FROM $cat.small").head.getLong(0) == 50)
    // REPLACE narrows; view-over-view composes through the NEW definition
    spark.sql(s"CREATE OR REPLACE VIEW $cat.small AS " +
      s"SELECT id, v FROM $cat.t WHERE id < 20")
    spark.sql(s"CREATE VIEW $cat.agg AS SELECT SUM(v) AS sv FROM $cat.small")
    assert(spark.sql(s"SELECT sv FROM $cat.agg").head.getLong(0) ==
      (0L until 20L).map(_ * 10).sum)
    // a view may not shadow a table, and racing CREATEs serialize
    intercept[Exception](
      spark.sql(s"CREATE VIEW $cat.t AS SELECT 1 AS one"))
    intercept[Exception](
      spark.sql(s"CREATE VIEW $cat.small AS SELECT 2 AS two"))
    // catalog API surface: list + rename + drop
    val gc = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog]
    assert(gc.listViews().map(_.name).toSeq == Seq("agg", "small"))
    gc.renameView(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, "agg"),
      org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, "agg2"))
    assert(spark.sql(s"SELECT sv FROM $cat.agg2").head.getLong(0) == 1900)
    spark.sql(s"DROP VIEW $cat.agg2")
    intercept[Exception](spark.sql(s"SELECT sv FROM $cat.agg2").collect())
    // IF EXISTS is quiet; plain drop of a missing view is loud
    spark.sql(s"DROP VIEW IF EXISTS $cat.agg2")
    intercept[Exception](spark.sql(s"DROP VIEW $cat.agg2"))
  }

  test("catalog views: cycle, unqualified-name and table-shadow guards are loud") {
    val (cat, _) = catalogFor("viewguards")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.t VALUES (1), (2)")
    // a replace that references ITSELF captures the old definition at
    // create time but persists the self-referential text — reads must
    // error on the depth guard, never StackOverflow
    spark.sql(s"CREATE VIEW $cat.v AS SELECT id FROM $cat.t")
    spark.sql(s"CREATE OR REPLACE VIEW $cat.v AS SELECT id FROM $cat.v WHERE id > 0")
    val cyc = intercept[Exception](spark.sql(s"SELECT * FROM $cat.v").collect())
    assert(cyc.getMessage.contains("recursive view"), cyc.getMessage)
    // unqualified references are rejected at CREATE (they would resolve
    // in the READER's context); CTE aliases stay legal
    val unq = intercept[Exception](
      spark.sql(s"CREATE VIEW $cat.bad AS SELECT * FROM sometable"))
    assert(unq.getMessage.contains("catalog-qualify"), unq.getMessage)
    spark.sql(s"CREATE VIEW $cat.cteok AS " +
      s"WITH a AS (SELECT id FROM $cat.t) SELECT COUNT(*) AS n FROM a")
    assert(spark.sql(s"SELECT n FROM $cat.cteok").head.getLong(0) == 2)
    // a table may not silently shadow a view (either creation order)
    val shadow = intercept[Exception](
      spark.sql(s"CREATE TABLE $cat.cteok (x BIGINT)"))
    assert(shadow.getMessage.contains("view named"), shadow.getMessage)
    val shadowCtas = intercept[Exception](
      spark.sql(s"CREATE TABLE $cat.cteok AS SELECT 1L AS x"))
    assert(shadowCtas.getMessage.contains("view named"), shadowCtas.getMessage)
  }

  test("catalog views: REPLACE is atomic — concurrent readers never see a missing view") {
    val (cat, catRoot) = catalogFor("viewatomic")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.t SELECT id FROM range(0, 10)")
    spark.sql(s"CREATE VIEW $cat.w AS SELECT COUNT(*) AS n FROM $cat.t WHERE id < 5")
    // hammer REPLACE from a background thread while reading continuously:
    // the old drop-then-create window surfaced NoSuchView under this load
    // (VERDICT r13); the staged atomic swap must serve old-or-new, only
    @volatile var replacerErr: Throwable = null
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val replacer = new Thread(() => {
      val s2 = spark.newSession()
      s2.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s2.conf.set(s"spark.sql.catalog.$cat.root", catRoot)
      var flip = false
      try while (!stop.get()) {
        val lim = if (flip) 5 else 7
        s2.sql(s"CREATE OR REPLACE VIEW $cat.w AS " +
          s"SELECT COUNT(*) AS n FROM $cat.t WHERE id < $lim")
        flip = !flip
      } catch { case t: Throwable => replacerErr = t }
    })
    replacer.start()
    try {
      (1 to 40).foreach { _ =>
        val n = spark.sql(s"SELECT n FROM $cat.w").head.getLong(0)
        assert(n == 5L || n == 7L, s"read a definition that is neither: $n")
      }
    } finally { stop.set(true); replacer.join(30000) }
    assert(replacerErr == null, s"replacer failed: $replacerErr")
    // a staged-but-unswapped definition (crash before the rename) is a
    // hidden .tmp file readers never resolve: only the swapped file counts
    val gc = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[GraftCatalog]
    assert(gc.listViews().map(_.name).toSeq == Seq("w"))
  }

  test("catalog views: CTE whitelist is scope-aware — outer refs sharing a nested CTE name are rejected") {
    val (cat, _) = catalogFor("viewscope")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.t VALUES (1), (2), (3)")
    // the OUTER unqualified `t` must be rejected even though an unrelated
    // subquery defines a CTE of the same name (VERDICT r13: the global
    // whitelist let it slip and re-resolve in each reader's session)
    val leak = intercept[Exception](spark.sql(
      s"CREATE VIEW $cat.leaky AS SELECT * FROM t UNION ALL " +
        s"(WITH t AS (SELECT id FROM $cat.t) SELECT * FROM t)"))
    assert(leak.getMessage.contains("catalog-qualify"), leak.getMessage)
    // same name, properly scoped on both sides: legal
    spark.sql(s"CREATE VIEW $cat.scoped AS " +
      s"WITH t AS (SELECT id FROM $cat.t WHERE id > 1) SELECT * FROM t " +
      s"UNION ALL (WITH t AS (SELECT id FROM $cat.t WHERE id < 2) SELECT * FROM t)")
    assert(spark.sql(s"SELECT COUNT(*) AS c FROM $cat.scoped").head.getLong(0) == 3)
    // a CTE name from one branch must not whitelist the OTHER branch
    val cross = intercept[Exception](spark.sql(
      s"CREATE VIEW $cat.crossbad AS " +
        s"(WITH a AS (SELECT id FROM $cat.t) SELECT * FROM a) " +
        s"UNION ALL SELECT * FROM a"))
    assert(cross.getMessage.contains("catalog-qualify"), cross.getMessage)
    // unqualified names inside subquery EXPRESSIONS are caught too (the
    // old child-only collect never walked IN/EXISTS/scalar subqueries)
    val sub = intercept[Exception](spark.sql(
      s"CREATE VIEW $cat.subq AS SELECT id FROM $cat.t " +
        s"WHERE id IN (SELECT id FROM hidden_unqualified)"))
    assert(sub.getMessage.contains("catalog-qualify"), sub.getMessage)
  }

  test("catalog views: a non-recursive CTE may not reference its own name") {
    val (cat, _) = catalogFor("viewselfref")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.t VALUES (1), (2)")
    // plain WITH: the inner `t` is an OUTER reference (the analyzer would
    // resolve it against the reader's session, not the CTE being defined)
    // — the unconditional own-name whitelist used to let it through
    // (ADVICE r14)
    val selfRef = intercept[Exception](spark.sql(
      s"CREATE VIEW $cat.selfbad AS WITH t AS (SELECT * FROM t) SELECT * FROM t"))
    assert(selfRef.getMessage.contains("catalog-qualify"), selfRef.getMessage)
    // WITH RECURSIVE: the self-reference is the point — still legal
    spark.sql(s"CREATE VIEW $cat.recok AS WITH RECURSIVE r AS (" +
      s"SELECT 1 AS n UNION ALL SELECT n + 1 FROM r WHERE n < 3) SELECT n FROM r")
    assert(spark.sql(s"SELECT COUNT(*) AS c FROM $cat.recok").head.getLong(0) == 3)
  }

  test("store rewrites reject whole-NULL arrays loudly instead of mutating them to []") {
    val (_, root) = catalogFor("nullarr")
    val path = s"$root/nt"
    // table created through the store API with one NULL embedding row —
    // the connector shape reads NULL back as [], so a layout-only compact
    // routed through it would silently change the row multiset; the
    // staging seam must fail loudly instead (ADVICE r14 medium)
    val df = spark.range(0, 10).select($"id",
      when($"id" === 3, lit(null))
        .otherwise(expr("array(CAST(id AS FLOAT))")).cast("array<float>").as("emb"))
    // land the NULL through the NATIVE writer (which preserves it) so the
    // table genuinely holds a NULL array before the rewrite attempt
    df.write.parquet(s"$path/seed")
    val rel = new java.io.File(s"$path/seed").listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(f => s"seed/${f.getName}").toSeq
    graft.store.Versioned.initTableWithFiles(path, df.schema, rel)
    val e = intercept[Exception](graft.store.Versioned.compact(spark, path))
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | "))
    assert(rootMsg(e).contains("NULL arrays are not stageable"), rootMsg(e))
    // the original version is untouched — NULL still reads back as NULL
    val back = graft.store.Versioned.read(spark, path)
      .where($"id" === 3).select($"emb").collect()
    assert(back.length == 1 && back(0).isNullAt(0), back.mkString(","))
  }

  test("array-bearing tables survive store rewrites: compact/CoW-delete/merge/MoR-update keep V2 readers green") {
    val (cat, root) = catalogFor("arrayrw")
    spark.sql(s"CREATE TABLE $cat.e (id BIGINT, emb ARRAY<FLOAT>)")
    spark.sql(s"INSERT INTO $cat.e SELECT id, " +
      "array(CAST(id AS FLOAT), CAST(id * 2 AS FLOAT)) FROM range(0, 100, 1, 4)")
    val path = s"$root/e"
    def readBoth(): (Seq[(Long, Seq[Float])], Seq[(Long, Seq[Float])]) = {
      def all() = spark.sql(s"SELECT id, emb FROM $cat.e")
        .as[(Long, Seq[Float])].collect().sortBy(_._1).toSeq
      val columnar = all()
      val row = try {
        System.setProperty("graft.v2.columnar", "off"); all()
      } finally System.clearProperty("graft.v2.columnar")
      (columnar, row)
    }
    // compact used to stage with the native writer (3-level LIST), which
    // the V2 readers reject loudly — the staging seam must keep the
    // connector's 2-level shape through EVERY rewrite (ADVICE r13)
    graft.store.Versioned.compact(spark, path)
    val (c1, r1) = readBoth()
    assert(c1.size == 100 && c1 == r1 && c1(7)._2 == Seq(7f, 14f))
    graft.store.Versioned.deleteWhere(spark, path, $"id" >= 90)
    val (c2, r2) = readBoth()
    assert(c2.size == 90 && c2 == r2)
    val updates = spark.range(0, 5).select($"id",
      expr("array(CAST(-id AS FLOAT))").as("emb"))
    graft.store.Versioned.merge(spark, path, updates, Seq("id"))
    val (c3, r3) = readBoth()
    assert(c3.size == 90 && c3 == r3 && c3(3)._2 == Seq(-3f))
    graft.store.Versioned.updateWhereMor(spark, path, $"id" === 10,
      Map("emb" -> expr("array(CAST(99 AS FLOAT))")))
    val (c4, r4) = readBoth()
    assert(c4.size == 90 && c4 == r4 && c4(10)._2 == Seq(99f))
    // ZORDER optimize rewrites the whole table; arrays must survive too
    spark.sql(s"CALL $cat.system.optimize('e', 'id', 'id')")
    val (c5, r5) = readBoth()
    assert(c5 == c4 && r5 == c4)
  }

  test("TIMESTAMP/DATE round-trip: pre-epoch and DST-boundary values, both readers") {
    val (cat, root) = catalogFor("tstype")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, ts TIMESTAMP, d DATE)")
    // pre-epoch (negative micros), a US-DST spring-forward boundary
    // instant, a sub-second value, and NULLs — the values that break
    // naive epoch math
    spark.sql(s"INSERT INTO $cat.t VALUES " +
      "(1, TIMESTAMP'1969-07-20 20:17:40.123456', DATE'1969-07-20'), " +
      "(2, TIMESTAMP'2021-03-14 02:30:00', DATE'2021-03-14'), " +
      "(3, TIMESTAMP'2021-11-07 01:30:00.000001', DATE'2021-11-07'), " +
      "(4, NULL, NULL)")
    def collectAll() = spark.sql(
      s"SELECT id, CAST(ts AS STRING), CAST(d AS STRING) FROM $cat.t ORDER BY id")
      .as[(Long, Option[String], Option[String])].collect().toSeq
    val expected = Seq(
      (1L, Some("1969-07-20 20:17:40.123456"), Some("1969-07-20")),
      (2L, Some("2021-03-14 02:30:00"), Some("2021-03-14")),
      (3L, Some("2021-11-07 01:30:00.000001"), Some("2021-11-07")),
      (4L, None, None))
    assert(collectAll() == expected)
    // the row reader agrees (columnar is the default path above)
    val viaRow =
      try { System.setProperty("graft.v2.columnar", "off"); collectAll() }
      finally System.clearProperty("graft.v2.columnar")
    assert(viaRow == expected)
    // a typed-literal DELETE translates through the predicate bridge
    spark.sql(s"DELETE FROM $cat.t WHERE ts < TIMESTAMP'1970-01-01 00:00:00'")
    assert(spark.sql(s"SELECT id FROM $cat.t ORDER BY id")
      .as[Long].collect().toSeq == Seq(2L, 3L, 4L))
    // native interchange: Spark's own parquet reader decodes the files
    val nativeRead = spark.read.parquet(
      Versioned.files(s"$root/t"): _*).count()
    assert(nativeRead >= 3)
  }

  test("DECIMAL round-trip: negatives, nulls, both readers, external INT32 files") {
    val (cat, root) = catalogFor("dectype")
    spark.sql(s"CREATE TABLE $cat.m (id BIGINT, amount DECIMAL(12,2))")
    spark.sql(s"INSERT INTO $cat.m VALUES " +
      "(1, 12.34), (2, -0.05), (3, 9999999999.99), (4, NULL)")
    def readAll() = spark.sql(s"SELECT id, CAST(amount AS STRING) FROM $cat.m ORDER BY id")
      .as[(Long, Option[String])].collect().toSeq
    val expected = Seq((1L, Some("12.34")), (2L, Some("-0.05")),
      (3L, Some("9999999999.99")), (4L, None))
    assert(readAll() == expected)
    val viaRow =
      try { System.setProperty("graft.v2.columnar", "off"); readAll() }
      finally System.clearProperty("graft.v2.columnar")
    assert(viaRow == expected)
    // typed decimal literal through the DELETE predicate bridge
    spark.sql(s"DELETE FROM $cat.m WHERE amount < 0.00")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.m").head.getLong(0) == 3)
    // EXACT aggregation (no float drift on money)
    assert(spark.sql(s"SELECT CAST(SUM(amount) * 100 AS BIGINT) FROM $cat.m")
      .head.getLong(0) == 1234L + 999999999999L)
    // external file with an INT32 compact decimal (p <= 9, Spark's own
    // non-legacy mapping) — both readers decode it
    val path = freshTable("decint32")
    Versioned.append(spark.range(0, 5, 1, 1)
      .selectExpr("id", "CAST(id AS DECIMAL(7,2)) + 0.25 AS d7"), path)
    val small = v2(path).select("id", "d7").as[(Long, java.math.BigDecimal)]
      .collect().sortBy(_._1).toSeq
    assert(small.map(_._2.toPlainString) ==
      (0 until 5).map(i => f"$i%d.25"), small.toString)
  }

  test("merge-on-read deletes served by row, columnar, count and agg paths") {
    val path = freshTable("mor")
    // two slices incl. an embedding column — the DV skip must hold on
    // scalar AND repeated decode, across both reader families
    spark.range(0, 6000, 1, 1)
      .selectExpr("id", "CAST(id % 5 AS STRING) AS s",
        "transform(array_repeat(id, 2), (x, i) -> CAST(x + i AS FLOAT)) AS emb")
      .write.format("graft-versioned").option("path", path)
      .mode("append").save()
    spark.range(6000, 9000, 1, 1)
      .selectExpr("id", "CAST(id % 5 AS STRING) AS s",
        "transform(array_repeat(id, 2), (x, i) -> CAST(x + i AS FLOAT)) AS emb")
      .write.format("graft-versioned").option("path", path)
      .mode("append").save()
    val filesBefore = Versioned.files(path).toSet
    Versioned.deleteWhereMor(spark, path, col("id") % 3 === 0 || col("id") === 8999)
    assert(Versioned.files(path).toSet == filesBefore, "no data file rewrites")
    val expectIds = (0L until 9000L).filterNot(i => i % 3 == 0 || i == 8999)
    // columnar path (default ON) serves the subtracted view
    val viaCol = v2(path).select("id", "s", "emb")
      .as[(Long, String, Seq[Float])].collect().sortBy(_._1).toSeq
    assert(viaCol.map(_._1) == expectIds)
    assert(viaCol.forall { case (i, s, e) =>
      s == (i % 5).toString && e == Seq(i.toFloat, (i + 1).toFloat) },
      "surviving rows keep aligned values across scalar and array columns")
    // row reader agrees batch-for-batch
    val viaRow =
      try {
        System.setProperty("graft.v2.columnar", "off")
        v2(path).select("id", "s", "emb")
          .as[(Long, String, Seq[Float])].collect().sortBy(_._1).toSeq
      } finally System.clearProperty("graft.v2.columnar")
    assert(viaRow == viaCol)
    // COUNT(*): the zero-data-page count reader subtracts sidecar counts
    assert(v2(path).count() == expectIds.size)
    // footer agg pushdown is DISABLED under DVs: the deleted max row
    // (8999) must not leak from block statistics
    val mm = v2(path).agg(min($"id"), max($"id")).head
    assert(mm.getLong(0) == 1L && mm.getLong(1) == 8998L, mm.toString)
    // time travel: the pre-delete version still serves every row
    assert(spark.read.format("graft-versioned").option("path", path)
      .option("versionAsOf", "2").load().count() == 9000)
  }

  test("streaming source rejects a version range that adds deletion vectors") {
    val path = freshTable("mordstream")
    spark.range(0, 10, 1, 1).selectExpr("id")
      .write.format("graft-versioned").option("path", path)
      .mode("append").save()
    Versioned.deleteWhereMor(spark, path, col("id") === 3)
    val stream = new VersionedMicroBatchStream(path,
      VersionedV2.messageType(new StructType().add("id", LongType)).toString,
      new StructType().add("id", LongType), emitEmptyRows = false)
    val e = intercept[IllegalStateException] {
      stream.planInputPartitions(VersionedStreamOffset(1), VersionedStreamOffset(2))
    }
    assert(e.getMessage.contains("deletion vector"), e.getMessage)
    // the pre-delete range still replays cleanly
    assert(stream.planInputPartitions(VersionedStreamOffset(0),
      VersionedStreamOffset(1)).nonEmpty)
  }

  test("columnar scan: evolution-null ARRAY column served as constant vector") {
    val (cat, root) = catalogFor("colembnull")
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.t SELECT id FROM range(0, 5, 1, 1)")
    // evolve the vector column in AFTER slice 1; its rows must serve a
    // constant-NULL array vector on the columnar path
    spark.sql(s"ALTER TABLE $cat.t ADD COLUMN emb ARRAY<FLOAT>")
    spark.sql(s"INSERT INTO $cat.t SELECT id, array(CAST(id AS FLOAT)) " +
      "FROM range(5, 8, 1, 1)")
    val q = spark.sql(s"SELECT id, emb FROM $cat.t")
    assert(q.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      q.queryExecution.executedPlan.toString)
    val got = q.as[(Long, Option[Seq[Float]])].collect().sortBy(_._1).toSeq
    assert(got.take(5).forall(_._2.isEmpty) &&
      got.drop(5) == Seq((5L, Some(Seq(5f))), (6L, Some(Seq(6f))),
        (7L, Some(Seq(7f)))), got.toString)
  }

  test("ALTER ADD COLUMN keeps a column added concurrently mid-retry") {
    val path = freshTable("widen")
    Versioned.append(Seq((1L, "a")).toDF("id", "s").coalesce(1), path)
    // simulate the lost-update interleaving: widen(base) consults each
    // attempt's CURRENT marker, so a marker committed after the caller's
    // initial read must appear in the final schema
    Versioned.replaceSchemaMarker(path, base => {
      val cur = base.getOrElse(
        VersionedV2.sparkSchema(VersionedV2.footerSchema(path, None)))
      cur.add(org.apache.spark.sql.types.StructField("c1",
        org.apache.spark.sql.types.LongType, nullable = true))
    })
    Versioned.replaceSchemaMarker(path, base => {
      val cur = base.getOrElse(
        VersionedV2.sparkSchema(VersionedV2.footerSchema(path, None)))
      cur.add(org.apache.spark.sql.types.StructField("c2",
        org.apache.spark.sql.types.LongType, nullable = true))
    })
    val names = Versioned.schemaOf(path).get.fieldNames.toSeq
    assert(names == Seq("id", "s", "c1", "c2"), names.mkString(","))
  }
}
