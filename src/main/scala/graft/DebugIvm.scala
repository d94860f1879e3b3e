package graft

import org.apache.spark.sql.SparkSession

// Manifest-log commit-cost probe at 10^4 files (SCALE.md evidence for
// checkpoint+delta logging; not part of the suite). Driver-side only —
// no Spark session needed: commit() is pure manifest I/O.
object DebugManifestBench {
  def main(args: Array[String]): Unit = {
    import graft.store.Versioned
    val t = java.nio.file.Files.createTempDirectory("mbench").toString
    // v1: a 10^4-line full listing (files needn't exist for commit())
    val base = (0 until 10000).map(i => f"batch-0/part-$i%05d.parquet")
    Versioned.commit(t, 0, base)
    val n = 200
    val t0 = System.nanoTime()
    (1 to n).foreach { i =>
      Versioned.commit(t, i, Seq(f"batch-$i/part-0.parquet"))
    }
    val perCommit = (System.nanoTime() - t0) / 1e6 / n
    val dir = new java.io.File(t, "_manifests")
    val bytes = dir.listFiles().map(_.length()).sum
    val fullBytes = (n + 1).toLong * base.map(_.length + 1L).sum
    println(f"[mbench] $n single-file commits over a 10k-file table: " +
      f"$perCommit%.3f ms/commit, log=${bytes / 1024} KiB " +
      f"(all-full-listings would be ~${fullBytes / 1024} KiB)")
    // the old format's write cost per commit, measured the same way:
    // write the complete 10k-line listing per version
    val t1 = System.nanoTime()
    (1 to n).foreach { i =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(t, f"full-$i%04d.tmp"),
        base.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
    }
    println(f"[mbench] full-listing write cost: ${(System.nanoTime() - t1) / 1e6 / n}%.3f ms/commit")
  }
}

// Streaming-replay fixed-cost probe (SCALE.md evidence for VERDICT r14
// #5): runs the stream_* replays with a progress listener and prints
// each micro-batch's duration breakdown plus the query wall time, so
// the floor decomposes into staging / batch execution / start-stop.
object DebugStream {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", graft.core.GraftExtensions.Name)
      .config("spark.sql.shuffle.partitions", "32")
      // r17 (guide §2.2 AQE coalescing): let AQE re-plan the partitioning
      // of plans that feed .cache() — the default (false) pins every
      // cached iterative frame (BFS/PageRank/k-core rounds) to the full
      // shuffle.partitions count, paying cpus tasks per tiny per-round
      // shuffle; with it on, AQE coalesces them by size (scale-adaptive:
      // full partitions at warehouse scale are untouched). Measured:
      // ppr_seeded 164 -> 41 tasks, taskMs halved, oracle-identical rows.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000L).selectExpr("sum(id)").collect()
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[stream-debug]   started ${e.id} at ${System.currentTimeMillis()}")
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[stream-debug]   batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs}")
      }
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[stream-debug]   terminated at ${System.currentTimeMillis()}")
    })
    val names = Seq("stream_join_outer", "stream_upsert", "stream_inactivity")
    for (r <- 1 to 2; n <- names) {
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(n)(spark, dir).count()
      println(f"[stream-debug] run$r $n rows=$c wall=${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}

// Generic per-query job tracer (dev-only, not part of the suite): runs the
// named declared queries with a job listener that prints every Spark job's
// duration plus the DRIVER GAP since the previous job ended (planning,
// manifest I/O, commit) — the r16 optimization round's measure-first tool
// for journey-class rows whose physical plans hide eager work.
object DebugQuery {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", graft.core.GraftExtensions.Name)
      .config("spark.sql.shuffle.partitions", "32")
      // r17 (guide §2.2 AQE coalescing): let AQE re-plan the partitioning
      // of plans that feed .cache() — the default (false) pins every
      // cached iterative frame (BFS/PageRank/k-core rounds) to the full
      // shuffle.partitions count, paying cpus tasks per tiny per-round
      // shuffle; with it on, AQE coalesces them by size (scale-adaptive:
      // full partitions at warehouse scale are untouched). Measured:
      // ppr_seeded 164 -> 41 tasks, taskMs halved, oracle-identical rows.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val jobCount = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      @volatile private var lastEnd = System.nanoTime()
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet()
        val gap = (System.nanoTime() - lastEnd) / 1e6
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
          .take(70)
        starts.put(e.jobId, System.nanoTime())
        println(f"[q-jobs] job=${e.jobId}%3d gap=${gap}%7.1f ms stages=${e.stageIds.size} $desc")
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        lastEnd = System.nanoTime()
        Option(starts.remove(e.jobId)).foreach { t0 =>
          println(f"[q-jobs] job=${e.jobId}%3d took ${(System.nanoTime() - t0) / 1e6}%7.1f ms")
        }
      }
    })
    for (r <- 1 to 2; n <- names) {
      val j0 = jobCount.get()
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(n)(spark, dir).count()
      println(f"[q-debug] run$r $n rows=$c wall=${(System.nanoTime() - t0) / 1e9}%6.2f s " +
        s"jobs=${jobCount.get() - j0}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

// Throwaway per-leg profiler for ivm_join_view (not part of the suite).
object DebugIvm {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", graft.core.GraftExtensions.Name)
      .config("spark.sql.shuffle.partitions", "32")
      // r17 (guide §2.2 AQE coalescing): let AQE re-plan the partitioning
      // of plans that feed .cache() — the default (false) pins every
      // cached iterative frame (BFS/PageRank/k-core rounds) to the full
      // shuffle.partitions count, paying cpus tasks per tiny per-round
      // shuffle; with it on, AQE coalesces them by size (scale-adaptive:
      // full partitions at warehouse scale are untouched). Measured:
      // ppr_seeded 164 -> 41 tasks, taskMs halved, oracle-identical rows.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (args.contains("--noaqe")) b.config("spark.sql.adaptive.enabled", "false")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // job-level trace: start/end of every Spark job plus the DRIVER GAP
    // since the previous job ended (manifest I/O, planning, commit)
    val trace = args.contains("--jobs")
    if (trace) spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      @volatile private var lastEnd = System.nanoTime()
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val gap = (System.nanoTime() - lastEnd) / 1e3 / 1e3
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
          .take(70)
        starts.put(e.jobId, (System.nanoTime(), desc))
        println(f"[ivm-jobs] job=${e.jobId}%3d gap=${gap}%7.1f ms stages=${e.stageIds.size} $desc")
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        lastEnd = System.nanoTime()
        Option(starts.remove(e.jobId)).foreach { case (t0, _) =>
          println(f"[ivm-jobs] job=${e.jobId}%3d took ${(System.nanoTime() - t0) / 1e6}%7.1f ms")
        }
      }
    })
    // two timed runs: first pays JIT, second is the steady state
    for (r <- 1 to 4) {
      val t0 = System.nanoTime()
      val n = graft.queries.StoreQueries.ivmJoinViewProfiled(spark, dir,
        label => println(f"[ivm-debug] run$r ${label}%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s cumulative"))
      println(f"[ivm-debug] run$r TOTAL rows=$n ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      val t1 = System.nanoTime()
      val m = graft.queries.StoreQueries.ivmDistinctView(spark, dir).count()
      println(f"[ivm-debug] run$r DISTINCT rows=$m ${(System.nanoTime() - t1) / 1e9}%7.2f s")
    }
    spark.stop()
  }
}
