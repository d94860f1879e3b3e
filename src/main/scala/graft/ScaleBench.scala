package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured scale datapoint beyond sf0.1 (VERDICT r15 #3): upsample the
  * sf0.1 fixtures 10× DETERMINISTICALLY (seeded row replication with
  * re-keyed ids — no RNG, so reruns measure the same corpus) and compare
  * each heavy family's wall time against the same query at 1×. The
  * upsample is content-aware so the 10× corpus keeps the 1× corpus's
  * STRUCTURE instead of degenerating:
  *
  *  - ids re-key per replica (`id + r·(max+1)`): key cardinality scales
  *    10×, no collisions;
  *  - document TEXT passes through a per-replica letter permutation
  *    (translate over the 10 most frequent letters, rotated by r):
  *    within-replica near-dup structure is preserved exactly, while
  *    cross-replica pairs stop being near-dups — a naive copy would
  *    hand every doc 9 synthetic twins and the dedup families would be
  *    measuring an artifact, not scale;
  *  - EMBEDDINGS rotate by r positions (norm-preserving, decorrelates
  *    cosine) for the same reason;
  *  - lineitem re-keys part/supplier/order, so the derived graph gets
  *    10× nodes and 10× edges in 10 disconnected replicas.
  *
  * Prints per-family [sec at 1×, sec at 10×, time ratio] — the evidence
  * table SCALE.md cites. A family scaling ~linearly (ratio ≈ 10 on 32
  * threads, minus fixed per-query cost amortization) holds its plan
  * shape; a superlinear one is flagged for explanation. */
object ScaleBench {
  private def upsampleDir(base: String, factor: Int): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_upsample_f${factor}_" +
        base.replaceAll("[^A-Za-z0-9.]", "_")).getAbsolutePath

  /** Cross-join with the replica index and re-key. `textCols` pass
    * through the per-replica letter permutation; `keyCols` shift by
    * r·(max+1); `rotateArrayCols` rotate by r. */
  private def upsample(spark: SparkSession, base: String, table: String,
      out: String, factor: Int, keyCols: Seq[String],
      textCols: Seq[String] = Seq.empty,
      rotateArrayCols: Seq[String] = Seq.empty): Unit = {
    val src = spark.read.parquet(s"$base/$table.parquet")
    val maxes = keyCols.map { k =>
      k -> (src.agg(max(col(k))).head().getLong(0) + 1L)
    }
    val alphabet = "etaoinshrd"
    def rotated(r: Int) = alphabet.drop(r % alphabet.length) +
      alphabet.take(r % alphabet.length)
    var df = src.crossJoin(
      spark.range(factor.toLong).select(col("id").cast("int").as("__r")))
    maxes.foreach { case (k, m) =>
      df = df.withColumn(k, col(k) + col("__r").cast("long") * m)
    }
    textCols.foreach { t =>
      df = df.withColumn(t,
        (1 until factor).foldLeft(when(col("__r") === 0, col(t))) {
          case (acc, r) => acc.when(col("__r") === r,
            translate(col(t), alphabet, rotated(r)))
        }.otherwise(col(t)))
    }
    rotateArrayCols.foreach { a =>
      df = df.withColumn(a,
        when(col("__r") === 0, col(a)).otherwise(concat(
          slice(col(a), col("__r") + 1, size(col(a)) - col("__r")),
          slice(col(a), lit(1), col("__r")))))
    }
    df.drop("__r")
      .repartition(32) // spread the 10× corpus over real files
      .write.mode("overwrite").parquet(s"$out/$table.parquet")
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_BASE", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_FACTOR", "10").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", graft.core.GraftExtensions.Name)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val up = upsampleDir(base, factor)
    if (!new java.io.File(up, "documents.parquet").exists()) {
      println(s"[scalebench] building ${factor}x corpus at $up ...")
      val t0 = System.nanoTime()
      upsample(spark, base, "documents", up, factor,
        keyCols = Seq("doc_id"), textCols = Seq("text"))
      upsample(spark, base, "events", up, factor,
        keyCols = Seq("event_id", "user_id"))
      upsample(spark, base, "embeddings", up, factor,
        keyCols = Seq("vec_id"), rotateArrayCols = Seq("embedding"))
      upsample(spark, base, "lineitem", up, factor,
        keyCols = Seq("l_orderkey", "l_partkey", "l_suppkey"))
      // the remaining TPC-H-ish dims are not read by the measured
      // families; symlink-free copy keeps Tables.* total on the dir
      Seq("region", "nation", "customer", "supplier", "part", "orders")
        .foreach { t =>
          spark.read.parquet(s"$base/$t.parquet")
            .write.mode("overwrite").parquet(s"$up/$t.parquet")
        }
      println(f"[scalebench] corpus built in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    } else println(s"[scalebench] reusing ${factor}x corpus at $up")

    val defaults = Seq("minhash_neardup", "simhash_neardup",
      "prefix_filter_join", "dedup_collapse", "pagerank", "ivf_topk",
      "nsw_topk", "bm25_topk", "quality_classifier", "sketch_stats",
      "versioned_merge", "stream_dedup")
    val names = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(defaults)
      .filter(SparkEntry.queries.contains)

    spark.range(1000000L).selectExpr("sum(id)").collect()
    def bestOf2(name: String, dir: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        val a = once(); val b = once()
        spark.catalog.clearCache(); System.gc()
        math.min(a, b)
      } catch { case e: Throwable =>
        System.err.println(s"[scalebench] $name@$dir failed: ${e.getMessage}")
        -1.0
      }
    }
    // shared stored frames (edge lists, shingles, classifier scores) are
    // dir-keyed; charge their first-touch separately for each corpus,
    // exactly as Bench does
    def prewarm(dir: String): Double = {
      val t0 = System.nanoTime()
      try graft.queries.RelationalQueries.prewarmShared(spark, dir)
      catch { case e: Throwable =>
        System.err.println(s"[scalebench] prewarm@$dir failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    val pwBase = prewarm(base)
    val pwUp = prewarm(up)
    def r2(v: Double) = math.round(v * 100) / 100.0
    println(f"[scalebench] prewarm: 1x ${pwBase}%.1f s, ${factor}x ${pwUp}%.1f s, " +
      f"ratio ${pwUp / math.max(pwBase, 1e-9)}%.1f")
    val rows = names.map { n =>
      val b = bestOf2(n, base)
      val u = bestOf2(n, up)
      val ratio = if (b > 0 && u > 0) u / b else -1.0
      println(f"[scalebench] $n%-22s 1x ${b}%7.2f s   ${factor}x ${u}%7.2f s   ratio ${ratio}%5.2f")
      s""""$n":[${r2(b)},${r2(u)},${r2(ratio)}]"""
    }
    println(s"""{"metric":"scale_ratio","factor":$factor,"base":"$base",""" +
      s""""prewarm":[${r2(pwBase)},${r2(pwUp)}],""" +
      s""""columns":["sec_1x","sec_${factor}x","time_ratio"],""" +
      s""""queries":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
