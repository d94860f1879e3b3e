package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, lit}

import graft.SparkSpec
import graft.store.Versioned

/** The automatic data-skipping rule: file counts come from the OPTIMIZED
  * plan's relation (the rule runs in the optimizer), results from
  * execution — both must agree with the manual readPruned path. */
class StatsSkipSpec extends SparkSpec {
  import spark.implicits._

  StatsSkip.attach(spark)

  private def filesScanned(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation =>
        l.relation.asInstanceOf[HadoopFsRelation].location.inputFiles.length
    }.sum

  private def store(): String = {
    val t = tmpDir("statsskip").toString
    Versioned.append(Seq((1L, "a"), (5L, "b")).toDF("id", "s").coalesce(1), t)
    Versioned.append(Seq((10L, "c"), (20L, "d")).toDF("id", "s").coalesce(1), t)
    Versioned.append(Seq((50L, "e")).toDF("id", "s").coalesce(1), t)
    Versioned.analyzeStats(spark, t, "id")
    t
  }

  test("range filter over Versioned.table scans only stats-overlapping files") {
    val t = store()
    val df = Versioned.table(spark, t).filter(col("id") >= 8 && col("id") <= 30)
    assert(filesScanned(df) == 1, df.queryExecution.optimizedPlan.toString)
    assert(df.as[(Long, String)].collect().toSet == Set((10L, "c"), (20L, "d")))
  }

  test("point lookup (either operand order) prunes to one file") {
    val t = store()
    val d1 = Versioned.table(spark, t).filter(col("id") === 50L)
    assert(filesScanned(d1) == 1)
    assert(d1.as[(Long, String)].collect().toSet == Set((50L, "e")))
    val d2 = Versioned.table(spark, t).filter(lit(50L) === col("id"))
    assert(filesScanned(d2) == 1)
  }

  test("disjoint range scans zero files and returns zero rows") {
    val t = store()
    val df = Versioned.table(spark, t).filter(col("id") > 60L)
    assert(filesScanned(df) == 0)
    assert(df.count() == 0)
  }

  test("filters on a column without stats prune nothing; untagged reads untouched") {
    val t = store()
    val noStats = Versioned.table(spark, t).filter(col("s") === "c")
    assert(filesScanned(noStats) == 3)
    assert(noStats.count() == 1)
    val untagged = Versioned.read(spark, t).filter(col("id") >= 8 && col("id") <= 30)
    assert(filesScanned(untagged) == 3)
    assert(untagged.count() == 2)
  }

  test("equality over interleaved files: stats keep all, blooms prune to one") {
    val t = tmpDir("statsskip").toString
    Versioned.append(Seq((1L, "a"), (50L, "b"), (100L, "c")).toDF("id", "s").coalesce(1), t)
    Versioned.append(Seq((2L, "d"), (51L, "e"), (99L, "f")).toDF("id", "s").coalesce(1), t)
    Versioned.analyzeStats(spark, t, "id")
    Versioned.analyzeBloom(spark, t, "id")
    // a range cannot prune interleaved min/max envelopes
    assert(filesScanned(Versioned.table(spark, t)
      .filter(col("id") >= 50L && col("id") <= 51L)) == 2)
    // the point lookup consults the blooms through the same rule
    val df = Versioned.table(spark, t).filter(col("id") === 51L)
    assert(filesScanned(df) == 1)
    assert(df.as[(Long, String)].collect().toSet == Set((51L, "e")))
  }

  test("the rule fires through the SQL surface: a temp view keeps the tagged relation") {
    val t = store()
    Versioned.table(spark, t).createOrReplaceTempView("skip_sql_t")
    val df = spark.sql("SELECT id, s FROM skip_sql_t WHERE id >= 8 AND id <= 30")
    assert(filesScanned(df) == 1, df.queryExecution.optimizedPlan.toString)
    assert(df.as[(Long, String)].collect().toSet == Set((10L, "c"), (20L, "d")))
  }

  test("unanalyzed files are conservatively scanned") {
    val t = store()
    Versioned.append(Seq((200L, "f")).toDF("id", "s").coalesce(1), t)
    val df = Versioned.table(spark, t).filter(col("id") >= 8 && col("id") <= 30)
    assert(filesScanned(df) == 2) // the [10,20] file + the unanalyzed one
    assert(df.as[(Long, String)].collect().toSet == Set((10L, "c"), (20L, "d")))
  }
}
