package graft.queries

import graft.SparkSpec

/** Meta-guard for the driver's hash gate: every declared query must be
  * bit-deterministic across executions in one session — same rows, same
  * order, same values. A query that interleaves differently under
  * parallelism (unordered float accumulation, missing total-order
  * ORDER BY, hash-partitioning leaks) fails here before it flakes in the
  * driver's DuckDB compare. */
class DeterminismSpec extends SparkSpec {

  test("every declared query returns identical ordered rows on repeated execution") {
    val flaky = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val a = fn(spark, sfDir).collect().map(_.toString).toSeq
        spark.catalog.clearCache()
        val b = fn(spark, sfDir).collect().map(_.toString).toSeq
        spark.catalog.clearCache()
        if (a == b) None
        else {
          val i = a.zip(b).indexWhere { case (x, y) => x != y }
          Some(s"$name: ${a.size}/${b.size} rows, " +
            (if (i < 0) "prefix equal, differs only in length" else s"first diff at row $i"))
        }
      } catch { case e: Throwable => Some(s"$name: threw ${e.getMessage}") }
    }
    assert(flaky.isEmpty, s"non-deterministic queries:\n${flaky.mkString("\n")}")
  }
}
