package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins for the Catalyst lineage walk: each plan shape that maps
  * attributes (projection chains, aggregates, generators, unions,
  * windows, expand) plus the direct/indirect split. */
class LineageSpec extends SparkSpec {
  import spark.implicits._

  private val docs = graft.Tables.documents(spark, sfDir)

  test("alias chains resolve to the leaf column; literals have no data source") {
    val df = docs.select(col("doc_id").as("a"), lit(1).as("one"))
      .select((col("a") + 1).as("b"), col("one"))
    val l = Lineage.of(df)
    assert(l.contains(("b", "data", "documents", "doc_id")))
    assert(!l.exists(r => r._1 == "one" && r._2 == "data"))
  }

  test("filters and join keys appear as indirect sources on every column") {
    val ev = graft.Tables.events(spark, sfDir)
    val df = docs.filter(col("lang") === "en")
      .join(ev, col("doc_id") === col("user_id"))
      .select(col("text"), col("value"))
    val l = Lineage.of(df)
    for (out <- Seq("text", "value")) {
      assert(l.contains((out, "filter", "documents", "lang")))
      assert(l.contains((out, "filter", "documents", "doc_id")))
      assert(l.contains((out, "filter", "events", "user_id")))
    }
    assert(l.contains(("text", "data", "documents", "text")))
    assert(!l.contains(("text", "data", "events", "value")))
  }

  test("aggregates, generators, windows and unions map through") {
    val agg = docs.groupBy(col("lang")).agg(sum(col("n_chars")).as("tc"))
    assert(Lineage.of(agg).contains(("tc", "data", "documents", "n_chars")))

    val gen = docs.select(explode(split(col("text"), " ")).as("tok"))
    assert(Lineage.of(gen).contains(("tok", "data", "documents", "text")))

    val w = docs.select(col("doc_id"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("n_chars"))).as("rn"))
    val lw = Lineage.of(w)
    assert(lw.contains(("rn", "data", "documents", "lang")))
    assert(lw.contains(("rn", "data", "documents", "n_chars")))

    val u = docs.select(col("doc_id").as("k"))
      .unionByName(graft.Tables.events(spark, sfDir).select(col("user_id").as("k")))
    val lu = Lineage.of(u)
    assert(lu.contains(("k", "data", "documents", "doc_id")))
    assert(lu.contains(("k", "data", "events", "user_id")))
  }

  test("expand (cube) keeps grouping-column provenance") {
    val c = graft.Tables.events(spark, sfDir)
      .cube(col("event_type")).agg(count(lit(1)).as("n"))
    assert(Lineage.of(c).contains(("event_type", "data", "events", "event_type")))
  }

  test("subquery expressions contribute sources (scalar value + exists gate)") {
    val ev = graft.Tables.events(spark, sfDir)
    ev.createOrReplaceTempView("lin_ev")
    docs.createOrReplaceTempView("lin_docs")
    // scalar subquery in a PROJECTION: the subquery's aggregated column
    // is a DATA source of the output column
    val scalar = spark.sql(
      "SELECT doc_id, (SELECT MAX(value) FROM lin_ev) AS mv FROM lin_docs")
    val ls = Lineage.of(scalar)
    assert(ls.contains(("mv", "data", "events", "value")), ls.mkString("\n"))
    // EXISTS in a FILTER: both the subquery's correlation column and its
    // internal filter column decide rows — filter provenance on every
    // output column (round-10 ADVICE: subqueries were invisible)
    val exists = spark.sql(
      """SELECT text FROM lin_docs d
        |WHERE EXISTS (SELECT 1 FROM lin_ev e
        |              WHERE e.user_id = d.doc_id AND e.value > 400)""".stripMargin)
    val le = Lineage.of(exists)
    assert(le.contains(("text", "filter", "events", "value")), le.mkString("\n"))
    assert(le.contains(("text", "filter", "events", "user_id")), le.mkString("\n"))
    assert(le.contains(("text", "data", "documents", "text")))
  }

  test("lineage runs on plan metadata only — no Spark job") {
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    Lineage.of(docs.filter(col("lang") === "en").select(col("text")))
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(before == after, "plan walk must not launch jobs")
  }
}
