package graft.core

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/** The extensions path must make every kernel SQL-callable in a session
  * built with `spark.sql.extensions=graft.core.GraftExtensions`, with NO
  * call to GraftFunctions.register. */
class GraftExtensionsSpec extends SparkSpec {

  test("a session built with the extensions applied resolves the kernels in SQL") {
    spark.sparkContext // force the shared context up first
    // Build a sibling session over the same context with the extensions
    // class applied. (`spark.sql.extensions` is a STATIC conf read at
    // SparkContext creation, so the string-config route cannot be
    // exercised against a shared test context — `withExtensions` drives
    // the same GraftExtensions.apply the config route would.)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val extended = try SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions())
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
    try {
      val row = extended.sql(
        """SELECT
          |  vec_squared_l2(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |                 array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS d,
          |  vec_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
          |          array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS dp,
          |  vec_cosine_sim(array(CAST(3.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |                 array(CAST(3.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cs
          |""".stripMargin).head()
      assert(row.getDouble(0) == 5.0)
      assert(row.getDouble(1) == 4.0)
      assert(row.getDouble(2) == 1.0)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("register() binds the same builders into an existing session") {
    GraftFunctions.register(spark)
    val d = spark.sql(
      "SELECT vec_cosine_sim(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS c")
      .head().getDouble(0)
    assert(d == 1.0)
  }

  test("nfc_normalize: codegen == interpreted, folds confusables, idempotent, null-safe") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val decomposed = "caf" + "e\u0301"
    val composed = "caf\u00e9"
    assert(decomposed != composed)
    val rows = Seq(Some(decomposed), Some(composed), Some("plain"), None)
      .toDF("t")
    // codegen path (whole-stage over a projection)
    val got = rows.selectExpr("nfc_normalize(t) AS n").as[Option[String]].collect().toSeq
    assert(got == Seq(Some(composed), Some(composed), Some("plain"), None))
    // interpreted path must agree bit for bit
    val interp = NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(decomposed)))
      .eval(null).toString
    assert(interp == composed)
    // idempotent: NFC(NFC(x)) == NFC(x)
    val twice = rows.selectExpr("nfc_normalize(nfc_normalize(t)) AS n")
      .as[Option[String]].collect().toSeq
    assert(twice == got)
    // non-string input fails analysis instead of silently casting
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT nfc_normalize(1)").collect()
    }
  }

  test("jaro_winkler: codegen == interpreted, literature values, edge conventions") {
    import spark.implicits._
    GraftFunctions.register(spark)
    def lit(s: String) = org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    // Winkler's canonical pairs (values to 1e-6)
    val cases = Seq(
      ("martha", "marhta", 961111L), ("dwayne", "duane", 840000L),
      ("dixon", "dicksonx", 813333L), ("abc", "abc", 1000000L),
      ("abc", "xyz", 0L),
      // DuckDB edge convention: any empty side is 0, even both
      ("", "", 0L), ("a", "", 0L))
    for ((a, b, want) <- cases) {
      // codegen path (whole-stage projection over a real frame)
      val got = Seq((a, b)).toDF("a", "b")
        .selectExpr("CAST(round(1000000 * jaro_winkler(a, b)) AS BIGINT) AS s")
        .as[Long].head()
      assert(got == want, s"codegen $a/$b")
      // interpreted path agrees
      val interp = math.round(1e6 *
        JaroWinkler(lit(a), lit(b)).eval(null).asInstanceOf[Double])
      assert(interp == want, s"interp $a/$b")
    }
    // symmetry and null safety
    assert(JaroWinkler(lit("duane"), lit("dwayne")).eval(null) ==
      JaroWinkler(lit("dwayne"), lit("duane")).eval(null))
    val nulls = Seq((Some("x"), Option.empty[String])).toDF("a", "b")
      .selectExpr("jaro_winkler(a, b) AS s").collect()
    assert(nulls.head.isNullAt(0))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT jaro_winkler(1, 'a')").collect()
    }
  }
}
