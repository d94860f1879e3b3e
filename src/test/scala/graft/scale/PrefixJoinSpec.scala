package graft.scale

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Prefix-filter exact set-similarity join: 100% recall vs brute force,
  * adversarial global-order cases, and edge-case prefix lengths. */
class PrefixJoinSpec extends SparkSpec {

  private def brute(el: org.apache.spark.sql.DataFrame, tNum: Int, tDen: Int) =
    NearDup.exactJaccardPairs(el.select(col("doc_id"), col("el").as("sh")))
      .filter(col("inter") * tDen >= col("uni") * tNum)
      .select("a_id", "b_id", "inter", "uni")

  private def run(el: org.apache.spark.sql.DataFrame, tNum: Int, tDen: Int) =
    PrefixJoin.jaccardSelfJoin(el, tNum, tDen)
      .select("a_id", "b_id", "inter", "uni")

  private def sorted(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("a_id", "b_id").collect().map(_.toSeq).toSeq

  test("matches brute force on the fixture corpus (5-grams, t=0.8 and t=0.5)") {
    val el = PrefixJoin.wordKGrams(
      graft.Tables.documents(spark, sfDir), k = 5)
    for ((tn, td) <- Seq((4, 5), (1, 2))) {
      val got = sorted(run(el, tn, td))
      val want = sorted(brute(el, tn, td))
      assert(got == want, s"mismatch at t=$tn/$td")
      assert(want.nonEmpty, s"vacuous fixture at t=$tn/$td")
    }
  }

  test("adversarial global order: df ties and rare-element-only overlap") {
    import spark.implicits._
    // a/b share only their RAREST element; c/d are identical; e overlaps
    // everything on a stopword-like hot element that never enters prefixes
    val rows = Seq(
      1L -> Seq("hot", "x1", "x2", "shared"),
      2L -> Seq("hot", "y1", "y2", "shared"),
      3L -> Seq("hot", "z1", "z2", "z3"),
      4L -> Seq("hot", "z1", "z2", "z3"),
      5L -> Seq("hot", "w1", "w2", "w3", "w4", "w5", "w6", "w7")
    ).flatMap { case (id, els) => els.map(e => (id, e)) }
    val el = rows.toDF("doc_id", "el")
    for ((tn, td) <- Seq((1, 4), (1, 2), (4, 5), (1, 1))) {
      assert(sorted(run(el, tn, td)) == sorted(brute(el, tn, td)),
        s"mismatch at t=$tn/$td")
    }
  }

  test("edge cases: singleton sets and t=1 (set equality)") {
    import spark.implicits._
    val el = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "a"), (4L, "b"))
      .toDF("doc_id", "el")
    // t=1: only pairs with identical sets — (1,2)
    assert(sorted(run(el, 1, 1)) == Seq(Seq(1L, 2L, 1L, 1L)))
    // t=1/2: (1,2) J=1; (1,4)/(2,4) J=1/2; (3,4) J=1/2
    assert(sorted(run(el, 1, 2)) == sorted(brute(el, 1, 2)))
    assert(sorted(run(el, 1, 2)).size == 4)
  }

  test("randomized corpora: equals brute force at random thresholds (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 12) {
      val nDocs = 8 + rnd.nextInt(18)
      val vocab = 6 + rnd.nextInt(20)
      val rows = (1 to nDocs).flatMap { id =>
        val n = 1 + rnd.nextInt(12)
        Seq.fill(n)(s"e${rnd.nextInt(vocab)}").distinct.map(e => (id.toLong, e))
      }
      val el = rows.toDF("doc_id", "el")
      val tDen = 2 + rnd.nextInt(9)
      val tNum = 1 + rnd.nextInt(tDen)
      assert(sorted(run(el, tNum, tDen)) == sorted(brute(el, tNum, tDen)),
        s"trial $trial mismatch at t=$tNum/$tDen docs=$nDocs vocab=$vocab")
    }
  }

  private def bruteContain(el: org.apache.spark.sql.DataFrame, tNum: Int, tDen: Int) = {
    val sh = el.select(col("doc_id"), col("el").as("sh"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("doc_id", "a_id"), "a_id")
      .filter(col("inter") * tDen >= col("n") * tNum)
      .select(col("a_id"), col("b_id"), col("inter"), col("n").as("na"))
  }

  test("containment join equals brute force; asymmetry is preserved") {
    import spark.implicits._
    // b contains all of a (C(a→b)=1) but a holds only half of b
    val rows = Seq(
      1L -> Seq("x1", "x2"),
      2L -> Seq("x1", "x2", "y1", "y2"),
      3L -> Seq("z1", "z2")
    ).flatMap { case (id, els) => els.map(e => (id, e)) }
    val el = rows.toDF("doc_id", "el")
    val got = PrefixJoin.containmentSelfJoin(el, 9, 10)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set(1L -> 2L)) // only a⊆b direction, never b→a at t=0.9
    for ((tn, td) <- Seq((1, 2), (9, 10), (1, 1))) {
      val g = PrefixJoin.containmentSelfJoin(el, tn, td)
        .orderBy("a_id", "b_id").collect().map(_.toSeq).toSeq
      val w = bruteContain(el, tn, td)
        .orderBy("a_id", "b_id").collect().map(_.toSeq).toSeq
      assert(g == w, s"mismatch at t=$tn/$td")
    }
  }

  test("containment join equals brute force on seeded random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(99L)
    for (trial <- 1 to 8) {
      val rows = (1 to 6 + rnd.nextInt(14)).flatMap { id =>
        Seq.fill(1 + rnd.nextInt(10))(s"e${rnd.nextInt(14)}").distinct
          .map(e => (id.toLong, e))
      }
      val el = rows.toDF("doc_id", "el")
      val tDen = 2 + rnd.nextInt(9)
      val tNum = 1 + rnd.nextInt(tDen)
      val g = PrefixJoin.containmentSelfJoin(el, tNum, tDen)
        .orderBy("a_id", "b_id").collect().map(_.toSeq).toSeq
      val w = bruteContain(el, tNum, tDen)
        .orderBy("a_id", "b_id").collect().map(_.toSeq).toSeq
      assert(g == w, s"trial $trial mismatch at t=$tNum/$tDen")
    }
  }

  test("non-broadcast path: results identical with auto-broadcast disabled") {
    // the verify stage carries no broadcast() hint — at scale AQE picks a
    // shuffle join; forcing the threshold to -1 exercises exactly that
    // plan and must not change a single pair
    val el = PrefixJoin.wordKGrams(
      graft.Tables.documents(spark, sfDir), k = 5)
    val want = sorted(run(el, 4, 5))
    val wantC = PrefixJoin.containmentSelfJoin(el, 9, 10)
      .orderBy("a_id", "b_id").collect().map(_.toSeq).toSeq
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(sorted(run(el, 4, 5)) == want)
      assert(PrefixJoin.containmentSelfJoin(el, 9, 10)
        .orderBy("a_id", "b_id").collect().map(_.toSeq).toSeq == wantC)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("no forced broadcast anywhere in the prefix-join plans") {
    // the round-8 scale defect: verified() hinted broadcast() on a frame
    // that grows with the corpus. Pin its absence at the analyzed-plan
    // level (hints appear as ResolvedHint before the planner consumes
    // them; AQE choosing a broadcast for a genuinely small side is fine)
    val el = PrefixJoin.wordKGrams(
      graft.Tables.documents(spark, sfDir), k = 5)
    for (df <- Seq(PrefixJoin.jaccardSelfJoin(el, 4, 5),
                   PrefixJoin.containmentSelfJoin(el, 9, 10))) {
      val hints = df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }
      assert(hints.isEmpty, s"forced hint in plan: $hints")
    }
  }

  test("wordKGrams drops too-short docs and dedups repeated grams") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a b a b a b a b")).toDF("doc_id", "text")
    val el = PrefixJoin.wordKGrams(docs, k = 3).collect()
    assert(el.forall(_.getLong(0) == 2L))
    // "a b a b a b a b" 3-grams: "a b a","b a b" repeated -> 2 distinct
    assert(el.length == 2)
  }
}
