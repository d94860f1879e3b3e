package graft.scale

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloom-pruned semi join is exactly a plain semi join") {
    val fact = Tables.orders(spark, sfDir)
    val dim = Tables.customer(spark, sfDir).filter(col("c_acctbal") > 9000)
    val got = BloomJoin.prunedSemiJoin(fact, dim, "o_custkey", "c_custkey")
      .select(col("o_orderkey")).as[Long].collect().sorted
    val want = fact.join(dim, fact("o_custkey") === dim("c_custkey"), "left_semi")
      .select(col("o_orderkey")).as[Long].collect().sorted
    assert(got.sameElements(want))
    assert(want.nonEmpty, "fixture must exercise a non-empty match set")
  }

  test("the probe prunes at the scan: no-false-negative, bounded pass-through") {
    val fact = Tables.orders(spark, sfDir)
    val dim = Tables.customer(spark, sfDir).filter(col("c_acctbal") > 9000)
    val bloom = BloomJoin.buildBloom(dim, dim("c_custkey"), 1L << 16)
    val passed = fact.filter(BloomJoin.mightContain(bloom, col("o_custkey"))).count()
    val matches = fact.join(dim, fact("o_custkey") === dim("c_custkey"), "left_semi").count()
    val total = fact.count()
    assert(passed >= matches, "a bloom filter must never drop a true match")
    // at 2^16 expected items for ~150 keys the fpp is tiny: pass-through
    // must be far below the unpruned fact count for the prefilter to be
    // worth shipping (here: every non-matching row is overwhelmingly
    // likely rejected)
    assert(passed < total / 2, s"probe passed $passed of $total rows — not pruning")
  }

  test("mismatched key types still match: probe hashes in the build key's type") {
    // XxHash64(int 5) != XxHash64(long 5) — without the probe-side cast,
    // every true match would be dropped at the filter
    val fact = Seq(5, 6, 7).toDF("k") // int keys
    val dim = Seq(5L, 7L).toDF("d") // long keys
    val got = BloomJoin.prunedSemiJoin(fact, dim, "k", "d").as[Int].collect().sorted
    assert(got.toSeq == Seq(5, 7))
  }

  test("string keys against numeric dim: probe hashes in the build type and keeps matches") {
    // the probe must try_cast (never throw) and hash '5' as long 5; rows
    // that don't cast would reach the exact join, which under ANSI throws
    // for them exactly as the plain semi join does — identical behavior
    val fact = Seq("5", "6", "7").toDF("k")
    val dim = Seq(5L, 7L).toDF("d")
    val want = fact.join(dim, fact("k") === dim("d"), "left_semi")
      .as[String].collect().sorted
    val got = BloomJoin.prunedSemiJoin(fact, dim, "k", "d")
      .as[String].collect().sorted
    assert(got.sameElements(want) && want.nonEmpty)
  }

  test("null fact keys never pass the probe (semi-join null semantics)") {
    val fact = Seq[java.lang.Long](1L, 2L, null).toDF("k")
    val dim = Seq(1L).toDF("d")
    val got = BloomJoin.prunedSemiJoin(fact, dim, "k", "d").as[Long].collect()
    assert(got.toSeq == Seq(1L))
  }

  test("the probe is planted as a scan-side Filter in the optimized plan") {
    val fact = Tables.orders(spark, sfDir)
    val dim = Tables.customer(spark, sfDir).filter(col("c_acctbal") > 9000)
    val plan = BloomJoin.prunedSemiJoin(fact, dim, "o_custkey", "c_custkey")
      .queryExecution.optimizedPlan
    val hasProbe = plan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.exists(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]) => f
    }
    assert(hasProbe.nonEmpty, s"no bloom probe Filter in:\n$plan")
  }
}
