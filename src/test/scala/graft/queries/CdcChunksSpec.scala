package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Content-defined chunking: the boundary-resync property that justifies
  * CDC over fixed-width chunking, plus output-contract invariants. */
class CdcChunksSpec extends SparkSpec {
  import spark.implicits._

  /** Write a documents.parquet fixture and run the query over it. */
  private def run(docs: Seq[(Long, String)]) = {
    val dir = tmpDir("cdc").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    DedupQueries.cdcChunks(spark, dir)
  }

  test("insertion shifts only the head: suffix chunks resync (the CDC property)") {
    val rnd = new scala.util.Random(7L)
    val words = Seq.fill(120)("w" + rnd.nextInt(500))
    val base = words.mkString(" ")
    val shifted = ("INSERTED " + base)
    val out = run(Seq(1L -> base, 2L -> shifted)).collect()
    // some chunk fingerprint must be stored twice across the two docs —
    // fixed-width chunking would share NOTHING after a 1-word prepend
    val shared = out.filter(r => r.getLong(1) == 2)
    assert(shared.nonEmpty,
      "no resynced chunk shared between original and shifted copy")
  }

  test("identical docs share every chunk; counts are consistent") {
    val rnd = new scala.util.Random(11L)
    val text = Seq.fill(80)("t" + rnd.nextInt(300)).mkString(" ")
    val out = run(Seq(1L -> text, 2L -> text, 3L -> ("zzz " + rnd.nextInt(9)))).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) >= 2)              // n_total >= 2 contract
      assert(r.getLong(1) <= r.getLong(2))   // n_docs <= n_total
      assert(r.getLong(3) == 1L)             // first_doc is the min id
    }
    // every chunk of doc 1 also appears in doc 2 → n_docs == 2 for all
    assert(out.forall(_.getLong(1) == 2))
  }

  test("short docs (< 3 words) form exactly one chunk and can still dedup") {
    val out = run(Seq(1L -> "a b", 2L -> "a b")).collect()
    assert(out.length == 1 && out.head.getLong(2) == 2)
  }
}
