package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private def predict(texts: (Long, String)*): Map[Long, String] = {
    // run the same scoring logic langId uses, over hand-written sentences
    val df = texts.toSeq.toDF("doc_id", "text")
      .withColumn("lang", lit("?")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val dir = tmpDir("langid").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    TextQueries.langId(spark, dir)
      .select("doc_id", "predicted").as[(Long, String)].collect().toMap
  }

  test("marker heuristic identifies real sentences per language") {
    val got = predict(
      1L -> "the cat is on a mat and the dog is near the door",
      2L -> "der hund ist gross und die katze ist klein",
      3L -> "el perro es grande y los gatos son una familia",
      4L -> "le chien est grand et les chats sont une famille",
      5L -> "这是一个中文句子")
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "fr", 5L -> "zh"))
  }

  test("empty-ish text defaults to en (deterministic tie-break)") {
    val got = predict(1L -> "xyzzy plugh")
    assert(got(1L) == "en")
  }
}
