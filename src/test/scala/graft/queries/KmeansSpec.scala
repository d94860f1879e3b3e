package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Semantic pin for the integer-exact k-means: a full local Lloyd's
  * replay under the same integer rules (e6 quantization, (dist, cluster)
  * tie-break, floor-mean update, empty clusters drop) must reproduce the
  * declared per-cluster roll-up exactly. */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  test("rocchio_prf equals a local two-stage integer replay") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
      .map { case (id, q) => (id, q.toArray) }
    val qs = vecs.filter(_._1 < 4)
    val corpus = vecs.filter(_._1 >= 4)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expect = qs.flatMap { case (qId, qv) =>
      val top10 = corpus.map(c => (d2(c._2, qv), c._1, c._2))
        .sortBy(t => (t._1, t._2)).take(10)
      val cent = Array.tabulate(qv.length) { dim =>
        Math.floorDiv(top10.map(_._3(dim)).sum, top10.length.toLong)
      }
      val qx = qv.zip(cent).map { case (x, y) => x + y }
      corpus.map(c => (d2(c._2, qx), c._1))
        .sortBy(identity).take(5).zipWithIndex
        .map { case ((d, id), i) => (qId, (i + 1).toLong, id, d) }
    }
    val got = VectorQueries.rocchioPrf(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expect.toSeq)
    // feedback must actually move the query: stage-2 lists differ from
    // plain top-5 for at least one query on the fixture
    val plain = qs.flatMap { case (qId, qv) =>
      corpus.map(c => (d2(c._2, qv), c._1)).sortBy(identity).take(5)
        .map(t => (qId, t._2))
    }.toSet
    assert(got.map(t => (t._1, t._3)).toSet != plain,
      "expanded-query retrieval must differ from the unexpanded one")
  }

  test("kmeans_clusters equals a local integer Lloyd's replay") {
    val k = 8
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
      .map { case (id, q) => (id, q.toArray) }

    var cents: Seq[(Long, Array[Long])] =
      vecs.filter(_._1 < k).map { case (id, q) => (id, q.clone) }.toSeq
    var assign = Map.empty[Long, Long]
    for (_ <- 1 to 3) {
      assign = vecs.map { case (id, q) =>
        val best = cents.map { case (cl, c) =>
          var d = 0L; var i = 0
          while (i < q.length) { val t = q(i) - c(i); d += t * t; i += 1 }
          (d, cl)
        }.min
        id -> best._2
      }.toMap
      cents = assign.groupBy(_._2).toSeq.sortBy(_._1).map { case (cl, members) =>
        val qs = members.keys.toArray.map(id => vecs(id.toInt)._2)
        val c = Array.tabulate(64)(d =>
          Math.floorDiv(qs.map(_(d)).sum, qs.length.toLong))
        (cl, c)
      }
    }
    val expect = assign.groupBy(_._2).toSeq.sortBy(_._1).map { case (cl, ms) =>
      val ids = ms.keys.toSeq
      val c = cents.find(_._1 == cl).get._2
      (cl, ids.size.toLong, ids.min, ids.sum, c(0), c.map(math.abs).sum)
    }
    val got = VectorQueries.kmeansClusters(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expect)
    assert(got.map(_._2).sum == vecs.length, "every vector assigned exactly once")
  }
}
