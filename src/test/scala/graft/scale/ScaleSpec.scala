package graft.scale

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.core.VectorOps

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 200).cache()
  private lazy val emb = Tables.embeddings(spark, sfDir).cache()

  /** Exact word-3-gram Jaccard ground truth for pairs above a threshold. */
  private def exactJaccardPairs(threshold: Double): Set[(Long, Long)] = {
    val sh = NearDup.shingles(docs).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    sh.as("a").join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.as("na"), col("a_id") === col("na.doc_id"))
      .join(sizes.as("nb"), col("b_id") === col("nb.doc_id"))
      .withColumn("j", col("inter").cast("double") / (col("na.n") + col("nb.n") - col("inter")))
      .filter(col("j") >= threshold)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
  }

  test("minhash LSH finds the planted near-duplicate pairs, verified exactly") {
    val truth = exactJaccardPairs(0.5)
    assert(truth.nonEmpty, "fixture should contain planted near-dups")
    val got = NearDup.minhashNearDups(docs, 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // exact-verify step removes false positives; banding with 8x4 bands at
    // jaccard>=0.5 should catch every true pair here
    assert(got == truth, s"minhash=$got truth=$truth")
  }

  test("minhash signature estimates jaccard roughly") {
    val sh = NearDup.shingles(docs).cache()
    val sig = NearDup.minhashSignatures(sh)
    assert(sig.count() == docs.count())
    assert(sig.columns.count(_.startsWith("mh")) == NearDup.NumHashes)
  }

  test("shingle DF cap: same pairs at threshold 0.2, pair-gen join bounded") {
    // the cap drops hot shingles from pair GENERATION only — any pair whose
    // jaccard clears a useful threshold shares rarer shingles too, so the
    // surfaced pair set (and every inter/uni count) is unchanged
    val sh = NearDup.shingles(docs).cache()
    val uncapped = NearDup.exactJaccardPairs(sh)
      .filter(col("inter").cast("double") / col("uni") >= 0.2)
      .select("a_id", "b_id", "inter", "uni")
      .as[(Long, Long, Long, Long)].collect().toSet
    val capped = NearDup.exactJaccardPairs(sh, maxShingleDf = 20)
      .filter(col("inter").cast("double") / col("uni") >= 0.2)
      .select("a_id", "b_id", "inter", "uni")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(uncapped.nonEmpty)
    assert(capped == uncapped)
    // and with every shingle capped away there are no pairs at all
    assert(NearDup.exactJaccardPairs(sh, maxShingleDf = 0).isEmpty)
  }

  test("banding hot-bucket cap: capped candidates are a subset, planted pairs survive") {
    val truth = exactJaccardPairs(0.5)
    val all = NearDup.minhashNearDups(docs, 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // near-dup bands are tiny buckets (2 docs); a generous cap drops nothing
    val capped = NearDup.minhashNearDups(docs, 0.5, maxBandDocs = 10)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(capped == all)
    assert(truth.forall(capped.contains))
    // cap of 1 kills every bucket (a candidate needs ≥ 2 docs in a bucket)
    assert(NearDup.minhashNearDups(docs, 0.5, maxBandDocs = 1).isEmpty)
  }

  test("minhash_precision banding (k=64, 32 bands) reaches full recall on the fixture") {
    val truth = exactJaccardPairs(0.5)
    val got = NearDup.minhashNearDups(docs, 0.5, k = 64, bands = 32)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == truth, s"minhash k=64/b=32 = $got, truth = $truth")
  }

  test("simhash near-dups include the near-identical pairs and report hamming") {
    val truth = exactJaccardPairs(0.8) // near-identical docs
    val got = NearDup.simhashNearDups(docs, 12)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    truth.foreach(p => assert(got.contains(p), s"simhash missed near-identical pair $p"))
    val hams = NearDup.simhashNearDups(docs, 12).select("hamming").as[Int].collect()
    assert(hams.forall(h => h >= 0 && h <= 12))
  }

  test("IVF search reaches high recall vs exact top-k with partial probing") {
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val exact = emb
      .withColumn("d", VectorOps.squaredL2(col("embedding"), lit(q)))
      .orderBy(col("d").asc, col("vec_id").asc).limit(13)
      .select("vec_id").as[Long].collect().toSet
    val index = Ivf.build(spark, emb)
    assert(index.centroids.length == 16)
    def recallAt(nprobe: Int): Double = {
      val approx = Ivf.search(index, q, k = 13, nprobe = nprobe)
        .select("vec_id").as[Long].collect().toSet
      exact.intersect(approx).size.toDouble / exact.size
    }
    // the fixture vectors are (near-)random, the worst case for IVF — real
    // embedding distributions cluster. The contract that must hold even
    // here: partial probing beats its uniform-sampling baseline, recall is
    // monotone in nprobe, and probing every cell recovers the exact result.
    val r3 = recallAt(3)
    assert(r3 > 3.0 / 16, s"nprobe=3 recall=$r3 no better than random cell sampling")
    assert(recallAt(8) >= r3)
    assert(recallAt(16) == 1.0)
  }

  test("persisted IVF index reloads, prunes partitions, and searches identically") {
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val index = Ivf.build(spark, emb)
    val dir = tmpDir("ivf").toString + "/index"
    Ivf.write(index, dir)
    val reloaded = Ivf.read(spark, dir)
    assert(reloaded.centroids.map(_.toSeq).toSeq == index.centroids.map(_.toSeq).toSeq)
    val mem = Ivf.search(index, q, k = 13, nprobe = 3)
      .select("vec_id").as[Long].collect().toSeq
    val disk = Ivf.search(reloaded, q, k = 13, nprobe = 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(disk == mem)
    // the cell filter must reach the partitioned scan as partition pruning
    val plan = Ivf.search(reloaded, q, k = 13, nprobe = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan)
  }

  test("IVF incremental append: new vectors are searchable without a refit") {
    // sf0.001 fixture has 500 vectors; hold out 400..449 as late arrivals
    val base = emb.filter(col("vec_id") < 400 || col("vec_id") >= 450)
    val late = emb.filter(col("vec_id") >= 400 && col("vec_id") < 450)
    assert(late.count() > 0)
    val index = Ivf.build(spark, base)
    val grown = Ivf.append(index, late)
    assert(grown.assigned.count() == emb.count())
    // an appended vector must find ITSELF at distance zero (full probe)
    val q = late.limit(1).select("vec_id", "embedding").head()
    val qid = q.getLong(0)
    val top = Ivf.search(grown, q.getSeq[Float](1).toArray, k = 1, nprobe = 16)
      .select("vec_id").as[Long].head()
    assert(top == qid)
    // assignment agrees with the model: every cell id is a valid centroid
    val cells = grown.assigned.select("cell").distinct().as[Int].collect()
    assert(cells.forall(c => c >= 0 && c < grown.centroids.length))
    // balance metric is sane on the fixture's ~uniform vectors
    val imb = Ivf.imbalance(grown)
    assert(imb >= 1.0 && imb < 5.0, s"imbalance $imb")
  }

  test("IVF-cell-blocked cosine near-dup: only true pairs, bounded recall loss at boundaries") {
    import org.apache.spark.sql.functions.sqrt
    val exact = emb.as("a")
      .join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim",
        VectorOps.dot(col("a.embedding"), col("b.embedding")) /
          (sqrt(VectorOps.dot(col("a.embedding"), col("a.embedding"))) *
            sqrt(VectorOps.dot(col("b.embedding"), col("b.embedding")))))
      .filter(col("sim") >= 0.4)
      .select(col("a.vec_id"), col("b.vec_id")).as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should have cosine>=0.4 pairs")
    val index = Ivf.build(spark, emb)
    val got = NearDup.cosineNearDupsByCell(index.assigned, 0.4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // blocking can only DROP pairs (cell boundaries), never invent them
    assert(got.subsetOf(exact))
    // and it must find a solid share of them (boundary loss is bounded)
    assert(got.size >= (exact.size * 0.3).toInt, s"recall too low: ${got.size}/${exact.size}")
    // multi-probe recovers boundary pairs: strictly better-or-equal
    // recall, still no false positives
    val probed = NearDup.cosineNearDupsByCell(index.assigned, 0.4,
      centroids = index.centroids, multiProbe = 2)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(probed.subsetOf(exact))
    assert(probed.size >= got.size, s"multi-probe lost pairs: ${probed.size} < ${got.size}")
    assert(probed.size >= (exact.size * 0.5).toInt,
      s"multi-probe recall too low: ${probed.size}/${exact.size}")
  }

  test("LSH self-join on an empty frame returns an empty result, not a crash") {
    val empty = emb.filter(col("vec_id") < 0)
    val out = LshJoin.selfJoin(empty, threshold = 1.1)
    assert(out.columns.toSeq == Seq("a_id", "b_id", "dist"))
    assert(out.isEmpty)
  }

  test("LSH self-join returns only true sub-threshold pairs (no false positives)") {
    val got = LshJoin.selfJoin(emb, threshold = 1.1).collect()
    assert(got.nonEmpty, "fixture has pairs closer than L2=1.1")
    // distances reported by the join must match exact L2
    got.foreach { r =>
      assert(r.getAs[Double]("dist") < 1.1)
    }
    // and be a subset of the exact all-pairs result
    val exact = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("d", sqrt(VectorOps.squaredL2(col("a.embedding"), col("b.embedding"))))
      .filter(col("d") < 1.1)
      .select(col("a.vec_id"), col("b.vec_id")).as[(Long, Long)].collect().toSet
    val gotPairs = got.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(gotPairs.subsetOf(exact))
    assert(gotPairs.size >= (exact.size * 0.5).toInt, s"recall too low: ${gotPairs.size}/${exact.size}")
  }

  test("IVF-blocked knn join: beats random sampling, monotone in nprobe, exact at full probe") {
    val index = Ivf.build(spark, emb)
    val queries = emb.filter(col("vec_id") < 30)
    def joined(nprobe: Int): Map[Long, Set[Long]] =
      Ivf.knnJoin(index, queries, k = 5, nprobe = nprobe)
        .select("q_id", "n_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2).toSet }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("d").asc, col("vec_id").asc)
    val exact = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .crossJoin(emb)
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("d", VectorOps.squaredL2(col("embedding"), col("q_emb")))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") <= 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2).toSet }
    def recall(got: Map[Long, Set[Long]]): Double = {
      val rs = exact.map { case (q, want) =>
        got.getOrElse(q, Set.empty).intersect(want).size.toDouble / want.size
      }
      rs.sum / rs.size
    }
    // same contract as the single-query IVF recall test: the fixture's
    // (near-)random vectors are IVF's worst case, so pin structure — the
    // candidate join beats uniform cell sampling, recall grows with the
    // probe set, and probing every cell recovers the exact join
    val r2 = recall(joined(2))
    assert(r2 > 2.0 / 16, s"nprobe=2 recall=$r2 no better than random cell sampling")
    assert(recall(joined(8)) >= r2)
    assert(joined(16) == exact, "full probe must equal the exact join")
  }

  test("incremental_dedup cross-set banding loses no qualifying pair") {
    val banded = graft.queries.DedupQueries.incrementalDedup(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    val exact = graft.queries.DedupQueries.incrementalDedupExact(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(exact.nonEmpty, "fixture should contain new-vs-corpus near-dup pairs")
    assert(banded == exact, s"banded=$banded exact=$exact")
  }

  test("containment_screen shared-hash blocking equals the exhaustive cross-product screen") {
    // the declared form blocks candidate pairs on shared bottom-k sketch
    // hashes; any pair the screen can emit has inter >= 1, i.e. shares a
    // sketch hash, so blocked == exhaustive EXACTLY (not just at fixture
    // scale — but pin it where the exhaustive form is affordable)
    val blocked = graft.queries.DedupQueries.containmentScreen(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val exhaustive = graft.queries.DedupQueries.containmentScreenExhaustive(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(exhaustive.nonEmpty, "fixture should contain containment pairs")
    assert(blocked == exhaustive, s"blocked=$blocked exhaustive=$exhaustive")
  }

  test("semantic_decontam headline is sound vs the exact screen; exact at full probe") {
    // the nprobe=4 headline may MISS contaminated test vectors (probe
    // coverage), but every hit it emits must be a genuinely contaminated
    // test id with a distance no better than the true nearest-train hit;
    // the all-cells parameterization must equal the exact screen
    val exact = graft.queries.ScaleQueries.semanticDecontamPrecision(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    val headline = graft.queries.ScaleQueries.semanticDecontamQ(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(exact.nonEmpty, "fixture should contain contaminated test vectors")
    val exactBest = exact.map(r => r._1 -> r._3).toMap
    headline.foreach { case (testId, _, d) =>
      assert(exactBest.contains(testId), s"false positive test_id=$testId")
      assert(d >= exactBest(testId), s"headline beat the exact nearest for $testId")
    }
    assert(headline.size * 2 >= exact.size,
      s"nprobe=4 recall collapsed: ${headline.size}/${exact.size}")
  }

  test("split_contamination banded prefilter loses no qualifying pair (superset at fixture scale)") {
    // the declared query narrows the exact shingle equi-join to MinHash
    // banded candidates (1-row bands, k=64); the banding must be a
    // superset of the answer or the oracle row would silently shrink
    val banded = graft.queries.PipelineQueries.splitContamination(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    val exact = graft.queries.PipelineQueries.splitContaminationExact(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(exact.nonEmpty, "fixture should contain cross-split contaminated pairs")
    assert(banded == exact, s"banded=$banded exact=$exact")
  }

  test("leakage_split: cluster protocol never straddles, naive does; md5 replay") {
    val out = graft.queries.DedupQueries.leakageSplit(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val (cl, nv) = out.partition(_._1 == "cluster")
    assert(cl.nonEmpty && nv.nonEmpty)
    // the whole point: cluster-keyed assignment cannot straddle
    assert(cl.forall(_._5 == 0L), s"cluster straddles: ${cl.toSeq}")
    // naive assignment leaks (every component has >= 2 members here)
    assert(nv.map(_._5).sum > 0L, s"naive straddles: ${nv.toSeq}")
    // both protocols assign every node exactly once
    assert(cl.map(_._3).sum == nv.map(_._3).sum)
    // exact md5 replay of the naive assignment for every node
    val md = java.security.MessageDigest.getInstance("MD5")
    def splitOf(key: Long): String = {
      val hex = md.digest(s"split:$key".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val v = "0123456789abcdef".indexOf(hex.last)
      if (v < 12) "train" else if (v < 14) "val" else "test"
    }
    val nodes = graft.Tables.documents(spark, sfDir)
      .filter($"doc_id" < 200).select($"doc_id").as[Long].collect()
    val expected = (nodes ++ nodes.map(_ + 100000L)).groupBy(splitOf).view
      .mapValues(_.length.toLong).toMap
    assert(nv.map(r => r._2 -> r._3).toMap == expected)
  }

  test("priority_sample: exact JVM replay; weight bias toward long docs") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): Long = {
      val hex = md.digest(s"wsamp:$id".getBytes("UTF-8")).map(b => f"$b%02x").mkString
      hex.take(13).foldLeft(0L)((acc, c) => acc * 16 + "0123456789abcdef".indexOf(c))
    }
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"n_chars".cast("long")).as[(Long, Long)].collect()
    val expect = docs.map { case (id, w) => (id, w, h(id)) }
      .sortBy(r => (r._3.toDouble / r._2, r._1)).take(20).toSeq
    val got = graft.queries.PipelineQueries.prioritySample(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
    // weighted inclusion: the sample leans long (pinned fixture fact —
    // 371 vs 306 corpus mean at sf0.001)
    val sampleMean = got.map(_._2).sum.toDouble / got.size
    val corpusMean = docs.map(_._2).sum.toDouble / docs.length
    assert(sampleMean > corpusMean, s"$sampleMean <= $corpusMean")
  }

  test("mrl_recall: p=64 sanity row exact, recall monotone, planted MRL vectors") {
    val out = graft.queries.ScaleQueries.mrlRecall(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // sanity: full-dim vs full-dim is a perfect retrieval
    assert(out.filter(_._1 == 64).forall(_._3 == 10000L))
    // mean recall is non-decreasing in the prefix width
    val means = Seq(8, 16, 32, 64).map(p =>
      out.filter(_._1 == p).map(_._3).sum.toDouble / out.count(_._1 == p))
    assert(means == means.sorted, means.toString)

    // planted Matryoshka property: information front-loaded into the
    // first 8 dims (rest constant) -> prefix-8 retrieval is already exact
    import spark.implicits._
    val planted = (0 until 60).map { i =>
      (i.toLong, "x", Array.tabulate(64)(d =>
        if (d < 8) ((i * (d + 3)) % 17).toFloat else 0.5f))
    }.toDF("vec_id", "label", "embedding")
    val orig = graft.Tables.embeddings(spark, sfDir)
    // run the same query body against the planted frame via a temp swap:
    // mrlRecall reads Tables.embeddings, so replay its logic inline here
    val xe4 = transform($"embedding", x => round(x.cast("double") * 10000).cast("long"))
    val base = planted.select($"vec_id", xe4.as("xe4"))
    val qv = base.filter($"vec_id" < 30).select($"vec_id".as("q_id"), $"xe4".as("q_xe4"))
    val pairs = qv.crossJoin(base.select($"vec_id".as("n_id"), $"xe4".as("n_xe4")))
      .filter($"n_id" =!= $"q_id")
    def top(p: Int) = {
      val dist = aggregate(zip_with(slice($"q_xe4", 1, p), slice($"n_xe4", 1, p),
        (a, b) => (a - b) * (a - b)), lit(0L), (acc, v) => acc + v)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"q_id").orderBy($"d".asc, $"n_id".asc)
      pairs.select($"q_id", $"n_id", dist.as("d"))
        .withColumn("rank", org.apache.spark.sql.functions.row_number().over(w))
        .filter($"rank" <= 10).select($"q_id", $"n_id")
        .as[(Long, Long)].collect().toSet
    }
    assert(top(8) == top(64), "front-loaded vectors: prefix-8 == full-dim top-10")
    assert(orig.count() > 0)
  }
}
