package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilarityOpsSpec extends SparkSpec {

  test("chunkRetrieval ranks the letter-identical chunk first, exactly") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma"),        // query doc, one chunk
      (10L, "beta gamma alpha"),       // anagram text -> identical profile, sim 1
      (11L, "alpha beta delta"),       // close profile
      (12L, "zzz zzz zzz"),            // distant profile
    ).toDF("doc_id", "text")
    val r = SimilarityOps.chunkRetrieval(docs, k = 3, maxQdoc = 1L)
      .orderBy("rn").collect()
    assert(r.length == 3)
    assert(r(0).getAs[Long]("ndoc") == 10L)
    assert(r(0).getAs[Double]("sim") == 1.0)
    assert(r(1).getAs[Long]("ndoc") == 11L)
    assert(r.last.getAs[Long]("ndoc") == 12L)
    assert(r.map(_.getAs[Double]("sim")).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("chunk vectors run through the LSH scale path with high recall") {
    // substantiates SCALE.md: when query sets outgrow a broadcast, the
    // p07 hyperplane bucketing applies to chunk vectors unchanged —
    // cast the integer profiles to float and reuse annTopK as-is
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo", "fox")
    val docs = (0L until 120L).map(i =>
      (i, Seq.fill(10)(words(rnd.nextInt(words.size))).mkString(" ")))
      .toDF("doc_id", "text")
    val vecs = TextOps.chunkTexts(docs)
      .select((col("doc_id")).as("vec_id"), // one chunk per 10-token doc
        TextOps.letterVector(col("text")).cast("array<float>").as("embedding"))
    val q = vecs.filter(col("vec_id") < 5)
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "nid").as[(Long, Long)].collect().toSet
    val exact = hits(SimilarityOps.bruteForceTopK(vecs, q, 10))
    val ann = hits(SimilarityOps.annTopK(vecs, q, 10, 64))
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall") // letter profiles are dense
  }

  test("chunkRetrieval excludes self and zero-letter chunks") {
    import spark.implicits._
    val docs = Seq(
      (0L, "abc def"),
      (1L, "123 456"), // no letters -> excluded from corpus side
      (2L, "abc xyz"),
    ).toDF("doc_id", "text")
    val r = SimilarityOps.chunkRetrieval(docs, k = 10, maxQdoc = 1L).collect()
    val neighbors = r.map(_.getAs[Long]("ndoc")).toSet
    assert(neighbors == Set(2L), neighbors) // not itself, not the digit doc
  }
  import spark.implicits._

  private def vecs(n: Int, dims: Int) = {
    val rnd = new scala.util.Random(7)
    (0L until n.toLong).map(i => (i, Array.fill(dims)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f), Array(0.0f, 2.0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      SimilarityOps.cosine($"a", $"b"),
      SimilarityOps.cosine($"a", $"c")).as[(Double, Double)].collect().head
    assert(math.abs(r._1 - 1.0) < 1e-12 && math.abs(r._2) < 1e-12)
  }

  test("bruteForceTopK returns k ordered neighbors per query") {
    val corpus = vecs(100, 16)
    val r = SimilarityOps.bruteForceTopK(corpus, corpus.filter($"vec_id" < 3), 5)
      .groupBy("qid").agg(count(lit(1)).as("n"), max("rn").as("maxrn"))
      .as[(Long, Long, Int)].collect()
    assert(r.length == 3 && r.forall(x => x._2 == 5 && x._3 == 5))
  }

  test("annTopK always finds an exact duplicate of the query (same bucket)") {
    val corpus = vecs(200, 16)
    // query 0's embedding duplicated as corpus id 999
    val dup = corpus.filter($"vec_id" === 0)
      .select(lit(999L).as("vec_id"), $"embedding")
    val r = SimilarityOps.annTopK(corpus.union(dup), corpus.filter($"vec_id" === 0), 3, 16)
      .filter($"qid" === 0 && $"rn" === 1)
      .select("nid").as[Long].collect()
    assert(r.toSeq == Seq(999L))
  }

  test("a zero vector never enters cosine top-k (its NaN sim would rank FIRST)") {
    // 0/0 = NaN, and Spark ranks NaN above every real similarity — an
    // unguarded zero row sat at rn = 1 of EVERY query
    val corpus = vecs(50, 16)
    val zero = Seq((999L, Array.fill(16)(0.0f))).toDF("vec_id", "embedding")
    val all = corpus.union(zero)
    val bf = SimilarityOps.bruteForceTopK(all, all.filter($"vec_id" < 3), 5)
      .select("nid").as[Long].collect()
    assert(!bf.contains(999L), "zero vector leaked into bruteForceTopK")
    val ann = SimilarityOps.annTopK(all, all.filter($"vec_id" < 3), 5, 16)
      .select("nid").as[Long].collect()
    assert(!ann.contains(999L), "zero vector leaked into annTopK")
    // and a zero QUERY returns no rows rather than NaN garbage
    assert(SimilarityOps.bruteForceTopK(corpus, zero, 5).count() == 0L)
    // p05's pair face: NaN >= tau is TRUE in Spark's ordering — the
    // zero row must not fabricate near-dup pairs
    val pairs = graft.ops.DedupOps.embeddingNearDupPairs(all, 0.9)
      .select("va", "vb").as[(Long, Long)].collect()
    assert(!pairs.exists(p => p._1 == 999L || p._2 == 999L))
  }

  test("ivfTopK: probing a few cells recovers most brute-force neighbors") {
    val corpus = vecs(400, 16)
    val q = corpus.filter($"vec_id" < 5)
    val brute = SimilarityOps.bruteForceTopK(corpus, q, 10)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val ivf = SimilarityOps.ivfTopK(corpus, q, 10, nlist = 8, nprobe = 4)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall@10 too low: $recall")
    // probing ALL cells is exact: must equal brute force
    val full = SimilarityOps.ivfTopK(corpus, q, 10, nlist = 8, nprobe = 8)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    assert(full == brute)
  }

  test("a saved IVF index round-trips through parquet and probes identically") {
    val corpus = vecs(300, 16)
    val q = corpus.filter($"vec_id" < 4)
    val (km, assigned) = SimilarityOps.ivfIndex(corpus, nlist = 8)
    val fresh = SimilarityOps.ivfTopKWith(km, assigned, q, 10, nprobe = 4)
      .select($"qid", $"nid", $"rn").as[(Long, Long, Int)].collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-idx-").toString
    SimilarityOps.saveIvfIndex(km, assigned, dir)
    val (centers, loadedAssigned) = SimilarityOps.loadIvfIndex(spark, dir)
    assert(centers.count() == 8 && loadedAssigned.count() == corpus.count())
    val loaded = SimilarityOps.ivfTopKFrom(centers, loadedAssigned, q, 10, nprobe = 4)
      .select($"qid", $"nid", $"rn").as[(Long, Long, Int)].collect().toSet
    assert(loaded == fresh, s"loaded-index probe diverged: ${loaded.diff(fresh)}")
    // the same persisted artifact feeds semantic dedup directly: the
    // assigned table IS semanticDedup's input (build the index once per
    // corpus snapshot, then both ANN probes and the dedup pass reuse it)
    val fromFresh = DedupOps.semanticDedup(assigned, tau = 0.9)
      .select($"vec_id", $"keep_id").as[(Long, Long)].collect().toSet
    val fromLoaded = DedupOps.semanticDedup(loadedAssigned, tau = 0.9)
      .select($"vec_id", $"keep_id").as[(Long, Long)].collect().toSet
    assert(fromLoaded == fromFresh,
      s"loaded-index dedup diverged: ${fromLoaded.diff(fromFresh)}")
  }

  test("annRecallReport: full probe reads 1e6 ppm; algebra and determinism hold (p102)") {
    val corpus = vecs(400, 16)
    val q = corpus.filter($"vec_id" < 5)
    val (km, assigned) = SimilarityOps.ivfIndex(corpus, nlist = 8)
    // probing every cell is exact (the full == brute lemma above), so
    // the report must read recall@10 = 1e6 ppm for every query
    val full = SimilarityOps.annRecallReport(corpus, km, assigned, q, 10, nprobe = 8)
      .collect()
    assert(full.length == 5)
    assert(full.forall(r => r.getLong(3) == 1000000L && r.getLong(2) == r.getLong(1)))
    // few probes: counts bounded, the ppm column is exactly the
    // integer division of its own count columns
    val few = SimilarityOps.annRecallReport(corpus, km, assigned, q, 10, nprobe = 4)
      .collect()
    assert(few.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    few.foreach { r =>
      val (nEx, nHit, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nHit <= nEx && nEx <= 10)
      assert(ppm == nHit * 1000000L / nEx)
    }
    val again = SimilarityOps.annRecallReport(corpus, km, assigned, q, 10, nprobe = 4)
      .collect()
    assert(again.map(_.toSeq).toSeq == few.map(_.toSeq).toSeq)
  }

  test("mmrRerank: pure-relevance λ reproduces the IVF top-m; λ=0 picks the least-redundant; deterministic (p103)") {
    val corpus = vecs(300, 16)
    val q = corpus.filter($"vec_id" < 3)
    val (km, assigned) = SimilarityOps.ivfIndex(corpus, nlist = 8)
    val centers = SimilarityOps.centersOf(km, spark)
    // λ = 1e6: the redundancy term has weight 0, so the greedy must
    // pick exactly the top-3 candidates by (rel desc, nid) — the IVF
    // probe's own order
    val pureRel = SimilarityOps.mmrRerank(centers, assigned, q,
      k0 = 8, m = 3, nprobe = 4, lambdaPpm = 1000000L)
      .select($"qid", $"rank", $"nid").as[(Long, Int, Long)].collect()
    val top3 = SimilarityOps.ivfTopKFrom(centers, assigned, q, 8, 4)
      .filter($"rn" <= 3).select($"qid", $"rn", $"nid")
      .as[(Long, Int, Long)].collect()
    assert(pureRel.sorted.toSeq == top3.sorted.toSeq)
    // λ = 0: rank 2 must be the candidate whose similarity to rank 1
    // is MINIMAL (the pure-diversity pick), re-derived independently
    val zero = SimilarityOps.mmrRerank(centers, assigned, q,
      k0 = 8, m = 2, nprobe = 4, lambdaPpm = 0L)
      .select($"qid", $"rank", $"nid").as[(Long, Int, Long)].collect()
    val cand = SimilarityOps.ivfTopKFrom(centers, assigned, q, 8, 4)
      .select($"qid", $"nid").as[(Long, Long)].collect().groupBy(_._1)
    val nv = assigned.select($"vec_id", $"nvec").as[(Long, Array[Double])]
      .collect().toMap
    def cos(a: Long, b: Long): Long =
      math.floor(nv(a).zip(nv(b)).map { case (x, y) => x * y }.sum * 1e6).toLong
    zero.groupBy(_._1).foreach { case (qid, rows) =>
      val r1 = rows.find(_._2 == 1).get._3
      val r2 = rows.find(_._2 == 2).get._3
      val others = cand(qid).map(_._2).filter(_ != r1)
      val minSim = others.map(n => (cos(n, r1), n)).min
      assert((cos(r2, r1), r2) == minSim, s"qid $qid: rank2 $r2 not the least-redundant")
    }
    // determinism across invocations
    val again = SimilarityOps.mmrRerank(centers, assigned, q,
      k0 = 8, m = 3, nprobe = 4, lambdaPpm = 700000L).collect()
    val once = SimilarityOps.mmrRerank(centers, assigned, q,
      k0 = 8, m = 3, nprobe = 4, lambdaPpm = 700000L).collect()
    assert(again.map(_.toSeq).toSeq == once.map(_.toSeq).toSeq)
  }

  test("ivfTopK finds an exact duplicate (same cell, sim 1)") {
    val corpus = vecs(200, 16)
    val dup = corpus.filter($"vec_id" === 0)
      .select(lit(999L).as("vec_id"), $"embedding")
    val r = SimilarityOps.ivfTopK(corpus.union(dup), corpus.filter($"vec_id" === 0),
      3, nlist = 8, nprobe = 2)
      .filter($"qid" === 0 && $"rn" === 1).select("nid").as[Long].collect()
    assert(r.toSeq == Seq(999L))
  }

  test("ivfTopK at nlist=1024: centroids broadcast, no plan-size blowup") {
    val corpus = vecs(2048, 8)
    val q = corpus.filter($"vec_id" < 2)
    val (km, assigned) = SimilarityOps.ivfIndex(corpus, nlist = 1024)
    val ivf = SimilarityOps.ivfTopKWith(km, assigned, q, 5, nprobe = 64)
    // centroids must ride a broadcast exchange, not the plan text:
    // 1024 cells × 8 dims as literals would be ~8k lit() nodes
    val planStr = ivf.queryExecution.analyzed.toString
    assert(planStr.length < 100000, s"plan text ${planStr.length} chars — centroids inlined?")
    assert(ivf.queryExecution.executedPlan.toString.contains("Broadcast"),
      "expected centroid broadcast join in the physical plan")
    val rows = ivf.select($"qid", $"nid").as[(Long, Long)].collect()
    assert(rows.nonEmpty && rows.map(_._1).toSet == Set(0L, 1L))
  }

  test("annTopK never reports a sim better than brute-force rank-1") {
    val corpus = vecs(200, 16)
    val q = corpus.filter($"vec_id" < 3)
    val brute = SimilarityOps.bruteForceTopK(corpus, q, 1)
      .select($"qid", $"sim").as[(Long, Double)].collect().toMap
    val ann = SimilarityOps.annTopK(corpus, q, 1, 16)
      .select($"qid", $"sim").as[(Long, Double)].collect()
    assert(ann.forall { case (qid, s) => s <= brute(qid) + 1e-12 })
  }

  // ---- hard-negative mining (p57) ----

  private def labeledVecs(n: Int, dims: Int) = {
    val rnd = new scala.util.Random(17)
    (0L until n.toLong).map { i =>
      (i, Array.fill(dims)(rnd.nextFloat() * 2 - 1), (i % 4).toInt)
    }.toDF("vec_id", "embedding", "label")
  }

  test("hard negatives never share the query's label and never self-match") {
    val corpus = labeledVecs(300, 16)
    val (km, assigned) = SimilarityOps.ivfIndex(corpus, nlist = 8)
    // the persisted index artifact carries (vec_id, nvec, cell); labels
    // join on from the corpus table, as in p57
    val labeled = assigned.select("vec_id", "nvec", "cell")
      .join(corpus.select("vec_id", "label"), "vec_id")
    val r = SimilarityOps.hardNegativesFrom(
      SimilarityOps.centersOf(km, spark), labeled,
      corpus.filter($"vec_id" < 6), k = 10, nprobe = 3)
      .select($"qid", $"q_label", $"nid", $"n_label").collect()
    assert(r.nonEmpty)
    assert(r.forall(row => row.getLong(0) != row.getLong(2)))
    assert(r.forall(row => row.getInt(1) != row.getInt(3)))
  }

  test("label propagation recovers planted cluster labels from a 20% seed") {
    // 4 well-separated direction clusters: label = cluster -> kNN vote
    // from the seed fifth must recover nearly every held-out label
    val rnd = new scala.util.Random(31)
    val base = Array.tabulate(4, 16)((c, d) => if (d % 4 == c) 5f else 0f)
    val corpus = (0L until 200L).map { i =>
      val c = (i % 4).toInt
      val v = base(c).map(x => x + rnd.nextFloat() * 0.5f)
      (i, v, c)
    }.toDF("vec_id", "embedding", "label")
    val (km, assigned) = SimilarityOps.ivfIndex(corpus, nlist = 8)
    val labeled = assigned.select("vec_id", "nvec", "cell")
      .join(corpus.select("vec_id", "label"), "vec_id")
    val seed = labeled.filter($"vec_id" % 5 === 0)
    val queries = corpus.filter($"vec_id" % 5 =!= 0)
    val r = SimilarityOps.labelPropagationFrom(
      SimilarityOps.centersOf(km, spark), seed, queries, k = 8, nprobe = 4)
      .collect()
    assert(r.length == queries.count())
    val acc = r.count(_.getAs[Boolean]("agree")).toDouble / r.length
    assert(acc >= 0.95, s"propagation accuracy $acc")
    // votes never exceed k and the winner's count is at least 1
    assert(r.forall(x => x.getAs[Long]("votes") >= 1 && x.getAs[Long]("votes") <= 8))
  }

  // ---- data-adaptive index sizing (VERDICT r5 #1/#6) ----

  test("adaptiveNlist keeps cells near the target size as the corpus grows") {
    // the regression guard for the r5 scale-killer: pinning nlist makes
    // per-query candidates ∝ corpus; adaptive sizing must keep
    // rows-per-cell inside a constant band at every size past the floor
    for (n <- Seq(2000L, 20000L, 200000L, 2000000L)) {
      val nlist = SimilarityOps.adaptiveNlist(n)
      val perCell = n.toDouble / nlist
      assert(perCell <= 125.0 && perCell >= 62.0,
        s"n=$n nlist=$nlist rows/cell=$perCell outside [62,125]")
    }
    // below the floor the floor wins (16 cells, test-SF behavior)
    assert(SimilarityOps.adaptiveNlist(500) == 16)
    assert(SimilarityOps.adaptiveNlist(2000) == 16)
    // LSH planes: bucket population likewise bounded as the corpus grows
    for (n <- Seq(2000L, 20000L, 200000L)) {
      val planes = SimilarityOps.adaptivePlanes(n)
      val perBucket = n.toDouble / (1L << planes)
      assert(perBucket <= 50.0, s"n=$n planes=$planes rows/bucket=$perBucket")
    }
    assert(SimilarityOps.adaptivePlanes(500) == 6) // floor at the test SFs
  }

  test("a 10x corpus trains ~10x the cells and rows-per-cell stays banded") {
    // build the REAL index at two corpus sizes (the end-to-end face of
    // the guard above): cell count must scale with the data, and actual
    // assigned rows-per-cell must stay within a constant band
    for (n <- Seq(2000, 20000)) {
      val corpus = vecs(n, 8)
      val nlist = SimilarityOps.adaptiveNlist(n.toLong)
      val (km, assigned) = SimilarityOps.ivfIndex(corpus, nlist)
      assert(km.clusterCenters.length == nlist)
      val perCell = assigned.count().toDouble / nlist
      assert(perCell <= 130.0,
        s"n=$n nlist=$nlist assigned rows/cell $perCell — candidates grow with corpus")
    }
  }

  test("at full probe, hard negatives equal brute force filtered by label") {
    val corpus = labeledVecs(200, 8)
    val (km, assigned) = SimilarityOps.ivfIndex(corpus, nlist = 4)
    val labeled = assigned.select("vec_id", "nvec", "cell")
      .join(corpus.select("vec_id", "label"), "vec_id")
    val q = corpus.filter($"vec_id" < 4)
    val mined = SimilarityOps.hardNegativesFrom(
      SimilarityOps.centersOf(km, spark), labeled, q, k = 5, nprobe = 4)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    // brute force over all pairs, keep only different-label, window top-5
    val lbl = corpus.select($"vec_id".as("nid"), $"label".as("nl"))
    val brute = SimilarityOps.bruteForceTopK(corpus, q, 200)
      .join(lbl, "nid")
      .join(corpus.select($"vec_id".as("qid"), $"label".as("ql")), "qid")
      .filter($"nl" =!= $"ql")
      .withColumn("rn2", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"qid")
          .orderBy($"sim".desc, $"nid")))
      .filter($"rn2" <= 5)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    assert(mined == brute)
  }

  // ---- margin-based aligned-pair mining (p99) ----

  test("margin mining: isolated aligned pair out-margins an equally-close hub") {
    val rnd = new scala.util.Random(23)
    val dims = 8
    def noise() = Array.fill(dims)(rnd.nextFloat() * 2 - 1)
    // planted aligned pair: 100 (side 0) / 101 (side 1), both pointing
    // up a direction the random cloud barely uses
    val aligned = Array(0f, 0f, 0f, 0f, 0f, 0f, 5f, 5f)
    def jitter(v: Array[Float]) = v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f)
    // planted hub: 200 (side 0) inside a tight cluster of side-1 vectors
    // 201..205 — best cosine just as high, but the whole neighborhood is
    val hub = Array(5f, 5f, 0f, 0f, 0f, 0f, 0f, 0f)
    val rows =
      (0L until 80L).map(i => (i, noise(), (i % 4).toInt)) ++
        Seq((100L, jitter(aligned), 0), (101L, jitter(aligned), 1)) ++
        Seq((200L, jitter(hub), 0)) ++
        (201L to 205L).map(i => (i, jitter(hub), 1))
    val corpus = rows.toDF("vec_id", "embedding", "label")
    val (km, assigned) = SimilarityOps.ivfIndex(corpus, nlist = 4)
    val labeled = assigned.select("vec_id", "nvec", "cell")
      .join(corpus.select("vec_id", "label"), "vec_id")
    val mined = SimilarityOps.marginMiningFrom(
      SimilarityOps.centersOf(km, spark), labeled, corpus,
      k = 4, nprobe = 4, minMarginPpm = 0L)
      .select($"qid", $"nid", $"margin_ppm")
      .as[(Long, Long, Long)].collect()
    val byQ = mined.map(r => r._1 -> r).toMap
    // the planted pair is each other's best match
    assert(byQ(100L)._2 == 101L, byQ.get(100L))
    // relative scoring is the method's point: the isolated pair clears
    // the hub even though both best cosines are ~1
    assert(byQ(100L)._3 > byQ(200L)._3, (byQ(100L), byQ(200L)))
    // every mined pair crosses sides
    val lbl = corpus.select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    assert(mined.forall { case (q, n, _) => lbl(q) % 2 != lbl(n) % 2 })
  }

  test("margin mining: a one-sided corpus mines nothing (no cross-side pairs)") {
    val rnd = new scala.util.Random(31)
    val corpus = (0L until 40L)
      .map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1), (i % 2 * 2).toInt))
      .toDF("vec_id", "embedding", "label") // labels 0/2: every side even
    val (km, assigned) = SimilarityOps.ivfIndex(corpus, nlist = 4)
    val labeled = assigned.select("vec_id", "nvec", "cell")
      .join(corpus.select("vec_id", "label"), "vec_id")
    val mined = SimilarityOps.marginMiningFrom(
      SimilarityOps.centersOf(km, spark), labeled, corpus,
      k = 4, nprobe = 4, minMarginPpm = 0L).collect()
    assert(mined.isEmpty)
  }
}
