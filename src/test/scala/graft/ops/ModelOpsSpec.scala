package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ModelOpsSpec extends SparkSpec {
  import spark.implicits._

  // high-quality shape: long, stopword-rich, normal word length (clears
  // the p09 gate); low-quality shape: short, no stopwords
  private val good = ("the quality of the data is good and it was clear " +
    "that the model for the corpus is sound and it is ready ") * 3
  private val bad = "zzzz qqqq xxxx"

  private def corpus = (0L until 40L).map { i =>
    if (i % 2 == 0) (i, good + s" extra$i") else (i, bad + s" noise$i")
  }.toDF("doc_id", "text")

  test("weak labels split the corpus and the learned model reproduces them") {
    val out = ModelOps.nbQualityScores(corpus).cache()
    val labels = out.select("label").as[Boolean].collect()
    assert(labels.count(identity) == 20 && labels.count(!_) == 20,
      "seed gate must split this corpus evenly")
    // distillation fidelity: hashed-ngram NB separates two disjoint
    // vocabularies perfectly
    val agree = out.filter(col("agree")).count()
    assert(agree == 40L, s"only $agree/40 agree")
    // both predicted classes occur (score crosses 0)
    val preds = out.select("pred").as[Boolean].collect().toSet
    assert(preds == Set(true, false))
    out.unpersist()
  }

  test("scores are a pure function of the data: partitioning-invariant") {
    def rows(parts: Int) =
      ModelOps.nbQualityScores(corpus.repartition(parts))
        .select("doc_id", "score").as[(Long, Long)].collect().toSortedMap
    assert(rows(1) == rows(13))
  }

  test("model join broadcasts; corpus is never shuffled to score") {
    val plan = ModelOps.nbQualityScores(corpus)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  // ---- bigramPerplexity (p55) ----

  private def langCorpus = (0L until 30L).map { i =>
    // two langs; even ids fluent (low perplexity under the seed LM),
    // ids 7 and 9 word-salad (unseen bigrams -> high perplexity)
    val text = if (i == 7L || i == 9L) "qq ww ee rr tt yy uu ii oo pp"
    else good + s" extra${i % 3}"
    (i, text, if (i % 2 == 0) "en" else "de")
  }.toDF("doc_id", "text", "lang")

  test("perplexity terciles are per-language, balanced, and rank salad last") {
    val out = ModelOps.bigramPerplexity(langCorpus).cache()
    assert(out.count() == 30)
    // ntile invariant: within each lang the tercile sizes differ by <= 1
    val sizes = out.groupBy("lang", "tercile").count()
      .collect().map(r => (r.getString(0), r.getLong(2)))
    sizes.groupBy(_._1).foreach { case (_, s) =>
      val counts = s.map(_._2)
      assert(counts.max - counts.min <= 1, s.toSeq)
    }
    // the word-salad docs cost the most bits per token in their language
    val salad = out.filter(col("doc_id").isin(7L, 9L)).collect()
    assert(salad.forall(_.getAs[Int]("tercile") == 3), salad.toSeq)
    assert(salad.forall(!_.getAs[Boolean]("keep")))
    out.unpersist()
  }

  test("perplexity handles empty documents and is partitioning-invariant") {
    val withEmpty = langCorpus.union(Seq((100L, "", "en")).toDF())
    val out = ModelOps.bigramPerplexity(withEmpty)
    val empty = out.filter(col("doc_id") === 100L).collect().head
    // split('') yields one empty token in BOTH engines (the p44/p47
    // tokenizer contract) -> exactly one <s>-context bigram, scored like
    // any unseen gram; what matters is the engines agree, not that the
    // count reads zero
    assert(empty.getAs[Long]("n_big") == 1L)
    assert(empty.getAs[Long]("bpt_milli") > 0L)
    def rows(parts: Int) =
      ModelOps.bigramPerplexity(withEmpty.repartition(parts))
        .select("doc_id", "qsum", "tercile").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(rows(1) == rows(13))
  }

  test("LM model joins broadcast; the corpus never shuffles to score") {
    val plan = ModelOps.bigramPerplexity(langCorpus)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("nb_quality scalar face == batch classifier (p82's binding)") {
    val model = ModelOps.nbModelOf(corpus)
    def key(r: org.apache.spark.sql.Row) = r.getLong(0) ->
      ((r.getBoolean(1), r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
    val scalar = corpus
      .select(col("doc_id"), ModelOps.nbQualityCol(col("text"), model).as("q"))
      .select(col("doc_id"), col("q")("label"), col("q")("n_grams"),
        col("q")("score"), col("q")("pred"), col("q")("agree"))
      .collect().map(key).toMap
    val batch = ModelOps.nbQualityScores(corpus)
      .select(col("doc_id"), col("label"), col("n_grams"), col("score"),
        col("pred"), col("agree"))
      .collect().map(key).toMap
    assert(scalar == batch)
  }

  test("NULL-text docs: scalar face emits n_grams NULL, the n_grams>0 filter restores the batch domain (r15)") {
    import spark.implicits._
    // nbQualityScores DROPS a null-text doc (explode of a null token
    // array yields no rows) and so does the shared DuckDB oracle; the
    // map-only face emits size(null) = NULL for it, so the p47/p82
    // faces' n_grams > 0 filter is what keeps the row domains equal
    val docs = Seq((0L, "alpha beta gamma real words here"),
      (1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val model = ModelOps.nbModelOf(docs)
    val batch = ModelOps.nbQualityScores(docs).select("doc_id")
      .as[Long].collect().toSet
    assert(batch == Set(0L)) // null-text doc absent
    val scalar = docs
      .select(col("doc_id"), ModelOps.nbQualityCol(col("text"), model).as("q"))
    val unfiltered = scalar.select(col("doc_id"), col("q")("n_grams"))
      .as[(Long, java.lang.Long)].collect().toMap
    assert(unfiltered(1L) == null) // the raw scalar face resurrects it...
    val filtered = scalar.filter(col("q")("n_grams") > 0)
      .select("doc_id").as[Long].collect().toSet
    assert(filtered == batch) // ...and the declared filter drops it
  }

  test("pplGate == bigramPerplexity (p55's r16 binding: full 7-column output, empty + NULL text edges)") {
    import spark.implicits._
    // empty text = one empty token (the engines' shared split contract);
    // NULL text = batch explode yields no rows and na.fill(0) restores
    // the doc — pplGate's coalesces must replay exactly that
    val edge = langCorpus.union(
      Seq((100L, "", "en"), (101L, null.asInstanceOf[String], "de")).toDF())
    val (m12, m1) = ModelOps.bigramLmMaps(edge)
    def key(r: org.apache.spark.sql.Row) = r.getLong(0) ->
      ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getInt(5), r.getBoolean(6)))
    val cols = Seq("doc_id", "lang", "n_big", "qsum", "bpt_milli",
      "tercile", "keep").map(col)
    val gate = ModelOps.pplGate(edge, m12, m1)
      .select(cols: _*).collect().map(key).toMap
    val batch = ModelOps.bigramPerplexity(edge)
      .select(cols: _*).collect().map(key).toMap
    assert(gate == batch)
  }

  test("ppl_bits scalar face == batch LM scoring (p83's binding)") {
    val (m12, m1) = ModelOps.bigramLmMaps(langCorpus)
    def key(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))
    val scalar = ModelOps.pplScore(langCorpus, m12, m1)
      .select(col("doc_id"), col("n_big"), col("qsum"), col("bpt_milli"))
      .collect().map(key).toMap
    val batch = ModelOps.bigramPerplexity(langCorpus)
      .select(col("doc_id"), col("n_big"), col("qsum"), col("bpt_milli"))
      .collect().map(key).toMap
    assert(scalar == batch)
  }

  private implicit class ToSortedMap(a: Array[(Long, Long)]) {
    def toSortedMap: Map[Long, Long] = a.toMap
  }

  // ---- p101: isotonic PAVA calibration kernel ----

  test("PAVA: already-monotone rates pass through pointwise") {
    val in = Seq((0L, 10L, 1L), (1L, 10L, 5L), (2L, 10L, 9L))
    assert(ModelOps.isotonicPava(in) ==
      Seq(0L -> 100000L, 1L -> 500000L, 2L -> 900000L))
  }

  test("PAVA: a single violation pools exactly two buckets") {
    // rates .75, .25, .75 → pool(0,1) to (8, 4) = .5, keep bucket 2
    val in = Seq((0L, 4L, 3L), (1L, 4L, 1L), (2L, 4L, 3L))
    assert(ModelOps.isotonicPava(in) ==
      Seq(0L -> 500000L, 1L -> 500000L, 2L -> 750000L))
  }

  test("PAVA: strictly decreasing rates pool to the global mean") {
    val in = Seq((0L, 5L, 5L), (1L, 5L, 3L), (2L, 5L, 1L), (3L, 5L, 0L))
    val want = 9L * 1000000L / 20L // 450000
    assert(ModelOps.isotonicPava(in).forall(_._2 == want))
  }

  test("PAVA: unsorted input is sorted by bucket; weights respected") {
    // heavy low-rate bucket drags its pooled block down but the pool
    // stops as soon as monotonicity is restored: {0,1} pool to 1/101,
    // bucket 2 stays at 1.0
    val in = Seq((2L, 1L, 1L), (0L, 1L, 1L), (1L, 100L, 0L))
    val out = ModelOps.isotonicPava(in).toMap
    assert(out == Map(0L -> 9900L, 1L -> 9900L, 2L -> 1000000L))
  }

  test("PAVA matches the independent minimax formula on random inputs") {
    // The L2 weighted isotonic fit has the closed form
    //   y_i = max_{j<=i} min_{k>=i} mean(rows j..k)
    // (Barlow et al. 1972, §1.2) — a genuinely different derivation
    // than the pooling loop; exact-fraction compare via BigInt.
    val rnd = new scala.util.Random(101)
    (0 until 50).foreach { iter =>
      val n = 1 + rnd.nextInt(24)
      val rows = (0 until n).map { b =>
        val w = 1L + rnd.nextInt(50)
        (b.toLong, w, rnd.nextLong(w + 1).max(0L))
      }
      val pava = ModelOps.isotonicPava(rows).toMap
      val ws = rows.map(_._2)
      val ps = rows.map(_._3)
      def mean(j: Int, k: Int): (BigInt, BigInt) =
        (BigInt(ps.slice(j, k + 1).sum), BigInt(ws.slice(j, k + 1).sum))
      def lt(a: (BigInt, BigInt), b: (BigInt, BigInt)) = a._1 * b._2 < b._1 * a._2
      (0 until n).foreach { i =>
        val minimax = (0 to i).map { j =>
          (i until n).map(k => mean(j, k)).reduce((a, b) => if (lt(a, b)) a else b)
        }.reduce((a, b) => if (lt(a, b)) b else a)
        val wantPpm = (minimax._1 * 1000000 / minimax._2).toLong
        assert(pava(i.toLong) == wantPpm, s"iter $iter bucket $i")
      }
      // and the fit is monotone non-decreasing
      val fitted = ModelOps.isotonicPava(rows).sortBy(_._1).map(_._2)
      assert(fitted == fitted.sorted, s"iter $iter not monotone")
    }
  }

  test("isotonicCalSql: an empty fit renders a valid never-matching sentinel row") {
    // `VALUES` with zero tuples is a DuckDB parse error; the renderer
    // must keep the oracle runnable (empty-to-empty via the inner join)
    val sql = ModelOps.isotonicCalSql(Seq.empty)
    assert(sql.contains(s"(${ModelOps.IsoBucketClamp + 1}, -1)"))
    val nonEmpty = ModelOps.isotonicCalSql(Seq(3L -> 250000L))
    assert(nonEmpty.contains("(3, 250000)"))
  }

  test("p101 face: bounded buckets, broadcast fit, oracle-shape columns") {
    val df = graft.queries.PipelineQueries.queries("p101_isotonic_calibration")(
      spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq == Seq("bucket", "n", "n_pos", "cal_ppm"))
    // bounded bucket domain
    assert(rows.forall(r => math.abs(r.getLong(0)) <= ModelOps.IsoBucketClamp))
    // calibrated values are probabilities in ppm and monotone in bucket
    val cal = rows.sortBy(_.getLong(0)).map(_.getLong(3)).toSeq
    assert(cal.forall(c => c >= 0L && c <= 1000000L))
    assert(cal == cal.sorted)
    // n_pos never exceeds n
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)))
  }
}
