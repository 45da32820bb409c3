package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) = (0 until n).map(i => s"value-$i-${i * 7}")

  test("hll estimate tracks true cardinality within sketch error (m=64 ~ 13% stderr)") {
    for (n <- Seq(300, 3000, 30000)) {
      val est = SketchOps.hllSummary(corpus(n).toDF("v"), col("v"))
        .select("est_distinct").as[Double].collect()(0)
      assert(math.abs(est - n) / n < 0.35, s"n=$n est=$est")
    }
  }

  test("registers and estimate are partition-invariant (merge = elementwise max)") {
    val df = corpus(5000).toDF("v")
    val a = SketchOps.hllSummary(df.repartition(1), col("v")).collect()(0)
    val b = SketchOps.hllSummary(df.repartition(17), col("v")).collect()(0)
    assert(a == b)
  }

  test("duplicates and NULLs do not move the estimate (COUNT DISTINCT semantics)") {
    val base = corpus(2000)
    val once = SketchOps.hllSummary(base.toDF("v"), col("v")).collect()(0)
    val dupes = SketchOps.hllSummary(
      (base ++ base ++ base).map(Option(_)).:+(None: Option[String]).toDF("v"),
      col("v")).collect()(0)
    assert(once == dupes)
  }

  test("hll_distinct aggregate matches the dataflow face bit for bit") {
    val df = corpus(4000).toDF("v")
    df.createOrReplaceTempView("hll_t")
    val viaAgg = spark.sql("SELECT hll_distinct(v) AS e FROM hll_t")
      .as[Double].collect()(0)
    val viaFlow = SketchOps.hllSummary(df, col("v"))
      .select("est_distinct").as[Double].collect()(0)
    assert(viaAgg == viaFlow)
    // and the aggregate itself is arrival-order / partitioning invariant
    df.repartition(23).createOrReplaceTempView("hll_t2")
    val viaAgg2 = spark.sql("SELECT hll_distinct(v) AS e FROM hll_t2")
      .as[Double].collect()(0)
    assert(viaAgg2 == viaAgg)
  }

  test("linear-counting regime: small cardinalities estimate tightly") {
    // raw HLL is biased low at n << m; the zeros-based correction is
    // near-exact there (every distinct value usually owns a register)
    for (n <- Seq(5, 20, 60)) {
      val est = SketchOps.hllSummary(corpus(n).toDF("v"), col("v"))
        .select("est_distinct").as[Double].collect()(0)
      assert(math.abs(est - n) / n < 0.25, s"n=$n est=$est")
    }
  }

  test("empty and all-NULL inputs estimate zero") {
    val empty = SketchOps.hllSummary(Seq.empty[String].toDF("v"), col("v"))
      .collect()(0)
    assert(empty.getAs[Double]("est_distinct") == 0.0)
    assert(empty.getAs[Long]("zeros") == SketchOps.HllM.toLong)
    val nulls = SketchOps.hllSummary(
      Seq[Option[String]](None, None).toDF("v"), col("v")).collect()(0)
    assert(nulls.getAs[Double]("est_distinct") == 0.0)
  }

  test("cms: planted heavy hitter surfaces exactly; estimates never undercount") {
    // 400 background docs + one 3-gram planted in 50 of them
    val docs = (0 until 400).map { i =>
      val planted = if (i % 8 == 0) " alpha beta gamma" else ""
      (i.toLong, s"w${i * 3} w${i * 3 + 1} w${i * 3 + 2} w${i * 3 + 3}$planted")
    }.toDF("doc_id", "text")
    val rows = SketchOps.cmsHeavyHitters(docs).collect()
    val top = rows.head
    assert(top.getString(0).contains("alpha beta gamma") || top.getLong(1) >= 50L)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS undercounted ${r.getString(0)}: est ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
    val hit = rows.find(_.getString(0) == "alpha beta gamma").get
    assert(hit.getLong(1) == 50L)
  }

  test("cms: counters merge by sum — estimates are partition-invariant") {
    val docs = (0 until 300).map(i => (i.toLong, s"a b c d${i % 40} e$i")).toDF("doc_id", "text")
    val a = SketchOps.cmsHeavyHitters(docs.repartition(1)).collect().toSeq
    val b = SketchOps.cmsHeavyHitters(docs.repartition(13)).collect().toSeq
    assert(a == b)
  }

  test("hdr: decode brackets the true rank value across octave boundaries") {
    // value sweep crossing several powers of two (in milli-units: the
    // doubles are exact integers so floor(x*1000) is exactly x*1000)
    val vs = ((0L until 200L) ++ Seq(4095L, 4096L, 1000000L,
      (1L << 40) - 1, 1L << 40)).distinct
    val rows = SketchOps.hdrQuantiles(vs.map(_.toDouble).toDF("x"), col("x")).collect()
    val sortedMilli = vs.map(_ * 1000L).sorted
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rank = r.getLong(1).toInt
      val truth = sortedMilli(rank - 1)
      assert(truth >= r.getLong(2) && truth <= r.getLong(3),
        s"q=${r.getLong(0)} true=$truth outside [${r.getLong(2)}, ${r.getLong(3)}]")
    }
  }

  test("hdr: true quantile lies inside every reported bucket; width <= 3.125% relative") {
    val n = 20000
    // deterministic skewed-ish values via a hash spread (no RNG)
    val vals = (0 until n).map(i => ((i * 2654435761L) % 1000003L).toDouble / 7.0)
    val rows = SketchOps.hdrQuantiles(vals.toDF("x"), col("x")).collect()
    assert(rows.length == SketchOps.HdrQs.length)
    val sortedMilli = vals.map(v => math.floor(v * 1000).toLong).sorted
    rows.foreach { r =>
      val (rank, lo, hi) = (r.getLong(1).toInt, r.getLong(2), r.getLong(3))
      val truth = sortedMilli(rank - 1)
      assert(truth >= lo && truth <= hi, s"q=${r.getLong(0)} true=$truth not in [$lo,$hi]")
      assert(lo < 64 || (hi - lo).toDouble / lo <= 0.03125 + 1e-9,
        s"bucket too wide: [$lo,$hi]")
    }
  }

  test("hdr: NULL/negative/NaN/Inf/oversize are excluded; merges are partition-invariant") {
    // NaN would silently map to vm=0 in Spark (skewing low quantiles)
    // while DuckDB raises on the cast; +Inf and >HdrMaxValue likewise
    // saturate vs overflow — all must be OUT of the trackable domain
    // identically in both engines
    val base = (1 to 5000).map(i => Option(i * 0.37)) ++
      Seq(None, Some(-5.0), None, Some(Double.NaN),
        Some(Double.PositiveInfinity), Some(Double.NegativeInfinity),
        Some(SketchOps.HdrMaxValue * 2))
    val a = SketchOps.hdrQuantiles(base.toDF("x").repartition(1), col("x")).collect().toSeq
    val b = SketchOps.hdrQuantiles(base.toDF("x").repartition(11), col("x")).collect().toSeq
    val clean = SketchOps.hdrQuantiles(
      base.flatten.filter(v => v >= 0 && v <= SketchOps.HdrMaxValue)
        .map(Option(_)).toDF("x"), col("x")).collect().toSeq
    assert(a == b)
    assert(a == clean)
  }

  test("hdrBucket (JVM) matches the Column bucket formula's histogram exactly") {
    // integer-valued doubles: floor(w*1000) is exactly 1000w, so the
    // Column pipeline and the JVM replica see the same milli-values;
    // the sweep crosses many octaves (w up to 2^42)
    val ws = ((0L to 300L) ++
      (1 to 42).flatMap(p => Seq((1L << p) - 1, 1L << p, (1L << p) + 1)))
      .distinct
    val dfIdx = SketchOps.hdrHistogram(ws.map(_.toDouble).toDF("x"), col("x"))
      .orderBy("idx").as[(Long, Long)].collect().toSeq
    val jvmIdx = ws.map(w => SketchOps.hdrBucket(w * 1000L))
      .groupBy(identity).map { case (i, g) => (i, g.size.toLong) }
      .toSeq.sortBy(_._1)
    assert(dfIdx == jvmIdx)
  }

  test("md5BucketJvm replays the Column md5-bucket spelling bit for bit") {
    val samples = Seq("0:alpha beta gamma", "3:x", "1:", "2:ünïcode ße",
      "0:a b c", "2:the quick brown")
    val viaCol = samples.toDF("s")
      .select(TextOps.md5Bucket(col("s"), SketchOps.CmsWidth).as("b"))
      .as[Long].collect().toSeq
    val viaJvm = samples.map(TextOps.md5BucketJvm(_, SketchOps.CmsWidth))
    assert(viaCol == viaJvm)
  }

  test("cms_count scalar agrees with the dataflow estimate; collected state is the sketch") {
    import org.apache.spark.sql.GraftColumnBridge.{column => cc, toExpression => tx}
    val docs = (0 until 200).map { i =>
      val planted = if (i % 5 == 0) " alpha beta gamma" else ""
      (i.toLong, s"u${i * 3} u${i * 3 + 1} u${i * 3 + 2}$planted")
    }.toDF("doc_id", "text")
    val arr = new Array[Long](SketchOps.CmsDepth * SketchOps.CmsWidth)
    SketchOps.cmsCounters(docs).collect().foreach { r =>
      arr(r.getInt(0) * SketchOps.CmsWidth + r.getLong(1).toInt) = r.getLong(2) }
    def est(term: String): Long = Seq(term).toDF("t")
      .select(cc(graft.functions.CmsCount(tx(col("t")), arr)).as("e"))
      .as[Long].collect()(0)
    // the scalar and the dataflow face answer from the SAME counters
    val flowRows = SketchOps.cmsHeavyHitters(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    flowRows.foreach { case (s, (exact, flowEst)) =>
      assert(est(s) == flowEst, s"scalar/dataflow drift on '$s'")
      assert(est(s) >= exact)
    }
    assert(est("alpha beta gamma") >= 40L) // planted in 40 docs
    // NULL in, NULL out
    val n = Seq(Option.empty[String]).toDF("t")
      .select(cc(graft.functions.CmsCount(tx(col("t")), arr)).as("e"))
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("hdr_quantile scalar replays the dataflow face; domain edges are NULL") {
    import org.apache.spark.sql.GraftColumnBridge.{column => cc, toExpression => tx}
    val vals = (1 to 7000).map(i => ((i * 2654435761L) % 99991L).toDouble / 3.0)
    val hist = SketchOps.hdrHistogram(vals.toDF("x"), col("x"))
      .orderBy("idx").collect()
    val idxs = hist.map(_.getLong(0))
    var run = 0L
    val cums = hist.map { r => run += r.getLong(1); run }
    def q(qpm: Long): org.apache.spark.sql.Row = Seq(qpm).toDF("q")
      .select(cc(graft.functions.HdrQuantile(tx(col("q")), idxs, cums)).as("r"))
      .select(col("r.rank"), col("r.est_lo_milli"), col("r.est_hi_milli"))
      .collect()(0)
    val flow = SketchOps.hdrQuantiles(vals.toDF("x"), col("x")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    SketchOps.HdrQs.foreach { qpm =>
      val s = q(qpm.toLong)
      assert((s.getLong(0), s.getLong(1), s.getLong(2)) == flow(qpm.toLong),
        s"scalar/dataflow drift at q=$qpm")
    }
    // out-of-domain q and the empty histogram return NULL, not garbage
    assert(Seq(0L, 1001L).forall { bad =>
      Seq(bad).toDF("q")
        .select(cc(graft.functions.HdrQuantile(tx(col("q")), idxs, cums)).as("r"))
        .collect()(0).isNullAt(0)
    })
    assert(Seq(500L).toDF("q")
      .select(cc(graft.functions.HdrQuantile(tx(col("q")),
        Array.empty[Long], Array.empty[Long])).as("r"))
      .collect()(0).isNullAt(0))
  }

  test("hll_distinct works per-group and rejects wrong arity with a clear message") {
    Seq(("a", "x1"), ("a", "x2"), ("b", "x1"), ("b", "x1"))
      .toDF("g", "v").createOrReplaceTempView("hll_g")
    val rows = spark.sql(
      "SELECT g, hll_distinct(v) AS e FROM hll_g GROUP BY g ORDER BY g")
      .as[(String, Double)].collect().toSeq
    // tiny groups sit in the linear-counting regime: near-exact
    assert(rows.map(_._1) == Seq("a", "b"))
    assert(math.abs(rows(0)._2 - 2.0) < 0.1, rows.toString)
    assert(math.abs(rows(1)._2 - 1.0) < 0.1, rows.toString)
    val e = intercept[Exception](
      spark.sql("SELECT hll_distinct(v, 2) FROM hll_g").collect())
    assert(e.getMessage.contains("expected 1 argument"), e.getMessage)
    // non-string input: analysis-time type error, not a runtime surprise
    val e2 = intercept[Exception](
      spark.sql("SELECT hll_distinct(42) FROM hll_g").collect())
    assert(e2.getMessage.toLowerCase.contains("string"), e2.getMessage)
  }
}
