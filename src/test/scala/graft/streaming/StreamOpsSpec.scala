package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import StreamOps.{SeriesPoint, SeriesUpdate}

/** Event-time windowed aggregation with watermark + custom keyed state,
  * driven deterministically through MemoryStream micro-batches. */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1700000000000000000L // ns
  private def ns(sec: Long): Long = t0 + sec * 1000000000L

  test("windowedAgg closes event-time windows and drops too-late rows") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String, Double)]
    val agg = StreamOps.windowedAgg(
      in.toDF().toDF("time", "sensor", "v"),
      "time", "v", Seq("sensor"), windowLen = "1 minute", lateness = "30 seconds")
    val q = agg.writeStream.format("memory").queryName("wagg")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two rows in window [t0, t0+60s)
      in.addData((ns(5), "a", 1.0), (ns(20), "a", 3.0))
      q.processAllAvailable()
      // batch 2: advance event time far past watermark -> window 1 closes
      in.addData((ns(200), "a", 7.0))
      q.processAllAvailable()
      // batch 3: a VERY late row for the closed window must be dropped
      in.addData((ns(10), "a", 100.0))
      q.processAllAvailable()
      in.addData((ns(400), "a", 9.0)) // close window of ns(200)
      q.processAllAvailable()
      val rows = spark.table("wagg")
        .selectExpr("n", "sum_v", "avg_v").as[(Long, Double, Double)].collect().toSet
      // first window: exactly the two on-time rows; late 100.0 never appears
      assert(rows.contains((2L, 4.0, 2.0)), rows)
      assert(!rows.exists(_._2 >= 100.0), rows)
    } finally q.stop()
  }

  test("runningSeriesStats keeps per-key state across micro-batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[SeriesPoint]
    val updates = StreamOps.runningSeriesStats(in.toDS())
    val q = updates.writeStream.format("memory").queryName("rstats")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(SeriesPoint("s1", ns(0), 10.0), SeriesPoint("s1", ns(10), 20.0))
      q.processAllAvailable()
      in.addData(SeriesPoint("s1", ns(30), 30.0), SeriesPoint("s2", ns(1), 5.0))
      q.processAllAvailable()
      val ups = spark.table("rstats").as[SeriesUpdate].collect()
      val s1 = ups.filter(_.key == "s1").sortBy(_.count)
      assert(s1.map(_.count).toSeq == Seq(1L, 2L, 3L))
      assert(s1.map(_.avg).toSeq == Seq(10.0, 15.0, 20.0))
      // state survived the batch boundary: gap computed vs previous batch
      assert(s1.last.gapNs == 20L * 1000000000L)
      assert(ups.filter(_.key == "s2").map(_.count).toSeq == Seq(1L))
    } finally q.stop()
  }

  test("runningSeriesStats: a cross-batch late point never yields a negative gap") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[SeriesPoint]
    val q = StreamOps.runningSeriesStats(in.toDS())
      .writeStream.format("memory").queryName("rlate")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(SeriesPoint("k", ns(100), 1.0))
      q.processAllAvailable()
      // batch 2 arrives with an EARLIER event time than state.lastNs
      in.addData(SeriesPoint("k", ns(40), 2.0))
      q.processAllAvailable()
      in.addData(SeriesPoint("k", ns(130), 3.0))
      q.processAllAvailable()
      val ups = spark.table("rlate").as[SeriesUpdate].collect().sortBy(_.count)
      assert(ups.map(_.gapNs).forall(_ >= 0L), ups.mkString(", "))
      assert(ups(1).gapNs == 0L) // late point clamps, doesn't go negative
      // lastNs never moved backward: next gap is vs ns(100), not ns(40)
      assert(ups(2).gapNs == 30L * 1000000000L)
    } finally q.stop()
  }

  test("dedupStream emits each distinct text once across micro-batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Long, String)]
    val out = StreamOps.dedupStream(
      in.toDF().toDF("time", "doc_id", "text"), "time", lateness = "1 hour")
    val q = out.writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((ns(0), 1L, "alpha"), (ns(1), 2L, "beta"), (ns(2), 3L, "alpha"))
      q.processAllAvailable()
      // cross-batch duplicate within the watermark horizon: suppressed
      in.addData((ns(10), 4L, "beta"), (ns(11), 5L, "gamma"))
      q.processAllAvailable()
      val texts = spark.table("sdedup").select("text").as[String].collect().toSeq
      assert(texts.sorted == Seq("alpha", "beta", "gamma"), texts)
      // schema passes through untouched (hash + event-time are internal)
      assert(spark.table("sdedup").columns.toSeq == Seq("time", "doc_id", "text"))
    } finally q.stop()
  }

  test("chunkTexts is map-only and composes with a stream unchanged") {
    // the RAG-prep unit transform (p35/p37/p38) on a readStream: pure
    // tokenize -> explode, no state, so chunks stream out per micro-batch
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = graft.ops.TextOps.chunkTexts(
      in.toDF().toDF("doc_id", "text"), size = 4, stride = 3)
    val q = out.writeStream.format("memory").queryName("schunk")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((1L, "a b c d e f g"), (2L, "x y"))
      q.processAllAvailable()
      val rows = spark.table("schunk").as[(Long, Int, Int, String)].collect().toSet
      assert(rows == Set((1L, 1, 4, "a b c d"), (1L, 4, 4, "d e f g"),
        (1L, 7, 1, "g"), (2L, 1, 2, "x y")), rows)
    } finally q.stop()
  }

  test("nearDupStream matches batch minHashPairs restricted to arrival x corpus") {
    implicit val sq = spark.sqlContext
    import graft.ops.DedupOps
    import org.apache.spark.sql.functions.{col, round}
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (101L, "one two three four five six seven eight nine ten eleven twelve"),
      (102L, "totally different content about ships and harbors at dawn"))
      .toDF("doc_id", "text")
    val arrivalRows = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa extra"),
      (2L, "completely unrelated arrival text about mountains and snow"),
      (3L, "one two three four five six seven eight nine ten eleven twelve"),
      (4L, "too short")) // < n tokens: no shingles, must pass through silently
    val in = MemoryStream[(Long, Long, String)]
    val out = StreamOps.nearDupStream(in.toDF().toDF("time", "doc_id", "text"),
      DedupOps.corpusBandIndex(corpus), DedupOps.corpusShingleSets(corpus),
      tau = 0.5, lateness = "1 hour")
    val q = out.writeStream.format("memory").queryName("sneardup")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(arrivalRows.zipWithIndex.map { case ((id, t), i) => (ns(i), id, t) }: _*)
      q.processAllAvailable()
      // the same (doc, corpus) pair re-arriving within the horizon: suppressed
      in.addData((ns(10), 3L, arrivalRows(2)._2))
      q.processAllAvailable()
      val got = spark.table("sneardup").as[(Long, Long, Double)].collect().toSet
      // batch differential: identical band scheme + exact verify over the
      // union, restricted to arrival-side x corpus-side pairs
      val expected = DedupOps.minHashPairs(
          arrivalRows.toDF("doc_id", "text").unionByName(corpus), tau = 0.5)
        .filter(col("da") < 100 && col("db") >= 100)
        .select(col("da"), col("db"), round(col("j"), 6).as("j"))
        .as[(Long, Long, Double)].collect().toSet
      assert(got == expected, s"got=$got expected=$expected")
      assert(got.map(_._1) == Set(1L, 3L)) // near-dup + exact dup, not 2L/4L
      assert(got.exists { case (d, c, j) => d == 3L && c == 101L && j == 1.0 })
    } finally q.stop()
  }

  test("nearDupStream names every corpus MEMBER, even inside exact-dup clusters") {
    // regression (code-review r9): collapsing the corpus index to
    // exact-dup representatives silently shrank this stream's output —
    // the contract is one row per (arrival, corpus near-dup), and the
    // prior spec's corpus had no exact dups to catch it
    implicit val sq = spark.sqlContext
    import graft.ops.DedupOps
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq((100L, t), (101L, t), (102L, t), // 3 exact copies
      (200L, "totally different content about ships and harbors at dawn"))
      .toDF("doc_id", "text")
    val in = MemoryStream[(Long, Long, String)]
    val out = StreamOps.nearDupStream(in.toDF().toDF("time", "doc_id", "text"),
      DedupOps.corpusBandIndex(corpus), DedupOps.corpusShingleSets(corpus),
      tau = 0.5, lateness = "1 hour")
    val q = out.writeStream.format("memory").queryName("sneardup_members")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((ns(0), 1L, s"$t extra"))
      q.processAllAvailable()
      val got = spark.table("sneardup_members")
        .as[(Long, Long, Double)].collect().toSet
      assert(got.map(_._2) == Set(100L, 101L, 102L), got) // ALL members named
    } finally q.stop()
  }

  test("scrub-on-ingest: PII redaction + quality gates compose with a stream") {
    // the map-only pipeline ops (p31 redact, p14 repetition gate columns,
    // p08 token count) are stateless projections, so they drop into a
    // readStream->writeStream pipeline unchanged — scrubbing AT ingest
    // instead of in a later batch pass
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val scrubbed = in.toDF().toDF("doc_id", "text")
      .withColumn("text",
        graft.ops.PiiOps.redact(org.apache.spark.sql.functions.col("text")))
      .withColumn("n_tokens",
        graft.ops.TextOps.tokenCount(org.apache.spark.sql.functions.col("text")))
    val q = scrubbed.writeStream.format("memory").queryName("scrub")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((1L, "mail a@b.co now"), (2L, "call 555-123-4567 ok"))
      q.processAllAvailable()
      val rows = spark.table("scrub").as[(Long, String, Int)].collect()
        .map { case (id, t, n) => id -> ((t, n)) }.toMap
      assert(rows(1L) == (("mail <EMAIL> now", 3)))
      assert(rows(2L) == (("call <PHONE> ok", 3)))
    } finally q.stop()
  }

  test("funnelStream folds buffered events at the watermark and emits level advances") {
    implicit val sq = spark.sqlContext
    import StreamOps.{FunnelAdvance, FunnelPoint}
    val in = MemoryStream[FunnelPoint]
    // stages: 0=view, 1=click, 2=purchase; window 200 s; lateness 10 s
    val out = StreamOps.funnelStream(in.toDS(), nStages = 3,
      windowNs = 200L * 1000000000L, lateness = "10 seconds")
    val q = out.writeStream.format("memory").queryName("sfunnel")
      .outputMode(OutputMode.Append()).start()
    try {
      // view + click buffer (watermark trails by 10 s)
      in.addData(FunnelPoint(1L, ns(0), 0), FunnelPoint(1L, ns(5), 1))
      q.processAllAvailable()
      // another user's event advances the watermark to 90 s ->
      // user 1's timeout fires, both events fold: level 2
      in.addData(FunnelPoint(9L, ns(100), 0))
      q.processAllAvailable()
      // purchase at 95 s buffers (> wm 90 s), then folds once the
      // watermark passes it: 95 - chain-start 0 <= 200 s -> level 3
      in.addData(FunnelPoint(1L, ns(95), 2))
      q.processAllAvailable()
      in.addData(FunnelPoint(9L, ns(300), 0))
      q.processAllAvailable()
      val rows = spark.table("sfunnel").as[FunnelAdvance].collect().toSet
      // every level advance is emitted with the event time that reached
      // it: 1 at the view, 2 at the click, 3 at the purchase
      val u1 = rows.filter(_.user == 1L)
      assert(u1 == Set(FunnelAdvance(1L, 1, ns(0)),
        FunnelAdvance(1L, 2, ns(5)), FunnelAdvance(1L, 3, ns(95))), rows)
      // the watermark-advancing user reports its own level-1 entry
      assert(rows.contains(FunnelAdvance(9L, 1, ns(100))), rows)
    } finally q.stop()
  }

  test("funnelStream: extreme-negative event times are late-gated, never chained (wrap class)") {
    implicit val sq = spark.sqlContext
    import StreamOps.{FunnelAdvance, FunnelPoint}
    val in = MemoryStream[FunnelPoint]
    val out = StreamOps.funnelStream(in.toDS(), nStages = 2,
      windowNs = 200L * 1000000000L, lateness = "10 seconds")
    val q = out.writeStream.format("memory").queryName("sfunnelwrap")
      .outputMode(OutputMode.Append()).start()
    try {
      // a MinValue-adjacent stage-0 time is the only input that could
      // make t - m wrap negative downstream; the late-event gate (plus
      // the DP's mirrored d >= 0 guard) must keep the ~2^64-ns-apart
      // pair from ever chaining — and must not crash the query
      in.addData(FunnelPoint(1L, Long.MinValue + 1, 0),
        FunnelPoint(1L, Long.MaxValue - 30000000000L, 1))
      q.processAllAvailable()
      in.addData(FunnelPoint(9L, Long.MaxValue - 1000L, 0))
      q.processAllAvailable()
      val rows = spark.table("sfunnelwrap").as[FunnelAdvance].collect().toSet
      assert(!rows.exists(r => r.user == 1L && r.level == 2), rows)
    } finally q.stop()
  }

  test("top_k aggregate runs inside a streaming windowed aggregation (state-store round-trip)") {
    implicit val sq = spark.sqlContext
    graft.Tables.init(spark)
    val in = MemoryStream[(Long, String)]
    val agg = in.toDF().toDF("time", "s")
      .withColumn("event_time",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("time DIV 1000")))
      .withWatermark("event_time", "10 seconds")
      .groupBy(org.apache.spark.sql.functions.window(
        org.apache.spark.sql.functions.col("event_time"), "1 minute"))
      .agg(org.apache.spark.sql.functions.expr("top_k(2, s)").as("tk"))
    val q = agg.writeStream.format("memory").queryName("stopk")
      .outputMode(OutputMode.Append()).start()
    try {
      // the sketch must survive state-store serialize/deserialize across
      // micro-batches within one open window
      in.addData((ns(1), "x"), (ns(2), "x"), (ns(3), "y"))
      q.processAllAvailable()
      in.addData((ns(5), "x"), (ns(6), "z"))
      q.processAllAvailable()
      in.addData((ns(200), "w")) // close the first window
      q.processAllAvailable()
      val tk = spark.table("stopk")
        .selectExpr("tk").as[Seq[(String, Long)]].collect()
      assert(tk.exists(_ == Seq(("x", 3L), ("y", 1L))), tk.toSeq)
    } finally q.stop()
  }

  /** 120 words, 1/3 stopwords, distinct long content words — clears the
    * heuristic quality gate (the TextOpsSpec "good" construction), so
    * these docs both seed the LM and pass the ensemble. */
  private def prose(stem: String) = (0 until 120)
    .map(i => if (i % 3 == 0) "the" else s"$stem$i").mkString(" ")
  private def corpusDocs = Seq(
    0L -> prose("wonder"),
    1L -> prose("window"),
    2L -> prose("wander"),
    3L -> "zzz qqq xxx 123 9981 !!! ### $$$ %%%",      // symbolic junk
    4L -> "the the the the the the the the the the the the", // dup words
    5L -> prose("winter"),
    6L -> "buy now click here free offer win cash prize instantly today", // low quality
    7L -> prose("wonder")) // exact repeat of 0: identical LM score

  test("pplGateStream scores a drained stream identically to the batch LM pass") {
    import graft.ops.ModelOps
    val docs = corpusDocs.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
    // train the LM once on the batch (the curated/seed snapshot) ...
    val (m12, m1) = ModelOps.bigramLmMaps(docs)
    assert(m12.nonEmpty && m1.nonEmpty)
    // ... and take the batch op as the oracle: per-doc integer scores
    // must match EXACTLY, and the streaming threshold gate must
    // reproduce the batch keep-set when fed the batch's own cut
    val batch = ModelOps.bigramPerplexity(docs)
      .select("doc_id", "n_big", "qsum", "bpt_milli", "keep")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4), r._5)).toMap
    val cut = batch.collect { case (_, (t, true)) => t._3 }.max
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamOps.pplGateStream(
      in.toDF().toDF("doc_id", "text"), m12, m1, maxBptMilli = cut)
      .select("doc_id", "n_big", "qsum", "bpt_milli", "keep")
      .writeStream.format("memory").queryName("pplgate")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(corpusDocs.take(4): _*)
      q.processAllAvailable()
      in.addData(corpusDocs.drop(4): _*) // second micro-batch: no state needed
      q.processAllAvailable()
      val got = spark.table("pplgate")
        .as[(Long, Long, Long, Long, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4), r._5)).toMap
      assert(got.size == corpusDocs.size)
      for ((id, (scores, _)) <- batch)
        assert(got(id)._1 == scores, s"doc $id: stream ${got(id)._1} vs batch $scores")
      // the threshold gate reproduces every batch keep; it may keep
      // MORE only where the batch tercile cut split equal scores
      for ((id, (s, keep)) <- batch if keep)
        assert(got(id)._2, s"doc $id kept by batch (bpt ${s._3}) but gated out")
      for ((id, (s, _)) <- batch if s._3 > cut)
        assert(!got(id)._2, s"doc $id over cut $cut but kept")
    } finally q.stop()
  }

  test("ensembleGateStream drains to the batch gate verdicts") {
    val docs = corpusDocs.toDF("doc_id", "text")
    val batch = graft.ops.TextOps.ensembleGate(docs)
      .select("doc_id", "keep", "reason")
      .as[(Long, Boolean, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamOps.ensembleGateStream(in.toDF().toDF("doc_id", "text"))
      .select("doc_id", "keep", "reason")
      .writeStream.format("memory").queryName("ensgate")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(corpusDocs: _*)
      q.processAllAvailable()
      val got = spark.table("ensgate").as[(Long, Boolean, String)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == batch, s"stream $got vs batch $batch")
      // the planted junk docs are rejected, the prose kept
      assert(!got(3L)._1 && !got(4L)._1 && got(0L)._1)
    } finally q.stop()
  }

  test("decontamScreenStream drains to the batch sketch-screen decisions") {
    import graft.ops.DedupOps
    // holdout shares 8-grams with docs 0/7 (prose("wonder")) and nothing
    // else; the sketch decisions — FPs included — must match the batch
    val holdout = Seq(100L -> prose("wonder")).toDF("doc_id", "text")
    val corpus = corpusDocs.toDF("doc_id", "text")
    val bits = DedupOps.bloomBits(holdout)
    val batch = DedupOps.bloomScreenWith(corpus, bits)
      .as[(Long, Long)].collect().toMap
    assert(batch.contains(0L) && batch.contains(7L), batch)
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamOps.decontamScreenStream(in.toDF().toDF("doc_id", "text"), bits)
      .select("doc_id", "n_hits", "contaminated")
      .writeStream.format("memory").queryName("dscreen")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(corpusDocs: _*)
      q.processAllAvailable()
      val got = spark.table("dscreen").as[(Long, Int, Boolean)].collect()
        .map(r => r._1 -> ((r._2.toLong, r._3))).toMap
      assert(got.size == corpusDocs.size)
      for ((id, _) <- corpusDocs) {
        val expected = batch.getOrElse(id, 0L)
        assert(got(id) == ((expected, expected > 0)),
          s"doc $id: stream ${got(id)} vs batch $expected")
      }
    } finally q.stop()
  }

  test("cdcScreenStream drains to the batch chunk-screen decisions") {
    import graft.ops.DedupOps
    // the corpus stores prose("wonder")/("window")/("wander")… chunks;
    // arrivals: an exact corpus doc (all chunks stored), a doc sharing a
    // long TAIL with a corpus doc (shift-invariance: trailing chunks
    // still hit), and novel prose
    val corpus = corpusDocs.toDF("doc_id", "text")
    val bits = DedupOps.cdcBloomBits(corpus)
    val arrivals = Seq(
      10L -> prose("wonder"),                    // exact corpus content
      11L -> ("freshly inserted words " + prose("window")), // shifted tail
      12L -> prose("novel"))                     // unseen stems
    // batch face of the SAME screen = the oracle for the drain
    val batch = StreamOps.cdcScreenStream(arrivals.toDF("doc_id", "text"), bits)
      .select("doc_id", "n_chunks", "n_dup", "dup_milli")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamOps.cdcScreenStream(in.toDF().toDF("doc_id", "text"), bits)
      .select("doc_id", "n_chunks", "n_dup", "dup_milli")
      .writeStream.format("memory").queryName("cdcscreen")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(arrivals.take(2): _*)
      q.processAllAvailable()
      in.addData(arrivals.drop(2): _*) // second micro-batch: no state
      q.processAllAvailable()
      val got = spark.table("cdcscreen")
        .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
      assert(got == batch, s"stream $got vs batch $batch")
      // the planted structure: exact dup ~fully covered; the shifted
      // doc still matches its surviving tail chunks; novel stays low
      // (sketch FPs can only ADD hits, never remove)
      assert(got(10L)._4 == 1000L, got(10L))
      assert(got(11L)._3 >= got(11L)._2 / 2, got(11L))
      assert(got(12L)._4 < got(11L)._4, s"${got(12L)} vs ${got(11L)}")
    } finally q.stop()
  }

  test("mediaMatchStream fingerprints arriving assets and matches the static index") {
    import graft.ops.{MediaGen, MultimodalOps}
    import org.apache.spark.sql.functions.{col, struct}
    // static index: fingerprints of the corpus assets (ids 0-11 cover
    // all three kinds; video assets contribute no fingerprint rows)
    val corpusAssets = MediaGen.syntheticAssets(
      (0L until 12L).toDF("doc_id"))
    val index = MultimodalOps.mediaFingerprints(corpusAssets)
      .withColumnRenamed("doc_id", "corpus_id")
    assert(index.count() == 8, "4 images + 4 audios expected") // 12/3 each
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Array[Byte], String)]
    val arrivals = in.toDF().toDF("doc_id", "media", "kind")
      .withColumn("meta", struct(col("kind")))
    val q = StreamOps.mediaMatchStream(arrivals, index)
      .select("doc_id", "mkind", "ahash", "corpus_id")
      .writeStream.format("memory").queryName("mmatch")
      .outputMode(OutputMode.Append()).start()
    try {
      // re-ingest corpus asset 0's image and 1's audio bytes under new
      // ids, plus a video (never fingerprinted, never matched)
      in.addData(
        (100L, MediaGen.mediaFor(0L), MediaGen.kindOf(0L)),
        (101L, MediaGen.mediaFor(1L), MediaGen.kindOf(1L)),
        (102L, MediaGen.mediaFor(2L), MediaGen.kindOf(2L)))
      q.processAllAvailable()
      val got = spark.table("mmatch")
        .as[(Long, String, Long, Long)].collect()
      // identical bytes -> identical fingerprint -> the original corpus
      // id is among the matches (8-bit hashes collide by design, so
      // other corpus ids may match too — that IS perceptual grouping)
      assert(got.exists(r => r._1 == 100L && r._2 == "image" && r._4 == 0L), got.toSeq)
      assert(got.exists(r => r._1 == 101L && r._2 == "audio" && r._4 == 1L), got.toSeq)
      assert(!got.exists(_._1 == 102L), got.toSeq) // video: no fingerprint
    } finally q.stop()
  }

  test("sessionizeStream merges points within gap, closes sessions at the watermark") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String, Double)]
    val out = StreamOps.sessionizeStream(
      in.toDF().toDF("time", "k", "v"), "k", "time", "v",
      gap = "1 minute", lateness = "10 seconds")
    val q = out.writeStream.format("memory").queryName("ssess")
      .outputMode(OutputMode.Append()).start()
    try {
      // one session: 0s and 30s merge (gap 1 min); 200s starts a new one
      in.addData((ns(0), "a", 1.0), (ns(30), "a", 2.0))
      q.processAllAvailable()
      in.addData((ns(200), "a", 5.0)) // watermark -> 190s: session 1 closes
      q.processAllAvailable()
      in.addData((ns(500), "a", 7.0)) // close session 2
      q.processAllAvailable()
      val rows = spark.table("ssess")
        .selectExpr("k", "n", "sum_v").as[(String, Long, Double)].collect().toSet
      assert(rows.contains(("a", 2L, 3.0)), rows) // merged 2-point session
      assert(rows.contains(("a", 1L, 5.0)), rows) // singleton after the gap
    } finally q.stop()
  }

  test("runningSeriesStats evicts idle keys at the event-time horizon") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[SeriesPoint]
    val q = StreamOps.runningSeriesStats(in.toDS(), idleLateness = "1 minute")
      .writeStream.format("memory").queryName("revict")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(SeriesPoint("s1", ns(0), 10.0)); q.processAllAvailable()
      // another key advances the watermark far past s1's idle horizon
      in.addData(SeriesPoint("s2", ns(600), 1.0)); q.processAllAvailable()
      in.addData(SeriesPoint("s2", ns(1200), 1.0)); q.processAllAvailable()
      // s1 reappears: its state was EVICTED, so the running count
      // restarts at 1 — without eviction every key ever seen holds a
      // state-store entry forever on churning key spaces
      in.addData(SeriesPoint("s1", ns(1300), 20.0)); q.processAllAvailable()
      val s1 = spark.table("revict").as[SeriesUpdate].collect()
        .filter(_.key == "s1")
      assert(s1.map(_.count).sorted.toSeq == Seq(1L, 1L), s1.mkString(","))
    } finally q.stop()
  }

  test("cmsCounterStream: streamed counters equal the batch sketch over the union") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamOps.cmsCounterStream(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cmsstream")
      .outputMode(OutputMode.Complete()).start()
    try {
      val b1 = (0 until 60).map(i => (i.toLong, s"alpha beta gamma d$i e${i * 2}"))
      val b2 = (60 until 90).map(i => (i.toLong, s"alpha beta gamma d$i"))
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("cmsstream")
        .as[(Int, Long, Long)].collect().toSet
      val batch = graft.ops.SketchOps.cmsCounters(
        (b1 ++ b2).toDF("doc_id", "text")).as[(Int, Long, Long)].collect().toSet
      assert(streamed == batch) // batch and stream are ONE definition
      // the state bound is the sketch's own constant, not the stream's length
      assert(streamed.size <=
        graft.ops.SketchOps.CmsDepth * graft.ops.SketchOps.CmsWidth)
    } finally q.stop()
  }

  test("arenaCellsStream: streamed game cells equal the batch cells; MM solve agrees") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val q = StreamOps.arenaCellsStream(in.toDF().toDF("winner", "loser"))
      .writeStream.format("memory").queryName("arenastream")
      .outputMode(OutputMode.Complete()).start()
    try {
      val b1 = Seq(("A", "B"), ("A", "B"), ("B", "A"), ("A", "C"))
      val b2 = Seq(("C", "B"), ("A", "C"), ("B", "C"))
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("arenastream")
        .as[(String, String, Long, Long)].collect().toSet
      val all = (b1 ++ b2).toDF("winner", "loser")
      val batch = graft.ops.PrefOps.matchCells(all)
        .as[(String, String, Long, Long)].collect().toSet
      assert(streamed == batch) // batch and stream are ONE definition
      // state is bounded by item pairs, not match volume
      assert(streamed.size == 3)
      // the tiny MM solve over the streamed snapshot IS the batch
      // leaderboard: feed the cells back through bradleyTerry's input
      // shape (one synthetic match row per (cell, direction, count))
      val replayed = streamed.toSeq.flatMap { case (x, y, n, wx) =>
        Seq.fill(wx.toInt)((x, y)) ++ Seq.fill((n - wx).toInt)((y, x))
      }.toDF("winner", "loser")
      val fromStream = graft.ops.PrefOps.bradleyTerry(replayed)
        .as[(String, Long, Long, Long)].collect().toSet
      val fromBatch = graft.ops.PrefOps.bradleyTerry(all)
        .as[(String, Long, Long, Long)].collect().toSet
      assert(fromStream == fromBatch)
    } finally q.stop()
  }

  test("hdrHistogramStream: streamed buckets equal the batch histogram; out-of-domain dropped") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Double]
    val q = StreamOps.hdrHistogramStream(in.toDF().toDF("v"), "v")
      .writeStream.format("memory").queryName("hdrstream")
      .outputMode(OutputMode.Complete()).start()
    try {
      val b1 = (1 to 500).map(i => i * 0.73)
      val b2 = Seq(Double.NaN, -3.0, Double.PositiveInfinity) ++
        (500 to 900).map(i => i * 12.5)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("hdrstream").as[(Long, Long)].collect().toSet
      val batch = graft.ops.SketchOps.hdrHistogram(
        (b1 ++ b2).toDF("v"), org.apache.spark.sql.functions.col("v"))
        .as[(Long, Long)].collect().toSet
      assert(streamed == batch)
      // non-finite/negative never entered: totals count only domain rows
      assert(streamed.toSeq.map(_._2).sum == (b1.size + 401).toLong)
    } finally q.stop()
  }
}
