package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextExprs

/** Learned-model corpus operators: the steps of a training-data pipeline
  * that TRAIN a small model on the corpus and then apply it back —
  * a hashed-n-gram Naive Bayes quality classifier (the "model-based
  * quality filter" of CCNet / GPT-3 / LLaMA data prep, where a linear
  * classifier trained on a curated seed corpus scores the raw crawl) and
  * batched BPE merge training (the vocabulary-LEARNING step ahead of
  * [[TextOps.vocabEncode]]'s tokenize-to-ids).
  *
  * Both follow the repo's exact-replay discipline: md5 is the shared
  * hash, logs are quantized to integer bit lengths (the p44 DSIR trick),
  * so every trained parameter and every decision replays bit-for-bit in
  * the DuckDB oracle — no FP boundary can flip a keep/drop between
  * engines.
  */
object ModelOps {

  // ---- hashed-n-gram Naive Bayes quality classifier ----

  /** Feature space: uni+bigrams hashed into this many buckets (the
    * fastText-style hashing trick; small here because the test corpus
    * is; at 100 TB raise it — the model stays broadcast-sized). */
  val NbBuckets = 256L

  /** Weak-supervision seed: docs whose heuristic quality (p09's gate)
    * clears this are the "curated" class the model learns to imitate. */
  val NbSeedTau = 0.5

  /** Stable feature bucket for a gram (md5 — the shared exact-hash
    * primitive; 6 hex digits = 24 bits, always positive). */
  def nbBucket(g: Column): Column =
    TextOps.md5Slice(g, 1, 6) % NbBuckets

  /** Quantized log2: floor(log2(c+1)) as the bit length of c+1 — exact
    * integer arithmetic in both engines (Spark `conv`, DuckDB `bin`),
    * so likelihood sums are partial-aggregation-order independent. */
  private def llog2(c: Column): Column =
    (length(conv((c + 1).cast("string"), 10, 2)) - 1).cast("long")

  /** Train a multinomial Naive Bayes classifier on weak labels (the
    * heuristic quality gate) and score every document with it:
    * `doc_id, label, n_grams, score, pred, agree`.
    *
    * score(x) = Σ_b k_b·[llog2 c⁺_b − llog2 c⁻_b]
    *          + n·[llog2 T⁻ − llog2 T⁺] + [llog2 N⁺ − llog2 N⁻]
    * — the per-class smoothed conditional log-likelihoods plus the
    * class prior, all in quantized-integer logs (+1 smoothing lives
    * inside llog2), `pred` = score ≥ 0. `agree` marks where the learned
    * model reproduces its own teacher — the distillation-fidelity
    * metric one watches before swapping in a real curated seed corpus
    * (which drops into the `label` column without touching the flow).
    *
    * Scale shape (the p44 dataflow): gram instances pre-aggregate to
    * per-(doc, bucket, label) counts, materialized once
    * (localCheckpoint) because the model and the scoring join are
    * consumers Catalyst cannot unify; the 256-key model BROADCASTS back
    * for map-side scoring — the corpus never shuffles for its score;
    * totals and priors ride 1-row broadcasts. */
  /** The ONE NB pre-aggregate both training faces consume: per-(doc,
    * bucket, label) gram-instance counts, materialized once
    * (localCheckpoint — the model and its other consumer cannot be
    * unified by Catalyst). Shared by [[nbQualityScores]] and
    * [[nbModelOf]] so the SQL face's model can never drift from the
    * batch face's (p82's equivalence rests on identical counts). */
  private def nbCounts(docs: DataFrame): DataFrame = {
    val w = col("__w")
    docs
      .select(col("doc_id"),
        (TextOps.qualityScore(col("text")) >= NbSeedTau).as("__pos"),
        TextOps.tokens(col("text")).as("__w"))
      .select(col("doc_id"), col("__pos"),
        explode(concat(w, TextExprs.ngrams(w, 2))).as("__g"))
      .select(col("doc_id"), col("__pos"), nbBucket(col("__g")).as("b"))
      .groupBy("doc_id", "b", "__pos")
      .agg(count(lit(1)).as("__k"))
      .localCheckpoint(true)
  }

  def nbQualityScores(docs: DataFrame): DataFrame = {
    val cnt = nbCounts(docs)
    val model = cnt.groupBy("b").agg(
      sum(when(col("__pos"), col("__k")).otherwise(0L)).as("__cp"),
      sum(when(!col("__pos"), col("__k")).otherwise(0L)).as("__cn"))
    val tot = model.agg(
      sum(col("__cp")).as("__tp"), sum(col("__cn")).as("__tn"))
    val prior = cnt.select(col("doc_id"), col("__pos")).distinct()
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("__np"),
        sum(when(!col("__pos"), 1L).otherwise(0L)).as("__nn"))
    cnt.join(broadcast(model), "b")
      .groupBy(col("doc_id"), col("__pos"))
      .agg(sum(col("__k")).as("n_grams"),
        sum(col("__k") * (llog2(col("__cp")) - llog2(col("__cn")))).as("__mw"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(prior))
      .select(col("doc_id"), col("__pos").as("label"), col("n_grams"),
        (col("__mw")
          + col("n_grams") * (llog2(col("__tn")) - llog2(col("__tp")))
          + (llog2(col("__np")) - llog2(col("__nn")))).as("score"))
      .withColumn("pred", col("score") >= 0)
      .withColumn("agree", col("pred") === col("label"))
  }

  /** Driver-side twin of [[llog2]] for rendering trained totals as
    * literals: floor(log2(x+1)) as the bit length of x+1. */
  private def llog2L(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x + 1)

  /** The trained NB classifier as a bounded driver artifact: per-bucket
    * (positive, negative) gram-instance counts — ≤ [[NbBuckets]] entries
    * at ANY corpus size — plus class totals and doc priors. The
    * broadcastable form of [[nbQualityScores]]' training stage (the
    * [[bigramLmMaps]] pattern); [[nbQualityCol]] binds it for map-only
    * scoring, which is also the SQL face `nb_quality(text)`. */
  final case class NbModel(buckets: Map[Long, (Long, Long)],
                           tp: Long, tn: Long, np: Long, nn: Long)

  /** Train the NB model once per corpus snapshot (bounded collect:
    * NbBuckets rows + one 1-row prior aggregate). The per-(doc, bucket,
    * label) pre-aggregate materializes ONCE (localCheckpoint — the
    * [[nbQualityScores]] discipline): buckets and priors are two
    * consumers Catalyst cannot unify, and without it each action
    * re-runs the full tokenize+hash+explode lineage over the corpus. */
  def nbModelOf(docs: DataFrame): NbModel = {
    val cnt = nbCounts(docs)
    try {
      val buckets = cnt.groupBy("b").agg(
        sum(when(col("__pos"), col("__k")).otherwise(0L)).as("cp"),
        sum(when(!col("__pos"), col("__k")).otherwise(0L)).as("cn"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val pr = cnt.select("doc_id", "__pos").distinct()
        .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("np"),
          sum(when(!col("__pos"), 1L).otherwise(0L)).as("nn")).head()
      def g(i: Int): Long = if (pr.isNullAt(i)) 0L else pr.getLong(i)
      NbModel(buckets,
        buckets.valuesIterator.map(_._1).sum, buckets.valuesIterator.map(_._2).sum,
        g(0), g(1))
    } finally
      // unlike nbQualityScores (whose returned frame still references
      // the checkpoint), the model is fully extracted here — free the
      // corpus-proportional blocks NOW, not at the next GC
      DedupOps.freeCheckpoint(cnt)
  }

  /** Map-only NB scoring with the trained model bound as ONE dense
    * ARRAY literal: `(label, n_grams, score, pred, agree)` exactly as
    * [[nbQualityScores]] computes them, but with NO aggregation or
    * join — the per-gram sum rides the `aggregate` higher-order
    * function (integer adds, so any order matches the grouped sums).
    * This is the SQL surface's `nb_quality(text)`; a bucket absent
    * from the model scores llog2(0) = 0 on both classes (the behavior
    * novel text gets — the training corpus itself always hits).
    *
    * r15 (the p82 sf0.1-drift root cause, VERDICT r14 note 3): the
    * model used to bind as a MAP literal, and `element_at` on an
    * ArrayBasedMapData literal is a LINEAR key scan over all
    * [[NbBuckets]] entries PER GRAM — measured 8.8 s at the 10×
    * corpus. The bucket space is dense 0..255 by construction, so the
    * per-bucket weight llog2(cp)−llog2(cn) precomputes into one
    * 256-slot array literal and `element_at` becomes O(1) positional
    * access (1.x s at the same corpus, identical integers). */
  def nbQualityCol(text: Column, model: NbModel): Column = {
    val wArr = Array.tabulate(NbBuckets.toInt) { b =>
      val (cp, cn) = model.buckets.getOrElse(b.toLong, (0L, 0L))
      llog2L(cp) - llog2L(cn)
    }
    val mL = typedlit(wArr.toSeq)
    val w = TextOps.tokens(text)
    val grams = concat(w, TextExprs.ngrams(w, 2))
    val nGrams = size(grams).cast("long")
    val label = TextOps.qualityScore(text) >= NbSeedTau
    val mw = aggregate(
      transform(grams, g =>
        element_at(mL, (nbBucket(g) + lit(1L)).cast("int"))),
      lit(0L), (acc, e) => acc + e)
    val score = mw +
      nGrams * lit(llog2L(model.tn) - llog2L(model.tp)) +
      lit(llog2L(model.np) - llog2L(model.nn))
    val pred = score >= 0
    struct(label.as("label"), nGrams.as("n_grams"), score.as("score"),
      pred.as("pred"), (pred === label).as("agree"))
  }

  // ---- CCNet-style bigram-LM perplexity gate ----

  /** Feature space for the bigram LM: contexts and bigrams hash into
    * this many buckets (CCNet — Wenzek et al., "CCNet: Extracting High
    * Quality Monolingual Datasets from Web Crawl Data", LREC 2020 —
    * trains a KenLM on a curated reference and buckets the crawl into
    * head/middle/tail by per-language perplexity percentile; here the
    * LM is a hashed bigram model with quantized-bit logs so every score
    * replays exactly in the oracle, and a real KenLM would drop into
    * the same dataflow). Larger than NbBuckets because bigram contexts
    * collide more destructively than bag-of-grams features. */
  val PplBuckets = 4096L

  /** Stable LM bucket (md5, 24 bits, always positive). */
  def pplBucket(g: Column): Column =
    TextOps.md5Slice(g, 1, 6) % PplBuckets

  /** Train a hashed bigram LM on the heuristic-quality seed slice (the
    * CCNet shape: LM learns the clean reference, scores the raw crawl)
    * and bucket every document into per-language perplexity terciles:
    * `doc_id, lang, n_big, qsum, bpt_milli, tercile, keep`.
    *
    * Per token position (context `<s>` at the start), add-one smoothing
    * over the bucket space — the denominator carries the +V mass, so an
    * UNSEEN bigram costs ≈ log2 V bits instead of reading as free:
    *   qlp_i = llog2 c(ctx_i,w_i) − bits(c(ctx_i) + V)   [quantized bits]
    * qsum = Σ qlp_i; bits-per-token (millibit, integer floor division)
    *   bpt_milli = 1000·max(−qsum, 0) DIV n
    * — hash collisions can make a bucket's bigram count exceed its
    * context count, so the clamp keeps the scale non-negative. CCNet's
    * head/middle/tail is the per-LANGUAGE perplexity tercile: ntile(3)
    * over (bpt_milli, doc_id) within each lang — exact, deterministic,
    * and identical ntile semantics in both engines. keep = head+middle
    * (CCNet discards the tail).
    *
    * Scale shape (the p44/p47 dataflow): token instances pre-aggregate
    * to per-(doc, ctx-bucket, bigram-bucket) counts, materialized once;
    * the two model tables (≤ PplBuckets rows each) BROADCAST back for
    * map-side scoring; the corpus never shuffles to be scored. The
    * tercile split is one window per language — at 100 TB you'd cut on
    * sampled percentile thresholds instead; the gate semantics (keep
    * the best ⅔ per language) are unchanged. Docs with no tokens keep
    * n_big = 0, score 0, and rank into the head by doc_id order. */
  def bigramPerplexity(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = TextOps.tokens(col("text"))
    val padded = concat(array(lit("<s>")), w)
    val inst = docs
      .select(col("doc_id"),
        (TextOps.qualityScore(col("text")) >= NbSeedTau).as("__seed"),
        slice(padded, lit(1), size(w)).as("__ctx"),
        TextExprs.ngrams(padded, 2).as("__big"))
      .select(col("doc_id"), col("__seed"),
        explode(arrays_zip(col("__ctx"), col("__big"))).as("__z"))
      .select(col("doc_id"), col("__seed"),
        pplBucket(col("__z")("__ctx")).as("b1"),
        pplBucket(col("__z")("__big")).as("b12"))
    val cnt = inst.groupBy("doc_id", "__seed", "b1", "b12")
      .agg(count(lit(1)).as("__k"))
      .localCheckpoint(true)
    val m12 = cnt.filter(col("__seed")).groupBy("b12")
      .agg(sum(col("__k")).as("__c12"))
    val m1 = cnt.filter(col("__seed")).groupBy("b1")
      .agg(sum(col("__k")).as("__c1"))
    val per = cnt
      .join(broadcast(m12), Seq("b12"), "left")
      .join(broadcast(m1), Seq("b1"), "left")
      .na.fill(0L, Seq("__c12", "__c1"))
      .groupBy("doc_id")
      // llog2(x) = bits(x+1), so the +V denominator passes x = c1+V−1
      .agg(sum(col("__k")).as("n_big"),
        sum(col("__k") * (llog2(col("__c12"))
          - llog2(col("__c1") + lit(PplBuckets - 1)))).as("qsum"))
    val scored = docs.select(col("doc_id"), col("lang"))
      .join(per, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_big", "qsum"))
      .withColumn("bpt_milli",
        expr("(1000 * greatest(-qsum, 0L)) DIV greatest(n_big, 1L)"))
    val terc = Window.partitionBy(col("lang"))
      .orderBy(col("bpt_milli"), col("doc_id"))
    scored.withColumn("tercile", ntile(3).over(terc))
      .withColumn("keep", col("tercile") <= 2)
  }

  /** The trained hashed-bigram LM as two driver-side bucket→count maps
    * — the broadcastable artifact of bigramPerplexity's training stage
    * (≤ PplBuckets entries each at ANY corpus size, so collecting is
    * bounded by design, like the PQ codebooks). Train once per corpus
    * snapshot; [[graft.streaming.StreamOps.pplGateStream]] binds the
    * maps for map-only scoring of an unbounded arrival stream. */
  def bigramLmMaps(docs: DataFrame): (Map[Long, Long], Map[Long, Long]) = {
    val w = TextOps.tokens(col("text"))
    val padded = concat(array(lit("<s>")), w)
    val inst = docs
      .filter(TextOps.qualityScore(col("text")) >= NbSeedTau)
      .select(slice(padded, lit(1), size(w)).as("__ctx"),
        TextExprs.ngrams(padded, 2).as("__big"))
      .select(explode(arrays_zip(col("__ctx"), col("__big"))).as("__z"))
      .select(pplBucket(col("__z")("__ctx")).as("b1"),
        pplBucket(col("__z")("__big")).as("b12"))
    // ONE corpus pass (review r10): the two collect() actions each
    // re-ran the full tokenize+hash+explode lineage (exchange reuse
    // does not span actions). The (b1, b12) pair pre-aggregate is
    // bigramPerplexity's cnt shape — bounded by PplBuckets² (4096²)
    // worst-case and by distinct observed bigrams in practice — and
    // both maps marginalize from it after one materialization.
    val cnt = inst.groupBy("b1", "b12").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    def toMap(df: DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    try (toMap(cnt.groupBy("b12").agg(sum(col("c")).as("c"))),
      toMap(cnt.groupBy("b1").agg(sum(col("c")).as("c"))))
    finally DedupOps.freeCheckpoint(cnt)
  }

  /** The per-doc LM bits as ONE struct column `(n_big, qsum,
    * bpt_milli)`, trained maps bound as map literals — no aggregation,
    * no join; the per-position sum rides `aggregate` over a `zip_with`
    * of (context, bigram) terms (integer adds, so any order matches
    * bigramPerplexity's grouped sums; a missing bucket scores
    * llog2(0) = 0, its na.fill path). This single expression is BOTH
    * the streaming scorer's core ([[pplScore]]) and the SQL surface's
    * `ppl_bits(text)` — one spelling, so the faces cannot drift. */
  def pplBitsCol(text: Column, m12: Map[Long, Long],
                 m1: Map[Long, Long]): Column = {
    val m12L = typedlit(m12)
    val m1L = typedlit(m1)
    val w = TextOps.tokens(text)
    val padded = concat(array(lit("<s>")), w)
    val ctx = slice(padded, lit(1), size(w))
    val big = TextExprs.ngrams(padded, 2)
    val nBig = size(big).cast("long")
    val qsum = aggregate(
      zip_with(ctx, big, (c, g) =>
        llog2(coalesce(element_at(m12L, pplBucket(g)), lit(0L)))
          - llog2(coalesce(element_at(m1L, pplBucket(c)), lit(0L))
            + lit(PplBuckets - 1))),
      lit(0L), (acc, t) => acc + t)
    // exact integer DIV (the shared bpt_milli spelling) on inline
    // columns — IntegralDivide directly, since expr() needs names
    val bpt = graft.functions.TextExprs.divL(
      lit(1000L) * greatest(-qsum, lit(0L)), greatest(nBig, lit(1L)))
    struct(nBig.as("n_big"), qsum.as("qsum"), bpt.as("bpt_milli"))
  }

  /** Map-only LM scoring with the trained maps bound as ONE map literal
    * each: per-doc `n_big, qsum, bpt_milli` exactly as bigramPerplexity
    * computes them, but with NO aggregation — the form a streaming
    * frame can run statelessly (one [[pplBitsCol]] struct, unpacked). */
  def pplScore(docs: DataFrame, m12: Map[Long, Long],
               m1: Map[Long, Long]): DataFrame =
    docs
      .withColumn("__p", pplBitsCol(col("text"), m12, m1))
      .withColumn("n_big", col("__p")("n_big"))
      .withColumn("qsum", col("__p")("qsum"))
      .withColumn("bpt_milli", col("__p")("bpt_milli"))
      .drop("__p")

  /** The FULL p55 gate from the trained maps (r16 optimization, guide
    * §2.3/§2.4 — the p52/p61/p65 move): map-only [[pplScore]] + the
    * per-language ntile cut = [[bigramPerplexity]]'s exact output
    * without its corpus-sized (doc, b1, b12) pre-aggregate + eager
    * checkpoint, two model joins, per-doc rollup and doc rejoin — the
    * corpus is scanned once and shuffles only for the lang window. The
    * coalesces replay the batch spelling's `na.fill(0)` row for a doc
    * whose token array is NULL (scalar scoring yields NULL there, the
    * batch explode yields no rows); spec-pinned ≡ the batch spelling
    * on the full 7-column output including that edge (ModelOpsSpec
    * "pplGate == bigramPerplexity"). */
  def pplGate(docs: DataFrame, m12: Map[Long, Long],
              m1: Map[Long, Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terc = Window.partitionBy(col("lang"))
      .orderBy(col("bpt_milli"), col("doc_id"))
    pplScore(docs, m12, m1)
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_big"), lit(0L)).as("n_big"),
        coalesce(col("qsum"), lit(0L)).as("qsum"),
        coalesce(col("bpt_milli"), lit(0L)).as("bpt_milli"))
      .withColumn("tercile", ntile(3).over(terc))
      .withColumn("keep", col("tercile") <= 2)
  }

  /** DuckDB oracle for bigramPerplexity (same buckets, same quantized
    * logs, same seed gate, same ntile cut). */
  def bigramPerplexitySql(table: String = "documents"): String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang,
       |    ${TextOps.qualityScoreSql("text")} >= $NbSeedTau AS seed,
       |    list_prepend('<s>',
       |      string_split_regex(trim(lower(text)), '\\s+')) AS p
       |  FROM $table),
       |inst AS (
       |  SELECT doc_id, seed,
       |    unnest(list_transform(range(1, len(p)), i -> p[i])) AS cx,
       |    unnest(list_transform(range(1, len(p)), i -> p[i]||' '||p[i+1])) AS g
       |  FROM toks),
       |bk AS (
       |  SELECT doc_id, seed,
       |    (('0x'||substr(md5(cx),1,6))::UBIGINT)::BIGINT % $PplBuckets AS b1,
       |    (('0x'||substr(md5(g),1,6))::UBIGINT)::BIGINT % $PplBuckets AS b12
       |  FROM inst),
       |cnt AS (
       |  SELECT doc_id, seed, b1, b12, count(*) AS k
       |  FROM bk GROUP BY ALL),
       |m12 AS (
       |  SELECT b12, CAST(sum(k) AS BIGINT) AS c12 FROM cnt
       |  WHERE seed GROUP BY b12),
       |m1 AS (
       |  SELECT b1, CAST(sum(k) AS BIGINT) AS c1 FROM cnt
       |  WHERE seed GROUP BY b1),
       |per AS (
       |  SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_big,
       |    CAST(sum(k * ((length(bin(COALESCE(c12, 0) + 1)) - 1)
       |               - (length(bin(COALESCE(c1, 0) + $PplBuckets)) - 1)))
       |      AS BIGINT) AS qsum
       |  FROM cnt LEFT JOIN m12 USING (b12) LEFT JOIN m1 USING (b1)
       |  GROUP BY doc_id),
       |scored AS (
       |  SELECT d.doc_id, d.lang,
       |    COALESCE(p.n_big, 0) AS n_big, COALESCE(p.qsum, 0) AS qsum,
       |    (1000 * greatest(-COALESCE(p.qsum, 0), 0))
       |      // greatest(COALESCE(p.n_big, 0), 1) AS bpt_milli
       |  FROM $table d LEFT JOIN per p USING (doc_id))
       |SELECT doc_id, lang, n_big, qsum, bpt_milli, tercile, tercile <= 2 AS keep
       |FROM (
       |  SELECT *, ntile(3) OVER (PARTITION BY lang
       |    ORDER BY bpt_milli, doc_id) AS tercile
       |  FROM scored) t
       |ORDER BY doc_id""".stripMargin

  /** Isotonic regression by pool-adjacent-violators (Ayer et al. 1955;
    * Barlow et al. 1972) — the standard way to CALIBRATE a classifier's
    * raw scores into empirical probabilities (Zadrozny & Elkan 2002,
    * KDD): fit the least-squares monotone step function from score
    * buckets to observed positive rate, so `cal(score)` reads as
    * P(label | score) and thresholds/mixture weights built on it mean
    * what they say.
    *
    * Exact integer arithmetic end to end: inputs are per-bucket
    * (bucket, n, nPos) counts sorted by bucket; a violation
    * (meanPrev > meanNext) is detected by BigInt cross-multiplication
    * (no floating point, no overflow at any corpus size) and pooled
    * blocks keep exact (Σn, ΣnPos). The fitted value per bucket is the
    * block mean in ppm, floor(nPos · 10⁶ / n) — deterministic and
    * oracle-replayable. The driver-side cost is O(buckets): callers
    * bucket scores into a BOUNDED domain first (p101 uses ≤129
    * buckets), so the fit is a constant-size artifact at any corpus
    * size — the nbModelFor pattern.
    */
  def isotonicPava(rows: Seq[(Long, Long, Long)]): Seq[(Long, Long)] = {
    final case class Block(buckets: List[Long], w: Long, pos: Long)
    val st = scala.collection.mutable.ArrayBuffer.empty[Block]
    rows.sortBy(_._1).foreach { case (b, n, p) =>
      require(n > 0 && p >= 0 && p <= n, s"bad bucket counts ($b, $n, $p)")
      var blk = Block(List(b), n, p)
      while (st.nonEmpty &&
        BigInt(st.last.pos) * blk.w > BigInt(blk.pos) * st.last.w) {
        val prev = st.remove(st.size - 1)
        blk = Block(prev.buckets ::: blk.buckets, prev.w + blk.w, prev.pos + blk.pos)
      }
      st += blk
    }
    // pos · 10⁶ stays inside a Long up to ~9.2e12 docs per bucket —
    // far past any real shard; the comparison path above is BigInt so
    // the pooling itself has no bound at all
    st.toSeq.flatMap(b => b.buckets.map(k => k -> b.pos * 1000000L / b.w))
  }

  /** Shared oracle core: DuckDB re-derives the whole NB train + score
    * from the raw table, ending at `fin(doc_id, label, n_grams, score)`
    * — used by p47's oracle and (r15 late) p101's calibration oracle,
    * factored so the two cannot drift apart. */
  private def nbFinCoreSql(table: String): String =
    s"""toks AS (
       |  SELECT doc_id, ${TextOps.qualityScoreSql("text")} >= $NbSeedTau AS pos,
       |    string_split_regex(trim(lower(text)), '\\s+') w FROM $table),
       |gr AS (
       |  SELECT doc_id, pos, unnest(w || list_transform(
       |    range(1, greatest(len(w), 1)), i -> w[i]||' '||w[i+1])) g
       |  FROM toks),
       |inst AS (
       |  SELECT doc_id, pos,
       |    (('0x'||substr(md5(g),1,6))::UBIGINT)::BIGINT % $NbBuckets AS b
       |  FROM gr),
       |model AS (
       |  SELECT b, count(*) FILTER (WHERE pos) AS cp,
       |    count(*) FILTER (WHERE NOT pos) AS cn
       |  FROM inst GROUP BY b),
       |tot AS (
       |  SELECT CAST(sum(cp) AS BIGINT) tp, CAST(sum(cn) AS BIGINT) tn
       |  FROM model),
       |prior AS (
       |  SELECT count(DISTINCT doc_id) FILTER (WHERE pos) AS np,
       |    count(DISTINCT doc_id) FILTER (WHERE NOT pos) AS nn
       |  FROM inst),
       |per AS (
       |  SELECT doc_id, pos, count(*) AS n_grams,
       |    CAST(sum((length(bin(cp + 1)) - 1)
       |           - (length(bin(cn + 1)) - 1)) AS BIGINT) AS mw
       |  FROM inst JOIN model USING (b) GROUP BY doc_id, pos),
       |fin AS (
       |  SELECT doc_id, pos AS label, n_grams,
       |    mw + n_grams * ((length(bin(tn + 1)) - 1)
       |                  - (length(bin(tp + 1)) - 1))
       |       + ((length(bin(np + 1)) - 1)
       |        - (length(bin(nn + 1)) - 1)) AS score
       |  FROM per, tot, prior)""".stripMargin

  /** DuckDB oracle for nbQualityScores (same buckets, same quantized
    * logs, same smoothing, same seed gate). */
  def nbQualitySql(table: String = "documents"): String =
    s"""WITH ${nbFinCoreSql(table)}
       |SELECT doc_id, label, n_grams, score,
       |  score >= 0 AS pred, (score >= 0) = label AS agree
       |FROM fin ORDER BY doc_id""".stripMargin

  /** Score-bucket quantization for p101: floor(16 · score / n_grams) —
    * the PER-GRAM log-odds in sixteenths, the length-invariant quantity
    * (the raw score scales with document length, so bucketing it
    * directly collapses every long doc into the clamp rails; whole
    * per-gram units are too coarse — the observed per-gram range is
    * within ±a few units) — clamped to ±clamp. A BOUNDED bucket domain
    * (≤ 2·clamp + 1 = 129) at any corpus size, so the PAVA fit stays a
    * constant-size driver artifact. Both engines compute the same IEEE
    * arithmetic: 16·score is exact below 2⁴⁹, one double division, one
    * floor. */
  val IsoBucketScale = 16
  val IsoBucketClamp = 64L

  /** p101's oracle: DuckDB re-derives the per-bucket (n, n_pos) counts
    * from the raw table through the SAME re-derived NB core as p47 —
    * fully independently of Spark — and joins the driver-fitted PAVA
    * step function carried as rendered VALUES (the trained-artifact
    * pattern: the fit is a deterministic pure function of the counts,
    * pinned separately in ModelOpsSpec). Any per-row disagreement in
    * scoring, bucketing, counting or fit application breaks the match. */
  def isotonicCalSql(fit: Seq[(Long, Long)],
                     table: String = "documents"): String = {
    // a degenerate corpus (zero rows / all-null text) fits an EMPTY
    // step — `VALUES` with no tuples is a parse error, so render one
    // impossible-bucket row instead: the inner join keeps the result
    // empty-to-empty rather than crashing the gate (review r15 late)
    val values =
      if (fit.isEmpty) s"(${IsoBucketClamp + 1}, -1)"
      else fit.map { case (b, c) => s"($b, $c)" }.mkString(", ")
    s"""WITH ${nbFinCoreSql(table)},
       |bkt AS (
       |  SELECT least(greatest(
       |    CAST(floor(CAST($IsoBucketScale * score AS DOUBLE)
       |      / CAST(n_grams AS DOUBLE)) AS BIGINT),
       |    -$IsoBucketClamp), $IsoBucketClamp) AS bucket, label
       |  FROM fin),
       |agg AS (
       |  SELECT bucket, count(*) AS n,
       |    count(*) FILTER (WHERE label) AS n_pos
       |  FROM bkt GROUP BY bucket),
       |fit(bucket, cal_ppm) AS (VALUES $values)
       |SELECT bucket, n, n_pos, cal_ppm
       |FROM agg JOIN fit USING (bucket) ORDER BY bucket""".stripMargin
  }
}
