package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash sampling — reproducible corpus subsetting and
  * source-weighted mixing for training-data pipelines. Unlike
  * `df.sample()` (seeded per-partition RNG: resplitting the input
  * changes the sample), the keep decision is a pure function of the KEY,
  * so the same document is kept or dropped no matter how the data is
  * partitioned, re-ingested, or re-run — and membership is auditable
  * after the fact.
  *
  * The bucket hash is md5-derived (same trick as [[DedupOps]] SimHash):
  * md5 is the one hash Spark and DuckDB compute bit-identically, which
  * makes sampling decisions oracle-checkable. Map-only — zero shuffle.
  */
object SampleOps {
  val SampleBuckets = 1000L

  /** Stable bucket in [0, SampleBuckets) from a key column. */
  def hashBucket(key: Column): Column =
    TextOps.md5Slice(key.cast("string"), 1, 15) % SampleBuckets

  /** Reproducible `rate` sample: keep iff the key's bucket falls below
    * rate·buckets (rate granularity 1/SampleBuckets). */
  def sampleByHash(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.filter(hashBucket(key) < math.round(rate * SampleBuckets))

  /** DuckDB rendering of `hashBucket` for the oracle. */
  def bucketSql(keyExpr: String): String =
    s"(('0x'||substr(md5(CAST($keyExpr AS VARCHAR)),1,15))::UBIGINT)::BIGINT % $SampleBuckets"

  /** Exact-N-per-stratum sampling: the first `n` keys of each stratum in
    * md5 order — a fixed QUOTA per group (vs sampleByHash's fixed RATE),
    * the "exactly 10 k docs per language" training-mix shape. Hash order
    * makes the quota winners a pure function of the data (partitioning/
    * re-run invariant, auditable), unlike any RNG-based pick.
    *
    * Plan: one shuffle on the stratum key; `row_number() <= n` compiles
    * to WindowGroupLimit, which keeps only the running top-n PER
    * PARTITION before and after the exchange — per-task state is O(n),
    * not O(stratum), so a popular stratum costs its scan, not its
    * memory. */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
                       n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(stratum).orderBy(md5(key.cast("string")), key)
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= n)
  }

  /** DuckDB oracle fragment: same md5-order row_number per stratum. */
  def stratifiedRankSql(stratumExpr: String, keyExpr: String): String =
    s"""row_number() OVER (PARTITION BY $stratumExpr
       |    ORDER BY md5(CAST($keyExpr AS VARCHAR)), $keyExpr)""".stripMargin

  /** Temperature-weighted source mixing (α = 1/2): resample the corpus
    * so over-represented sources shrink toward weights w_s ∝ √n_s — the
    * DoReMi/data-mixture reweighting step of a pre-training pipeline.
    * Per-source keep rate r_s = min(1, targetFrac·N·w_s / (Z·n_s)) with
    * Z = Σw_s, applied via the same md5 bucket gate as sampleByHash, so
    * membership is a pure function of the key (partition/re-run
    * invariant) and the whole decision replays in the oracle.
    *
    * Exactness across engines: w_s = floor(√n_s) — IEEE sqrt and floor
    * are correctly-rounded in BOTH engines, so w_s and the integer sum
    * Z are order-independent exact; the rate is then a fixed left-
    * associated chain of double ops on exact integers, identical in
    * both renderings. No float aggregate whose order could drift.
    *
    * Scale shape: per-source counts are a dimension-sized aggregate
    * that BROADCASTS back onto the corpus — the corpus itself never
    * shuffles; the gate is map-side. */
  def temperatureMix(df: DataFrame, source: Column, key: Column,
                     targetFrac: Double): DataFrame = {
    val counts = df.groupBy(source.as("__src")).agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(sqrt(col("__n"))).cast("long"))
    val tot = counts.agg(sum(col("__n")).as("__bigN"), sum(col("__w")).as("__z"))
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("__rate", least(lit(1.0),
        lit(targetFrac) * col("__bigN") * col("__w") / col("__z") / col("__n")))
      .select(col("__src"), col("__rate"))
    df.join(broadcast(rates), source === col("__src"))
      .filter(hashBucket(key) < floor(col("__rate") * SampleBuckets))
      .drop("__src", "__rate")
  }

  /** DuckDB oracle for temperatureMix over `table` keyed on `keyExpr`,
    * returning the kept rows' (sourceExpr, keyExpr) subquery body. */
  def temperatureMixSql(targetFrac: Double, sourceCol: String,
                        keyExpr: String, table: String): String =
    s"""WITH c AS (
       |  SELECT $sourceCol AS __src, count(*) AS __n,
       |    CAST(floor(sqrt(count(*))) AS BIGINT) AS __w
       |  FROM $table GROUP BY 1)
       |SELECT d.* FROM $table d JOIN (
       |  SELECT __src, least(1.0,
       |    CAST($targetFrac AS DOUBLE) * __bigN * __w / __z / __n) AS __rate
       |  FROM c,
       |       (SELECT CAST(sum(__n) AS BIGINT) AS __bigN,
       |               CAST(sum(__w) AS BIGINT) AS __z FROM c) t
       |) r ON d.$sourceCol = r.__src
       |WHERE ${bucketSql(keyExpr)} < CAST(floor(__rate * $SampleBuckets) AS BIGINT)""".stripMargin

  // ---- length-curriculum binning ----

  /** Curriculum bins by document length: split the corpus into `nBins`
    * quantile bins of token count (short → long, the length-curriculum /
    * bucketed-batching prep step) and report per-bin volume + quality.
    *
    * Boundaries are TYPE-1 (no-interpolation) quantiles — b_k = the
    * smallest length v with count(len ≤ v) · nBins ≥ k · N — computed
    * from a length HISTOGRAM, not a corpus sort: token lengths live in a
    * bounded value domain (≤ context size), so the groupBy is a
    * bounded-key shuffle, the cumulative window runs over the DOMAIN
    * (≤10⁵ rows at any corpus size), and the boundary row broadcasts.
    * Bin assignment is then a map-side comparison — the corpus never
    * shuffles for its bin, and every step is integer arithmetic, so the
    * whole decision replays exactly in SQL (no interpolated-percentile
    * FP drift can flip a bin).
    *
    * Per-bin medians use the exact mergeable percentile (p39's path);
    * at 100 TB swap `quantileExact` → `quantile` (fixed-size sketch)
    * in the same query. */
  /** Per-document length-decile assignment `(doc_id, n_tok, __q, bin)`
    * — the shared core of [[lengthCurriculum]] (which summarizes it per
    * bin) and the curriculum manifest p68 (which orders training by
    * it). Same integer histogram-quantile boundaries, broadcast back
    * for a map-side comparison; the corpus never shuffles for its bin. */
  def docBins(docs: DataFrame, nBins: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBins >= 2, s"docBins needs nBins >= 2, got $nBins")
    val sized = docs.select(col("doc_id"),
      TextOps.tokenCount(col("text")).cast("long").as("n_tok"),
      TextOps.qualityScore(col("text")).as("__q"))
    val hist = sized.groupBy("n_tok").agg(count(lit(1)).as("__c"))
    // domain-sized window (distinct lengths), not a corpus sort
    val cum = hist.withColumn("__cum",
      sum(col("__c")).over(Window.orderBy("n_tok")))
    val boundCols = (1 until nBins).map(k =>
      min(when(col("__cum") * nBins >= col("__n") * k, col("n_tok")))
        .as(s"__b$k"))
    // total from the domain-sized hist (its exchange is reused), NOT a
    // third corpus scan — sized already has two consumers
    val bounds = cum.crossJoin(broadcast(hist.agg(sum(col("__c")).as("__n"))))
      .agg(boundCols.head, boundCols.tail: _*)
    val bin = (1 until nBins).map(k =>
      when(col("n_tok") > col(s"__b$k"), 1).otherwise(0)).reduce(_ + _) + lit(1)
    sized.crossJoin(broadcast(bounds))
      .select(col("doc_id"), col("n_tok"), col("__q"), bin.as("bin"))
  }

  def lengthCurriculum(docs: DataFrame, nBins: Int = 10): DataFrame = {
    docBins(docs, nBins)
      .select(col("n_tok"), col("__q"), col("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        min(col("n_tok")).as("min_tok"), max(col("n_tok")).as("max_tok"),
        // built-in percentile, not the graft quantileExact shim — same
        // exact interpolated Percentile expression, but this op must work
        // on a stock session without registerAll
        round(percentile(col("__q"), lit(0.5)), 4).as("med_q"))
  }

  // ---- DSIR importance resampling (Xie et al., NeurIPS 2023: "Data
  //      Selection for Language Models via Importance Resampling") ----

  /** Hashed n-gram feature space size (the paper hashes uni+bigrams into
    * a fixed bucket count; 10k there, 512 here — the corpus is smaller). */
  val DsirBuckets = 512L

  /** Target-domain tag: select raw text that "looks like" English docs. */
  val DsirTargetLang = "en"

  /** Quantized log2: floor(log2(c+1)) as the BIT LENGTH of c+1 — exact
    * integer arithmetic (Spark `conv(_,10,2)` / DuckDB `bin()`), so the
    * log-ratio sums replay bit-for-bit where a float log-prob sum would
    * drift with partial-aggregation order. Rank fidelity loss vs real
    * log2 is < 1 bit per gram, immaterial for a selection gate. */
  private def llog2(c: Column): Column =
    (length(conv((c + 1).cast("string"), 10, 2)) - 1).cast("long")

  /** Stable feature bucket for a gram (md5 — the shared exact-hash
    * primitive; 6 hex digits = 24 bits, always positive). */
  def dsirBucket(g: Column): Column =
    TextOps.md5Slice(g, 1, 6) % DsirBuckets

  /** DSIR importance scores: per-doc
    * `doc_id, n_grams, logw, score, keep`.
    *
    * The method (hashed n-gram importance resampling): build bag-of-
    * hashed-(uni+bi)gram models of the TARGET domain (`isTarget` rows)
    * and the RAW corpus, then weight each document by
    * `logw(x) = Σ_g [log p_tgt(b_g) − log p_raw(b_g)]` — documents whose
    * feature mass sits in target-heavy buckets score high and are kept
    * for training. Here log ≡ quantized [[llog2]] with +1 smoothing on
    * every count (bucket and total), `score` = logw/n_grams (one IEEE
    * division, rounded 6dp) and `keep` gates on the INTEGER logw ≥ 0,
    * so no FP boundary can flip a decision between engines.
    *
    * Scale shape: gram instances pre-aggregate to per-(doc, bucket)
    * counts FIRST, and that pre-aggregate is MATERIALIZED once
    * (localCheckpoint — the connectedComponents pattern): the model,
    * the totals, and the scoring join are three consumers whose
    * column-pruned subtrees Catalyst cannot unify (measured: three full
    * scan+tokenize+md5 evaluations without it), while the checkpoint
    * is bounded at docs × min(grams, buckets) rows of four longs. The
    * 512-key model then BROADCASTS back for map-side scoring (the
    * corpus never shuffles for its score) and totals ride a 1-row
    * broadcast. A pre-trained target model table drops in by replacing
    * the filtered sum. */
  def dsirScores(docs: DataFrame, isTarget: Column): DataFrame = {
    val w = col("__w")
    val cnt = docs
      .select(col("doc_id"), isTarget.as("__tgt"),
        TextOps.tokens(col("text")).as("__w"))
      .select(col("doc_id"), col("__tgt"),
        explode(concat(w, graft.functions.TextExprs.ngrams(w, 2))).as("__g"))
      .select(col("doc_id"), col("__tgt"), dsirBucket(col("__g")).as("b"))
      .groupBy("doc_id", "b", "__tgt")
      .agg(count(lit(1)).as("__k"))
      .localCheckpoint(true)
    val model = cnt.groupBy("b").agg(
      sum(col("__k")).as("__raw"),
      sum(when(col("__tgt"), col("__k")).otherwise(0L)).as("__tgtc"))
    val tot = model.agg(sum(col("__raw")).as("__bigR"),
      sum(col("__tgtc")).as("__bigT"))
    cnt.join(broadcast(model), "b")
      .groupBy("doc_id")
      .agg(sum(col("__k")).as("n_grams"),
        sum(col("__k") * (llog2(col("__tgtc")) - llog2(col("__raw")))).as("__mw"))
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("n_grams"),
        (col("__mw") + col("n_grams") *
          (llog2(col("__bigR")) - llog2(col("__bigT")))).as("logw"))
      .withColumn("score",
        round(col("logw").cast("double") / col("n_grams"), 6))
      .withColumn("keep", col("logw") >= 0)
  }

  /** DuckDB oracle for dsirScores with `isTarget` = (lang = target)
    * (same buckets, same quantized logs, same smoothing). */
  def dsirSql(target: String = DsirTargetLang,
              table: String = "documents"): String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang = '$target' AS tgt,
       |    string_split_regex(trim(lower(text)), '\\s+') w FROM $table),
       |gr AS (
       |  SELECT doc_id, tgt, unnest(w || list_transform(
       |    range(1, greatest(len(w), 1)), i -> w[i]||' '||w[i+1])) g
       |  FROM toks),
       |inst AS (
       |  SELECT doc_id, tgt,
       |    (('0x'||substr(md5(g),1,6))::UBIGINT)::BIGINT % $DsirBuckets AS b
       |  FROM gr),
       |model AS (
       |  SELECT b, count(*) AS rawc, count(*) FILTER (WHERE tgt) AS tgtc
       |  FROM inst GROUP BY b),
       |tot AS (
       |  SELECT CAST(sum(rawc) AS BIGINT) bigR, CAST(sum(tgtc) AS BIGINT) bigT
       |  FROM model),
       |per AS (
       |  SELECT doc_id, count(*) AS n_grams,
       |    CAST(sum((length(bin(tgtc + 1)) - 1)
       |           - (length(bin(rawc + 1)) - 1)) AS BIGINT) AS mw
       |  FROM inst JOIN model USING (b) GROUP BY doc_id),
       |fin AS (
       |  SELECT doc_id, n_grams,
       |    mw + n_grams * ((length(bin(bigR + 1)) - 1)
       |                  - (length(bin(bigT + 1)) - 1)) AS logw
       |  FROM per, tot)
       |SELECT doc_id, n_grams, logw,
       |  ${OracleSql.roundD("CAST(logw AS DOUBLE) / n_grams", 6)} AS score,
       |  logw >= 0 AS keep
       |FROM fin ORDER BY doc_id""".stripMargin

  // ---- leakage-safe train/val/test split ----

  /** Split boundaries over [[SampleBuckets]]: train < 800, val < 900,
    * test otherwise (80/10/10). */
  val SplitTrainLt = 800L
  val SplitValLt = 900L

  /** Assign train/val/test by the near-dup CLUSTER representative's hash
    * bucket, not the document's own: near-duplicate documents then land
    * in the SAME split by construction, so eval examples can never leak
    * into training as their own near-copies — the failure a naive
    * per-doc hash split invites (train/test contamination via dups is a
    * standard published eval hazard). Input: `(doc_id, cluster_id)` from
    * the p20 clustering; singleton docs are their own cluster.
    *
    * Map-only on top of the clustering (one md5 per row, evaluated in
    * its own projection); membership is a pure function of cluster_id —
    * partitioning/re-run invariant and auditable, like every gate here. */
  def leakageSafeSplit(clustered: DataFrame): DataFrame =
    clustered
      .withColumn("__b", hashBucket(col("cluster_id")))
      .withColumn("split",
        when(col("__b") < SplitTrainLt, "train")
          .when(col("__b") < SplitValLt, "val")
          .otherwise("test"))
      .drop("__b")

  /** DuckDB oracle: p20's recursive-closure clustering feeding the same
    * bucket boundaries. */
  def leakageSafeSplitSql(tau: Double, table: String = "documents"): String =
    s"""WITH clus AS (${DedupOps.clusterSql(tau, table = table)})
       |SELECT doc_id, cluster_id,
       |  CASE WHEN ${bucketSql("cluster_id")} < $SplitTrainLt THEN 'train'
       |       WHEN ${bucketSql("cluster_id")} < $SplitValLt THEN 'val'
       |       ELSE 'test' END AS split
       |FROM clus ORDER BY doc_id""".stripMargin

  /** DuckDB oracle for lengthCurriculum (same histogram boundaries, same
    * integer bin rule, quality/median via the p09/p39 renderings). */
  /** Shared CTE chain ending in `binned(doc_id, n_tok, q, bin)` — used
    * by both the p42 summary and the p68 manifest oracles. */
  private[ops] def docBinsSqlCtes(nBins: Int, table: String): String = {
    val boundCols = (1 until nBins).map(k =>
      s"min(CASE WHEN cum * $nBins >= n * $k THEN n_tok END) AS b$k").mkString(",\n  ")
    val binExpr = (1 until nBins).map(k =>
      s"(CASE WHEN s.n_tok > b.b$k THEN 1 ELSE 0 END)").mkString(" + ")
    s"""sized AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) AS n_tok,
       |    ${TextOps.qualityScoreSql("text")} AS q
       |  FROM $table),
       |hist AS (SELECT n_tok, count(*) AS c FROM sized GROUP BY n_tok),
       |cum AS (SELECT n_tok, sum(c) OVER (ORDER BY n_tok) AS cum FROM hist),
       |tot AS (SELECT sum(c) AS n FROM hist),
       |b AS (SELECT $boundCols FROM cum, tot),
       |binned AS (
       |  SELECT s.doc_id, s.n_tok, s.q, 1 + $binExpr AS bin FROM sized s, b)""".stripMargin
  }

  def lengthCurriculumSql(nBins: Int = 10, table: String = "documents"): String =
    s"""WITH ${docBinsSqlCtes(nBins, table)}
       |SELECT bin, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |  min(n_tok) AS min_tok, max(n_tok) AS max_tok,
       |  ${OracleSql.roundD("quantile_cont(q, 0.5)", 4)} AS med_q
       |FROM binned GROUP BY bin ORDER BY bin""".stripMargin
}
