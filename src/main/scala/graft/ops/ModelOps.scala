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
    conv(substring(md5(g), 1, 6), 16, 10).cast("long") % NbBuckets

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
  def nbQualityScores(docs: DataFrame): DataFrame = {
    val w = col("__w")
    val cnt = docs
      .select(col("doc_id"),
        (TextOps.qualityScore(col("text")) >= NbSeedTau).as("__pos"),
        TextOps.tokens(col("text")).as("__w"))
      .select(col("doc_id"), col("__pos"),
        explode(concat(w, TextExprs.ngrams(w, 2))).as("__g"))
      .select(col("doc_id"), col("__pos"), nbBucket(col("__g")).as("b"))
      .groupBy("doc_id", "b", "__pos")
      .agg(count(lit(1)).as("__k"))
      .localCheckpoint(true)
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

  /** DuckDB oracle for nbQualityScores (same buckets, same quantized
    * logs, same smoothing, same seed gate). */
  def nbQualitySql(table: String = "documents"): String =
    s"""WITH toks AS (
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
       |  FROM per, tot, prior)
       |SELECT doc_id, label, n_grams, score,
       |  score >= 0 AS pred, (score >= 0) = label AS agree
       |FROM fin ORDER BY doc_id""".stripMargin
}
