package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed corpus-preparation pipeline — the end-to-end dataflow a
  * training-data team actually ships, built from the individual
  * operators:
  *
  *   1. quality gates: repetition metrics (Gopher/C4) AND rare-n-gram
  *      rate, both on the FULL corpus (per-row and corpus-model gates);
  *   2. near-dup clustering over the gated survivors (inverted-index
  *      Jaccard pairs → star-contraction components);
  *   3. canonical-keeper selection: best rounded quality per cluster,
  *      doc_id tie-break;
  *   4. PII redaction of the keepers;
  *   5. overlapping chunking of the scrubbed text (the unit a
  *      downstream embedding/indexing pass consumes).
  *
  * Returns one row per chunk with provenance AND the scrubbed chunk
  * text (what a downstream embedding/indexing pass consumes):
  * `doc_id, cluster_id, quality, start_tok, n_tok, chunk_fp,
  * chunk_text`. Documents too short to produce an n-gram (< RareN
  * tokens) have no rarity evidence and pass that gate vacuously.
  *
  * Scale shape: it inherits each stage's plan — the gates are map-only
  * plus the Zipf-bounded gram model, clustering is the only pair-join
  * and runs on the PRUNED corpus, keeper selection is one cluster-keyed
  * window, redaction+chunking are map-only. No stage widens beyond its
  * standalone form, and the whole pipeline — including the recursive
  * closure and the regex chain — replays in the DuckDB oracle.
  */
object CorpusPipeline {

  def prepare(docs: DataFrame, tau: Double = 0.5): DataFrame =
    finish(gateAndLabel(docs, tau))

  /** Stages 1-2, the ARTIFACT face: gates + near-dup cluster labels over
    * the gated survivors — `doc_id, cluster_id, text, quality`. This is
    * the once-per-corpus-snapshot table (the clusterMapFor/IVF-index
    * pattern): the pair join + connected components are the pipeline's
    * most expensive stages, and every downstream consumer composes on
    * the materialized map instead of re-deriving it. */
  def gateAndLabel(docs: DataFrame, tau: Double = 0.5): DataFrame = {
    val rep = TextOps.repetitionStats(docs)
      .select(col("doc_id"), col("keep").as("__kr"))
    val rare = TextOps.rareNgramStats(docs)
      .select(col("doc_id"), col("keep").as("__kq"))
    // rare gate LEFT-joined: gram-less short docs emit no rare row and
    // must pass vacuously, not silently vanish through an inner join
    // gated feeds TWO consumers (the pair join inside the clustering and
    // the keeper labeling); measured at sf0.1, re-evaluating the gate
    // branch per consumer BEATS materializing it (a localCheckpoint here
    // costs +0.9 s — the gram model's exchanges are already reused by
    // ReuseExchange, so the "duplicate" work is mostly map-side)
    val gated = docs.select("doc_id", "text")
      .join(rep, "doc_id")
      .join(rare, Seq("doc_id"), "left")
      .filter(col("__kr") && coalesce(col("__kq"), lit(true)))
      .select("doc_id", "text")
    DedupOps.clusterLabels(gated, tau,
      Seq(col("text"), TextOps.qualityScore(col("text")).as("quality")))
  }

  /** Stages 3-5 over a (possibly loaded-from-parquet) gate+label table:
    * keeper selection, PII redaction, chunking. */
  def finish(labeled: DataFrame): DataFrame = {
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("quality").desc, col("doc_id"))
    val keepers = labeled
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("doc_id"), col("cluster_id"), col("quality"),
        PiiOps.redact(col("text")).as("text"))
    // cluster_id/quality ride the chunker's map-only explode; a
    // chunks⋈keepers re-join here would reshuffle every chunk row
    TextOps.chunkTexts(keepers, passthrough = Seq("cluster_id", "quality"))
      .select(col("doc_id"), col("cluster_id"), col("quality"),
        col("start_tok"), col("n_tok"), md5(col("text")).as("chunk_fp"),
        col("text").as("chunk_text"))
  }

  /** DuckDB oracle: the same five stages composed from each operator's
    * own SQL rendering (gates as subqueries, the recursive-closure
    * clustering pointed at the gated CTE, the redact chain, the chunk
    * fragment pointed at the scrubbed CTE). */
  def prepareSql(tau: Double = 0.5, table: String = "documents"): String =
    s"""WITH gated AS (
       |  SELECT d.doc_id, d.text FROM $table d
       |  JOIN (${TextOps.repetitionSql(table)}) repk
       |    ON d.doc_id = repk.doc_id AND repk.keep
       |  LEFT JOIN (${TextOps.rareNgramSql(table = table)}) rarek
       |    ON d.doc_id = rarek.doc_id
       |  WHERE coalesce(rarek.keep, true)),
       |clus AS (${DedupOps.clusterSql(tau, table = "gated")}),
       |q AS (SELECT doc_id, ${TextOps.qualityScoreSql("text")} AS quality
       |      FROM gated),
       |ranked AS (
       |  SELECT c.cluster_id, g.doc_id, g.text, q.quality,
       |    row_number() OVER (PARTITION BY c.cluster_id
       |      ORDER BY q.quality DESC, g.doc_id) AS rk
       |  FROM gated g JOIN clus c USING (doc_id) JOIN q USING (doc_id)),
       |scrub AS (
       |  SELECT doc_id, cluster_id, quality,
       |    ${PiiOps.redactSql("text")} AS text
       |  FROM ranked WHERE rk = 1),
       |ch AS (${TextOps.chunkTextsSql(table = "scrub")})
       |SELECT ch.doc_id, s.cluster_id, s.quality, ch.start_tok, ch.n_tok,
       |  md5(ch.text) AS chunk_fp, ch.text AS chunk_text
       |FROM ch JOIN scrub s USING (doc_id)
       |ORDER BY ch.doc_id, ch.start_tok""".stripMargin
}
