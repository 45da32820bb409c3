package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental corpus processing: screen a batch of NEW documents
  * against the accumulated corpus state — exact fingerprints plus the
  * MinHash band index — so only genuinely new content flows into the
  * (expensive) pipeline. A 100 TB corpus is never reprocessed from
  * scratch; each ingest round costs the new batch, not the corpus:
  * the same reason every production lakehouse pipeline (Delta/Hudi
  * incremental consumers) is built incremental-first.
  *
  * The near-dup probe is the batch face of the streaming lookup
  * ([[graft.streaming.StreamOps.nearDupStream]]): arrival signatures
  * are map-only column expressions, candidates come from an equi-join
  * of the arrival's 16 band hashes against the static band index, and
  * the exact verify (`array_intersect` Jaccard ≥ tau) touches only
  * band-colliding candidates. No state operator is needed in batch —
  * a `distinct` collapses multi-band collisions.
  *
  * Scale shape: the batch side is small relative to the corpus (that
  * is the point of incremental); the band index is a parquet table
  * keyed by (band, bh), so the candidate join is one hash join whose
  * corpus side never re-shuffles if the index is bucketed/partitioned
  * by band; the shingle verify join carries candidates only.
  */
object IncrementalCorpus {

  /** Drop every new doc that duplicates the seen corpus: exact (md5 in
    * `fps(fp)`) then near (band collision against `bandIndex(corpus_id,
    * band, bh)` verified ≥ tau against `shingles(corpus_id, sh)`).
    * Docs too short to shingle pass the near screen vacuously (they
    * cannot band-collide), exactly like the streaming face. */
  /** Content fingerprint — md5(coalesce(text,'')), the
    * DedupOps.memberMap contract (review r10): raw md5(text) is null
    * for null text, and a null key never joins, so null-text
    * duplicates silently passed the exact screen on both faces (the
    * oracle is updated in lockstep — it had the same null-IN gap). */
  private def fpCol = md5(coalesce(col("text"), lit("")))

  /** New docs whose content fingerprint is NOT in the seen set — the
    * exact screen both faces share (review r10: it existed twice). */
  private def exactSurvivors(newDocs: DataFrame, fps: DataFrame): DataFrame =
    newDocs.withColumn("__fp", fpCol)
      .join(fps.select(col("fp").as("__fp")), Seq("__fp"), "left_anti")
      .drop("__fp")

  /** doc_ids among `cands` with exact Jaccard >= tau against their
    * colliding corpus doc — the ONE verify spelling (review r10). */
  private def nearDupIds(cands: DataFrame, shingles: DataFrame,
                         tau: Double): DataFrame =
    cands.join(shingles, "corpus_id")
      .withColumn("__inter", size(array_intersect(col("__sh"), col("sh"))))
      .filter(col("__inter").cast("double") /
        (size(col("__sh")) + size(col("sh")) - col("__inter")) >= tau)
      .select("doc_id").distinct()

  def screen(newDocs: DataFrame, fps: DataFrame, bandIndex: DataFrame,
             shingles: DataFrame, tau: Double, n: Int = 3): DataFrame = {
    val exactNew = exactSurvivors(newDocs, fps)
    val dupIds = nearDupIds(bandCandidates(exactNew, bandIndex, n), shingles, tau)
    exactNew.join(dupIds, Seq("doc_id"), "left_anti")
  }

  /** Band-colliding (doc_id, corpus_id, __sh) candidate pairs — the LSH
    * probe both screen faces share. The ONE shingle definition
    * (DedupOps.shingleSets) builds the arrival side — screening must
    * never drift from the index it probes; the shingle-hash array is
    * materialized once in its own projection (the nearDupStream
    * discipline). Public so the recall property the oracle relies on
    * (candidates ⊇ true ≥tau pairs at this band config) is ASSERTED in
    * IncrementalCorpusSpec against a brute-force all-pairs sweep, not
    * just assumed. */
  def bandCandidates(newDocs: DataFrame, bandIndex: DataFrame,
                     n: Int = 3): DataFrame = {
    val sh = DedupOps.shingleSets(newDocs, n)
      .withColumnRenamed("sh", "__sh")
      .withColumn("__hs", transform(col("__sh"), s => xxhash64(s)))
      .withColumn("__sig", DedupOps.rowSignature(col("__hs")))
    sh.select(col("doc_id"), col("__sh"),
        posexplode(DedupOps.bandHashes(col("__sig"))).as(Seq("__band", "__bh")))
      .join(bandIndex,
        col("__band") === bandIndex("band") && col("__bh") === bandIndex("bh"))
      .select(col("doc_id"), col("corpus_id"), col("__sh"))
      .distinct()
  }

  /** Distinct content fingerprints of a batch — the exact-dedup face of
    * the state. */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(fpCol.as("fp")).distinct()

  /** [[screen]] with the audit trail kept: every new doc gets a fate —
    * `exact` (content fingerprint already in the corpus), `near` (a
    * band-colliding corpus doc verifies Jaccard ≥ tau), or `kept`. The
    * screening order matches [[screen]]: a doc that is both an exact
    * and a near dup reports `exact` (the near probe only ever sees
    * exact survivors). The fate ledger is what a production dedup run
    * publishes next to the surviving batch — drop rates per dump are a
    * headline corpus-quality metric (every CC-dump pipeline reports
    * them), and disputes about a dropped doc need the reason.
    *
    * Same plan as [[screen]] plus one broadcast-sized join: the fates
    * of drops are dimension-small relative to the batch. */
  def screenReport(newDocs: DataFrame, fps: DataFrame, bandIndex: DataFrame,
                   shingles: DataFrame, tau: Double, n: Int = 3): DataFrame = {
    val exactIds = newDocs.withColumn("__fp", fpCol)
      .join(fps.select(col("fp").as("__fp")), Seq("__fp"), "left_semi")
      .select(col("doc_id"), lit("exact").as("fate"))
    val exactNew = exactSurvivors(newDocs, fps)
    val nearIds =
      nearDupIds(bandCandidates(exactNew, bandIndex, n), shingles, tau)
        .select(col("doc_id"), lit("near").as("fate"))
    val dropped = exactIds.unionByName(nearIds)
    newDocs.select("doc_id")
      .join(dropped, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("fate"), lit("kept")).as("fate"))
  }

  /** DuckDB oracle for [[screenReport]] over a hash-gated seen/new
    * split of `table`: seen = bucket < seenBuckets, new = rest. Exact =
    * md5(text) appears among seen; near = ANY seen doc with classical
    * 3-shingle Jaccard ≥ tau. The oracle computes true ALL-PAIRS
    * Jaccard while the impl only verifies band-colliding candidates —
    * so this differential check leans on band recall being 1 at this
    * tau/band config. That is probabilistic in general, so it is
    * ASSERTED (candidates ⊇ true ≥tau pairs, brute-force sweep) in
    * IncrementalCorpusSpec where it is relied on, not just assumed. */
  def screenReportSql(tau: Double, seenBuckets: Long,
                      table: String = "documents"): String =
    s"""WITH seen AS (
       |  SELECT * FROM $table
       |  WHERE ${SampleOps.bucketSql("doc_id")} < $seenBuckets),
       |newb AS (
       |  SELECT * FROM $table
       |  WHERE ${SampleOps.bucketSql("doc_id")} >= $seenBuckets),
       |exact AS (
       |  SELECT n.doc_id FROM newb n
       |  WHERE md5(coalesce(n.text, '')) IN
       |    (SELECT md5(coalesce(text, '')) FROM seen)),
       |survivors AS (SELECT * FROM newb WHERE doc_id NOT IN (SELECT doc_id FROM exact)),
       |ssh AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(1, greatest(len(w) - 1, 1)), i -> w[i]||' '||w[i+1]||' '||w[i+2])) sh
       |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') w
       |        FROM survivors)
       |  WHERE len(list_distinct(list_transform(
       |    range(1, greatest(len(w) - 1, 1)), i -> w[i]||' '||w[i+1]||' '||w[i+2]))) > 0),
       |csh AS (
       |  SELECT doc_id corpus_id, list_distinct(list_transform(
       |    range(1, greatest(len(w) - 1, 1)), i -> w[i]||' '||w[i+1]||' '||w[i+2])) sh
       |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') w
       |        FROM seen)
       |  WHERE len(list_distinct(list_transform(
       |    range(1, greatest(len(w) - 1, 1)), i -> w[i]||' '||w[i+1]||' '||w[i+2]))) > 0),
       |near AS (
       |  SELECT DISTINCT s.doc_id
       |  FROM ssh s JOIN csh c ON len(list_intersect(s.sh, c.sh)) * 1.0 /
       |    (len(s.sh) + len(c.sh) - len(list_intersect(s.sh, c.sh))) >= $tau)
       |SELECT n.doc_id,
       |  CASE WHEN n.doc_id IN (SELECT doc_id FROM exact) THEN 'exact'
       |       WHEN n.doc_id IN (SELECT doc_id FROM near) THEN 'near'
       |       ELSE 'kept' END AS fate
       |FROM newb n ORDER BY n.doc_id""".stripMargin
}
