package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot DIFF — dataset versioning's core query: given two
  * snapshots of a corpus, the per-document ledger of what changed
  * (added / removed / changed / unchanged, by content hash). Every
  * serious training-data pipeline publishes this between dumps: it is
  * how a data team audits that "v2.1 = v2.0 + March crawl − takedowns"
  * actually holds, and the input to incremental passes (p49/p62 screen
  * exactly the `added ∪ changed` slice).
  *
  * Plan: one md5 per side, FULL OUTER join on doc_id, one CASE — two
  * linear shuffles at any corpus size, no text moves past its hash.
  * Statuses compare CONTENT hashes, so a doc rewritten in place counts
  * `changed` while metadata-only churn stays `unchanged`. */
object DiffOps {

  /** Per-document diff ledger: `doc_id, status` with status ∈
    * {added, removed, changed, unchanged} from old → new. */
  def snapshotDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    // presence must be its OWN indicator, not hash-nullness (review
    // r10): md5(null text) is null, so a null-text doc would read as
    // absent-from-its-own-side — 'removed' reported 'added', and the
    // oracle (which tests doc_id nullness) disagreeing on every
    // null-text row. The hash comparison is null-safe on both sides
    // (<=> here, IS DISTINCT FROM in the oracle): null vs non-null
    // text is 'changed', null vs null is 'unchanged'.
    val a = oldDocs.select(col("doc_id"), md5(col("text")).as("__ha"),
      lit(true).as("__ina"))
    val b = newDocs.select(col("doc_id"), md5(col("text")).as("__hb"),
      lit(true).as("__inb"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("__ina").isNull, "added")
          .when(col("__inb").isNull, "removed")
          .when(!(col("__ha") <=> col("__hb")), "changed")
          .otherwise("unchanged").as("status"))
  }

  // The p66 query diffs two DETERMINISTIC transforms of the documents
  // table (the p31/p41 planted-structure trick — the driver's corpus has
  // no native version axis): snapshot A drops doc_id % 7 == 0 (docs that
  // arrive later) and appends a legacy marker to doc_id % 11 == 0 (docs
  // edited since); snapshot B drops doc_id % 13 == 0 (docs taken down).

  /** Snapshot A: the "previous" corpus version. */
  def snapshotA(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" legacy")))
          .otherwise(col("text")).as("text"))

  /** Snapshot B: the "current" corpus version. */
  def snapshotB(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 13 =!= 0)

  /** DuckDB oracle: the same planted snapshots, the same hash diff. */
  def snapshotDiffSql(table: String = "documents"): String =
    s"""WITH a AS (
       |  SELECT doc_id,
       |    md5(CASE WHEN doc_id % 11 = 0 THEN text || ' legacy'
       |             ELSE text END) AS ha
       |  FROM $table WHERE doc_id % 7 != 0),
       |b AS (
       |  SELECT doc_id, md5(text) AS hb
       |  FROM $table WHERE doc_id % 13 != 0)
       |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
       |  CASE WHEN a.doc_id IS NULL THEN 'added'
       |       WHEN b.doc_id IS NULL THEN 'removed'
       |       WHEN a.ha IS DISTINCT FROM b.hb THEN 'changed'
       |       ELSE 'unchanged' END AS status
       |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
       |ORDER BY doc_id""".stripMargin
}
