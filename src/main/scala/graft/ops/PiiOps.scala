package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction — the scrubbing pass every training-data
  * pipeline runs before a corpus ships (emails, phone numbers, IP
  * addresses, SSN-shaped ids). Pure column expressions (regex sweeps +
  * chained replaces), so the operator is map-only: zero shuffles, linear
  * in corpus bytes, and fully inside whole-stage codegen — the exact
  * shape that survives a 100 TB scan.
  *
  * The regexes are written in the Java-regex ∩ RE2 common subset
  * (`\b`, `\d`, bounded reps, no lookaround), so the SAME pattern
  * strings drive both the Spark columns and the DuckDB oracle.
  *
  * The synthetic corpus carries no natural PII, so `withSyntheticPii`
  * deterministically plants PII derived from `doc_id` (same trick as
  * MediaGen's synthesized media): both engines rebuild the identical
  * input, making detection counts and redacted-text fingerprints
  * hash-comparable end-to-end.
  */
object PiiOps {

  /** (kind, pattern, replacement) — applied in this fixed order. The
    * patterns are pairwise non-overlapping on any input (phone's 3-digit
    * middle group can't match SSN's 2-digit one and vice versa; dotted
    * quads share nothing with dashed numbers), but the fixed order makes
    * the redaction chain deterministic regardless. */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"))

  /** Plant deterministic PII on a doc_id-keyed corpus: residue classes
    * pick which docs get which PII kind, and every planted value is a
    * pure integer rendering of doc_id (no division — `%` and `*` agree
    * between Spark and DuckDB on non-negative longs, and both engines
    * print a BIGINT identically when concatenated into a string). */
  def withSyntheticPii(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val id = col(idCol)
    def onlyIf(m: Int, c: Column): Column =
      when(id % m === 0, c).otherwise(lit(""))
    docs.withColumn(textCol, concat(
      col(textCol),
      onlyIf(3, concat(lit(" contact user"), id, lit("@example.com"))),
      onlyIf(5, concat(lit(" call 555-867-"), lpad((id % 10000).cast("string"), 4, "0"))),
      onlyIf(7, concat(lit(" host 10."), id % 256, lit("."), (id * 13) % 256,
        lit("."), id % 250)),
      onlyIf(11, concat(lit(" id 123-45-"),
        lpad(((id * 7) % 10000).cast("string"), 4, "0")))))
  }

  /** SQL rendering of withSyntheticPii's augmented text column. */
  def syntheticPiiSql(idCol: String = "doc_id", textCol: String = "text"): String = {
    def onlyIf(m: Int, e: String) =
      s"CASE WHEN $idCol % $m = 0 THEN $e ELSE '' END"
    s"$textCol || " +
      onlyIf(3, s"' contact user' || $idCol || '@example.com'") + " || " +
      onlyIf(5, s"' call 555-867-' || lpad(CAST($idCol % 10000 AS VARCHAR), 4, '0')") + " || " +
      onlyIf(7, s"' host 10.' || ($idCol % 256) || '.' || (($idCol * 13) % 256) || '.' || ($idCol % 250)") + " || " +
      onlyIf(11, s"' id 123-45-' || lpad(CAST(($idCol * 7) % 10000 AS VARCHAR), 4, '0')")
  }

  /** Redacted text: every pattern replaced by its tag, in Patterns
    * order. Spark's regexp_replace is global, matching DuckDB's 'g'. */
  def redact(text: Column): Column =
    Patterns.foldLeft(text) { case (t, (_, re, tag)) =>
      regexp_replace(t, re, tag)
    }

  /** Per-doc PII stats + redacted fingerprint:
    * `doc_id, n_email, n_phone, n_ip, n_ssn, has_pii, redacted_fp`.
    * Counts sweep the ORIGINAL text (the patterns are disjoint, so
    * count-then-redact and redact-order don't interact); the fingerprint
    * is md5 of the fully redacted text — the compact way to
    * hash-compare the actual rewritten corpus without shipping it. */
  def piiStats(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val t = col("__t")
    docs.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
      .select(
        Seq(col("doc_id")) ++
          Patterns.map { case (kind, re, _) =>
            size(regexp_extract_all(t, lit(re), lit(0))).as(s"n_$kind")
          } ++
          Seq(md5(redact(t)).as("redacted_fp")): _*)
      .withColumn("has_pii",
        Patterns.map { case (k, _, _) => col(s"n_$k") > 0 }.reduce(_ || _))
      .select("doc_id", "n_email", "n_phone", "n_ip", "n_ssn", "has_pii",
        "redacted_fp")
  }

  /** DuckDB oracle for piiStats ∘ withSyntheticPii over `table`. */
  def piiStatsSql(table: String = "documents"): String = {
    val red = Patterns.foldLeft("t") { case (e, (_, re, tag)) =>
      s"regexp_replace($e, '$re', '$tag', 'g')"
    }
    val counts = Patterns.map { case (kind, re, _) =>
      s"len(regexp_extract_all(t, '$re')) AS n_$kind"
    }.mkString(", ")
    val hasPii = Patterns.map { case (k, _, _) => s"n_$k > 0" }.mkString(" OR ")
    s"""WITH aug AS (
       |  SELECT doc_id, ${syntheticPiiSql()} AS t FROM $table),
       |stats AS (
       |  SELECT doc_id, $counts, md5($red) AS redacted_fp FROM aug)
       |SELECT doc_id, n_email, n_phone, n_ip, n_ssn,
       |  ($hasPii) AS has_pii, redacted_fp
       |FROM stats ORDER BY doc_id""".stripMargin
  }
}
