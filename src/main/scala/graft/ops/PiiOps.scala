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
    * numeric patterns can't match each other (phone's 3-digit middle
    * group vs SSN's 2-digit one; dotted quads vs dashed numbers), but
    * an email LOCAL PART may contain a phone/SSN/IP-shaped substring
    * ("555-123-4567@ex.co"), so order matters: each pattern is counted
    * on the text AFTER the previous patterns were redacted, making the
    * counts exactly what the redaction chain rewrites. */
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
    * Each count sweeps the text with the PRECEDING patterns already
    * redacted (see Patterns order), so `n_phone` never reports a
    * phone-shaped substring of an email the chain has already rewritten
    * whole — the counts are exactly the rewrite counts. The fingerprint
    * is md5 of the fully redacted text — the compact way to
    * hash-compare the actual rewritten corpus without shipping it.
    * Staged projections keep each intermediate redaction materialized
    * once (HOF-free, still one codegen stage). */
  def piiStats(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("__t0"))
    // stage k: count pattern k on __t{k}, then produce __t{k+1}
    val staged = Patterns.zipWithIndex.foldLeft(base) {
      case (df, ((kind, re, tag), i)) =>
        df.withColumn(s"n_$kind",
            size(regexp_extract_all(col(s"__t$i"), lit(re), lit(0))))
          .withColumn(s"__t${i + 1}",
            regexp_replace(col(s"__t$i"), re, tag))
    }
    staged
      .withColumn("redacted_fp", md5(col(s"__t${Patterns.size}")))
      .withColumn("has_pii",
        Patterns.map { case (k, _, _) => col(s"n_$k") > 0 }.reduce(_ || _))
      .select("doc_id", "n_email", "n_phone", "n_ip", "n_ssn", "has_pii",
        "redacted_fp")
  }

  /** DuckDB rendering of redact(expr): the same fixed-order chain. */
  def redactSql(expr: String): String =
    Patterns.foldLeft(expr) { case (e, (_, re, tag)) =>
      s"regexp_replace($e, '$re', '$tag', 'g')"
    }

  /** DuckDB oracle for piiStats ∘ withSyntheticPii over `table` —
    * same staged count-then-redact chain. */
  def piiStatsSql(table: String = "documents"): String = {
    // one CTE per stage: count on t{i}, redact into t{i+1}
    val stages = Patterns.zipWithIndex.map { case ((kind, re, tag), i) =>
      s"""s${i + 1} AS (
         |  SELECT *, len(regexp_extract_all(__t$i, '$re')) AS n_$kind,
         |    regexp_replace(__t$i, '$re', '$tag', 'g') AS __t${i + 1}
         |  FROM s$i)""".stripMargin
    }.mkString(",\n")
    val hasPii = Patterns.map { case (k, _, _) => s"n_$k > 0" }.mkString(" OR ")
    s"""WITH s0 AS (
       |  SELECT doc_id, ${syntheticPiiSql()} AS __t0 FROM $table),
       |$stages
       |SELECT doc_id, n_email, n_phone, n_ip, n_ssn,
       |  ($hasPii) AS has_pii, md5(__t${Patterns.size}) AS redacted_fp
       |FROM s${Patterns.size} ORDER BY doc_id""".stripMargin
  }
}
