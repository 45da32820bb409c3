package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus composition operators: per-domain quality caps and the
  * token-budget mixture plan — the two steps that decide WHAT a corpus
  * trains on once hygiene and dedup have decided what survives.
  *
  * Both are standard pre-training practice: web-scale corpora cap how
  * many documents any one domain may contribute (a handful of template
  * mills otherwise dominate the crawl — RefinedWeb/FineWeb ship exactly
  * this gate), and every training run publishes a mixture table saying
  * how many tokens of each (language, source) slice the budget buys and
  * at how many epochs (Hoffmann et al. 2022 scaling-law runs; the
  * multilingual √-temperature mix of mT5).
  */
object MixOps {
  /** Documents any single source may keep (dial; test corpora have
    * 10-16 docs/source so the cap exercises every decision branch). */
  val DomainCap = 8

  /** Token budget the mixture plan allocates (a dial — the arithmetic
    * is integer-exact at any value below 2^53/maxWeight). */
  val TokenBudget = 1000000000L

  /** Per-source quality cap: keep the top-`cap` docs of each source by
    * (quality DESC, doc_id) — identical semantics to
    * `row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id)
    * <= cap`, but computed WITHOUT ranking whole sources.
    *
    * Scale shape (the p42 histogram-threshold pattern): quality is
    * quantized (4 dp), so per-(source, q) counts are a DIMENSION-sized
    * histogram — the corpus aggregates down to it with map-side combine,
    * the cumulative scan runs over the histogram (not the corpus), and
    * the per-group verdict (keep-all / keep-quota / drop-all) broadcasts
    * back. Only rows in a source's single BOUNDARY score-group — where
    * the cap lands mid-group — ever see a rank window, and that window
    * is partitioned by (source, q), one score-group, not the source. A
    * hot domain with 10^9 docs costs its scan plus a histogram row; the
    * window a naive rank would hang on it never materializes.
    */
  def domainCap(docs: DataFrame, cap: Int = DomainCap): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = docs.select(col("doc_id"), col("source"),
      TextOps.qualityScore(col("text")).as("q"))
    val hist = scored.groupBy("source", "q").agg(count(lit(1)).as("__c"))
    // running count of strictly-better docs, over the histogram only
    val better = Window.partitionBy("source").orderBy(col("q").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val verdicts = hist
      .withColumn("__before", coalesce(sum(col("__c")).over(better), lit(0L)))
      .withColumn("__quota",
        greatest(lit(0L), least(col("__c"), lit(cap.toLong) - col("__before"))))
      .select(col("source"), col("q"), col("__c"), col("__quota"))
    val tagged = scored.join(broadcast(verdicts), Seq("source", "q"))
    val clear = tagged
      .filter(col("__quota") === 0L || col("__quota") === col("__c"))
      .select(col("doc_id"), col("source"), col("q"),
        (col("__quota") === col("__c")).as("kept"))
    // boundary score-group: cap - before slots left, ties broken by doc_id
    val tie = Window.partitionBy("source", "q").orderBy("doc_id")
    val boundary = tagged
      .filter(col("__quota") > 0L && col("__quota") < col("__c"))
      .withColumn("__rk", row_number().over(tie))
      .select(col("doc_id"), col("source"), col("q"),
        (col("__rk") <= col("__quota")).as("kept"))
    clear.unionByName(boundary)
  }

  /** DuckDB oracle for [[domainCap]]: the rank definition itself. */
  def domainCapSql(cap: Int = DomainCap, table: String = "documents"): String =
    s"""SELECT doc_id, source, q, rn <= $cap AS kept FROM (
       |  SELECT doc_id, source, q,
       |    row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id) AS rn
       |  FROM (SELECT doc_id, source, ${TextOps.qualityScoreSql("text")} AS q
       |        FROM $table))
       |ORDER BY doc_id""".stripMargin

  /** Token-budget mixture plan: per (lang, source) slice — doc/token
    * volume, a √-temperature sampling weight (w ∝ √tokens, the mT5
    * multilingual mix at α = 1/2: big slices shrink, small ones grow),
    * the slice's token allocation under [[TokenBudget]], and the epoch
    * factor (allocation / available, in basis points — >10000 bp means
    * the slice oversamples/repeats).
    *
    * Exactness: w = floor(√tokens) — IEEE sqrt + floor are correctly
    * rounded in both engines, so w and Z = Σw are exact integers; every
    * derived column is INTEGER arithmetic (`DIV`), so no float division
    * whose rounding could drift between engines.
    *
    * Scale shape: one map-side-combined aggregate corpus pass down to a
    * dimension-sized (lang, source) table; the total Z rides a 1-row
    * broadcast. The corpus never shuffles.
    */
  def mixturePlan(docs: DataFrame, budget: Long = TokenBudget): DataFrame = {
    val g = docs
      .select(col("lang"), col("source"),
        TextOps.tokenCount(col("text")).cast("long").as("__t"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum(col("__t")).as("n_tokens"))
      .withColumn("__w", floor(sqrt(col("n_tokens"))).cast("long"))
    val tot = g.agg(sum(col("__w")).as("__z"))
    g.crossJoin(broadcast(tot))
      .withColumn("alloc_tokens", expr(s"($budget * __w) DIV __z"))
      .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
        expr("(__w * 1000000) DIV __z").as("weight_ppm"),
        col("alloc_tokens"),
        expr("(alloc_tokens * 10000) DIV n_tokens").as("epochs_bp"))
  }

  /** DuckDB oracle for [[mixturePlan]] — same integer arithmetic
    * (`//` is DuckDB's DIV; sums cast back from HUGEINT). */
  def mixturePlanSql(budget: Long = TokenBudget,
                     table: String = "documents"): String =
    s"""WITH g AS (
       |  SELECT lang, source, count(*) AS n_docs,
       |    CAST(sum(len(string_split_regex(trim(lower(text)), '\\s+'))) AS BIGINT)
       |      AS n_tokens
       |  FROM $table GROUP BY 1, 2),
       |w AS (SELECT *, CAST(floor(sqrt(n_tokens)) AS BIGINT) AS w FROM g),
       |z AS (SELECT CAST(sum(w) AS BIGINT) AS z FROM w)
       |SELECT lang, source, n_docs, n_tokens,
       |  (w * 1000000) // z AS weight_ppm,
       |  ($budget * w) // z AS alloc_tokens,
       |  ((($budget * w) // z) * 10000) // n_tokens AS epochs_bp
       |FROM w, z ORDER BY lang, source""".stripMargin
}
