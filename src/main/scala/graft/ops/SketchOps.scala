package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cardinality sketching: a DETERMINISTIC HyperLogLog.
  *
  * At 100 TB, `COUNT(DISTINCT x)` is a full shuffle of every distinct
  * value; the sketch replaces it with one map-side pass that reduces to
  * `m` integer registers (max of a leading-zero rank per hash bucket —
  * Flajolet et al. 2007, the same estimator family behind ClickHouse
  * `uniq` and Spark's own `approx_count_distinct`). Registers merge by
  * elementwise MAX — commutative and associative, so the result is
  * independent of partitioning, arrival order, and cluster size, unlike
  * e.g. space-saving top-k.
  *
  * What makes THIS one differential-testable (the graft oracle
  * discipline) where the built-ins are not: every quantity up to the
  * final estimate is INTEGER-EXACT and derived from the engines' shared
  * md5 primitive — bucket and rank come from disjoint md5 hex slices,
  * and the harmonic mean's denominator `Z = Σ 2^-rho` is kept as the
  * scaled integer `S = Σ 2^(49-rho)` (rho ≤ 49 so each term is exact;
  * S ≤ m·2^49 < 2^56 fits a long). The estimate is then ONE IEEE
  * double division `C / S` (correctly rounded identically everywhere)
  * — so Spark and DuckDB agree bit for bit, and the estimator is
  * regression-pinned by hash compare, not a tolerance band.
  *
  * Spark-first: the register build is `select(bucket, rho).groupBy
  * (bucket).max(rho)` — whole-stage-codegen'd hash aggregation with
  * map-side partial combine, so the shuffle carries at most
  * `m × partitions` rows no matter the corpus size. */
object SketchOps {

  /** Register count. 64 divides the 12-bit bucket slice's 4096-value
    * domain evenly (no modulo bias) and its 2.5·m = 160 linear-counting
    * threshold sits below the smallest oracle corpus's cardinality, so
    * the cross-engine gate exercises the raw-estimate branch (the
    * linear-counting branch uses `ln`, which is libm- not IEEE-defined
    * — spec-covered Spark-side, kept out of the hash compare). */
  val HllM = 64

  /** Standard bias-correction constant for m = 64 (Flajolet et al.,
    * Fig. 3): alpha_64 = 0.709. */
  val HllAlpha: Double = 0.709

  /** Max rank: the value slice is 12 hex chars = 48 bits, so a hash
    * with ALL value bits zero ranks 49. */
  val HllMaxRho = 49

  /** 2^49 — the scale that turns `Σ 2^-rho` into an exact long. */
  val HllScale: Long = 1L << HllMaxRho

  /** `alpha · m² · 2^49`: the numerator of the raw estimate over the
    * scaled integer denominator. ONE double constant, rendered into the
    * oracle via `Double.toString` (shortest round-trip form — DuckDB
    * parses back the identical bits). */
  val HllC: Double = HllAlpha * HllM * HllM * HllScale.toDouble

  /** Linear-counting threshold: raw estimates at or below 2.5·m with
    * empty registers present switch to `m·ln(m/zeros)`. */
  val HllLcThreshold: Double = 2.5 * HllM

  private def bucketOf(c: Column): Column =
    TextOps.md5Slice(c, 1, 3) % HllM

  /** Rank = leading zeros of the 48-bit value slice + 1 = 49 − bit
    * length (the [[SampleOps]] llog2 device: `conv(_, 10, 2)` length —
    * exact integer arithmetic, no float log). */
  private def rhoOf(c: Column): Column = {
    val v = TextOps.md5Slice(c, 4, 12)
    when(v === 0L, lit(HllMaxRho.toLong))
      .otherwise(lit(HllMaxRho.toLong) -
        length(conv(v.cast("string"), 10, 2)).cast("long"))
  }

  /** The populated registers: `bucket, rho` (bucket ∈ [0, m), rho ∈
    * [1, 49]). NULLs are ignored — `COUNT(DISTINCT x)` semantics. */
  def hllRegisters(df: DataFrame, c: Column): DataFrame =
    df.select(c.as("__v")).where(col("__v").isNotNull)
      .select(bucketOf(col("__v")).as("bucket"), rhoOf(col("__v")).as("rho"))
      .groupBy("bucket").agg(max("rho").as("rho"))

  /** One-row summary: `m, zeros, s, est_distinct`.
    *
    *  - `s`  = Σ_present 2^(49−rho) + zeros·2^49 (every empty register
    *    contributes 2^0 to the harmonic sum) — integer-exact.
    *  - `est_distinct` = round(C/s, 2) in the raw regime;
    *    m·ln(m/zeros) linear counting at small cardinalities. */
  def hllSummary(df: DataFrame, c: Column): DataFrame = {
    val agg = hllRegisters(df, c).agg(
      count(lit(1)).as("used"),
      coalesce(sum(expr(
        s"shiftleft(CAST(1 AS BIGINT), CAST($HllMaxRho - rho AS INT))")),
        lit(0L)).as("sp"))
    val zeros = lit(HllM.toLong) - col("used")
    val s = col("sp") + zeros * lit(HllScale)
    val raw = lit(HllC) / s
    agg.select(
      lit(HllM).as("m"),
      zeros.as("zeros"),
      s.as("s"),
      when(zeros > 0L && raw <= lit(HllLcThreshold),
        round(lit(HllM.toDouble) * log(lit(HllM.toDouble) / zeros), 2))
        .otherwise(round(raw, 2)).as("est_distinct"))
  }

  // =========================================================================
  // Count-min sketch: frequency estimation with a broadcastable state
  // =========================================================================

  /** Hash rows. Overestimate bound: est ≤ exact + e·N/w with probability
    * 1 − (1/e)^d ≈ 0.98 at d = 4 (Cormode & Muthukrishnan 2005). */
  val CmsDepth = 4

  /** Counters per row: 2^16 divides the md5-bucket primitive's 24-bit
    * slice evenly (no modulo bias). The whole sketch is d·w = 2^18
    * longs (2 MB) REGARDLESS of corpus size — overestimate ≤ e·N/w
    * with prob. ~0.98, so point queries stay sharp while N ≲ 10^7
    * distinct-shingle occurrences and degrade gracefully (never
    * under-count) beyond; size the width to the corpus like any CMS. */
  val CmsWidth = 65536

  /** Probe set size for the heavy-hitter demo face. */
  val CmsTopK = 10

  /** p93's probe slice: every distinct shingle of the first-N docs —
    * a deterministic, corpus-bounded probe set for the SQL point-query
    * face (documents' doc-id head doesn't scale with SF, so the slice
    * is the same shape at every scale). */
  val CmsProbeDocs = 40

  /** Row-j slot of value `s`: the engines' shared md5-bucket primitive
    * over the row-tagged value, so Spark and DuckDB land every count in
    * the same counter. */
  private def cmsSlot(j: Column, s: Column): Column =
    TextOps.md5Bucket(concat_ws(":", j.cast("string"), s), CmsWidth)

  /** JVM replay of [[cmsSlot]] for point queries against a collected
    * sketch ([[graft.functions.CmsCount]]). */
  def cmsSlotJvm(j: Int, s: String): Long =
    TextOps.md5BucketJvm(s"$j:$s", CmsWidth)

  /** The CMS counter state over per-doc-distinct word 3-gram shingles:
    * `(j, slot, c)` for every OCCUPIED slot — the production artifact.
    * One explode by the d = [[CmsDepth]] hash rows, then a hash
    * aggregate whose map-side partial combine caps the shuffle at
    * d·w rows per partition; merges across corpora/days by elementwise
    * SUM of `c` on (j, slot). */
  def cmsCounters(docs: DataFrame): DataFrame = {
    val sh = DedupOps.shingles(docs, 3).select(col("s"))
    val rows = (0 until CmsDepth).map(lit(_))
    sh.select(explode(array(rows: _*)).as("j"), col("s"))
      .groupBy(col("j"), cmsSlot(col("j"), col("s")).as("slot"))
      .agg(count(lit(1)).as("c"))
  }

  /** Count-min heavy-hitter demo over per-doc-distinct word 3-gram
    * shingles: `(s, exact_df, cms_df)` for the top-[[CmsTopK]] shingles
    * by document frequency, proving `cms_df ≥ exact_df` with the
    * overestimate tiny at sketch scale.
    *
    * The PRODUCT here is the counter build: one explode by the d = 4
    * hash rows, then a hash aggregate whose map-side partial combine
    * caps the shuffle at d·w rows per partition — the sketch is
    * d·w = 2^18 longs (2 MB) no matter how many petabytes stream through,
    * merges by elementwise SUM (commutative + associative), and
    * broadcasts to answer any point query without touching the corpus
    * again. The exact side exists to DIFFERENTIAL-TEST the estimate
    * (and is itself the full shingle shuffle you deploy the sketch to
    * avoid). */
  def cmsHeavyHitters(docs: DataFrame): DataFrame = {
    val sh = DedupOps.shingles(docs, 3).select(col("s"))
    val exact = sh.groupBy("s").agg(count(lit(1)).as("exact_df"))
    val top = exact.orderBy(col("exact_df").desc, col("s")).limit(CmsTopK)
    val rows = (0 until CmsDepth).map(lit(_))
    // counters DERIVED from the exact aggregate, not a second corpus
    // pass (r14, profiled): a CMS cell is the SUM of the frequencies of
    // the shingles hashing into it, so grouping `exact` by (j, slot)
    // gives bit-identical cells while (a) Spark's ReuseExchange serves
    // both branches from the ONE shingle shuffle this query already
    // pays for its differential-test side, and (b) the depth-explode
    // runs over DISTINCT shingles instead of every occurrence. The
    // standalone [[cmsCounters]] (p93's sketch build) keeps its
    // freq-free one-pass shape on purpose — THERE the map-side combine
    // caps the shuffle at d·w rows regardless of corpus size, which is
    // the 100 TB deployment path; here the full shuffle exists anyway.
    val counters = exact
      .select(col("s"), col("exact_df"), explode(array(rows: _*)).as("j"))
      .groupBy(col("j"), cmsSlot(col("j"), col("s")).as("slot"))
      .agg(sum("exact_df").as("c"))
    top
      .select(col("s"), col("exact_df"), explode(array(rows: _*)).as("j"))
      .withColumn("slot", cmsSlot(col("j"), col("s")))
      .join(broadcast(counters), Seq("j", "slot"))
      .groupBy("s", "exact_df").agg(min("c").as("cms_df"))
      .orderBy(col("exact_df").desc, col("s"))
  }

  /** The identical computation as DuckDB SQL ([[cmsHeavyHitters]]'s
    * differential oracle); shingling reuses the Jaccard oracles' CTE
    * spelling so the two sketch families cannot drift apart. */
  def cmsHeavyHittersSql(table: String = "documents"): String =
    s"""WITH ${DedupOps.shingleCtes(table)},
       |exact AS (SELECT s, count(*) AS exact_df FROM sh GROUP BY s),
       |top AS (SELECT s, exact_df FROM exact
       |        ORDER BY exact_df DESC, s LIMIT $CmsTopK),
       |counters AS (
       |  SELECT j, ${TextOps.md5BucketSql("j::VARCHAR||':'||s", CmsWidth)} AS slot,
       |         count(*) AS c
       |  FROM sh CROSS JOIN range($CmsDepth) r(j) GROUP BY 1, 2),
       |probe AS (
       |  SELECT top.s, top.exact_df, j,
       |         ${TextOps.md5BucketSql("j::VARCHAR||':'||top.s", CmsWidth)} AS slot
       |  FROM top CROSS JOIN range($CmsDepth) r(j))
       |SELECT s, exact_df, min(c) AS cms_df
       |FROM probe JOIN counters USING (j, slot)
       |GROUP BY s, exact_df ORDER BY exact_df DESC, s""".stripMargin

  /** DuckDB oracle for the SQL point-query face (p93): re-derives every
    * probe shingle's d counter cells from the corpus and takes the
    * min — the answer the bound [[graft.functions.CmsCount]] scalar
    * must reproduce from its COLLECTED array. Probe terms come from the
    * corpus, so each of their slots is occupied by construction (their
    * own contribution) and the inner join drops nothing. */
  def cmsProbeSql(table: String = "documents",
                  maxDocId: Int = CmsProbeDocs): String =
    s"""WITH ${DedupOps.shingleCtes(table)},
       |counters AS (
       |  SELECT j, ${TextOps.md5BucketSql("j::VARCHAR||':'||s", CmsWidth)} AS slot,
       |         count(*) AS c
       |  FROM sh CROSS JOIN range($CmsDepth) r(j) GROUP BY 1, 2),
       |probe AS (SELECT DISTINCT s FROM sh WHERE doc_id < $maxDocId),
       |pslots AS (
       |  SELECT probe.s, j,
       |         ${TextOps.md5BucketSql("j::VARCHAR||':'||probe.s", CmsWidth)} AS slot
       |  FROM probe CROSS JOIN range($CmsDepth) r(j))
       |SELECT s, CAST(min(c) AS BIGINT) AS est
       |FROM pslots JOIN counters USING (j, slot)
       |GROUP BY s ORDER BY s""".stripMargin

  // =========================================================================
  // HDR-style log-linear histogram: quantiles without sorting
  // =========================================================================

  /** Sub-bucket resolution bits: each power-of-two octave splits into
    * 2^(b−1) = 32 linear buckets → relative bucket width ≤ 2^−(b−1) =
    * 3.125% (the HdrHistogram layout, Tene's `bucketIndex`/
    * `subBucketIndex` decomposition, reduced to one integer formula). */
  val HdrSubBits = 6

  /** Quantiles reported by [[hdrQuantiles]], in per-mille. */
  val HdrQs: Seq[Int] = Seq(500, 900, 990, 999)

  /** Half an octave's worth of sub-buckets: 2^(b−1) = 32. */
  private val HdrHalf = (1 << (HdrSubBits - 1)).toLong

  /** Highest trackable value (the HdrHistogram concept): milli-units
    * must fit a BIGINT in BOTH engines — Spark's floor().cast(long)
    * saturates silently where DuckDB's CAST raises, so anything past
    * the shared domain is EXCLUDED up front rather than diverging. */
  val HdrMaxValue: Double = 9.0e15

  /** The histogram state: `(idx, cnt)` per occupied log-linear bucket
    * (≤1.5 k rows at any corpus size) — the production artifact.
    * between() excludes NULL, NaN (sorts greatest), and ±Inf in one
    * predicate — the trackable-domain contract from [[hdrQuantiles]]'s
    * scaladoc. Merges across corpora/days by bucket-wise SUM of `cnt`. */
  def hdrHistogram(df: DataFrame, c: Column): DataFrame =
    df.where(c.between(lit(0d), lit(HdrMaxValue)))
      .select(floor(c * lit(1000)).cast("long").as("vm"))
      .select(col("vm"),
        greatest(length(conv(col("vm").cast("string"), 10, 2)).cast("long")
          - lit(HdrSubBits.toLong), lit(0L)).as("k"))
      .select((expr("shiftright(vm, CAST(k AS INT))") + lit(HdrHalf) * col("k"))
        .as("idx"))
      .groupBy("idx").agg(count(lit(1)).as("cnt"))

  /** Exact decode of bucket `idx` → inclusive `[lo, hi]` milli-range
    * (the scaladoc's decode formula; shared by the dataflow face, the
    * [[graft.functions.HdrQuantile]] scalar, and specs). */
  def hdrDecode(idx: Long): (Long, Long) = {
    val k = math.max(idx / HdrHalf - 1, 0L)
    val lo = (idx - HdrHalf * k) << k
    (lo, lo + (1L << k) - 1)
  }

  /** JVM replica of the bucket formula (bitlen via nlz — spec-pinned
    * equal to the Column face's decimal→binary-string spelling): the
    * property-test surface for the layout's invariants — monotone in
    * vm, decode brackets vm, width ≤ lo·2^−(b−1). Nonnegative vm only. */
  def hdrBucket(vm: Long): Long = {
    val k = math.max(64 - java.lang.Long.numberOfLeadingZeros(vm) - HdrSubBits, 0)
    (vm >> k) + HdrHalf * k
  }

  /** Quantile summary of a finite nonnegative DOUBLE column (values
    * outside [0, [[HdrMaxValue]]], NaN, and ±Inf are excluded as out of
    * the histogram's trackable domain — identically in both engines,
    * since Spark would silently map NaN→0 and +Inf→Long.Max where
    * DuckDB raises on the cast), quantized to
    * integer milli-units (`floor(x·1000)` — one IEEE multiply, bitwise
    * identical across engines): `(q_permille, rank, est_lo_milli,
    * est_hi_milli)` with the true q-quantile guaranteed inside
    * `[lo, hi]` and `hi − lo ≤ lo·2^−(b−1)` = 3.125% relative.
    *
    * Bucket index of milli-value v: `k = max(0, bitlen(v) − b)`,
    * `idx = (v >> k) + 2^(b−1)·k` — the HdrHistogram log-linear layout
    * as ONE integer formula: identity below 2^b, top-b-bits-plus-octave
    * above, continuous at every power-of-two boundary (spec-pinned).
    * Decode is exact: `k = max(idx/2^(b−1) − 1, 0)`,
    * `lo = (idx − 2^(b−1)·k) << k`, `hi = lo + 2^k − 1`.
    *
    * Plan shape at 100 TB: ONE map pass computes the bucket index in
    * pure integer arithmetic (no sort, no float log), then a hash
    * aggregate with map-side combine reduces the corpus to ≲1.5 k
    * bucket rows (49-bit domain × 32/octave — [[hdrHistogram]]); the
    * cumulative window and the 4-row quantile probe run over that
    * bucket-count-bounded frame, so everything after the scan is
    * constant-size. Histograms merge by bucket-wise SUM — the same
    * commutative shape as the CMS counters — so per-partition or
    * per-day histograms roll up without re-reading data. The
    * no-partition window is over ≤1.5 k rows by construction, not
    * data-bounded. */
  def hdrQuantiles(df: DataFrame, c: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bkt = hdrHistogram(df, c)
    val cum = bkt.select(col("idx"),
      sum("cnt").over(Window.orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum"))
    val targets = cum.agg(max("cum").as("t"))
      .select(explode(array(HdrQs.map(q => lit(q.toLong)): _*)).as("qpm"), col("t"))
      .select(col("qpm"),
        expr("CAST((qpm * t + 999) DIV 1000 AS BIGINT)").as("rank"))
    broadcast(targets)
      .join(cum, col("cum") >= col("rank"))
      .groupBy("qpm", "rank").agg(min("idx").as("idx"))
      .select(col("qpm").as("q_permille"), col("rank"),
        expr(s"greatest(idx DIV $HdrHalf - 1, 0)").as("dk"), col("idx"))
      .select(col("q_permille"), col("rank"),
        expr(s"shiftleft(idx - $HdrHalf * dk, CAST(dk AS INT))")
          .as("est_lo_milli"), col("dk"))
      .select(col("q_permille"), col("rank"), col("est_lo_milli"),
        (col("est_lo_milli") + expr("shiftleft(1L, CAST(dk AS INT))") - lit(1L))
          .as("est_hi_milli"))
      .orderBy("q_permille")
  }

  /** The identical computation as DuckDB SQL ([[hdrQuantiles]]'s
    * differential oracle). `sum()` windows widen to HUGEINT in DuckDB,
    * so `cum`/`rank` pin BIGINT for the driver's type compare. */
  def hdrQuantilesSql(source: String, valueExpr: String): String = {
    val b = HdrSubBits; val half = HdrHalf
    s"""WITH v AS (
       |  SELECT CAST(floor(($valueExpr) * 1000) AS BIGINT) AS vm
       |  FROM $source WHERE isfinite($valueExpr)
       |    AND ($valueExpr) BETWEEN 0 AND ${HdrMaxValue.toLong}),
       |bx AS (
       |  SELECT (vm >> greatest(length(bin(vm)) - $b, 0))
       |         + $half * greatest(length(bin(vm)) - $b, 0) AS idx FROM v),
       |bkt AS (SELECT idx, count(*) AS cnt FROM bx GROUP BY idx),
       |cum AS (SELECT idx, CAST(sum(cnt) OVER (ORDER BY idx) AS BIGINT) AS cum
       |        FROM bkt),
       |tgt AS (
       |  SELECT CAST(qpm AS BIGINT) AS qpm,
       |         CAST((qpm * t + 999) // 1000 AS BIGINT) AS rank
       |  FROM (SELECT max(cum) AS t FROM cum)
       |  CROSS JOIN (VALUES ${HdrQs.map(q => s"($q)").mkString(",")}) q(qpm)),
       |sel AS (
       |  SELECT qpm, rank, min(idx) AS idx
       |  FROM tgt JOIN cum ON cum.cum >= tgt.rank GROUP BY qpm, rank),
       |dec AS (
       |  SELECT qpm, rank, idx, greatest(idx // $half - 1, 0) AS dk FROM sel)
       |SELECT qpm AS q_permille, rank,
       |  (idx - $half * dk) << dk AS est_lo_milli,
       |  ((idx - $half * dk) << dk) + (1::BIGINT << dk) - 1 AS est_hi_milli
       |FROM dec ORDER BY q_permille""".stripMargin
  }

  /** The identical computation as DuckDB SQL (differential oracle);
    * every constant and the arithmetic shape mirror [[hllSummary]]. */
  def hllSummarySql(source: String, valueExpr: String): String =
    s"""WITH h AS (
       |  SELECT (('0x'||substr(md5(__v),1,3))::UBIGINT)::BIGINT % $HllM AS bucket,
       |         (('0x'||substr(md5(__v),4,12))::UBIGINT)::BIGINT AS v
       |  FROM (SELECT $valueExpr AS __v FROM $source) WHERE __v IS NOT NULL),
       |regs AS (
       |  SELECT bucket,
       |         max(CASE WHEN v = 0 THEN $HllMaxRho
       |                  ELSE $HllMaxRho - length(bin(v)) END) AS rho
       |  FROM h GROUP BY bucket),
       |agg AS (
       |  -- DuckDB sum(BIGINT) widens to HUGEINT; the driver gate
       |  -- compares types too, so pin BIGINT (S < 2^56, no overflow)
       |  SELECT count(*) AS used,
       |         CAST(coalesce(sum(1::BIGINT << ($HllMaxRho - rho)), 0)
       |              AS BIGINT) AS sp
       |  FROM regs)
       |SELECT $HllM AS m, $HllM - used AS zeros,
       |  sp + ($HllM - used) * $HllScale AS s,
       |  CASE WHEN ($HllM - used) > 0
       |        AND ${HllC.toString} / (sp + ($HllM - used) * $HllScale)
       |              <= ${HllLcThreshold.toString}
       |       THEN ${OracleSql.roundD(s"$HllM * ln($HllM.0 / ($HllM - used))", 2)}
       |       ELSE ${OracleSql.roundD(
                s"${HllC.toString} / (sp + ($HllM - used) * $HllScale)", 2)} END
       |    AS est_distinct
       |FROM agg""".stripMargin
}
