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
    conv(substring(md5(c), 1, 3), 16, 10).cast("long") % HllM

  /** Rank = leading zeros of the 48-bit value slice + 1 = 49 − bit
    * length (the [[SampleOps]] llog2 device: `conv(_, 10, 2)` length —
    * exact integer arithmetic, no float log). */
  private def rhoOf(c: Column): Column = {
    val v = conv(substring(md5(c), 4, 12), 16, 10).cast("long")
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
       |       THEN round($HllM * ln($HllM.0 / ($HllM - used)), 2)
       |       ELSE round(${HllC.toString}
       |                  / (sp + ($HllM - used) * $HllScale), 2) END
       |    AS est_distinct
       |FROM agg""".stripMargin
}
