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
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long") % SampleBuckets

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
    s"""SELECT d.* FROM $table d JOIN (
       |  SELECT __src, least(1.0,
       |    CAST($targetFrac AS DOUBLE) * __bigN * __w / __z / __n) AS __rate
       |  FROM (SELECT $sourceCol AS __src, count(*) AS __n,
       |          CAST(floor(sqrt(count(*))) AS BIGINT) AS __w
       |        FROM $table GROUP BY 1) c,
       |       (SELECT CAST(sum(__n) AS BIGINT) AS __bigN,
       |               CAST(sum(__w) AS BIGINT) AS __z
       |        FROM (SELECT count(*) AS __n,
       |                CAST(floor(sqrt(count(*))) AS BIGINT) AS __w
       |              FROM $table GROUP BY $sourceCol)) t
       |) r ON d.$sourceCol = r.__src
       |WHERE ${bucketSql(keyExpr)} < CAST(floor(__rate * $SampleBuckets) AS BIGINT)""".stripMargin
}
