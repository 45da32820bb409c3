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
}
