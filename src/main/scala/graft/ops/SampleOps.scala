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
}
