package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-order generation: the seeded global shuffle + shard
  * assignment every pre-training pipeline runs between corpus prep and
  * the dataloader. Changing the seed reshuffles; re-running with the
  * same seed reproduces the exact order — the order is a pure function
  * of (seed, key), never of partitioning or execution (unlike
  * `df.orderBy(rand(seed))`, whose per-partition RNG changes with the
  * split layout).
  *
  * Scale shape: there is NO global sort. `shard` comes from the order
  * hash itself (map-only), `seq` is a row_number inside each shard —
  * one hash shuffle on the shard key + an in-partition sort, the same
  * plan at 600 k docs or 100 TB (shard count grows with the corpus;
  * each dataloader rank reads its shard sequentially). The interleaved
  * `step` (= seq·S + shard) gives a global round-robin order across
  * shards without ever materializing it: rank r at step t reads its
  * own shard's seq t — the standard distributed-sampler contract.
  *
  * Oracle: md5 is the one hash Spark and DuckDB compute bit-identically
  * (the [[SampleOps]] trick), and row_number ties are broken by the
  * key, so the full (shard, seq, step) manifest hash-checks.
  */
object ShardOps {
  /** Default shard count for the p48 query (dataloader world size). */
  val Shards = 8

  /** Seed for the p48 query — a different string is a different epoch
    * order, which is exactly how epoch reshuffling should work. */
  val Seed = "epoch-0"

  /** Seeded order hash: md5 over seed|key. Shard and order both derive
    * from it, so one map pass decides everything. */
  private def ordHash(key: Column, seed: String): Column =
    md5(concat(lit(seed), lit("|"), key.cast("string")))

  /** Shared shard/seq/step construction (review r10: this existed
    * twice, and the bucket math + step formula must never diverge
    * between the shuffle and curriculum faces). Input rows carry
    * `__key` plus any passthrough columns; `orderPrefix` columns sort
    * BEFORE the seeded order inside each shard (the curriculum stage). */
  private def manifest(rows: DataFrame, seed: String, shards: Int,
                       orderPrefix: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withOrd = rows
      .withColumn("__ord", ordHash(col("__key"), seed))
      .withColumn("shard",
        (conv(substring(col("__ord"), 1, 15), 16, 10).cast("long") % shards)
          .cast("int"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(orderPrefix :+ col("__ord") :+ col("__key"): _*)
    withOrd.withColumn("seq", row_number().over(w).cast("long"))
      .withColumn("step", (col("seq") - 1) * shards + col("shard"))
  }

  /** Shuffle manifest: key → (shard, seq, step).
    *  - shard: top-60-bits-of-md5 bucket mod `shards` (uniform, stable)
    *  - seq:   this key's position within its shard's seeded order
    *  - step:  global interleaved training step when ranks round-robin
    *           (exact permutation when shards are balanced; hash
    *           sharding keeps them balanced to O(√n) at any scale) */
  def shuffleManifest(df: DataFrame, key: Column, seed: String = Seed,
                      shards: Int = Shards): DataFrame =
    manifest(df.select(key.as("__key")), seed, shards, Nil)
      .select(col("__key").as("doc_id"), col("shard"), col("seq"), col("step"))

  /** CURRICULUM manifest (p68): [[shuffleManifest]] with a curriculum
    * stage ordering the seeded shuffle — within each shard, `seq` sorts
    * by (bin ASC, order-hash): every dataloader rank sees stage-1 docs
    * (short, per p42's deciles) before stage 2, while WITHIN a stage
    * the order is the same seeded uniform shuffle (and shard assignment
    * stays pure hash, so ranks stay balanced per stage). This is the
    * standard length-curriculum prep (short-to-long warmup); a quality
    * or difficulty stage drops into the same `bin` column. Same plan as
    * shuffleManifest — shard hash map-side, one shard-keyed shuffle,
    * NO global sort (the bin prefix rides the in-partition sort). */
  def curriculumManifest(bins: DataFrame, seed: String = Seed,
                         shards: Int = Shards): DataFrame =
    manifest(bins.select(col("doc_id").as("__key"), col("bin")),
        seed, shards, Seq(col("bin")))
      .select(col("__key").as("doc_id"), col("bin"), col("shard"),
        col("seq"), col("step"))

  /** DuckDB oracle for [[curriculumManifest]] over p42's bins. */
  def curriculumManifestSql(nBins: Int = 10, seed: String = Seed,
                            shards: Int = Shards,
                            table: String = "documents"): String =
    s"""WITH ${SampleOps.docBinsSqlCtes(nBins, table)},
       |t AS (
       |  SELECT doc_id, bin,
       |    md5(${OracleSql.sqlStr(seed)}||'|'||CAST(doc_id AS VARCHAR)) AS ord
       |  FROM binned),
       |s AS (
       |  SELECT doc_id, bin, ord,
       |    CAST((('0x'||substr(ord,1,15))::UBIGINT)::BIGINT % $shards AS INT) AS shard
       |  FROM t),
       |r AS (
       |  SELECT doc_id, bin, shard,
       |    row_number() OVER (PARTITION BY shard ORDER BY bin, ord, doc_id) AS seq
       |  FROM s)
       |SELECT doc_id, bin, shard, seq, (seq - 1) * $shards + shard AS step
       |FROM r ORDER BY doc_id""".stripMargin

  /** DuckDB oracle: same md5 order hash, same bucket math, same
    * row_number tie-break. */
  def shuffleManifestSql(seed: String = Seed, shards: Int = Shards,
                         table: String = "documents",
                         keyExpr: String = "doc_id"): String =
    s"""WITH t AS (
       |  SELECT $keyExpr AS doc_id,
       |    md5(${OracleSql.sqlStr(seed)}||'|'||CAST($keyExpr AS VARCHAR)) AS ord
       |  FROM $table),
       |s AS (
       |  SELECT doc_id, ord,
       |    CAST((('0x'||substr(ord,1,15))::UBIGINT)::BIGINT % $shards AS INT) AS shard
       |  FROM t),
       |r AS (
       |  SELECT doc_id, shard,
       |    row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id) AS seq
       |  FROM s)
       |SELECT doc_id, shard, seq, (seq - 1) * $shards + shard AS step
       |FROM r ORDER BY shard, seq""".stripMargin
}
