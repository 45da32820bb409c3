package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for 100 TB joins.
  *
  * AQE's skew-join split (on by default) handles sort-merge skew after a
  * shuffle materializes; explicit salting is the complementary tool when
  * one join key dominates so heavily that even a split partition of it
  * won't fit an executor, or when the skewed side feeds a hash join AQE
  * won't rewrite. Salting trades a `salt`× replication of the small side
  * for an even distribution of the hot key across `salt` tasks.
  */
object SkewOps {

  /** Inner equi-join with the LEFT side's hot keys spread over `salt`
    * sub-keys: each left row gets a salt from its partition-local row
    * position (NOT a row-content hash — skew usually means many
    * IDENTICAL rows, which would all hash to one salt and leave the
    * straggler intact); the right side is replicated `salt` times so
    * every (key, salt) pair still meets its match. Produces exactly the
    * rows of `left.join(right, Seq(key))` — verified by the spec — but a
    * key holding N% of the left side now occupies `salt` tasks instead
    * of one straggler. Use when the RIGHT side is the smaller
    * (dimension) side: its replication factor is `salt`. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    // reserved internal (the asof precedent): a caller's __salt would
    // be silently overwritten and change the join result (review r10)
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "saltedJoin: column name '__salt' is reserved by the implementation")
    val l = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)))
    val r = right.withColumn("__salt",
      explode(array((0 until salt).map(s => lit(s.toLong)): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
