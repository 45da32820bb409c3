package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range join — point-in-interval without the cartesian trap.
  *
  * A naive `p.t BETWEEN iv.start AND iv.end` join has no equi-key, so
  * Spark plans BroadcastNestedLoop/cartesian: O(|points|·|intervals|)
  * comparisons. Bucketing restores an equi-join: intervals explode into
  * the fixed-width time buckets they cover, points key by their own
  * bucket, and the hash join on (key, bucket) does the pruning; the
  * exact BETWEEN filter runs only on same-bucket pairs. Each (interval,
  * bucket) copy is unique and a point lives in exactly one bucket, so
  * no post-join dedup is needed.
  *
  * At 100 TB: shuffle keys are (key, bucket) — fine-grained and
  * time-uniform, so hot keys spread across buckets; interval blow-up is
  * bounded by interval_length/bucketNs + 1 copies (pick bucketNs near
  * the typical interval length). This is the standard interval-join
  * layout streaming engines use for event-time range joins.
  */
object RangeJoin {

  /** Matched (point, interval) pairs: same `key`, and point time in
    * [ivStart, ivEnd] inclusive. Column sets must be disjoint except
    * `key`; times are int64 ns. */
  def pointInInterval(points: DataFrame, intervals: DataFrame, key: String,
                      pointTime: String, ivStart: String, ivEnd: String,
                      bucketNs: Long): DataFrame = {
    require(bucketNs > 0, "bucketNs must be positive")
    val collisions = points.columns.toSet.intersect(intervals.columns.toSet) - key
    require(collisions.isEmpty, s"column collision beyond the key: $collisions")
    // DIV, not `/`: long `/` is DOUBLE division, and ns-epochs exceed
    // 2^53 — double rounding would put points in the wrong bucket
    require(!points.columns.contains("__b") && !intervals.columns.contains("__b"),
      "pointInInterval: column name '__b' is reserved by the implementation")
    val p = points.withColumn("__b", expr(s"$pointTime DIV ${bucketNs}L"))
    // inverted intervals (end < start) must match NOTHING — but Spark's
    // sequence(start, stop) defaults to step -1 when start > stop, so
    // one corrupt row would explode a huge DESCENDING bucket range (or
    // kill the job at the array-size limit) instead of zero (review r10)
    val iv = intervals.filter(col(ivEnd) >= col(ivStart)).withColumn("__b",
      explode(sequence(expr(s"$ivStart DIV ${bucketNs}L"), expr(s"$ivEnd DIV ${bucketNs}L"))))
    p.join(iv, Seq(key, "__b"))
      .filter(col(pointTime).between(col(ivStart), col(ivEnd)))
      .drop("__b")
  }
}
