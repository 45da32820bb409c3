package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grouped order statistics with a scale route (VERDICT r8 #7).
  *
  * Spark's exact `percentile` is a sort-based aggregate that holds each
  * group's full value multiset on the reducer — the right default while
  * a differential oracle must replay the exact number, and an OOM risk
  * once single groups stop fitting (SCALE.md q17 row names the swap).
  * Above [[ExactPercentileMaxGroup]] values in the largest group, the
  * route switches to `approx_percentile` (t-digest sketch, fixed memory
  * per group, mergeable map-side) — the [[DedupOps.nearDupPairs]]
  * routing discipline: one cheap count-only scan guards the decision,
  * and a caller holding catalog stats passes `knownMaxGroup` to skip
  * even that. */
object StatsOps {

  /** Largest per-group value count the exact sort-based percentile may
    * hold. 10 M doubles ≈ 80 MB of reducer heap for that group's
    * multiset — safely inside an executor at the default 32-partition
    * shuffle; past it the t-digest's fixed ~`accuracy` centroids win. */
  val ExactPercentileMaxGroup: Long = 10000000L

  /** `groupBy(groupCol).agg(percentile(valueCol, p) …)` with the
    * exact-vs-sketch route decided by the largest group's row count.
    * Returns `groupCol, <aliases…>, n` (percentiles rounded to 4dp —
    * the oracle-compare discipline for emitted floats). */
  def groupedPercentiles(df: DataFrame, groupCol: String, valueCol: String,
                         ps: Seq[(Double, String)],
                         exactMaxGroup: Long = ExactPercentileMaxGroup,
                         knownMaxGroup: Option[Long] = None): DataFrame = {
    val maxGroup = knownMaxGroup.getOrElse {
      // __-prefixed internal alias (codebase convention): a bare "c"
      // collides with a group column literally named c
      val r = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__c"))
        .agg(max(col("__c"))).collect()(0)
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    // alias hygiene (review r10; the fcdd834 '__c'-collision precedent):
    // an alias equal to the emitted 'n' count, the group column, or a
    // sibling alias would produce a duplicate/ambiguous column that
    // fails far from this call site
    val aliases = ps.map(_._2)
    require(aliases.distinct.size == aliases.size &&
      !aliases.contains("n") && !aliases.contains(groupCol),
      s"groupedPercentiles aliases must be distinct and avoid 'n'/'$groupCol'" +
        s" (got ${aliases.mkString(", ")})")
    val fn = if (maxGroup <= exactMaxGroup) "percentile" else "approx_percentile"
    val aggs = ps.map { case (p, a) =>
      // CAST(... AS DOUBLE) before round: percentile returns DOUBLE but
      // approx_percentile returns the INPUT type, so without it the
      // documented 4dp-float contract silently flipped to integer
      // output at the route boundary (schema mismatch on any union)
      round(expr(s"CAST($fn($valueCol, $p) AS DOUBLE)"), 4).as(a)
    } :+ count(lit(1)).as("n")
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
