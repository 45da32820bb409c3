package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join — the time-series primitive Spark lacks (and
  * the natural companion to this engine's int64-ns time model): for every
  * left row, attach the latest right row whose time is ≤ the left row's
  * time within the same key. DuckDB ships it natively (`ASOF JOIN`),
  * which is exactly what the differential oracle uses.
  *
  * Composition, not a custom physical operator (preference (a) of the
  * custom-op ladder): both sides union with a side flag, one window pass
  * carries the last right-side payload forward in (time, side) order,
  * left rows keep the carried struct. That is:
  *
  *  - ONE hash shuffle on the key (the window's partitionBy) — no join
  *    explosion, no per-row probing, no broadcast requirement;
  *  - linear in |left| + |right| with an in-partition sort, the same
  *    cost shape as a sort-merge join's sort phase;
  *  - inclusive ties (right time == left time matches), because right
  *    rows sort BEFORE left rows at equal time.
  *
  * At 100 TB: partitions hold whole keys (series); a single dominant key
  * is the same skew case as any keyed window — pre-split it with
  * [[SkewOps]] salting and merge the carried edge, or range-partition by
  * (key, time). The payload rides as ONE struct column, so a wide right
  * side costs one carried value per row, not one window pass per column.
  */
object AsOfJoin {

  /** `rightCols` are the right-side columns carried onto each left row
    * (null when no right row at-or-before the left time exists — a right
    * row with null payload VALUES still matches, like SQL ASOF). Both
    * sides must expose `key`; `rightCols` must not collide with left
    * column names. The right side must be UNIQUE per (key, time) —
    * dedupe first (e.g. min_by) or the carried payload among duplicates
    * is partition-order dependent. Time columns must be integral (int64
    * ns); TimestampType is rejected because casting it to long truncates
    * to SECONDS. Output: all left columns + `rightCols`, left row count
    * preserved. */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           rightCols: Seq[String]): DataFrame = {
    require(rightCols.forall(c => !left.columns.contains(c)),
      s"right carry columns ${rightCols.mkString(",")} collide with left columns")
    def requireIntegral(df: DataFrame, c: String): Unit = {
      import org.apache.spark.sql.types._
      val ok = df.schema(c).dataType match {
        case LongType | IntegerType | ShortType | ByteType => true
        case _ => false
      }
      require(ok, s"$c must be an integral time (int64 ns) — cast timestamps " +
        "explicitly (a long cast of TimestampType silently truncates to seconds)")
    }
    requireIntegral(left, leftTime)
    requireIntegral(right, rightTime)
    // reserved internals (the chunkTexts precedent): a left column named
    // __t would be silently overwritten by the cast time and returned
    // corrupted; fail loudly instead
    Seq("__t", "__side", "__c", "__p").foreach { n =>
      require(!left.columns.contains(n) && !right.columns.contains(n),
        s"asof: column name '$n' is reserved by the implementation")
    }
    val leftOut = left.columns.toSeq

    val l = left
      .withColumn("__t", col(leftTime).cast("long"))
      .withColumn("__side", lit(1))
    val r = right
      .select(col(key), col(rightTime).cast("long").as("__t"), lit(0).as("__side"),
        struct(rightCols.map(col): _*).as("__p"))
      // a null right time would sort FIRST (asc-nulls-first) and its
      // payload struct (non-null even with null fields) would carry
      // onto every left row before the first real right row; SQL ASOF
      // semantics (rts <= t is NULL) match nothing — drop it (review r10)
      .filter(col("__t").isNotNull)

    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = last(when(col("__side") === 0, col("__p")), ignoreNulls = true).over(w)

    // allowMissingColumns null-fills each side's absent columns (the
    // left's __p payload, the right's left-only columns)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__c", carried)
      .filter(col("__side") === 1)
      .select(leftOut.map(col) ++ rightCols.map(c => col(s"__c.$c").as(c)): _*)
  }
}
