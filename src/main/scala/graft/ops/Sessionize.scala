package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over int64-ns event times: consecutive
  * events of a key belong to one session until a silence longer than
  * `gapNs` starts the next — the batch analog of streaming session
  * windows, and a standard unit for training-data event logs (one
  * session ≈ one behavioral document).
  *
  * Plan: one keyed window (hash shuffle on the key + in-partition sort)
  * computes the new-session flag via lag and its running sum — linear,
  * no joins. `tieCol` must make (timeCol, tieCol) unique per key so the
  * ordering — and therefore session numbering — is deterministic.
  */
object Sessionize {

  /** Adds `session_seq` (0-based per key, in time order). */
  def sessionize(df: DataFrame, key: String, timeCol: String, tieCol: String,
                 gapNs: Long): DataFrame = {
    // reserved internals / output name (the asof precedent): a caller
    // column named __new would be silently replaced then dropped, an
    // existing session_seq silently clobbered — fail loudly (review r10)
    Seq("__new", "session_seq").foreach { n =>
      require(!df.columns.contains(n),
        s"sessionize: column name '$n' is reserved by the implementation")
    }
    val w = Window.partitionBy(col(key)).orderBy(col(timeCol), col(tieCol))
    df
      // lag is null on each key's first row -> otherwise(0): first event
      // opens session 0 (same null semantics as SQL's CASE)
      .withColumn("__new",
        when(col(timeCol) - lag(col(timeCol), 1).over(w) > gapNs, 1).otherwise(0))
      .withColumn("session_seq",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }
}
