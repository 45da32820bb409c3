package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series analytics in the reference's metrics domain (int64-ns
  * time model, SURVEY §1): downsample + gap-fill, and the ClickHouse
  * funnel/retention analytics that sit next to the §2.3 scalar alias
  * surface (ClickHouse `windowFunnel`/`retention`; re-derived here as
  * window-function dataflows, not ports — ref exposes CH compat via
  * `aliases.sql`, these are the analytic counterparts a CH user expects).
  *
  * Everything is oracle-replayable: the same window/when dataflow is
  * rendered to DuckDB SQL so results hash-match bit-for-bit.
  */
object TimeSeriesOps {

  /** Downsample `valCol` into fixed `bucketNs` buckets per `key`, then
    * materialize EVERY bucket in each key's [min,max] span and fill the
    * empty ones by carrying the last observed average forward (LOCF) —
    * the canonical metrics-dashboard query (downsample + gap-fill).
    *
    * Scale shape: the aggregate is one keyed shuffle with partial agg;
    * the grid is generated per key with `sequence()` (no driver state —
    * each key's grid explodes from its OWN (min,max) row, so total grid
    * size is span/bucket summed over keys, never keys × global span);
    * the carry-forward is one window scan per key. Per-key grid length
    * is bounded by span/bucketNs — pick bucketNs so that bound fits a
    * task (a 10-year span at 1 h buckets is 88 k rows/key); beyond
    * that, carry the fill across range-partition boundaries the way
    * AsOfJoin carries its payload.
    *
    * Output: key, bucket_ts (ns), n (observed rows), v_avg (null on
    * gaps), v_fill (LOCF; buckets before a key's first observation
    * cannot exist since the grid starts at the key's min). */
  def gapFill(ev: DataFrame, key: String, timeCol: String, valCol: String,
              bucketNs: Long): DataFrame = {
    // a zero bucket silently yields an empty frame in non-ANSI Spark
    // (pmod/DIV by 0 -> null everywhere) — fail loudly instead, the
    // RangeJoin precedent (review r10)
    require(bucketNs > 0, "bucketNs must be positive")
    // FLOOR division, not DIV: Spark DIV truncates toward zero while the
    // DuckDB oracle's // floors, so a pre-1970 (negative-ns) timestamp
    // would bucket differently between engines. pmod is non-negative, so
    // (t - pmod(t, b)) / b is exact floor division in long arithmetic.
    val floorDiv = expr(s"($timeCol - pmod($timeCol, $bucketNs)) DIV $bucketNs")
    val obs = ev.groupBy(col(key), floorDiv.as("b"))
      .agg(count(lit(1)).as("n"), avg(col(valCol)).as("v_avg"))
    val grid = obs.groupBy(col(key))
      .agg(min("b").as("b0"), max("b").as("b1"))
      .select(col(key), explode(sequence(col("b0"), col("b1"))).as("b"))
    val w = Window.partitionBy(key).orderBy("b")
    grid.join(obs, Seq(key, "b"), "left")
      .select(col(key), (col("b") * bucketNs).as("bucket_ts"),
        coalesce(col("n"), lit(0L)).as("n"), col("v_avg"),
        last("v_avg", ignoreNulls = true).over(w).as("v_fill"))
  }

  /** DuckDB oracle for `gapFill` over events filtered to
    * `event_id % sparsify = 0` (sparsified so gaps actually occur at
    * every test SF), keyed by event_type. */
  def gapFillSql(bucketNs: Long, sparsify: Long, scale: Int = 4): String =
    s"""WITH e AS (
       |  SELECT event_type AS etype, epoch_ns(ts) // $bucketNs AS b, value
       |  FROM events WHERE event_id % $sparsify = 0),
       |obs AS (
       |  SELECT etype, b, count(*) AS n, avg(value) AS v FROM e GROUP BY 1, 2),
       |grid AS (
       |  SELECT etype, unnest(generate_series(b0, b1)) AS b
       |  FROM (SELECT etype, min(b) AS b0, max(b) AS b1 FROM obs GROUP BY 1)),
       |f AS (
       |  SELECT g.etype, g.b, coalesce(o.n, 0) AS n, o.v,
       |    last_value(o.v IGNORE NULLS) OVER (
       |      PARTITION BY g.etype ORDER BY g.b) AS vf
       |  FROM grid g LEFT JOIN obs o ON o.etype = g.etype AND o.b = g.b)
       |SELECT etype, b * $bucketNs AS bucket_ts, n,
       |  ${OracleSql.roundD("v", scale)} AS v_avg,
       |  ${OracleSql.roundD("vf", scale)} AS v_fill
       |FROM f ORDER BY etype, bucket_ts""".stripMargin

  /** ClickHouse-windowFunnel-style stage progression per `key`: the max
    * level L such that events matching stages(0..L-1) occur at strictly
    * increasing (timeCol, tieCol) rank with t_L - t_1 <= windowNs (the
    * window anchors at the CHAIN'S FIRST event, as in CH).
    *
    * Chain DP via window functions, never collect_list: for each row,
    * m_j = running max over STRICTLY EARLIER rows of the start time of
    * any level-j chain; a stage-(j+1) row extends iff t - m_j <=
    * windowNs. Maximizing the start time is optimal — a chain with an
    * earlier start only tightens the window — so the running max is the
    * whole state. One sort per key (all layers share the window spec),
    * linear scan, per-row state is `stages.size` longs: no per-user
    * arrays, no skew beyond the keyed sort itself. */
  def windowFunnel(ev: DataFrame, key: String, timeCol: String, tieCol: String,
                   stages: Seq[Column], windowNs: Long): DataFrame = {
    require(stages.nonEmpty, "windowFunnel needs at least one stage")
    // reserved internals (the asof precedent): a caller column named
    // s<j> would be silently overwritten — and silently CORRUPT the
    // result if a stage condition references it (review r10)
    (1 to stages.size).map(j => s"s$j").foreach { n =>
      require(!ev.columns.contains(n),
        s"windowFunnel: column name '$n' is reserved by the implementation")
    }
    val wPrev = Window.partitionBy(key).orderBy(col(timeCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val t = col(timeCol)
    var df = ev.withColumn("s1", when(stages.head, t))
    stages.zipWithIndex.drop(1).foreach { case (cond, i) =>
      val m = max(col(s"s$i")).over(wPrev)
      df = df.withColumn(s"s${i + 1}", when(cond && t - m <= windowNs, m))
    }
    // fold ASCENDING so the HIGHEST stage lands as the outermost when():
    // a row matching several stages must report the highest level (the
    // DuckDB rendering below lists WHEN s_max first for the same reason)
    val lvl = (1 to stages.size).foldLeft(lit(0)) { (acc, j) =>
      when(col(s"s$j").isNotNull, j).otherwise(acc)
    }
    df.groupBy(col(key)).agg(max(lvl).as("funnel_level"))
  }

  /** DuckDB oracle for `windowFunnel` over events keyed by user_id with
    * event_type equality stages. */
  def windowFunnelSql(stages: Seq[String], windowNs: Long): String = {
    val base =
      s"""WITH e0 AS (
         |  SELECT user_id, epoch_ns(ts) AS t, event_id, event_type
         |  FROM events),
         |e1 AS (SELECT *, CASE WHEN event_type = ${OracleSql.sqlStr(stages.head)} THEN t END AS s1 FROM e0)""".stripMargin
    val layers = stages.zipWithIndex.drop(1).map { case (st, i) =>
      val j = i + 1
      s"""m$i AS (SELECT *, max(s$i) OVER (PARTITION BY user_id
         |    ORDER BY t, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx$i FROM ${if (i == 1) "e1" else s"m${i - 1}x"}),
         |m${i}x AS (SELECT *, CASE WHEN event_type = ${OracleSql.sqlStr(st)}
         |    AND t - mx$i <= $windowNs THEN mx$i END AS s$j FROM m$i)""".stripMargin
    }
    val lvl = (stages.size to 1 by -1)
      .map(j => s"WHEN s$j IS NOT NULL THEN $j").mkString(" ")
    val lastCte = if (stages.size == 1) "e1" else s"m${stages.size - 1}x"
    (Seq(base) ++ layers).mkString(",\n") +
      s"""
         |SELECT user_id, max(CASE $lvl ELSE 0 END) AS funnel_level
         |FROM $lastCte GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  /** ClickHouse-retention-style cohort flags per `key`: r0 = any event
    * matched conds(0); r_i (i>0) = conds(0) AND conds(i) both matched —
    * CH `retention()` semantics, computed as one keyed aggregate of
    * max(when) flags (partial-agged, single shuffle, no event order
    * dependence). */
  def retention(ev: DataFrame, key: String, conds: Seq[Column]): DataFrame = {
    require(conds.nonEmpty, "retention needs at least one condition")
    val flags = conds.zipWithIndex.map { case (c, i) =>
      max(when(c, 1).otherwise(0)).as(s"f$i")
    }
    val agged = ev.groupBy(col(key)).agg(flags.head, flags.tail: _*)
    val rs = conds.indices.map { i =>
      (if (i == 0) col("f0") else col("f0") * col(s"f$i")).as(s"r$i")
    }
    agged.select(col(key) +: rs: _*)
  }

  /** DuckDB oracle for `retention` over events keyed by user_id, with
    * conds = `eventType` activity in week i since `originNs` (epoch-
    * anchored weeks, not per-user cohorts — same grid both engines). */
  def retentionSql(originNs: Long, weekNs: Long, weeks: Int,
                   eventType: String): String = {
    val fs = (0 until weeks).map(i =>
      s"""max(CASE WHEN event_type = ${OracleSql.sqlStr(eventType)}
         |    AND (epoch_ns(ts) - $originNs) // $weekNs = $i
         |    THEN 1 ELSE 0 END) AS f$i""".stripMargin)
    val rs = (0 until weeks).map(i => if (i == 0) "f0 AS r0" else s"f0 * f$i AS r$i")
    s"""WITH f AS (
       |  SELECT user_id, ${fs.mkString(",\n    ")}
       |  FROM events GROUP BY user_id)
       |SELECT user_id, ${rs.mkString(", ")}
       |FROM f ORDER BY user_id""".stripMargin
  }
}
