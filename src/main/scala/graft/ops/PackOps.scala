package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: greedily pack documents into fixed token-budget
  * training sequences — the step between sampling and training in an
  * LLM data pipeline (docs are concatenated into `budget`-token rows;
  * the packer decides which docs share a row and at what offset).
  *
  * Greedy next-fit is a sequential recurrence (bin boundaries depend on
  * every prior doc), so it cannot be a window/prefix-sum — but it
  * parallelizes perfectly across independent SHARDS: shard by a pure
  * function of doc_id, walk each shard in doc_id order with O(1) state.
  * At 100 TB: shard count grows with the corpus (shards of ~1 M docs),
  * each shard is one linear scan inside its partition — one hash
  * shuffle + in-partition sort total, no driver state, no per-group
  * buffering (the iterator streams; state is three scalars).
  *
  * Packing rule (standard next-fit): a doc opens a new bin when the
  * current bin is non-empty and the doc would overflow it; an oversize
  * doc (n_tok > budget) sits alone in its own bin at offset 0 (the
  * trainer's chunker splits it downstream). Output is integers only —
  * the DuckDB oracle replays the recurrence as a recursive CTE and the
  * compare is exact.
  */
object PackOps {
  final case class SizedDoc(shard: Int, doc_id: Long, n_tok: Int)
  final case class PackedDoc(shard: Int, doc_id: Long, n_tok: Int,
                             bin: Long, off_tok: Long)

  /** Pack `sized` (columns shard:int, doc_id:long, n_tok:int) into
    * per-shard bins of `budget` tokens. Deterministic: output is a pure
    * function of the (shard, doc_id, n_tok) rows. */
  def packGreedy(sized: DataFrame, budget: Int): DataFrame = {
    val spark = sized.sparkSession
    import spark.implicits._
    val ds = sized.select(col("shard").cast("int").as("shard"),
      col("doc_id").cast("long").as("doc_id"),
      col("n_tok").cast("int").as("n_tok")).as[SizedDoc]
    // secondary-sort pattern: hash the shards across partitions, sort
    // within each partition by (shard, doc_id), stream with state reset
    // at shard boundaries — several shards may share a partition, each
    // still sees its docs contiguously and in order
    ds.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .mapPartitions { rows =>
        var cur = Int.MinValue
        var bin = 0L
        var fill = 0L
        rows.map { d =>
          if (d.shard != cur) { cur = d.shard; bin = 0L; fill = 0L }
          if (fill > 0 && fill + d.n_tok > budget) { bin += 1; fill = 0L }
          val off = fill
          fill += d.n_tok
          PackedDoc(d.shard, d.doc_id, d.n_tok, bin, off)
        }
      }
      .toDF()
  }

  /** DuckDB oracle: the same next-fit recurrence as a recursive CTE —
    * all shards advance in lockstep, one doc per shard per iteration
    * (depth = max docs/shard; fine at oracle scale, and the point: the
    * oracle proves the distributed scan computes the SEQUENTIAL
    * definition). Same tokenizer as p08/p21. */
  def packGreedySql(shards: Int, budget: Int, table: String = "documents"): String =
    s"""WITH RECURSIVE d AS (
       |  SELECT doc_id, CAST(doc_id % $shards AS INT) AS shard,
       |    len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tok,
       |    row_number() OVER (PARTITION BY doc_id % $shards ORDER BY doc_id) AS rn
       |  FROM $table),
       |walk AS (
       |  SELECT shard, doc_id, n_tok, rn,
       |    CAST(0 AS BIGINT) AS bin, CAST(0 AS BIGINT) AS off_tok,
       |    CAST(n_tok AS BIGINT) AS fill
       |  FROM d WHERE rn = 1
       |  UNION ALL
       |  SELECT d.shard, d.doc_id, d.n_tok, d.rn,
       |    CASE WHEN w.fill > 0 AND w.fill + d.n_tok > $budget
       |         THEN w.bin + 1 ELSE w.bin END,
       |    CASE WHEN w.fill > 0 AND w.fill + d.n_tok > $budget
       |         THEN 0 ELSE w.fill END,
       |    CASE WHEN w.fill > 0 AND w.fill + d.n_tok > $budget
       |         THEN CAST(d.n_tok AS BIGINT) ELSE w.fill + d.n_tok END
       |  FROM walk w JOIN d ON d.shard = w.shard AND d.rn = w.rn + 1)
       |SELECT shard, doc_id, n_tok, bin, off_tok FROM walk
       |ORDER BY shard, doc_id""".stripMargin
}
