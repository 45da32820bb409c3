package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // coalesce post-shuffle partitions by size, not parallelism —
      // collapses the many tiny exchanges these small-SF runs otherwise
      // schedule cores-wide. The advisory size must be SMALL: coalescing
      // merges adjacent partitions up to the target, so 64 MB (default)
      // folded the heavy self-join exchanges (~10 MB/partition at sf0.1)
      // down to a few tasks — measured +14..34% on p02/p03/p06/q12 in r3.
      // At 1 MB sub-MB exchanges still collapse to one task while
      // anything core-scale keeps its full fan-out (A/B: p02 3.44 s @
      // 64 MB, 2.54 s @ 1 MB, 2.64 s with parallelismFirst=true).
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // prime page cache + parquet footers + temp views + codegen JIT so
    // per-query times measure the queries, not whichever one runs first.
    // Each query also runs once against the smallest SF: a query's FIRST
    // execution pays its class-loading + codegen compilation (measured:
    // p02 9.2 s cold vs 2.0 s steady at sf0.1; p13's KMeans 3.1 vs 1.7),
    // which would otherwise be billed to whichever query the map ordered
    // first. sf0.001 is ~1000x smaller than the measured SF, so the warm
    // pass costs seconds and touches none of the measured data.
    try {
      Tables.views(spark, sfDir)
      // full-column noop scan, not count(): count() reads only parquet
      // metadata, so whichever query first touched a table's column
      // pages was billed that table's disk I/O (measured: q01 2.7 s
      // first-touch vs 0.7 s steady on sf0.1 lineitem). Page-cache +
      // footer warm-up is what the reference's warm benchmark runs get.
      Tables.names.foreach(n =>
        spark.table(n).write.format("noop").mode("overwrite").save())
      val warmDir = "/root/testdata/sf0.001"
      // canonical compare: a trailing slash / relative SPARK_GRAFT_SF_DIR
      // naming the same dir must not defeat the don't-warm-on-measured guard
      val warmF = new java.io.File(warmDir)
      if (warmF.isDirectory &&
          warmF.getCanonicalPath != new java.io.File(sfDir).getCanonicalPath)
        SparkEntry.queries.foreach { case (_, fn) =>
          try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => () }
        }
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink executes the FULL plan (projection, sort, limit) —
      // count() would let Spark drop projection work for some queries.
      // -1 marks a failed query so fast failures never read as fast runs.
      val sec =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      name -> sec
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // ingest throughput at the reference's e2e volume (20 M rows,
    // e2e_test.go:44-94): bulk + stream write the full volume; the
    // buffered path is capped — it is ack-latency-bound by design, so
    // its rows/sec is flat in volume and a capped run measures the same
    // figure without minutes of wall-clock.
    val ingestRows = sys.env.getOrElse("SPARK_GRAFT_INGEST_ROWS", "20000000").toLong
    val ingest =
      try IngestBench.run(spark, bulkRows = ingestRows, streamRows = ingestRows,
        bufferedRows = math.min(ingestRows, 640000L))
      catch { case e: Throwable => s"""{"error":${graft.server.JsonOut.str(e.toString)}}""" }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""ingest_rows_per_sec":$ingest,"sf":"$sfDir"}""")
    spark.stop()
  }
}
