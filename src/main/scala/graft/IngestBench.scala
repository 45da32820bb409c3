package graft

import java.nio.file.Files
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.lit
import graft.catalog.TableCatalog
import graft.ingest.{BufferedIngest, IngestWriter}
import graft.lineproto.LineProtocolParser

/** Ingest throughput smoke — the analog of the reference's e2e test
  * (e2e_test.go:44-94: 200 goroutines × 100 k rows × 3 cols, prints
  * rows/sec, no canonical figure). Two paths:
  *
  *  - `buffered`: the reference-shaped driver path — concurrent writers
  *    parse line protocol and enqueue into BufferedIngest; durable
  *    parquet + manifest per flush. Driver-bound by design (SURVEY §7
  *    risk 3); it exists for protocol parity, not scale.
  *  - `bulk`: storeDataFrame of pre-built rows — the write-path ceiling
  *    (partitioned sort + parquet + manifest, no parse).
  *
  * Prints one JSON line. Env: SPARK_GRAFT_INGEST_ROWS (default 1M),
  * SPARK_GRAFT_CPUS.
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val totalRows = sys.env.getOrElse("SPARK_GRAFT_INGEST_ROWS", "1000000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --- buffered path: writers -> parse -> BufferedIngest -> flush ---
    val root1 = Files.createTempDirectory("graft-ibench-buf-")
    val cat1 = new TableCatalog(root1.toString)
    val buf = new BufferedIngest(new IngestWriter(spark, root1.toString, cat1),
      saveTimeoutMs = 1000L)
    val threads = 8
    val batchRows = 10000
    val batches = math.max(1, totalRows / (threads * batchRows))
    val pool = Executors.newFixedThreadPool(threads)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val t0 = System.nanoTime()
    val fs = (0 until threads).map { t =>
      Future {
        (0 until batches).foreach { b =>
          val base = 1700000000000000000L + (t.toLong * batches + b) * 1000000L
          val lines = new StringBuilder
          (0 until batchRows).foreach { r =>
            lines.append(s"bench,host=h$t value=${r * 0.5},seq=${b * batchRows + r}i ${base + r}\n")
          }
          LineProtocolParser.parse(lines.result())
            .map(buf.store).foreach(Await.result(_, 10.minutes))
        }
      }
    }
    fs.foreach(Await.result(_, 30.minutes))
    buf.flush()
    val bufferedSec = (System.nanoTime() - t0) / 1e9
    val bufferedRows = threads.toLong * batches * batchRows
    buf.close(); pool.shutdown()

    // --- bulk path: storeDataFrame of pre-built rows ---
    val root2 = Files.createTempDirectory("graft-ibench-bulk-")
    val cat2 = new TableCatalog(root2.toString)
    val w2 = new IngestWriter(spark, root2.toString, cat2)
    import spark.implicits._
    val df = spark.range(totalRows.toLong).select(
      ($"id" % 8).cast("string").as("host"),
      ($"id" * 0.5).as("value"),
      $"id".as("seq"),
      (lit(1700000000000000000L) + $"id").as("time"))
    val t1 = System.nanoTime()
    w2.storeDataFrame("default", "bulk", df)
    val bulkSec = (System.nanoTime() - t1) / 1e9

    // --- stream path: the StreamIngest micro-batch shape — per-task
    // sorted files (singleFile=false), write scales with cores ---
    val root3 = Files.createTempDirectory("graft-ibench-stream-")
    val cat3 = new TableCatalog(root3.toString)
    val w3 = new IngestWriter(spark, root3.toString, cat3)
    val dfPar = df.repartition(cpus.toInt)
    val t2 = System.nanoTime()
    val streamFiles = w3.storeDataFrame("default", "stream", dfPar, singleFile = false)
    val streamSec = (System.nanoTime() - t2) / 1e9

    println(s"""{"metric":"ingest_rows_per_sec","buffered":${(bufferedRows / bufferedSec).toLong},""" +
      s""""buffered_rows":$bufferedRows,"buffered_sec":$bufferedSec,""" +
      s""""bulk":${(totalRows / bulkSec).toLong},"bulk_rows":$totalRows,"bulk_sec":$bulkSec,""" +
      s""""stream":${(totalRows / streamSec).toLong},"stream_rows":$totalRows,""" +
      s""""stream_sec":$streamSec,"stream_files":${streamFiles.size}}""")
    spark.stop()
  }
}
