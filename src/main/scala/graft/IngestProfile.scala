package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.catalog.TableCatalog
import graft.ingest.IngestWriter
import graft.lineproto.LineProtocolParser

/** One-off phase profiler for the buffered ingest path (VERDICT r12 #2:
  * the face has been flat at ~111 k rows/s for three rounds — measure
  * where a flush's time actually goes before reaching for a cure).
  *
  * Phases measured on a single merged flush-sized batch (the steady
  * state the bench converges to: all writer threads' batches drain into
  * ONE writer.store call):
  *   parse      — line-protocol text → Batch (driver CPU)
  *   build      — Batch → DataFrame (toDataFrame: driver-parallel flat
  *                UnsafeRow chunk conversion, eager)
  *   count      — payload ship + scan (no parquet encode)
  *   store      — full writer.store (job + stats + manifest + rename)
  *
  * Usage: runMain graft.IngestProfile [rows] (default 320k = 32
  * writers × 10k, the bench's natural flush size).
  */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toInt else 320000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("graft-iprof-")
    val cat = new TableCatalog(root.toString)
    val w = new IngestWriter(spark, root.toString, cat)

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // 3 reps: rep 1 carries codegen/JIT
    (1 to 3).foreach { rep =>
      val text = {
        val sb = new StringBuilder(rows * 48)
        var r = 0
        while (r < rows) {
          sb.append(s"bench,host=h${r % 32} value=${r * 0.5},seq=${r}i ${1700000000000000000L + r}\n")
          r += 1
        }
        sb.result()
      }
      val (batches, parseSec) = time(LineProtocolParser.parse(text).toVector)
      val batch = {
        val b = batches.head
        LineProtocolParser.Batch(b.database, b.table, b.schema,
          batches.flatMap(_.rows))
      }
      val (df, buildSec) = time(w.toDataFrame(batch))
      // materialize the conversion cost separately from the write: count
      // forces row conversion + serialization without parquet encode
      val (_, countSec) = time(df.count())
      val (_, storeSec) = time(w.store(batch))
      println(f"[iprof] rep=$rep rows=$rows parse=$parseSec%.3f build=$buildSec%.3f " +
        f"count=$countSec%.3f store=$storeSec%.3f " +
        f"store_rows_per_sec=${(rows / storeSec).toLong}")
    }

    // cleanup
    val s = Files.walk(root)
    try s.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
    finally s.close()
    spark.stop()
  }
}
