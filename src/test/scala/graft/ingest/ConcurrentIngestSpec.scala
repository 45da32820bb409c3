package graft.ingest

import java.nio.file.Files
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._
import graft.SparkSpec
import graft.catalog.TableCatalog
import graft.lineproto.LineProtocolParser
import graft.pruning.Pruning

/** Scaled-down analog of the reference's e2e concurrency test
  * (e2e_test.go:44-94: 200 goroutines × 100k rows): many writer threads
  * share one BufferedIngest; every promise must resolve and every row
  * must land exactly once. Exercises the AtomicLong buffered counter and
  * the queue-drain flush under contention. */
class ConcurrentIngestSpec extends SparkSpec {

  test("parallel writers through one buffer: all rows land exactly once") {
    val root = Files.createTempDirectory("graft-conc-")
    val cat = new TableCatalog(root.toString)
    val writer = new IngestWriter(spark, root.toString, cat)
    val buffer = new BufferedIngest(writer, saveTimeoutMs = 100L,
      maxBufferedRows = 500L) // force early-flush triggers too
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val threads = 8
      val batchesPerThread = 25
      val rowsPerBatch = 20
      val futures = (0 until threads).flatMap { t =>
        (0 until batchesPerThread).map { b =>
          Future {
            val lines = (0 until rowsPerBatch)
              .map(r => s"conc,writer=w$t v=${t * 100000 + b * 100 + r}i")
              .mkString("\n")
            val stores = LineProtocolParser.parse(lines).map(buffer.store).toVector
            stores.foreach(Await.result(_, 2.minutes))
          }
        }
      }
      futures.foreach(Await.result(_, 2.minutes))
      buffer.flush()
      val df = Pruning.readTable(spark, cat, "default", "conc")
      val expected = threads * batchesPerThread * rowsPerBatch
      assert(df.count() == expected)
      // exactly once: all v values distinct
      assert(df.select("v").distinct().count() == expected)
    } finally {
      buffer.close()
      pool.shutdown()
    }
  }

  test("throughput regime flushes on the gather cadence, not the save timer (r13)") {
    val root = Files.createTempDirectory("graft-hot-")
    val cat = new TableCatalog(root.toString)
    // timer 3 s, gather 50 ms: a cohort-sized drain must put the buffer
    // in the hot regime so the NEXT batch acks on the gather cadence —
    // under the old fixed-delay ticker the second ack would wait the
    // full 3 s timer again
    val buffer = new BufferedIngest(new IngestWriter(spark, root.toString, cat),
      saveTimeoutMs = 3000L, gatherMs = 50L, throughputRows = 100L)
    try {
      val lines1 = (0 until 200).map(r => s"hot v=${r}i").mkString("\n")
      // first ack rides the first 3 s tick (drains 200 >= 100 -> hot)
      LineProtocolParser.parse(lines1).map(buffer.store)
        .foreach(Await.result(_, 1.minute))
      // enqueue immediately (inside the hot retry window): the ack must
      // arrive on the 50 ms gather cadence, far under the 3 s timer
      val t0 = System.nanoTime()
      val lines2 = (0 until 200).map(r => s"hot v=${1000 + r}i").mkString("\n")
      LineProtocolParser.parse(lines2).map(buffer.store)
        .foreach(Await.result(_, 1.minute))
      val ackSec = (System.nanoTime() - t0) / 1e9
      assert(ackSec < 1.5, s"hot-regime ack took $ackSec s (timer-bound?)")
      val df = Pruning.readTable(spark, cat, "default", "hot")
      assert(df.count() == 400)
    } finally buffer.close()
  }

  test("store after close fails fast instead of hanging a dead promise") {
    val root = Files.createTempDirectory("graft-closed-")
    val cat = new TableCatalog(root.toString)
    val buffer = new BufferedIngest(
      new IngestWriter(spark, root.toString, cat), saveTimeoutMs = 50L)
    val batch = LineProtocolParser.parse("c v=1i 1700000000000000000").toSeq.head
    Await.result(buffer.store(batch), 1.minute) // alive: resolves
    buffer.close()
    val late = buffer.store(batch)
    val e = intercept[IllegalStateException](
      Await.result(late, 5.seconds))
    assert(e.getMessage.contains("closed"))
  }
}
