package graft.ingest

import java.util.concurrent.{ConcurrentLinkedQueue, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicLong
import scala.concurrent.{Future, Promise}
import scala.jdk.CollectionConverters._
import graft.lineproto.LineProtocolParser.Batch

/** Micro-batch ingest buffer (reference N12, merge_tree_service.go:179-213):
  * writers enqueue parsed batches and get a promise completed after the
  * durable flush; a ticker flushes every `saveTimeoutMs` (reference default
  * 1 s) or immediately past `maxBufferedRows` (reference: 1 M).
  *
  * Backpressure exactly like the reference: the HTTP handler blocks on the
  * promise, so clients see 204 only after their rows hit parquet.
  */
final class BufferedIngest(writer: IngestWriter,
                           saveTimeoutMs: Long = 1000L,
                           maxBufferedRows: Long = 1000000L) extends AutoCloseable {

  private final case class Pending(batch: Batch, done: Promise[Unit])
  private val queue = new ConcurrentLinkedQueue[Pending]()
  // AtomicLong: += on a @volatile var from concurrent HTTP threads loses
  // updates and the 1 M-row early-flush trigger can fire late or never.
  private val buffered = new AtomicLong(0L)
  private val scheduler = Executors.newSingleThreadScheduledExecutor(r => {
    val t = new Thread(r, "graft-ingest-flush"); t.setDaemon(true); t
  })
  scheduler.scheduleWithFixedDelay(() => flush(), saveTimeoutMs, saveTimeoutMs,
    TimeUnit.MILLISECONDS)

  @volatile private var closed = false

  def store(batch: Batch): Future[Unit] = {
    // fail fast after close(): the ticker is gone, so an enqueued batch
    // would never flush — the caller would block on the promise forever
    // and the rows would be silently lost (and scheduler.execute below
    // would throw RejectedExecutionException out of store)
    if (closed)
      return Future.failed(new IllegalStateException("BufferedIngest is closed"))
    val p = Promise[Unit]()
    queue.add(Pending(batch, p))
    val big = buffered.addAndGet(batch.size.toLong) >= maxBufferedRows
    // re-check AFTER the add: a close() racing past the first check
    // drains the queue once — if we now read closed=true, our add may
    // have landed after that drain, so flush ourselves (idempotent,
    // synchronized). If we read false, close()'s volatile write hadn't
    // happened yet, so its later drain observes our earlier add. Either
    // way the batch is written and the promise completes — the old
    // order could silently drop the rows and park the caller for the
    // full ack timeout.
    if (closed) flush()
    else if (big)
      try scheduler.execute(() => flush())
      catch { // shutdown raced between the check and the submit
        case _: java.util.concurrent.RejectedExecutionException => flush()
      }
    p.future
  }

  /** Drain and durably write everything queued; complete promises. */
  def flush(): Unit = synchronized {
    val drained = Iterator.continually(queue.poll()).takeWhile(_ != null).toVector
    if (drained.isEmpty) return
    buffered.addAndGet(-drained.map(_.batch.size.toLong).sum)
    // group same-(db,table,schema) batches IN FIRST-ARRIVAL ORDER
    // (review r10): groupBy's Map iterates hash-ordered, so two
    // different-schema batches for one new table could reach
    // catalog.evolve reversed — the opposite of the reference's
    // arrival-order first-type-wins. Sorting groups by their first
    // drained index restores the write order the queue guarantees.
    drained.zipWithIndex
      .groupBy { case (p, _) => (p.batch.database, p.batch.table, p.batch.schema) }
      .toSeq.sortBy { case (_, ps) => ps.head._2 }
      .foreach { case ((db, table, schema), psi) =>
        val ps = psi.map(_._1)
        try {
          val merged = Batch(db, table, schema, ps.flatMap(_.batch.rows).toVector)
          writer.store(merged)
          ps.foreach(_.done.trySuccess(()))
        } catch {
          case e: Throwable => ps.foreach(_.done.tryFailure(e))
        }
      }
  }

  /** Stop accepting, then drain. A producer that raced past the closed
    * check either lands its batch before this drain (it reads
    * closed=false on the post-add re-check, so our volatile write —
    * and this flush — come after its add), or reads closed=true and
    * flushes its own batch; later store() calls fail fast. */
  override def close(): Unit = {
    closed = true
    scheduler.shutdown()
    flush()
  }
}
