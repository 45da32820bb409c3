package graft.server

import java.util.concurrent.{CountDownLatch, TimeUnit}
import org.scalatest.funsuite.AnyFunSuite

/** Job-registry semantics that need controlled timing (latches), no
  * Spark: duplicate-key rejection, shutdown draining, ledger reload. */
class ArtifactJobsSpec extends AnyFunSuite {

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("graft-jobs-").toFile

  test("per-key serialization: duplicate in-flight submit is rejected with the live id (ADVICE r7)") {
    val a = new ArtifactJobs(None, workers = 2)
    val gate = new CountDownLatch(1)
    val id1 = a.submit("bpe:d:t", () => { gate.await(30, TimeUnit.SECONDS); "{}" })
    val dup = intercept[a.DuplicateJob](a.submit("bpe:d:t", () => "{}"))
    assert(dup.existingId == id1)
    assert(dup.getMessage.contains("bpe:d:t"))
    // a different key is NOT serialized against it
    val id2 = a.submit("ivf:d:t", () => "{}")
    assert(id2 != id1)
    gate.countDown()
    val deadline = System.currentTimeMillis + 10000
    while (a.status(id1).exists(s => s == a.Pending || s == a.Running) &&
           System.currentTimeMillis < deadline) Thread.sleep(20)
    assert(a.status(id1).contains(a.Done("{}")))
    // key freed after completion: same-key resubmit accepted
    val id3 = a.submit("bpe:d:t", () => "{}")
    assert(id3 != id1)
    a.close()
  }

  test("close drains: queued jobs fail loudly, late submits rejected clearly (ADVICE r7)") {
    val a = new ArtifactJobs(None, workers = 1)
    val gate = new CountDownLatch(1)
    val started = new CountDownLatch(1)
    val running = a.submit("k1:d:t", () => {
      started.countDown(); gate.await(30, TimeUnit.SECONDS); "{}"
    })
    started.await(10, TimeUnit.SECONDS)
    val queued = a.submit("k2:d:t", () => "{}") // sits pending behind the 1 worker
    a.close() // interrupts the runner, drains the queue
    Seq(running, queued).foreach { id =>
      a.status(id) match {
        case Some(a.Failed(msg)) => assert(msg.contains("shutting down"), s"$id: $msg")
        case other => fail(s"$id not failed after close: $other")
      }
    }
    val e = intercept[IllegalStateException](a.submit("k3:d:t", () => "{}"))
    assert(e.getMessage.contains("shutting down"))
  }

  test("ledger: done jobs survive reload; interrupted ones demote to failed (VERDICT r7 #6)") {
    val dir = tmpDir()
    val a = new ArtifactJobs(Some(dir), workers = 1)
    val id = a.submit("bloom:d:t", () => """{"ok":true}""")
    val deadline = System.currentTimeMillis + 10000
    while (!a.status(id).exists(_.isInstanceOf[a.Done]) &&
           System.currentTimeMillis < deadline) Thread.sleep(20)
    assert(a.status(id).contains(a.Done("""{"ok":true}""")))
    a.close()

    // hand-plant a pending entry (a job whose process died mid-build)
    val f = new java.io.File(dir, "jobs.json")
    val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    val planted = txt.replace("]}",
      """,{"job":"job-7","key":"pq:d:t","status":"pending"}]}""")
    java.nio.file.Files.write(f.toPath, planted.getBytes("UTF-8"))

    val b = new ArtifactJobs(Some(dir), workers = 1)
    b.status(id) match {
      case Some(b.Done(r)) => assert(r.contains("\"ok\":true"), r)
      case other => fail(s"done job lost across reload: $other")
    }
    b.status("job-7") match {
      case Some(b.Failed(msg)) => assert(msg.contains("interrupted"), msg)
      case other => fail(s"planted pending not demoted: $other")
    }
    // id sequence resumes past the loaded max — no collisions
    val fresh = b.submit("x:d:t", () => "{}")
    assert(fresh.stripPrefix("job-").toLong > 7L)
    b.close()

    // a SECOND restart must still serve the done job: the boot-time
    // demotion persist once ran before MaxLedgerTerminal initialized
    // (read 0) and truncated every terminal entry from the ledger —
    // silent data loss on the restart after a restart
    val c = new ArtifactJobs(Some(dir), workers = 1)
    c.status(id) match {
      case Some(c.Done(r)) => assert(r.contains("\"ok\":true"), r)
      case other => fail(s"done job lost across SECOND reload: $other")
    }
    c.close()
  }

  test("eviction never drops a live publication's newest Done; memory stays bounded") {
    // code-review r9: a global newest-N window could silently evict a
    // still-served artifact's only rebind record once enough unrelated
    // build history accumulated — the newest Done per key is exempt,
    // and the same window now bounds the in-memory map too
    val a = new ArtifactJobs(None, workers = 1)
    val early = a.runSync("bm25:d:tA")(() => """{"v":1}""")
    assert(early == """{"v":1}""")
    // a superseded same-key Done IS evictable; the newer one is not
    a.runSync("bm25:d:tA")(() => """{"v":2}""")
    // pile far more than MaxLedgerTerminal failures on other keys
    (1 to a.MaxLedgerTerminal + 150).foreach { i =>
      intercept[RuntimeException] {
        a.runSync(s"bloom:d:t$i")(() => sys.error(s"boom $i"))
      }
    }
    val completed = a.completedOldestFirst()
    assert(completed == Seq("bm25:d:tA" -> """{"v":2}"""),
      s"newest Done per key must survive any amount of history: $completed")
    // the in-memory registry is bounded by the same window (+ exempt set)
    assert(a.all().size <= a.MaxLedgerTerminal + 2, a.all().size.toString)
    // the oldest failures were evicted from status serving too
    assert(a.status("job-3").isEmpty)
    a.close()
  }
}
