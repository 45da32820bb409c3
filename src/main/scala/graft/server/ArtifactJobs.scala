package graft.server

import java.util.concurrent.{ConcurrentHashMap, Executors, RejectedExecutionException, TimeUnit}
import java.util.concurrent.atomic.AtomicLong
import scala.util.control.NonFatal

/** Background artifact-build job registry (VERDICT r6 #1): training a
  * cluster map or an index over a production corpus is minutes-to-hours
  * of Spark jobs, so `POST /gigapi/artifacts` must not hold an HTTP
  * handler thread (and its connection) for the duration. The reference's
  * own precedent for long background work is the ticker-driven merge
  * registry (reference registry.go:42-62); this is the submit-once
  * variant of the same executor pattern `compact/MergeScheduler` uses —
  * POST enqueues and returns a job id, `GET /gigapi/artifacts/{id}`
  * serves pending/running/done/failed.
  *
  * Workers are a small fixed pool: each build is itself a sequence of
  * cluster-parallel Spark jobs, so queuing builds driver-side costs
  * nothing at scale — two concurrent trainings already saturate a
  * cluster's scheduler pools more fairly than N would.
  *
  * Durability (VERDICT r7 #6): job state persists as a one-file ledger
  * under the lakehouse root (`.artifacts/jobs.json`, the MetadataIndex
  * rewrite-and-rename pattern — `index/MetadataIndex.scala:70`), so a
  * restart between the 202 and the status poll doesn't lose the id the
  * caller holds. Jobs that were pending/running when the process died
  * load back as failed("interrupted by server restart") — the honest
  * answer, since the build's Spark jobs died with the JVM; the published
  * views/functions of COMPLETED builds were always durable on parquet.
  *
  * Builds are serialized per (db, table, kind) (ADVICE r7): two
  * concurrent trainings of the same key would race their publications
  * on the 2-worker pool and could leave the latest-binding alias bound
  * to the OLDER training. A duplicate submit while one is in flight is
  * rejected with the existing job id — the caller polls that instead. */
final class ArtifactJobs(ledgerDir: Option[java.io.File] = None,
                         workers: Int = 2) extends AutoCloseable {

  sealed trait State { def name: String }
  case object Pending extends State { val name = "pending" }
  case object Running extends State { val name = "running" }
  final case class Done(resultJson: String) extends State { val name = "done" }
  final case class Failed(error: String) extends State { val name = "failed" }

  /** Thrown by submit when the same (db, table, kind) key already has a
    * pending/running build. */
  final class DuplicateJob(val existingId: String, key: String)
    extends IllegalStateException(
      s"a build for $key is already in flight: $existingId")

  /** Terminal entries kept (newest first) BEYOND the always-retained
    * set — declared BEFORE the constructor's loadLedger() call: a val
    * below it would still read 0 during the boot-time demotion persist,
    * truncating every terminal entry from the ledger at startup (the
    * latent double-restart data loss the eviction spec caught). */
  val MaxLedgerTerminal = 1000

  private val seq = new AtomicLong(0L)
  private val jobs = new ConcurrentHashMap[String, (String, State)]() // id -> (key, state)
  private val inFlight = new ConcurrentHashMap[String, String]()      // key -> id
  @volatile private var closing = false
  private val pool = Executors.newFixedThreadPool(workers, r => {
    val t = new Thread(r, "graft-artifact-build")
    t.setDaemon(true)
    t
  })

  loadLedger()

  /** Enqueue `build` (which returns the result JSON the synchronous
    * path would have responded with); returns the job id immediately.
    * `key` identifies what is being built (kind:db:table) for the
    * in-flight duplicate guard. */
  def submit(key: String, build: () => String): String = {
    if (closing) throw new IllegalStateException(
      "server shutting down; build not accepted")
    val id = s"job-${seq.incrementAndGet()}"
    val prior = inFlight.putIfAbsent(key, id)
    if (prior != null) throw new DuplicateJob(prior, key)
    transition(id, key, Pending)
    try pool.submit(new Runnable {
      def run(): Unit = {
        transition(id, key, Running)
        // free the key BEFORE the terminal transition: a caller who
        // polls `done` must be able to resubmit immediately — the old
        // remove-after order left a window where status read terminal
        // but a same-key submit still hit DuplicateJob. Safe: build()
        // (including its publication) has fully completed first.
        try { val r = build(); inFlight.remove(key, id); transition(id, key, Done(r)) }
        catch {
          case _: InterruptedException =>
            inFlight.remove(key, id)
            transition(id, key, Failed("server shutting down"))
          case NonFatal(e) =>
            inFlight.remove(key, id)
            transition(id, key, Failed(Option(e.getMessage).getOrElse(e.toString)))
        } finally inFlight.remove(key, id) // backstop for fatal throws
      }
    })
    catch {
      case _: RejectedExecutionException =>
        inFlight.remove(key, id)
        transition(id, key, Failed("server shutting down"))
        throw new IllegalStateException(
          "server shutting down; build not accepted")
    }
    id
  }

  /** Run a SYNCHRONOUS build under the same per-key in-flight guard
    * the async path uses — a {"sync": true} build racing an async one
    * for the same (kind, db, table) would otherwise reopen exactly the
    * publication race the guard exists to close. The job is recorded
    * in the registry/ledger like any other; returns the result JSON. */
  def runSync(key: String)(build: () => String): String = {
    if (closing) throw new IllegalStateException(
      "server shutting down; build not accepted")
    val id = s"job-${seq.incrementAndGet()}"
    val prior = inFlight.putIfAbsent(key, id)
    if (prior != null) throw new DuplicateJob(prior, key)
    transition(id, key, Running)
    try {
      val r = build()
      inFlight.remove(key, id) // before the terminal transition, as above
      transition(id, key, Done(r))
      r
    } catch {
      case NonFatal(e) =>
        inFlight.remove(key, id)
        transition(id, key, Failed(Option(e.getMessage).getOrElse(e.toString)))
        throw e
    } finally inFlight.remove(key, id)
  }

  def status(id: String): Option[State] = Option(jobs.get(id)).map(_._2)

  /** Completed builds oldest-first: (key, resultJson) — the rebind
    * replay order (newest same-key build must publish last and win
    * the bare latest-binding alias). */
  def completedOldestFirst(): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    jobs.asScala.toSeq
      .sortBy { case (id, _) => id.stripPrefix("job-").toLong }
      .collect { case (_, (key, Done(r))) => (key, r) }
  }

  /** All jobs this registry knows (including loaded-from-ledger ones),
    * newest first (ids are sequential). */
  def all(): Seq[(String, State)] = {
    import scala.jdk.CollectionConverters._
    jobs.asScala.toSeq
      .map { case (id, (_, s)) => (id, s) }
      .sortBy { case (id, _) => -id.stripPrefix("job-").toLong }
  }

  /** Drain on close (ADVICE r7): stop accepting, interrupt workers, and
    * mark anything not yet terminal as failed("server shutting down") —
    * the old shutdown() left queued jobs 'pending' forever. */
  override def close(): Unit = {
    closing = true
    pool.shutdownNow()
    try pool.awaitTermination(10, TimeUnit.SECONDS)
    catch { case _: InterruptedException => Thread.currentThread().interrupt() }
    import scala.jdk.CollectionConverters._
    jobs.asScala.foreach {
      case (id, (key, Pending | Running)) =>
        transition(id, key, Failed("server shutting down"))
      case _ =>
    }
    inFlight.clear()
  }

  // ---- ledger ----

  private def ledgerFile: Option[java.io.File] =
    ledgerDir.map(d => new java.io.File(d, "jobs.json"))

  private def transition(id: String, key: String, s: State): Unit = {
    jobs.put(id, (key, s))
    persist()
  }

  /** Rewrite-and-rename, serialized: concurrent worker transitions must
    * not interleave partial writes (same contract as MetadataIndex). */
  /** Eviction policy (window = [[MaxLedgerTerminal]]): bounds the
    * per-transition rewrite cost, what loadLedger re-materializes after
    * years of builds, AND the in-memory registry (evicted ids answer
    * 404 on the status route — the honest bound). Always retained
    * regardless of the window: in-flight jobs, and the NEWEST Done
    * entry per artifact key — that entry is a still-served
    * publication's only rebind record, and a global newest-N window
    * would silently drop it (and its boot rebind) once enough unrelated
    * build history accumulated after it (code-review r9). */
  private def persist(): Unit = synchronized {
    import scala.jdk.CollectionConverters._
    val all = jobs.asScala.toSeq
      .sortBy { case (id, _) => id.stripPrefix("job-").toLong }
    val newestDonePerKey: Set[String] = all
      .collect { case (id, (key, Done(_))) => (id, key) }
      .groupBy(_._2).map { case (_, g) => g.last._1 }.toSet
    val evictable = all.collect {
      case (id, (_, Done(_) | Failed(_))) if !newestDonePerKey(id) => id }
    val drop = evictable.dropRight(MaxLedgerTerminal).toSet
    val rows = all.filterNot { case (id, _) => drop(id) }
    drop.foreach(jobs.remove) // same window bounds memory, not just disk
    ledgerFile.foreach { f =>
      try {
        f.getParentFile.mkdirs()
        val body = rows.map { case (id, (key, s)) =>
          val extra = s match {
            case Done(r) => s""","result":$r"""
            case Failed(e) => s""","error":${JsonOut.str(e)}"""
            case _ => ""
          }
          s"""{"job":${JsonOut.str(id)},"key":${JsonOut.str(key)},""" +
            s""""status":${JsonOut.str(s.name)}$extra}"""
        }
        val tmp = new java.io.File(f.getParentFile, f.getName + ".tmp")
        java.nio.file.Files.write(tmp.toPath,
          s"""{"jobs":[${body.mkString(",")}]}""".getBytes("UTF-8"))
        java.nio.file.Files.move(tmp.toPath, f.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      } catch { case NonFatal(_) => () } // ledger is best-effort; state serves from memory
    }
  }

  private def loadLedger(): Unit = {
    ledgerFile.filter(_.isFile).foreach { f =>
      try {
        import org.json4s._
        import org.json4s.jackson.JsonMethods
        val j = JsonMethods.parse(new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
        val loaded = (j \ "jobs") match {
          case JArray(vs) => vs.flatMap { v =>
            val id = v \ "job" match { case JString(s) => s; case _ => "" }
            val key = v \ "key" match { case JString(s) => s; case _ => "" }
            val st = v \ "status" match { case JString(s) => s; case _ => "" }
            // ids must be job-<digits>: a corrupt/hand-edited entry
            // would otherwise crash every all() sort (toLong) and 500
            // the list route until the file is fixed
            if (!id.matches("job-\\d+")) None
            else Some(id -> (key, st match {
              case "done" =>
                val r = v \ "result"
                Done(if (r == JNothing) "{}" else JsonMethods.compact(r))
              case "failed" =>
                Failed(v \ "error" match { case JString(e) => e; case _ => "failed" })
              // a pending/running job's Spark work died with the old JVM
              case _ => Failed("interrupted by server restart")
            }))
          }
          case _ => Nil
        }
        loaded.foreach { case (id, v) => jobs.put(id, v) }
        val maxId = loaded.map(_._1.stripPrefix("job-"))
          .flatMap(s => scala.util.Try(s.toLong).toOption)
          .foldLeft(0L)(math.max)
        seq.set(maxId)
        if (loaded.exists(_._2._2 == Failed("interrupted by server restart")))
          persist() // record the demotion durably
      } catch { case NonFatal(_) => () } // corrupt ledger: start fresh, don't crash serving
    }
  }
}
