package graft.sources

import org.apache.spark.sql.SparkSession

/** DuckDB `read_csv`/`read_csv_auto` on the /query surface (VERDICT
  * r10 #5): [[graft.server.DuckDialect]] rewrites the call to a
  * content-addressed GLOBAL temp view (`global_temp.__graft_csv_<h>`)
  * and the executing surface materializes the view here via
  * `spark.read.csv` with the translated options.
  *
  * Global — not session — temp views, because /query executes on
  * snapshot/private child sessions (`Pruning.sqlFor`) that do not see
  * the outer session's temp catalog; the global-temp catalog is
  * SparkContext-wide, so one registration serves every executing
  * session. The name is content-addressed over (paths, options), so
  * concurrent registrations of the same call race benignly (same
  * definition) and different option sets never collide.
  *
  * DuckDB re-sniffs the file on every query; re-inferring a schema per
  * request would rescan the whole file (Spark's inferSchema is a full
  * pass), so registration is cached per (name, source stat fingerprint)
  * — a changed file (length/mtime) re-registers, an unchanged one
  * serves the cached plan. That is the 100 TB-sane behavior: schema
  * inference once per file version, scans stay lazy and pushdown-able.
  *
  * Header detection: DuckDB's sniffer decides whether row 1 is a
  * header. When the query doesn't say, we read the first line and call
  * it a header iff no field parses as a number (the dominant real-world
  * signal, and DuckDB's own primary heuristic); unreadable/compressed/
  * globbed sources default to header=true, the common case on a query
  * surface. An explicit `header=` option always wins.
  */
object CsvReads {

  /** One rewritten read_csv call: the global-temp view name, the
    * (already localized) paths, translated Spark csv options, and
    * whether the header needs sniffing (no explicit header option). */
  final case class CsvView(name: String, paths: Seq[String],
                           options: Map[String, String], sniffHeader: Boolean)

  /** Content-addressed view name — deterministic across the dry and
    * fetching rewrite passes (both see localized paths). */
  def viewName(paths: Seq[String], options: Map[String, String],
               sniffHeader: Boolean): String = {
    val canon = paths.mkString("\u0000") + "\u0001" +
      options.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString("\u0000") +
      "\u0001" + sniffHeader
    "__graft_csv_" + java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
  }

  /** Cap on live csv views (VERDICT r12 hygiene note): distinct
    * (paths, options) sets otherwise accrete global temp views for the
    * JVM lifetime on a long-running /query server. Views are
    * metadata-only, so the cap is generous; eviction is LRU and drops
    * the catalog entry too. */
  private val MaxViews = 256

  // name -> source stat fingerprint at registration time; access-order
  // for LRU eviction. All access synchronized on the map.
  private val registered =
    new java.util.LinkedHashMap[String, String](64, 0.75f, true)

  /** Register every view on the context-global temp catalog (no-op when
    * already registered for the same source bytes AND the view still
    * exists). Must run BEFORE the rewritten SQL executes. The existence
    * check (ADVICE r12): the process-level `registered` map can outlive
    * the global-temp catalog — a rebuilt SparkContext in the same JVM or
    * an explicit dropGlobalTempView would otherwise leave ensure()
    * no-oping on a matching fingerprint while the rewritten SQL fails on
    * a missing view. */
  def ensure(spark: SparkSession, views: Seq[CsvView]): Unit = views.foreach { v =>
    val fp = sourceFingerprint(v.paths)
    val cached = registered.synchronized { registered.get(v.name) }
    if (cached != fp ||
        !spark.catalog.tableExists("global_temp." + v.name)) {
      val opts = if (v.sniffHeader)
        v.options + ("header" -> sniffHeader(v.paths, v.options).toString)
      else v.options
      spark.read.options(opts).csv(v.paths: _*)
        .createOrReplaceGlobalTempView(v.name)
      val evicted = registered.synchronized {
        registered.put(v.name, fp)
        val out = Seq.newBuilder[String]
        while (registered.size > MaxViews) {
          val it = registered.entrySet().iterator()
          out += it.next().getKey
          it.remove()
        }
        out.result()
      }
      evicted.foreach { name =>
        try spark.catalog.dropGlobalTempView(name)
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
  }

  /** Spec/diagnostic hook: forget a registration so the next ensure
    * re-reads (global temp views survive in the shared context between
    * suites). */
  private[graft] def invalidate(name: String): Unit =
    registered.synchronized { registered.remove(name) }

  /** Re-registration window for sources we cannot stat or list (remote
    * schemes): the view freezes Spark's eagerly-listed file index, so
    * serving it forever would return silently stale results on a
    * long-running /query server; a 10 s bucket caps staleness without
    * re-sniffing per query. */
  private val RemoteTtlMs = 10000L

  private def sourceFingerprint(paths: Seq[String]): String =
    paths.map { p =>
      val f = new java.io.File(p)
      if (f.isFile) s"$p:${f.length}:${f.lastModified}"
      else {
        // glob/dir (ADVICE r12 medium, tightened per ADVICE r13): the
        // registered view froze the scan's file listing, so files
        // added/changed under the pattern were invisible for the JVM's
        // lifetime while DuckDB re-lists per query. Fold a BOUNDED
        // RECURSIVE walk (paths + lengths + mtimes) under the deepest
        // non-glob directory into the fingerprint: any add/remove/
        // rename/in-place rewrite anywhere under the pattern
        // re-registers. One level was not enough — a directory's mtime
        // changes only on entry add/remove/rename, so an in-place
        // rewrite of `dir/sub/x.csv` under `dir/**.csv` was silently
        // invisible to a one-readdir listing. Unlistable (remote
        // scheme) or over-cap (> MaxWalkEntries) sources fall back to a
        // TTL bucket instead of the old once-per-JVM freeze.
        val listing = walkListing(deepestDir(p))
          .getOrElse("ttl:" + System.currentTimeMillis() / RemoteTtlMs)
        s"$p@" + java.security.MessageDigest.getInstance("MD5")
          .digest(listing.getBytes("UTF-8")).map("%02x".format(_)).mkString
      }
    }.mkString("|")

  /** Stat-walk cap: a csv view over a directory tree wider than this
    * costs more to fingerprint per query than the 10 s TTL staleness
    * bound it buys, so it falls back to the TTL bucket (DuckDB's own
    * per-query re-list over such a tree is no cheaper). */
  private val MaxWalkEntries = 8192

  /** Sorted recursive (path, length, mtime) listing, or None when the
    * root is unlistable (remote scheme / permission) or the walk
    * exceeds [[MaxWalkEntries]]. */
  private def walkListing(root: java.io.File): Option[String] = {
    val sb = new StringBuilder
    var count = 0
    def go(dir: java.io.File): Boolean = {
      val kids = dir.listFiles()
      if (kids == null) return false // unlistable mid-walk: be loud, TTL
      kids.sortBy(_.getName).forall { c =>
        count += 1
        if (count > MaxWalkEntries) false
        else {
          sb.append(c.getPath).append(':').append(c.length)
            .append(':').append(c.lastModified).append(',')
          !c.isDirectory || go(c)
        }
      }
    }
    if (root.isDirectory && go(root)) Some(sb.toString) else None
  }

  /** Deepest path prefix with no glob metacharacter, as a directory:
    * "dir/sub" + "/&#42;.csv" → "dir/sub"; a plain directory path →
    * itself. */
  private def deepestDir(p: String): java.io.File = {
    val segs = p.split('/')
    val glob = segs.indexWhere(_.exists("*?{}[]".contains(_)))
    if (glob < 0) new java.io.File(p)
    else new java.io.File(segs.take(glob).mkString("/") match {
      case "" => "/"
      case s => s
    })
  }

  /** Header sniff on the first plainly-readable local file, DuckDB's
    * primary signal: row 1 is a header iff it is all-untyped (no field
    * parses as a number, date or bool). Row 2 is deliberately NOT
    * consulted (ADVICE r13 high): DuckDB 1.0's sniffer reports
    * HasHeader=true for an all-VARCHAR body too — verified live against
    * duckdb 1.0.0 (`sniff_csv('alice,nyc\nbob,sfo')` → HasHeader=true,
    * 1 data row, columns alice/nyc) — so only a typed field in row 1
    * itself demotes it to data. Empty row-1 fields don't count as typed
    * (duckdb still calls that a header, naming the empty slot
    * positionally). */
  private def sniffHeader(paths: Seq[String], options: Map[String, String]): Boolean = {
    val sep = options.getOrElse("sep", ",")
    val numeric = "[+-]?((\\d+\\.?\\d*)|(\\.\\d+))([eE][+-]?\\d+)?"
    // date/timestamp-ish: 1-2/1-2/2-4 or 4-2-2 digit groups with -/./
    // separators, optional time tail — the shapes DuckDB's sniffer (and
    // an explicit dateformat= option) would type as DATE/TIMESTAMP
    val dateish = "\\d{1,4}[-./]\\d{1,2}[-./]\\d{1,4}" +
      "([ T]\\d{1,2}:\\d{2}(:\\d{2}(\\.\\d+)?)?)?"
    def hasTyped(line: String): Boolean = {
      // strip one layer of surrounding quotes per field: a data row
      // of all-quoted numerals ("1","2") must read as DATA, not as a
      // header (DuckDB's sniffer unquotes before type-testing too)
      val fields = line.split(java.util.regex.Pattern.quote(sep), -1)
        .map(_.trim).map(f =>
          if (f.length >= 2 && f.head == '"' && f.last == '"')
            f.substring(1, f.length - 1)
          else f)
      fields.exists(f => f.nonEmpty &&
        (f.matches(numeric) || f.matches(dateish) ||
          f.equalsIgnoreCase("true") || f.equalsIgnoreCase("false")))
    }
    paths.iterator
      .filterNot(p => p.exists("*?{}[]".contains(_)))
      .map(new java.io.File(_))
      .find(f => f.isFile && !f.getName.endsWith(".gz") &&
        !f.getName.endsWith(".zst") && !f.getName.endsWith(".bz2"))
      .map(firstLines) match {
      case Some(row1 +: _) if row1.nonEmpty =>
        !hasTyped(row1)
      case _ => true // unreadable here: the common query-surface case
    }
  }

  /** First two lines, capped at 64 KiB total: readLine on a
    * newline-less multi-gigabyte file would otherwise buffer the whole
    * file on the request thread — a row longer than the cap is treated
    * as its first 64 KiB (the numeric test only needs early fields).
    * Returns 0, 1 or 2 non-empty lines. */
  private def firstLines(f: java.io.File): Seq[String] =
    try {
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        new java.io.FileInputStream(f), "UTF-8"))
      try {
        val buf = new Array[Char](65536)
        val n = in.read(buf, 0, buf.length)
        if (n <= 0) Nil
        else new String(buf, 0, n).split('\n').iterator
          .map(_.stripSuffix("\r")).filter(_.nonEmpty).take(2).toSeq
      } finally in.close()
    } catch { case _: Throwable => Nil }
}
