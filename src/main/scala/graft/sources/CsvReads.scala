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

  // name -> source stat fingerprint at registration time
  private val registered =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Register every view on the context-global temp catalog (no-op when
    * already registered for the same source bytes). Must run BEFORE the
    * rewritten SQL executes. */
  def ensure(spark: SparkSession, views: Seq[CsvView]): Unit = views.foreach { v =>
    val fp = sourceFingerprint(v.paths)
    if (registered.get(v.name) != fp) {
      val opts = if (v.sniffHeader)
        v.options + ("header" -> sniffHeader(v.paths, v.options).toString)
      else v.options
      spark.read.options(opts).csv(v.paths: _*)
        .createOrReplaceGlobalTempView(v.name)
      registered.put(v.name, fp)
    }
  }

  /** Spec/diagnostic hook: forget a registration so the next ensure
    * re-reads (global temp views survive in the shared context between
    * suites). */
  private[graft] def invalidate(name: String): Unit = registered.remove(name)

  private def sourceFingerprint(paths: Seq[String]): String =
    paths.map { p =>
      val f = new java.io.File(p)
      if (f.isFile) s"$p:${f.length}:${f.lastModified}"
      else p // glob/dir/remote-cache-miss: register once per JVM
    }.mkString("|")

  /** First-line header sniff on the first plainly-readable local file. */
  private def sniffHeader(paths: Seq[String], options: Map[String, String]): Boolean = {
    val sep = options.getOrElse("sep", ",")
    paths.iterator
      .filterNot(p => p.exists("*?{}[]".contains(_)))
      .map(new java.io.File(_))
      .find(f => f.isFile && !f.getName.endsWith(".gz") &&
        !f.getName.endsWith(".zst") && !f.getName.endsWith(".bz2"))
      .flatMap(firstLine) match {
      case Some(line) =>
        // strip one layer of surrounding quotes per field: a data row
        // of all-quoted numerals ("1","2") must read as DATA, not as a
        // header (DuckDB's sniffer unquotes before type-testing too)
        val fields = line.split(java.util.regex.Pattern.quote(sep), -1)
          .map(_.trim).map(f =>
            if (f.length >= 2 && f.head == '"' && f.last == '"')
              f.substring(1, f.length - 1)
            else f)
        // numbers in row 1 = data, not a header
        !fields.exists(f =>
          f.nonEmpty && f.matches("[+-]?((\\d+\\.?\\d*)|(\\.\\d+))([eE][+-]?\\d+)?"))
      case None => true // unreadable here: the common query-surface case
    }
  }

  /** First line, capped at 64 KiB: readLine on a newline-less
    * multi-gigabyte file would otherwise buffer the whole file on the
    * request thread — a header row longer than the cap is treated as
    * its first 64 KiB (the numeric test only needs the early fields). */
  private def firstLine(f: java.io.File): Option[String] =
    try {
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        new java.io.FileInputStream(f), "UTF-8"))
      try {
        val buf = new Array[Char](65536)
        val n = in.read(buf, 0, buf.length)
        if (n <= 0) None
        else {
          val s = new String(buf, 0, n)
          val cut = s.indexOf('\n')
          Option(if (cut >= 0) s.substring(0, cut) else s)
            .map(_.stripSuffix("\r")).filter(_.nonEmpty)
        }
      } finally in.close()
    } catch { case _: Throwable => None }
}
