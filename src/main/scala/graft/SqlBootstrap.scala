package graft

import org.apache.spark.sql.SparkSession

/** `--stdin` SQL bootstrap (reference stdin/init.go:15-49, N30): read SQL
  * from stdin, execute statement-by-statement against a graft session,
  * print each result as the reference's `{"results":[...]}` JSON, exit.
  * The reference uses this in its Docker build to pre-install extensions;
  * here it doubles as a handy one-shot SQL runner:
  *
  *   echo "SELECT 1 AS x" | sbt "runMain graft.SqlBootstrap /path/to/root"
  */
object SqlBootstrap {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(".")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.init(spark)
    val catalog = new graft.catalog.TableCatalog(root)
    // same view path as /query (FileIndex-backed), so result schemas —
    // e.g. partition column types — match the HTTP surface exactly
    new graft.pruning.QueryViews(spark, catalog).ensure(None)
    val sql = scala.io.Source.stdin.mkString
    // statement split on ';' outside quotes (reference splits on ';')
    splitStatements(sql).foreach { stmt =>
      // same DuckDB-dialect acceptance as /query: `expr::TYPE` casts,
      // LOAD/INSTALL/PRAGMA no-ops (the reference's Docker build sends
      // `INSTALL chsql; LOAD chsql;` through exactly this surface,
      // reference stdin/init.go), CREATE SECRET → fs.s3a.* conf
      import graft.server.DuckDialect
      if (DuckDialect.isExtensionNoOp(stmt)) ()
      else DuckDialect.parseSecret(stmt) match {
        case Some(confs) => confs.foreach { case (k, v) =>
          spark.sparkContext.hadoopConfiguration.set(k, v) }
        case None =>
          val rw = DuckDialect.rewriteInfo(stmt, fetchRemote = true)
          rw.confs.foreach { case (k, v) => spark.conf.set(k, v) }
          println(graft.server.JsonOut.results(spark.sql(rw.sql), 10000))
      }
    }
    spark.stop()
  }

  private[graft] def splitStatements(sql: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0
    var escaped = false
    sql.foreach { c =>
      if (quote != 0) {
        cur += c
        if (escaped) escaped = false // backslash-escaped char inside a literal
        else if (c == '\\') escaped = true
        else if (c == quote) quote = 0
      }
      else if (c == '\'' || c == '"') { quote = c; cur += c }
      else if (c == ';') { out += cur.result(); cur.clear() }
      else cur += c
    }
    out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
