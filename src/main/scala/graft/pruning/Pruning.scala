package graft.pruning

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.catalog.TableCatalog
import graft.index.MetadataIndex

/** Query-side table access with metadata.json zone-map pruning — the
  * Spark analog of the reference querier's "resolve data location from
  * the metadata catalog by time range" (reference README.md:115,
  * ARCHITECTURE.md:2075-2090).
  *
  * Layered pruning at 100 TB:
  *  1. this file-level min/max prune (before Spark lists anything),
  *  2. Spark's hive partition pruning on date=/hour= dirs,
  *  3. parquet row-group stats inside each surviving file (data is
  *     sorted by __timestamp, so row-group ranges are tight).
  */
object Pruning {

  /** Read a graft table, optionally pruned to a `__timestamp` ns range.
    * The metadata.json manifest drives the file list — for object-store
    * tables the local index paths map to remote data URIs, and unlisted
    * (half-uploaded) objects are invisible by construction. */
  def readTable(spark: SparkSession, catalog: TableCatalog, db: String, table: String,
                timeRangeNs: Option[(Long, Long)] = None): DataFrame = {
    val root = catalog.tableDir(db, table)
    val localFiles = timeRangeNs match {
      case Some((lo, hi)) => MetadataIndex.pruneByTime(root, table, lo, hi)
      case None => MetadataIndex.pruneByTime(root, table)
    }
    val files = catalog.get(db, table).flatMap(_.dataUrl) match {
      case Some(_) =>
        val spec = catalog.get(db, table).get
        localFiles.map(p => graft.sources.ObjectStore.dataUri(
          spark, spec, root, p.getParent, p.getFileName.toString))
      case None => localFiles.map(_.toString)
    }
    if (files.isEmpty) {
      // empty table: derive schema from the catalog
      val spec = catalog.get(db, table)
        .getOrElse(throw new IllegalArgumentException(s"unknown table $db.$table"))
      import org.apache.spark.sql.types._
      val w = new graft.ingest.IngestWriter(spark, root.toString, catalog)
      val schema = StructType(spec.columns.map { case (n, t) =>
        StructField(n, w.sparkType(t))
      })
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    } else {
      val base = catalog.get(db, table).flatMap(_.dataUrl) match {
        case Some(u) => graft.sources.ObjectStore.tableRemoteRoot(spark,
          catalog.get(db, table).get).get
        case None => root.toString
      }
      spark.read
        .option("mergeSchema", "true")
        .option("basePath", base)
        .parquet(files: _*)
    }
  }

  /** Register every catalog table as `db_table` temp view for spark.sql. */
  def registerViews(spark: SparkSession, catalog: TableCatalog,
                    timeRangeNs: Option[(Long, Long)] = None): Unit =
    catalog.all().foreach { spec =>
      val df = readTable(spark, catalog, spec.database, spec.name, timeRangeNs)
      df.createOrReplaceTempView(s"${spec.database}_${spec.name}")
      if (spec.database == "default") df.createOrReplaceTempView(spec.name)
    }

  // conjunctive comparisons of the reference's two time columns against
  // int64-ns literals; BETWEEN lo AND hi is the querier's documented shape
  private val CmpRe = """(?i)\b(?:__timestamp|time)\s*(>=|<=|>|<)\s*(\d+)""".r
  private val BetweenRe = """(?i)\b(?:__timestamp|time)\s+between\s+(\d+)\s+and\s+(\d+)""".r

  /** Extract a `__timestamp`/`time` ns bound from the SQL text for
    * file-level pruning — the Spark analog of the reference querier's
    * "resolve data location by time range" (ARCHITECTURE.md:2079).
    * Conservative: any OR in the query disables extraction (the bounds
    * below are only sound for conjunctive predicates); multiple bounds
    * intersect. Pruning is by file min/max OVERLAP, so a too-wide range
    * is always safe. */
  def extractTimeRangeNs(sql: String): Option[(Long, Long)] = {
    if ("""(?i)\bor\b""".r.findFirstIn(sql).isDefined) return None
    var lo = Long.MinValue
    var hi = Long.MaxValue
    CmpRe.findAllMatchIn(sql).foreach { m =>
      val v = BigInt(m.group(2))
      def clampL(b: BigInt): Long =
        if (b > Long.MaxValue) Long.MaxValue
        else if (b < Long.MinValue) Long.MinValue else b.toLong
      m.group(1) match {
        case ">=" => lo = math.max(lo, clampL(v))
        case ">"  => lo = math.max(lo, clampL(v + 1))
        case "<=" => hi = math.min(hi, clampL(v))
        case "<"  => hi = math.min(hi, clampL(v - 1))
      }
    }
    BetweenRe.findAllMatchIn(sql).foreach { m =>
      lo = math.max(lo, BigInt(m.group(1)).toLong)
      hi = math.min(hi, BigInt(m.group(2)).toLong)
    }
    if (lo == Long.MinValue && hi == Long.MaxValue) None else Some((lo, hi))
  }
}

/** Per-session query-view registry with version-based caching: full-table
  * views are (re)registered only when the table's data version changed
  * (write/compaction bumps it) — the round-1 server re-walked the catalog
  * and re-inferred every schema on EVERY request. Time-bounded requests
  * register file-pruned views instead (and invalidate the cache, since
  * the view names then no longer mean "the whole table").
  *
  * `ensure` + `spark.sql` (eager analysis) must run under one lock —
  * temp views are session-global, so concurrent requests with different
  * time ranges would otherwise stomp each other mid-analysis.
  */
final class QueryViews(spark: SparkSession, catalog: TableCatalog) {
  private val registered = scala.collection.mutable.Map.empty[(String, String), Long]

  def ensure(timeRangeNs: Option[(Long, Long)]): Unit = synchronized {
    timeRangeNs match {
      case some @ Some(_) =>
        Pruning.registerViews(spark, catalog, some)
        registered.clear() // pruned views must not be mistaken for full ones
      case None =>
        catalog.all().foreach { spec =>
          val key = (spec.database, spec.name)
          val v = catalog.version(spec.database, spec.name)
          if (!registered.get(key).contains(v)) {
            val df = Pruning.readTable(spark, catalog, spec.database, spec.name)
            df.createOrReplaceTempView(s"${spec.database}_${spec.name}")
            if (spec.database == "default") df.createOrReplaceTempView(spec.name)
            registered(key) = v
          }
        }
    }
  }

  /** Plan a SQL statement against current (possibly pruned) views.
    * Callers needing an explicit range do
    * `views.synchronized { views.ensure(range); spark.sql(...) }` —
    * same monitor, so registration and analysis stay atomic. */
  def sql(sqlText: String): DataFrame = synchronized {
    ensure(Pruning.extractTimeRangeNs(sqlText))
    spark.sql(sqlText) // analysis is eager; execution happens later
  }
}
