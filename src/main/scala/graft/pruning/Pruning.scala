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
    val spec = catalog.get(db, table)
    val localFiles = timeRangeNs match {
      case Some((lo, hi)) => MetadataIndex.pruneByTime(root, table, lo, hi)
      case None => MetadataIndex.pruneByTime(root, table)
    }
    val remote = spec.filter(_.dataUrl.isDefined)
    val files = remote match {
      case Some(s) =>
        localFiles.map(p => graft.sources.ObjectStore.dataUri(
          spark, s, root, p.getParent, p.getFileName.toString))
      case None => localFiles.map(_.toString)
    }
    if (files.isEmpty) {
      // empty table: derive schema from the catalog (GraftTypes directly
      // — the query path has no business constructing an IngestWriter)
      val s = spec
        .getOrElse(throw new IllegalArgumentException(s"unknown table $db.$table"))
      import org.apache.spark.sql.types._
      val schema = StructType(s.columns.map { case (n, t) =>
        StructField(n, graft.catalog.GraftTypes.sparkType(t))
      })
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    } else {
      val base = remote match {
        case Some(s) => graft.sources.ObjectStore.tableRemoteRoot(spark, s).get
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

}

/** Per-session query-view registry: views are backed by the
  * manifest-driven GraftFileIndex, so time and partition predicates in
  * ANY query prune whole files inside Catalyst planning — no SQL
  * inspection needed. Views are (re)registered only when the table's
  * data version changed (write/compaction bumps it; the FileIndex
  * snapshots the manifest at construction) — the round-1 server
  * re-walked the catalog and re-inferred every schema on EVERY request.
  * An explicit querier-style range (?from=/?to=) becomes a plain
  * `__timestamp` filter on the indexed view, which prunes through the
  * same dataFilters path (and invalidates the cached name, since the
  * view then no longer means "the whole table").
  *
  * Concurrency: unranged default-scoped queries share the server session
  * and its version-cached views; a RANGED or db-scoped request gets its
  * own child session (`spark.newSession()`: same SparkContext, shared
  * cache, private temp-view catalog + conf), so concurrent requests with
  * different ranges cannot stomp each other; only shared-session
  * (unranged, default-scoped) requests still take the monitor, and only
  * across registration + analysis (milliseconds — execution runs
  * outside), to keep one query's table resolutions on a single
  * registration snapshot.
  */
final class QueryViews(spark: SparkSession, catalog: TableCatalog) {
  private val registered = scala.collection.mutable.Map.empty[(String, String), Long]

  /** Plan one request's SQL. Fresh-session path for ranged/scoped
    * requests: registration cost equals what the old invalidate-and-
    * re-register path paid, but with zero lock contention. */
  def sqlFor(sqlText: String, timeRangeNs: Option[(Long, Long)],
             bareDb: Option[String]): DataFrame = {
    if (timeRangeNs.isEmpty && bareDb.forall(_ == "default")) {
      // ensure + analysis under one monitor: a concurrent write bumping
      // versions between this request's registration and its analysis
      // would otherwise let one query resolve two tables at different
      // manifest versions. Analysis is ms-scale; execution runs outside.
      synchronized {
        ensure(None, None)
        spark.sql(sqlText)
      }
    } else {
      val s = spark.newSession()
      graft.Tables.init(s) // child sessions don't inherit runtime conf/UDFs
      registerOn(s, timeRangeNs, bareDb.getOrElse("default"))
      s.sql(sqlText)
    }
  }

  /** Register all catalog tables on a private session (no cache, no
    * cross-request state — the session is this request's own). */
  private def registerOn(s: SparkSession, timeRangeNs: Option[(Long, Long)],
                         bare: String): Unit =
    catalog.all().foreach { spec =>
      val base = GraftFileIndex.readTable(s, catalog, spec.database, spec.name)
      val df = timeRangeNs match {
        // created-but-never-written tables have no __timestamp column yet
        case Some((lo, hi)) if base.columns.contains("__timestamp") =>
          base.filter(org.apache.spark.sql.functions.col("__timestamp").between(lo, hi))
        case _ => base
      }
      df.createOrReplaceTempView(s"${spec.database}_${spec.name}")
      if (spec.database == bare) df.createOrReplaceTempView(spec.name)
    }

  def ensure(timeRangeNs: Option[(Long, Long)]): Unit = ensure(timeRangeNs, None)

  /** `bareDb` scopes BARE table names to that database for this request
    * (the reference querier's `?db=` semantics, README.md:114-133:
    * `POST /query?db=mydb {"query": "... FROM weather"}`); qualified
    * `db_table` names always resolve. Bare names for a non-default db
    * are per-request state, so the cache is invalidated afterwards. */
  def ensure(timeRangeNs: Option[(Long, Long)], bareDb: Option[String]): Unit =
    synchronized {
      val bare = bareDb.getOrElse("default")
      catalog.all().foreach { spec =>
        val key = (spec.database, spec.name)
        val v = catalog.version(spec.database, spec.name)
        val cacheOk = timeRangeNs.isEmpty && bare == "default" &&
          registered.get(key).contains(v)
        if (!cacheOk) {
          val base = GraftFileIndex.readTable(spark, catalog, spec.database, spec.name)
          val df = timeRangeNs match {
            // created-but-never-written tables have no __timestamp column
            // yet (it appears on first write) — an unresolvable filter here
            // would 500 EVERY ranged request for ALL tables
            case Some((lo, hi)) if base.columns.contains("__timestamp") =>
              base.filter(org.apache.spark.sql.functions.col("__timestamp").between(lo, hi))
            case _ => base
          }
          df.createOrReplaceTempView(s"${spec.database}_${spec.name}")
          if (spec.database == bare) df.createOrReplaceTempView(spec.name)
          val cacheable = timeRangeNs.isEmpty && bare == "default"
          if (cacheable) registered(key) = v else registered.remove(key): Unit
        }
      }
      // drop bare names NOT owned by the scoped db — a previous request's
      // scope must not leak its bare bindings into this one
      val bareOwned = catalog.all().filter(_.database == bare).map(_.name).toSet
      catalog.all().foreach { spec =>
        if (spec.database != bare && !bareOwned.contains(spec.name))
          spark.catalog.dropTempView(spec.name): Unit
      }
    }

  /** Plan a SQL statement against the shared session's whole-table views
    * (SQL-embedded time predicates prune via the FileIndex
    * automatically). Equivalent to `sqlFor(sqlText, None, None)`. */
  def sql(sqlText: String): DataFrame = sqlFor(sqlText, None, None)
}
