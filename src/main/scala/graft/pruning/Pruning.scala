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

  /** Read a graft table, optionally pruned to a `__timestamp` ns range. */
  def readTable(spark: SparkSession, catalog: TableCatalog, db: String, table: String,
                timeRangeNs: Option[(Long, Long)] = None): DataFrame = {
    val root = catalog.tableDir(db, table)
    val files = timeRangeNs match {
      case Some((lo, hi)) => MetadataIndex.pruneByTime(root, table, lo, hi)
      case None => MetadataIndex.pruneByTime(root, table)
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
      spark.read
        .option("mergeSchema", "true")
        .option("basePath", root.toString)
        .parquet(files.map(_.toString): _*)
    }
  }

  /** Register every catalog table as `db_table` temp view for spark.sql. */
  def registerViews(spark: SparkSession, catalog: TableCatalog): Unit =
    catalog.all().foreach { spec =>
      val df = readTable(spark, catalog, spec.database, spec.name)
      df.createOrReplaceTempView(s"${spec.database}_${spec.name}")
      if (spec.database == "default") df.createOrReplaceTempView(spec.name)
    }
}
