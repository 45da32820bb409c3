package graft.pruning

import java.nio.file.{Path => NioPath}
import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.catalog.{TableCatalog, TableSpec}
import graft.index.{MetadataIndex, PartitionIndex}
import graft.sources.ObjectStore

/** Catalyst-integrated zone-map pruning (SURVEY §4 phase 2): a custom
  * `FileIndex` over the per-partition `metadata.json` manifests, so
  * Spark's own planning prunes files — no SQL inspection, no explicit
  * range plumbing:
  *
  *  - `partitionFilters` (on the date=/hour= dir columns) are evaluated
  *    against each partition's values — standard hive-style pruning, but
  *    from the manifest instead of a directory listing;
  *  - `dataFilters` arrive as pre-split conjuncts; comparisons of
  *    `__timestamp` and `time` against int64 literals narrow per-column
  *    [lo, hi] windows checked for overlap with each file's min/max —
  *    whole files skip before any scan task launches. Each predicate
  *    meets its OWN column's stats (`__timestamp` → min_time/max_time,
  *    `time` → data_min_time/data_max_time; the reference querier prunes
  *    client time against server-arrival stats, which backfilled data
  *    breaks). Conjunct granularity makes OR safe: a disjunction is one
  *    opaque conjunct and simply doesn't narrow the window.
  *
  * At 100 TB this is the difference between "list and footer-read a
  * million objects" and "plan from a few thousand manifest files";
  * `sizeInBytes` comes from the manifest (no FS stat calls) but is the
  * WHOLE-table total — the FileIndex interface reports one static size
  * before any filter exists, so per-query pruned sizes are not
  * expressible here; AQE's runtime shuffle statistics are what turn a
  * well-pruned side into a broadcast join at execution. Files resolve through the table's data residency
  * (local or object store).
  */
final class GraftFileIndex(spark: SparkSession, catalog: TableCatalog, spec: TableSpec)
  extends FileIndex {

  private val tableRoot: NioPath = catalog.tableDir(spec.database, spec.name)

  // the remote root is constant per table: resolve it ONCE per index
  // (review r10 — the per-file dataUri call re-parsed the S3 URL and
  // re-applied the global s3a confs for every manifest entry on every
  // query plan of a remote table)
  private lazy val remoteRoot: Option[String] =
    graft.sources.ObjectStore.tableRemoteRoot(spark, spec)
  private val hive = spec.engine == "HiveMerge"

  @volatile private var snapshot: Seq[(NioPath, PartitionIndex)] = loadSnapshot()

  private def loadSnapshot(): Seq[(NioPath, PartitionIndex)] =
    MetadataIndex.partitionDirs(tableRoot) match {
      case Seq() => Seq(tableRoot -> MetadataIndex.load(tableRoot, spec.name))
      case dirs => dirs.map(d => d -> MetadataIndex.load(d, spec.name))
    }

  override def rootPaths: Seq[HPath] = Seq(new HPath(tableRoot.toUri))

  override val partitionSchema: StructType = GraftFileIndex.partitionSchemaFor(spec)

  /** date=/hour= values from the dir path as partition-schema internals
    * (DateType → epoch days, IntegerType → int). */
  private def partitionValues(dir: NioPath): Seq[Any] =
    if (!hive) Nil
    else {
      val segs = tableRoot.relativize(dir).toString.replace('\\', '/')
        .split('/').filter(_.contains('=')).map { s =>
          val Array(k, v) = s.split("=", 2); k -> v
        }.toMap
      partitionSchema.fields.toSeq.map { f =>
        segs.get(f.name) match {
          case None => null
          // a non-conforming dir value (legacy layout, null partition)
          // maps to null rather than throwing during planning (which would
          // 500 every query on the table). A bound partition predicate
          // then evals null -> false, so a filter like date = X EXCLUDES
          // that whole partition — the standard Hive null-partition SQL
          // semantics. Keeping it instead would leak null-valued rows into
          // filtered results, since Spark does not re-apply partition
          // filters above the scan.
          case Some(v) => f.dataType match {
            case DateType =>
              scala.util.Try(java.time.LocalDate.parse(v).toEpochDay.toInt).getOrElse(null)
            case IntegerType => scala.util.Try(v.toInt).getOrElse(null)
            case _ => UTF8String.fromString(v)
          }
        }
      }
    }

  private def bindToPartition(e: Expression): Expression = e.transform {
    case a: AttributeReference =>
      val i = partitionSchema.fieldIndex(a.name)
      BoundReference(i, partitionSchema(i).dataType, nullable = true)
  }

  private def timeColOf(e: Expression): Option[String] = e match {
    case a: AttributeReference if a.name == "__timestamp" || a.name == "time" => Some(a.name)
    case _ => None
  }

  /** Per-column [lo, hi] windows from conjunctive int64 comparisons:
    * `__timestamp` prunes against the server-assigned stats (min_time/
    * max_time), `time` against the client-data stats (data_min_time/
    * data_max_time, unbounded when unknown) — the two clocks are
    * correlated but NOT equal, so each predicate only ever meets its own
    * column's stats (the reference querier conflates them). */
  private[pruning] def timeBounds(dataFilters: Seq[Expression]): Map[String, (Long, Long)] = {
    val b = scala.collection.mutable.Map(
      "__timestamp" -> (Long.MinValue, Long.MaxValue),
      "time" -> (Long.MinValue, Long.MaxValue))
    def narrow(colName: String, op: String, v: Long): Unit = {
      var (lo, hi) = b(colName)
      op match {
        case ">=" => lo = math.max(lo, v)
        case ">" => lo = math.max(lo, if (v == Long.MaxValue) v else v + 1)
        case "<=" => hi = math.min(hi, v)
        case "<" => hi = math.min(hi, if (v == Long.MinValue) v else v - 1)
        case "=" => lo = math.max(lo, v); hi = math.min(hi, v)
      }
      b(colName) = (lo, hi)
    }
    dataFilters.foreach {
      case GreaterThan(c, Literal(v: Long, LongType)) if timeColOf(c).isDefined =>
        narrow(timeColOf(c).get, ">", v)
      case GreaterThanOrEqual(c, Literal(v: Long, LongType)) if timeColOf(c).isDefined =>
        narrow(timeColOf(c).get, ">=", v)
      case LessThan(c, Literal(v: Long, LongType)) if timeColOf(c).isDefined =>
        narrow(timeColOf(c).get, "<", v)
      case LessThanOrEqual(c, Literal(v: Long, LongType)) if timeColOf(c).isDefined =>
        narrow(timeColOf(c).get, "<=", v)
      case EqualTo(c, Literal(v: Long, LongType)) if timeColOf(c).isDefined =>
        narrow(timeColOf(c).get, "=", v)
      // literal-first forms (Catalyst does not canonicalize operand order here)
      case GreaterThan(Literal(v: Long, LongType), c) if timeColOf(c).isDefined =>
        narrow(timeColOf(c).get, "<", v)
      case GreaterThanOrEqual(Literal(v: Long, LongType), c) if timeColOf(c).isDefined =>
        narrow(timeColOf(c).get, "<=", v)
      case LessThan(Literal(v: Long, LongType), c) if timeColOf(c).isDefined =>
        narrow(timeColOf(c).get, ">", v)
      case LessThanOrEqual(Literal(v: Long, LongType), c) if timeColOf(c).isDefined =>
        narrow(timeColOf(c).get, ">=", v)
      case EqualTo(Literal(v: Long, LongType), c) if timeColOf(c).isDefined =>
        narrow(timeColOf(c).get, "=", v)
      case _ => // opaque conjunct (incl. ORs): does not narrow, stays safe
    }
    b.toMap
  }

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val bounds = timeBounds(dataFilters)
    val (lo, hi) = bounds("__timestamp")
    val (dlo, dhi) = bounds("time")
    val pred = partitionFilters.filter(_.references.nonEmpty) match {
      case Seq() => None
      case fs => Some(Predicate.create(fs.map(bindToPartition).reduce(And)))
    }
    snapshot.flatMap { case (dir, idx) =>
      val row = InternalRow.fromSeq(partitionValues(dir))
      if (pred.forall(_.eval(row))) {
        val files = idx.entries.values.toSeq
          .filter(e => e.minTime <= hi && e.maxTime >= lo &&
            e.dataMinTime <= dhi && e.dataMaxTime >= dlo)
          .sortBy(_.path)
          .map { e =>
            val uri = ObjectStore.dataUriFrom(remoteRoot, tableRoot, dir, e.path)
            // mtime is ms in Hadoop; maxTime is ns (the _metadata column
            // would otherwise show year ~55000)
            new FileStatus(e.sizeBytes, false, 1, 128L * 1024 * 1024,
              e.maxTime / 1000000L, new HPath(uri))
          }
        if (files.nonEmpty) Some(PartitionDirectory(row, files.toArray)) else None
      } else None
    }
  }

  override def inputFiles: Array[String] =
    snapshot.flatMap { case (dir, idx) =>
      idx.entries.values.map(e => ObjectStore.dataUriFrom(remoteRoot, tableRoot, dir, e.path))
    }.toArray

  override def refresh(): Unit = snapshot = loadSnapshot()

  override def sizeInBytes: Long = snapshot.map(_._2.parquetSizeBytes).sum
}

object GraftFileIndex {
  /** Hive partition columns a HiveMerge table exposes (date=/hour= dirs).
    * DateType/IntegerType match both Spark's own hive-partition inference
    * (round-1 behavior) and DuckDB's — StringType here would silently turn
    * `SELECT hour FROM t` from JSON number 22 into "22" over /query.
    * Shared with Pruning.readTable's empty-table branch so EVERY read
    * path exposes the same columns (review r15: the empty branch built a
    * spec.columns-only schema, so `select("hour")` worked or threw
    * depending on how much data the time range hit). */
  def partitionSchemaFor(spec: TableSpec): StructType =
    if (spec.engine == "HiveMerge")
      StructType(Seq(StructField("date", DateType), StructField("hour", IntegerType)))
    else StructType(Nil)

  /** Data schema from the catalog spec — the single spelling shared by
    * this FileIndex relation and Pruning's empty-table branch. */
  def dataSchemaFor(spec: TableSpec): StructType =
    StructType(spec.columns.map { case (n, t) =>
      StructField(n, graft.catalog.GraftTypes.sparkType(t))
    })

  /** DataFrame over a graft table through the manifest-backed FileIndex:
    * time + partition predicates prune files inside Catalyst planning. */
  def readTable(spark: SparkSession, catalog: TableCatalog,
                db: String, table: String): DataFrame = {
    val spec = catalog.get(db, table)
      .getOrElse(throw new IllegalArgumentException(s"unknown table $db.$table"))
    val index = new GraftFileIndex(spark, catalog, spec)
    val dataSchema = dataSchemaFor(spec)
    val relation = HadoopFsRelation(index, index.partitionSchema, dataSchema,
      None, new ParquetFileFormat(), Map.empty[String, String])(spark)
    GraftColumnBridge.ofRows(spark, LogicalRelation(relation))
  }
}
