package graft.ingest

import java.util.UUID
import scala.jdk.CollectionConverters._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.catalog.{TableCatalog, TableSpec}
import graft.index.{FileEntry, MetadataIndex}
import graft.lineproto.LineProtocolParser.{Batch, FieldType}
import graft.sources.ObjectStore

/** The schema-on-write ingest path (reference write pipeline §3.1):
  * line-protocol batch → typed DataFrame → `__timestamp` injection →
  * per-row date/hour partition derivation → sorted parquet in
  * `{root}/{db}/{table}/date=YYYY-MM-DD/hour=HH/{uuid}.1.parquet` →
  * metadata.json index update.
  *
  * Differences from the reference, by design (SURVEY §2.1 quirks):
  *  - date AND hour derive per-row from `__timestamp` (the reference
  *    buckets by day but labels with the first row's hour);
  *  - bool fields are stored (BooleanType);
  *  - UInt64 → Decimal(20,0).
  *
  * Scale path: this writer handles the reference-style driver-buffered
  * micro-batches. For sustained 100 TB/day firehose ingest the same
  * transform chain runs under Structured Streaming
  * (graft.streaming.StreamIngest) where parallel parse happens in
  * executors, not the driver.
  */
final class IngestWriter(spark: SparkSession, root: String, catalog: TableCatalog,
                         nowNs: () => Long = () => System.currentTimeMillis() * 1000000L) {

  /** Reference type names per FieldType (data_types.go:26-51). */
  private def typeName(t: FieldType): String = t match {
    case FieldType.I64 => "INT64"
    case FieldType.U64 => "UINT64"
    case FieldType.F64 => "FLOAT64"
    case FieldType.Str => "STRING"
    case FieldType.Bool => "BOOL"
  }

  def sparkType(name: String): DataType = graft.catalog.GraftTypes.sparkType(name)

  /** The table's directory (for callers like StreamIngest that persist
    * per-table sidecar state next to the data). */
  def tableDirOf(db: String, table: String): java.nio.file.Path =
    catalog.tableDir(db, table)

  /** Chunk size for the driver-parallel UnsafeRow build: below one
    * chunk the fork-join fan-out costs more than it saves. */
  private[ingest] val ConvertChunkRows = 8192

  /** Line-proto batch → DataFrame with the batch's own schema.
    *
    * r13 buffered-throughput fix — the batch is converted to compact
    * UnsafeRow BYTES on the driver, in parallel chunks, and handed to
    * Spark via internalCreateDataFrame. The prior shapes all paid this
    * cost serially somewhere: parallelize(Vector[Row], 1) re-ran
    * CatalystTypeConverters per row inside the single write task
    * (profiled ~1.4 s of the ~2 s flush at 320 k rows); fanning raw
    * parsed Lines across slices just moved it into the driver's serial
    * task-binary serialization (nested case classes Java-serialize far
    * worse than bytes); even parallelize(Array[UnsafeRow]) still pushed
    * 320 k individual Externalizable objects through
    * ObjectOutputStream (~0.3 s/flush). Here the flush thread's idle
    * cores build flat per-chunk (bytes, offsets) buffers (fork-join
    * over disjoint ranges, one codegen'd UnsafeProjection per chunk —
    * instances are not thread-safe, the generated class is cached), the
    * task payload Java-serializes as a handful of primitive arrays, and
    * the task re-points shared-buffer UnsafeRows with ZERO copies — the
    * write task starts directly at the null-pad projection + sort +
    * parquet encode. Safe without per-row copies because every consumer
    * below (Project codegen, the sorter's insert) writes its OWN output
    * buffer; the chunk bytes are immutable. */
  def toDataFrame(batch: Batch): DataFrame = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeProjection, UnsafeRow}
    import org.apache.spark.unsafe.Platform
    import org.apache.spark.unsafe.types.UTF8String
    import graft.ingest.IngestWriter.RowChunk

    val fields = batch.schema.map { case (n, t) => StructField(n, sparkType(typeName(t))) }
    val schema = StructType(fields)
    val byName = batch.schema.map(_._1).zipWithIndex.toMap
    val timeIdx = byName("time")
    val width = fields.length
    val rows = batch.rows
    val n = rows.length

    def convertChunk(lo: Int, hi: Int): RowChunk = {
      val proj = UnsafeProjection.create(schema)
      val scratch = new GenericInternalRow(width)
      var bytes = new Array[Byte](math.max(64, (hi - lo) * 64))
      val offsets = new Array[Int](hi - lo + 1)
      var pos = 0
      var i = lo
      while (i < hi) {
        val line = rows(i)
        var j = 0
        while (j < width) { scratch.update(j, null); j += 1 }
        line.tags.foreach { case (k, v) =>
          scratch.update(byName(k), UTF8String.fromString(v))
        }
        line.fields.foreach { case (k, v, t) =>
          scratch.update(byName(k), t match {
            case FieldType.U64 =>
              org.apache.spark.sql.types.Decimal(v.asInstanceOf[BigDecimal], 20, 0)
            case FieldType.Str => UTF8String.fromString(v.asInstanceOf[String])
            case _ => v // I64: java.lang.Long, F64: Double, Bool: Boolean
          })
        }
        scratch.update(timeIdx, line.timeNs)
        val r = proj(scratch)
        val sz = r.getSizeInBytes
        if (pos + sz > bytes.length)
          bytes = java.util.Arrays.copyOf(bytes, math.max(bytes.length * 2, pos + sz))
        r.writeToMemory(bytes, Platform.BYTE_ARRAY_OFFSET + pos)
        pos += sz
        offsets(i - lo + 1) = pos
        i += 1
      }
      RowChunk(width, hi - lo, offsets,
        if (pos == bytes.length) bytes else java.util.Arrays.copyOf(bytes, pos))
    }

    val chunks = math.max(1, math.min(spark.sparkContext.defaultParallelism,
      n / ConvertChunkRows))
    val built = new Array[RowChunk](chunks)
    if (chunks == 1) built(0) = convertChunk(0, n)
    else java.util.stream.IntStream.range(0, chunks).parallel().forEach { c =>
      built(c) = convertChunk((n.toLong * c / chunks).toInt, (n.toLong * (c + 1) / chunks).toInt)
    }
    val rdd = spark.sparkContext.parallelize(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(built), 1)
      .mapPartitions { it =>
        it.flatMap { ch =>
          Iterator.tabulate(ch.count) { i =>
            val r = new UnsafeRow(ch.width)
            r.pointTo(ch.bytes, Platform.BYTE_ARRAY_OFFSET + ch.offsets(i),
              ch.offsets(i + 1) - ch.offsets(i))
            r: InternalRow
          }
        }
      }
    org.apache.spark.sql.GraftColumnBridge.internalDf(spark, rdd, schema)
  }

  /** On HiveMerge tables `date`/`hour` are DERIVED partition columns: the
    * write path's withColumn would silently replace a client column of
    * that name (and partitionBy would strip it into the dir name) — acked
    * data destroyed invisibly. Rejected HERE, before catalog.evolve
    * persists anything (review r15: the guard used to run inside write(),
    * AFTER evolve had already upserted the reserved column into the
    * table spec — one rejected write polluted the catalog forever). For
    * a table not yet in the catalog the engine is evolve's own default
    * (HiveMerge), so the pre-create check matches what evolve would
    * build. */
  private def guardReservedPartitionCols(db: String, table: String,
                                         names: Seq[String]): Unit = {
    val engine = catalog.get(db, table).map(_.engine).getOrElse("HiveMerge")
    if (engine == "HiveMerge") Seq("date", "hour").foreach { c =>
      if (names.contains(c)) throw new IllegalArgumentException(
        s"column '$c' is reserved on HiveMerge tables (derived partition)")
    }
  }

  /** Store one parsed batch: evolve schema (first-type-wins), add
    * `__timestamp`, write partitioned+sorted, index. Returns URIs written. */
  def store(batch: Batch): Seq[String] = {
    // the engine OWNS __timestamp (arrival-time projection below): a
    // client field/tag of that name would silently lose its values to
    // the projection and double-enter the catalog — reject loudly
    if (batch.schema.exists(_._1 == "__timestamp"))
      throw new IllegalArgumentException(
        "column '__timestamp' is reserved (engine arrival time); " +
          "use the line-protocol timestamp token for event time")
    guardReservedPartitionCols(batch.database, batch.table, batch.schema.map(_._1))
    val spec0 = catalog.evolve(batch.database, batch.table,
      batch.schema.map { case (n, t) => (n, typeName(t)) } :+ ("__timestamp" -> "INT64"))
    // __timestamp is ONE literal for the whole flush -> every row
    // compares equal on it, so it contributes nothing to the file sort
    write(spec0, toDataFrame(batch).withColumn("__timestamp", lit(nowNs())),
      constSorted = Set("__timestamp"))
  }

  /** Store an arbitrary DataFrame (NDJSON/createDataFrame ingest path).
    * Schema must be line-proto-compatible types.
    *
    * `singleFile = true` (HTTP/buffered flushes) keeps the reference's
    * one-file-per-flush shape via a single sort task. `singleFile =
    * false` (the StreamIngest firehose path) keeps the DataFrame's
    * existing executor partitioning — no shuffle, no single-task
    * bottleneck: each task sorts its slice by (partition cols ++
    * orderBy) and writes its own sorted file per (date, hour); the
    * L1→L2 compactor merges the extra files, which is exactly what it
    * exists for. (Repartitioning on (date, hour) would NOT scale here:
    * at firehose rates nearly all rows share the current hour, so that
    * key hashes the whole batch back into one task.) */
  def storeDataFrame(db: String, table: String, df: DataFrame,
                     singleFile: Boolean = true): Seq[String] = {
    val cols = df.schema.fields.map { f =>
      val t = f.dataType match {
        case LongType => "INT64"
        // UINT64 IS decimal(20,0): any other precision/scale would write
        // parquet files mergeSchema can never reconcile with the
        // table's decimal(20,0) files, breaking every later read+merge
        case d: DecimalType if d.precision == 20 && d.scale == 0 => "UINT64"
        case d: DecimalType => throw new IllegalArgumentException(
          s"decimal(${d.precision},${d.scale}) unsupported for column " +
            s"${f.name}: UINT64 is decimal(20,0) exactly")
        case DoubleType => "FLOAT64"
        case StringType => "STRING"
        case BooleanType => "BOOL"
        case other => throw new IllegalArgumentException(
          s"unsupported ingest type ${other.simpleString} for column ${f.name}")
      }
      (f.name, t)
    }
    // a pre-set __timestamp (the StreamIngest firehose contract) must
    // already be the engine's epoch-ns model, not a lookalike type
    if (df.columns.contains("__timestamp") &&
        df.schema("__timestamp").dataType != LongType)
      throw new IllegalArgumentException(
        s"__timestamp must be INT64 epoch-ns, got " +
          df.schema("__timestamp").dataType.simpleString)
    guardReservedPartitionCols(db, table, df.columns.toSeq)
    val spec = catalog.evolve(db, table, cols.toSeq :+ ("__timestamp" -> "INT64"))
    val withTs = if (df.columns.contains("__timestamp")) df
      else df.withColumn("__timestamp", lit(nowNs()))
    // same constant-key argument as store(): only when WE injected the
    // single-literal arrival stamp (a caller-provided __timestamp
    // column varies per row and must keep sorting)
    write(spec, withTs, singleFile,
      constSorted = if (df.columns.contains("__timestamp")) Set.empty
                    else Set("__timestamp"))
  }

  private def write(spec: TableSpec, dfIn: DataFrame,
                    singleFile: Boolean = true,
                    constSorted: Set[String] = Set.empty): Seq[String] = {
    val tableDir = catalog.tableDir(spec.database, spec.name)
    // null-pad to the table's full first-seen schema (reference
    // data_store.go:109-141 back-fill)
    val full = catalog.get(spec.database, spec.name).get
    val df = full.columns.foldLeft(dfIn) { case (d, (n, t)) =>
      if (d.columns.contains(n)) d else d.withColumn(n, lit(null).cast(sparkType(t)))
    }.select(full.columns.map(c => col(c._1)): _*)

    val hive = spec.engine == "HiveMerge"
    // reserved date/hour columns were rejected by BOTH public entry
    // points (guardReservedPartitionCols) BEFORE catalog.evolve ran —
    // the guard cannot live here: by write() time the reserved column
    // is already persisted in the spec (review r15: a rejected write
    // left it in the catalog forever — every later write null-padded
    // it, and any future client field of that name failed evolve with
    // a bogus type conflict)
    val tsUs = expr("__timestamp DIV 1000")
    val partitioned =
      if (hive)
        df.withColumn("date", date_format(timestamp_micros(tsUs), "yyyy-MM-dd"))
          .withColumn("hour", date_format(timestamp_micros(tsUs), "HH"))
      else df

    // stage via Spark, then publish with reference-style names. Local
    // tables: atomic move. Object-store tables (spec.dataUrl): bytes are
    // copied to their FINAL key and the metadata.json manifest is the
    // commit — no rename exists on S3 (reference save_service_s3.go:55-88).
    //
    // Staging runs on the Hadoop FileSystem API, NOT java.nio: on a real
    // cluster `sorted.write.parquet(staging)` lands wherever the staging
    // URI's FS says (shared HDFS/s3a), which the driver could never
    // `Files.walk`. The same code therefore serves local[?], HDFS and s3a
    // masters — only the table root URI changes.
    // per-phase wall clock under GRAFT_FLUSH_DEBUG (r14 task 7: know
    // what a flush cycle spends before touching the hot path)
    val wdbg = sys.env.contains("GRAFT_FLUSH_DEBUG")
    var tMark = System.nanoTime()
    def mark(phase: String): Unit = if (wdbg) {
      val now = System.nanoTime()
      println(f"[wdbg] $phase=${(now - tMark) / 1e9}%.3f")
      tMark = now
    }
    val hconf = spark.sparkContext.hadoopConfiguration
    val tableUri = new HPath(tableDir.toUri)
    val fs = ObjectStore.publishFs(tableUri, hconf)
    val staging = new HPath(new HPath(tableUri, "tmp"), UUID.randomUUID().toString)
    fs.mkdirs(staging)
    // staging is removed in finally: a failed Spark write or publish step
    // must not leak tmp/{uuid} partial parquet (at a 1 s flush cadence a
    // flaky table would accumulate unbounded garbage; Compactor already
    // wraps its identical pattern)
    try {
    // coalesce(1), not repartition(1): reads inputs straight into the
    // single sort task instead of adding a round-robin exchange first.
    // Parallel (streaming) path: sort each existing task's slice with
    // the hive partition cols leading so every written file is still
    // internally ordered by orderBy within its (date, hour) dir.
    // r14 (profiled): the flush cycle is dominated by the single
    // coalesce(1) sort+encode task, and on default tables the sort key
    // is ONLY __timestamp — a per-flush constant literal, so all rows
    // compare equal and the external sorter's full pass over the batch
    // orders nothing. Keys the caller proved constant for this batch
    // drop out of the sort; a file whose rows are all-equal on the key
    // IS sorted by it, so the sorted-file invariant (compactor k-way
    // merge, read_parquet_mergetree) holds bit-for-bit.
    val sortKeys = spec.orderBy.filterNot(constSorted)
    val sorted =
      if (singleFile) {
        val one = partitioned.coalesce(1)
        if (sortKeys.isEmpty) one
        else one.sortWithinPartitions(sortKeys.map(col): _*)
      } else {
        val keys = (if (hive) Seq("date", "hour") else Nil) ++ sortKeys
        if (keys.isEmpty) partitioned
        else partitioned.sortWithinPartitions(keys.distinct.map(col): _*)
      }
    val writer = sorted.write.mode("append")
    (if (hive) writer.partitionBy("date", "hour") else writer)
      .parquet(staging.toString)
    mark("sort_encode_job")

    // ONE spelling of the remote key layout (ObjectStore owns it): a
    // divergent inline reassembly here would publish to keys the
    // dataUri-based readers and the GC deleter could never find
    val remoteRoot = ObjectStore.tableRemoteRoot(spark, spec)
    val stagingStr = staging.toString
    val written = {
      val it = fs.listFiles(staging, true)
      val buf = Vector.newBuilder[HPath]
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet"))
          buf += st.getPath
      }
      buf.result()
    }
    // plan final names up front so footer stats (read from the STAGED
    // bytes — publish never rewrites them) can be gathered for ALL files
    // in one Spark job instead of a serial driver loop (a T-task ×
    // P-partition micro-batch would otherwise cost T×P driver footer opens)
    val planned = written.map { part =>
      val rel = part.getParent.toString.stripPrefix(stagingStr)
        .stripPrefix("/") // "" or date=../hour=..
      (part, rel, s"${UUID.randomUUID()}.1.parquet")
    }
    val entries: Map[String, FileEntry] = ParquetStats.manifestEntries(
      spark, planned.map { case (p, _, name) => (p.toString, name) })
    mark("footer_stats_job")
    // published-but-not-yet-committed URIs: a failure between publish
    // and the manifest commit would otherwise leak final-key objects
    // that no manifest references and no drop queue can ever reclaim
    // (unbounded at a 1 s flush cadence on a flaky table — the same
    // argument as the staging cleanup in `finally`)
    val uncommitted = scala.collection.mutable.LinkedHashSet.empty[String]
    try {
    val out = planned.map { case (part, rel, name) =>
      val uri = remoteRoot match {
        case Some(r) =>
          val u = r + (if (rel.isEmpty) "" else "/" + rel) + "/" + name
          ObjectStore.copyPublish(spark, part, u)
          u
        case None =>
          val destDir = if (rel.isEmpty) tableUri else new HPath(tableUri, rel)
          fs.mkdirs(destDir)
          val dest = new HPath(destDir, name)
          ObjectStore.publishRename(fs, part, dest)
          dest.toUri.getPath
      }
      uncommitted += uri
      (rel, name, uri)
    }
    mark("publish")

    // ONE manifest commit per partition dir (reference applies adds/removes
    // in a single index Batch — json_index.go:312-416): N files into a
    // partition is one read-modify-write of its metadata.json, not N. For
    // remote tables this manifest write IS what makes the files visible.
    out.groupBy(_._1).foreach { case (rel, group) =>
      val dir = if (rel.isEmpty) tableDir else tableDir.resolve(rel)
      MetadataIndex.batch(dir, spec.name, add = group.map { case (_, n, _) => entries(n) })
      group.foreach { case (_, _, u) => uncommitted -= u }
    }
    catalog.bumpVersion(spec.database, spec.name)
    mark("manifest_commit")
    out.map(_._3)
    } catch {
      case scala.util.control.NonFatal(e) =>
        uncommitted.foreach { u =>
          try ObjectStore.delete(spark, u)
          catch { case scala.util.control.NonFatal(_) => () }
        }
        throw e
    }
    } finally fs.delete(staging, true)
  }
}

object IngestWriter {
  /** Flat UnsafeRow payload for one driver-built conversion chunk:
    * `bytes` holds `count` concatenated UnsafeRows, row i spanning
    * [offsets(i), offsets(i+1)). Primitive arrays only, so the task
    * binary serializes as two straight array writes instead of count
    * individual Externalizable objects. */
  private[ingest] final case class RowChunk(width: Int, count: Int,
                                            offsets: Array[Int], bytes: Array[Byte])
}

/** Footer-level stats for one parquet file (no data scan). */
object ParquetStats {
  final case class Stats(rowCount: Long, minTime: Long, maxTime: Long,
                         colRanges: Map[String, (Long, Long)] = Map.empty)

  /** Manifest entry for a published file — the ONE place encoding the
    * stats invariants (min_time/max_time = server __timestamp arrival
    * stats; data_min/max_time = client `time` stats, unbounded when the
    * column is absent). Used by both ingest and compaction so the two
    * can never drift. */
  def manifestEntry(conf: Configuration, uri: String, name: String): FileEntry = {
    val stats = read(conf, uri, "__timestamp", extraCols = Seq("time"))
    val (dmin, dmax) = stats.colRanges.getOrElse("time", (Long.MinValue, Long.MaxValue))
    val p = new HPath(uri)
    FileEntry(
      id = 0, path = name,
      sizeBytes = p.getFileSystem(conf).getFileStatus(p).getLen,
      rowCount = stats.rowCount,
      chunkTime = stats.minTime,
      minTime = stats.minTime, maxTime = stats.maxTime,
      dataMinTime = dmin, dataMaxTime = dmax)
  }

  def manifestEntry(spark: SparkSession, uri: String, name: String): FileEntry =
    manifestEntry(spark.sparkContext.hadoopConfiguration, uri, name)

  /** Threshold below which footer stats are read inline on the driver:
    * the buffered-HTTP flush path publishes 1-2 files and a Spark job's
    * scheduling round-trip would only add flush latency. Above it (the
    * streaming firehose path: T tasks × P hour-partitions files) stats
    * are gathered by ONE Spark job with the footer opens running in
    * executors — the driver never does a per-file loop. */
  private val InlineStatsMax = 4

  /** Manifest entries for many staged files: `(stagedUri, finalName)` →
    * name-keyed entries. Stats come from the staged bytes (publish is a
    * rename/copy, never a rewrite). */
  def manifestEntries(spark: SparkSession,
                      files: Seq[(String, String)]): Map[String, FileEntry] = {
    if (files.isEmpty) return Map.empty
    if (files.size <= InlineStatsMax) {
      val conf = spark.sparkContext.hadoopConfiguration
      files.map { case (uri, name) => name -> manifestEntry(conf, uri, name) }.toMap
    } else {
      import org.apache.spark.util.GraftHadoopConf
      val bc = confBroadcast(spark)
      spark.sparkContext
        .parallelize(files, math.min(files.size, 64))
        .map { case (uri, name) => name -> manifestEntry(GraftHadoopConf.value(bc), uri, name) }
        // metadata-only collect: one small FileEntry per published file,
        // bounded by the batch's file count — the driver owns the
        // manifest and must write these; no table data moves
        .collect().toMap
    }
  }

  /** One Hadoop-conf broadcast per SparkContext, not per micro-batch:
    * the firehose path calls manifestEntries every few seconds, and a
    * fresh broadcast each time churns the block manager between GCs.
    * Staleness is a non-issue for THIS broadcast: stats jobs read staged
    * files on the table root's FS, whose access needs no late-bound
    * credentials (object-store creds only matter for published keys,
    * which this job never touches). */
  private val confBcRef = new java.util.concurrent.atomic.AtomicReference[
    (org.apache.spark.SparkContext,
     org.apache.spark.broadcast.Broadcast[org.apache.spark.util.SerializableConfiguration])]()
  private def confBroadcast(spark: SparkSession) = {
    val sc = spark.sparkContext
    val cur = confBcRef.get()
    if (cur != null && (cur._1 eq sc)) cur._2
    else {
      val bc = org.apache.spark.util.GraftHadoopConf.broadcast(sc)
      confBcRef.set((sc, bc))
      bc
    }
  }

  /** Row count + min/max of `timeCol`, plus ranges of any `extraCols`
    * that are present with int64 stats (absent → not in the map →
    * callers must treat as unknown/unbounded). */
  def read(conf: Configuration, file: String, timeCol: String,
           extraCols: Seq[String] = Nil): Stats = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new HPath(file), conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala
      var rows = 0L
      val mins = scala.collection.mutable.Map.empty[String, Long]
      val maxs = scala.collection.mutable.Map.empty[String, Long]
      val wanted = (timeCol +: extraCols).toSet
      blocks.foreach { b =>
        rows += b.getRowCount
        b.getColumns.asScala.filter(c => wanted(c.getPath.toDotString)).foreach { c =>
          val name = c.getPath.toDotString
          val st = c.getStatistics
          if (st != null && st.hasNonNullValue) {
            st.genericGetMin match {
              case l: java.lang.Long =>
                mins(name) = math.min(mins.getOrElse(name, Long.MaxValue), l)
                maxs(name) = math.max(maxs.getOrElse(name, Long.MinValue),
                  st.genericGetMax.asInstanceOf[java.lang.Long])
              case _ =>
            }
          }
        }
      }
      val ranges = mins.keys.map(k => k -> (mins(k), maxs(k))).toMap
      // missing/statless timeCol → UNBOUNDED, exactly like extraCols:
      // (0, 0) would make the file prunable by any lower-bound > 0 query
      // (silent missing rows) and retention-expirable (maxTime 0 < any
      // cutoff → data loss) — conservative unknown is the only safe stat
      val (minT, maxT) = ranges.getOrElse(timeCol, (Long.MinValue, Long.MaxValue))
      Stats(rows, minT, maxT, ranges - timeCol)
    } finally reader.close()
  }
}
