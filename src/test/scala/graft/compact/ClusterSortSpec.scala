package graft.compact

import graft.SparkSpec
import graft.catalog.{TableCatalog, TableSpec}
import org.apache.spark.sql.functions._

class ClusterSortSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L; var i = 0
    while (i < 31) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  private val grid = for (h <- 0L until 4L; u <- 0L until 4L) yield (h, u)

  test("clusterSort default: lexicographic on the order_by keys") {
    val spec = TableSpec("db", "t", orderBy = Seq("h", "u"))
    val out = Compactor.clusterSort(
      scala.util.Random.shuffle(grid).toDF("h", "u").coalesce(1), spec)
      .as[(Long, Long)].collect().toSeq
    assert(out == grid.sortBy(identity))
  }

  test("clusterSort with zorder: rows follow the Morton curve of bucketed keys") {
    val spec = TableSpec("db", "t", orderBy = Seq("h", "u"), zorder = true)
    val out = Compactor.clusterSort(
      scala.util.Random.shuffle(grid).toDF("h", "u").coalesce(1), spec)
      .as[(Long, Long)].collect().toSeq
    // same bucketing arithmetic as clusterSort: min 0, max 3, 2048 cells
    def bucket(v: Long): Long = math.min(2047L, (v.toDouble / 3.0 * 2047.0).toLong)
    val expected = grid.sortBy { case (h, u) =>
      (mortonRef(bucket(h), bucket(u)), h, u) }
    assert(out == expected)
    // and the curve actually differs from the lexicographic order
    assert(out != grid.sortBy(identity))
  }

  test("zorder with a constant or absent dimension degrades to a stable sort") {
    val spec = TableSpec("db", "t", orderBy = Seq("h", "u"), zorder = true)
    val const = Seq((1L, 5L), (1L, 2L), (1L, 9L)).toDF("h", "u").coalesce(1)
    // h is constant → its bucket is 0 for every row; u still clusters
    val out = Compactor.clusterSort(const, spec).as[(Long, Long)].collect().toSeq
    assert(out.map(_._2).sorted == Seq(2L, 5L, 9L))
    val empty = Seq.empty[(Long, Long)].toDF("h", "u")
    assert(Compactor.clusterSort(empty, spec).count() == 0L)
  }

  test("zorder survives NaN key values (excluded from probe, bucket 0 per-row)") {
    // Spark's max() ranks NaN greatest: an unguarded probe would take
    // hi = NaN, every row's normalization would be NaN, and the ANSI
    // NaN->long cast would fail EVERY merge of the table forever
    val spec = TableSpec("db", "t", orderBy = Seq("h", "u"), zorder = true)
    val rows = Seq((1.0, 5L), (Double.NaN, 2L), (3.0, 9L), (2.0, 7L))
    val out = Compactor.clusterSort(rows.toDF("h", "u"), spec)
      .as[(Double, Long)].collect().toSeq
    assert(out.length == 4)
    assert(out.count(_._1.isNaN) == 1)
    // all-NaN dimension: probe sees an empty min/max -> stable fallback
    val allNaN = Seq((Double.NaN, 5L), (Double.NaN, 2L)).toDF("h", "u")
    assert(Compactor.clusterSort(allNaN, spec).count() == 2L)
  }

  test("zorder survives ±Inf key values (excluded from probe, pinned to curve ends)") {
    // finite() must exclude ±Inf like NaN: an Inf hi would make every
    // row's normalization Inf/Inf = NaN and fail the ANSI long cast on
    // every merge of the table forever; per-row Inf pins to an extreme
    // bucket instead of erroring
    val spec = TableSpec("db", "t", orderBy = Seq("h", "u"), zorder = true)
    val rows = Seq((1.0, 5L), (Double.PositiveInfinity, 2L),
      (Double.NegativeInfinity, 9L), (3.0, 7L), (2.0, 3L))
    val out = Compactor.clusterSort(rows.toDF("h", "u"), spec)
      .as[(Double, Long)].collect().toSeq
    assert(out.length == 5)
    assert(out.count(_._1.isPosInfinity) == 1)
    assert(out.count(_._1.isNegInfinity) == 1)
    // lo/hi from the finite rows only: +Inf buckets like the max (2047),
    // so it sorts with/after the hi-end finite row, never mid-curve
    assert(out.indexWhere(_._1.isPosInfinity) >
      out.indexWhere(_._1 == 1.0))
    // a lo/hi pair whose difference overflows to Inf must not error
    // (norm = finite/Inf -> 0, or Inf/Inf nanvl'd to 0)
    val wide = Seq((-1.7e308, 1L), (1.7e308, 2L), (0.0, 3L))
    assert(Compactor.clusterSort(wide.toDF("h", "u"), spec).count() == 3L)
  }

  test("zorder persists through the catalog JSON roundtrip") {
    val root = java.nio.file.Files.createTempDirectory("zcat").toString
    val cat = new TableCatalog(root)
    cat.upsert(TableSpec("db", "zt", orderBy = Seq("a", "b"), zorder = true))
    val reloaded = new TableCatalog(root).get("db", "zt").get
    assert(reloaded.zorder)
    assert(reloaded.orderBy == Seq("a", "b"))
    // absent key in older catalog files reads as false
    cat.upsert(TableSpec("db", "plain"))
    assert(!new TableCatalog(root).get("db", "plain").get.zorder)
  }
}
