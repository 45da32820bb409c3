package graft.pruning

import java.nio.file.Files
import graft.SparkSpec
import graft.catalog.TableCatalog
import graft.ingest.IngestWriter
import graft.lineproto.LineProtocolParser

/** Query-path time pruning: the metadata.json zone map must shrink the
  * actual file list Spark reads (reference querier resolves files by time
  * range — ARCHITECTURE.md:2079). */
class PruningSpec extends SparkSpec {

  test("time-bounded query reads only overlapping files (df.inputFiles)") {
    val root = Files.createTempDirectory("graft-prune-")
    val cat = new TableCatalog(root.toString)
    var tick = 0L
    val t0 = 1700000000000000000L
    val w = new IngestWriter(spark, root.toString, cat, () => { tick += 1; t0 + tick * 1000000L })
    (1 to 3).foreach { i =>
      LineProtocolParser.parse(s"m v=${i}i", nowNs = () => t0 + tick * 1000000L)
        .foreach(w.store)
    }
    val all = Pruning.readTable(spark, cat, "default", "m")
    assert(all.inputFiles.length == 3)

    val idx = graft.index.MetadataIndex.pruneByTime(root.resolve("default/m"), "m")
    val oneT = graft.index.MetadataIndex
      .load(idx.head.getParent, "m").entries.values.map(_.minTime).min
    val pruned = Pruning.readTable(spark, cat, "default", "m", Some((oneT, oneT)))
    assert(pruned.inputFiles.length == 1)
    assert(pruned.count() == 1)

    // the view path: a ranged ensure() registers a range-filtered view
    // (pruned by the FileIndex at plan time); a later unranged ensure()
    // restores the full table (cache invalidated)
    val views = new QueryViews(spark, cat)
    views.synchronized { views.ensure(Some((oneT, oneT))) }
    assert(spark.table("m").count() == 1)
    views.synchronized { views.ensure(None) }
    assert(spark.table("m").count() == 3)
    // SQL-embedded time predicates prune through the same path: the
    // GraftFileIndexSpec asserts scan-level numFiles; here row-correctness
    assert(spark.sql(s"SELECT count(*) c FROM m WHERE __timestamp = $oneT")
      .collect().head.getLong(0) == 1)
  }

  test("concurrent ranged queries run in private sessions, no cross-stomp") {
    val root = Files.createTempDirectory("graft-conc-")
    val cat = new TableCatalog(root.toString)
    var tick = 0L
    val t0 = 1700000000000000000L
    val w = new IngestWriter(spark, root.toString, cat, () => { tick += 1; t0 + tick * 1000000L })
    (1 to 4).foreach { i =>
      LineProtocolParser.parse(s"cm v=${i}i", nowNs = () => t0 + tick * 1000000L)
        .foreach(w.store)
    }
    val stamps = graft.index.MetadataIndex
      .pruneByTime(root.resolve("default/cm"), "cm")
      .map(p => graft.index.MetadataIndex.load(p.getParent, "cm"))
      .flatMap(_.entries.values.map(_.minTime)).distinct.sorted
    assert(stamps.size == 4)
    val views = new QueryViews(spark, cat)
    // each thread queries a different 1-file range many times; a shared
    // temp view would intermittently serve another thread's range
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val futs = stamps.zipWithIndex.map { case (ts, i) =>
      Future {
        (1 to 10).map { _ =>
          views.sqlFor("SELECT v FROM cm", Some((ts, ts)), None)
            .collect().map(_.getLong(0)).toSeq
        }
      }
    }
    val results = Await.result(Future.sequence(futs), 120.seconds)
    results.zipWithIndex.foreach { case (runs, i) =>
      assert(runs.forall(_ == Seq(i + 1L)), s"range $i saw $runs")
    }
    // and the shared unranged path still sees the whole table
    assert(views.sqlFor("SELECT count(*) c FROM cm", None, None)
      .collect().head.getLong(0) == 4)
  }

  test("unranged default-db queries plan lock-free on published snapshots under concurrent writes") {
    val root = Files.createTempDirectory("graft-lockfree-")
    val cat = new TableCatalog(root.toString)
    val w = new IngestWriter(spark, root.toString, cat)
    import spark.implicits._
    w.storeDataFrame("default", "lf", Seq((0L, "x")).toDF("id", "s"))
    val views = new QueryViews(spark, cat)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val totalWrites = 10
    val writer = Future {
      (1 to totalWrites).foreach { i =>
        w.storeDataFrame("default", "lf", Seq((i.toLong, "x")).toDF("id", "s"))
      }
    }
    // readers hammer the unranged path while the version vector moves:
    // every query must succeed and see SOME committed manifest state —
    // a count in [1, writes+1]; a torn/stomped view would throw or
    // return rows outside any committed version
    val readers = (1 to 4).map { _ =>
      Future {
        (1 to 25).map { _ =>
          views.sqlFor("SELECT count(*) c FROM lf", None, None)
            .collect().head.getLong(0)
        }
      }
    }
    val counts = Await.result(Future.sequence(readers), 180.seconds).flatten
    Await.result(writer, 180.seconds)
    counts.foreach(c => assert(c >= 1 && c <= totalWrites + 1L, s"count $c"))
    // writes settled: a fresh snapshot sees every committed row
    assert(views.sqlFor("SELECT count(*) c FROM lf", None, None)
      .collect().head.getLong(0) == totalWrites + 1L)
  }

  test("a range that prunes every file still exposes the hive partition columns") {
    val root = Files.createTempDirectory("graft-emptyschema-")
    val cat = new TableCatalog(root.toString)
    val t0 = 1700000000000000000L
    val w = new IngestWriter(spark, root.toString, cat, () => t0)
    LineProtocolParser.parse("es v=1i", nowNs = () => t0).foreach(w.store)
    val full = Pruning.readTable(spark, cat, "default", "es")
    // a range hitting NOTHING must answer with the same column set as a
    // range hitting something (review r15: the empty branch dropped the
    // date/hour partition columns, so select("hour") worked or threw
    // depending on how much data the range hit)
    val empty = Pruning.readTable(spark, cat, "default", "es", Some((1L, 2L)))
    assert(empty.count() == 0)
    assert(empty.columns.sorted.toSeq == full.columns.sorted.toSeq,
      s"${empty.columns.toSeq} vs ${full.columns.toSeq}")
    assert(empty.select("date", "hour", "v").count() == 0) // resolves
    // and it matches the FileIndex path's columns too
    val fi = GraftFileIndex.readTable(spark, cat, "default", "es")
    assert(empty.columns.sorted.toSeq == fi.columns.sorted.toSeq)
  }

  test("colliding flattened db_table names fail loudly instead of silently last-binding") {
    val root = Files.createTempDirectory("graft-collide-")
    val cat = new TableCatalog(root.toString)
    val w = new IngestWriter(spark, root.toString, cat)
    import spark.implicits._
    // db 'a_b' table 'c' registers first and owns the flat name...
    w.storeDataFrame("a_b", "c", Seq((1L, "x")).toDF("id", "s"))
    val views = new QueryViews(spark, cat)
    views.ensure(None)
    assert(spark.table("a_b_c").count() == 1)
    // ...until db 'a' table 'b_c' makes 'a_b_c' ambiguous: the flat view
    // must now resolve for NEITHER (an unresolved-relation error is
    // attributable; a silent last-wins binding reads the wrong table
    // nondeterministically across snapshot rebuilds)
    w.storeDataFrame("a", "b_c", (1 to 2).map(i => (i.toLong, "y")).toDF("id", "s"))
    views.ensure(None)
    intercept[Exception](spark.table("a_b_c").count())
    // the snapshot path agrees
    intercept[Exception](
      views.sqlFor("SELECT count(*) c FROM a_b_c", None, None).collect())
    // both tables stay reachable via bare names under their own ?db scope
    assert(views.sqlFor("SELECT count(*) c FROM c", None, Some("a_b"))
      .collect().head.getLong(0) == 1)
    assert(views.sqlFor("SELECT count(*) c FROM b_c", None, Some("a"))
      .collect().head.getLong(0) == 2)
    // non-colliding tables keep their flat alias
    w.storeDataFrame("other", "t", Seq((9L, "z")).toDF("id", "s"))
    views.ensure(None)
    assert(spark.table("other_t").count() == 1)
  }

  test("unranged views are cached by version and refresh on write") {
    val root = Files.createTempDirectory("graft-vcache-")
    val cat = new TableCatalog(root.toString)
    val w = new IngestWriter(spark, root.toString, cat)
    import spark.implicits._
    w.storeDataFrame("default", "vc", Seq((1L, "a")).toDF("id", "s"))
    val views = new QueryViews(spark, cat)
    views.ensure(None)
    assert(spark.table("vc").count() == 1)
    views.ensure(None) // no-op: same version
    w.storeDataFrame("default", "vc", Seq((2L, "b")).toDF("id", "s"))
    views.ensure(None) // version bumped -> re-registered
    assert(spark.table("vc").count() == 2)
  }
}
