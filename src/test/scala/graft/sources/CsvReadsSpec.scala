package graft.sources

import java.nio.file.{Files, Path}
import graft.SparkSpec
import graft.sources.CsvReads.CsvView

/** Pins the r13 ADVICE fixes to the read_csv view cache: glob/dir
  * fingerprints track the directory listing (no once-per-JVM freeze),
  * a dropped global temp view re-registers despite a matching
  * fingerprint, and the header sniff follows DuckDB's actual verdict:
  * header iff row 1 has no typed field (ADVICE r13 high). Every sniff
  * expectation below was re-pinned against live duckdb 1.0.0
  * `sniff_csv`/`read_csv` on identical bytes (2026-08-16). */
class CsvReadsSpec extends SparkSpec {

  private def write(p: Path, s: String): Unit =
    Files.write(p, s.getBytes("UTF-8"))

  private def view(paths: Seq[String], sniff: Boolean = true,
                   opts: Map[String, String] = Map("inferSchema" -> "true")) = {
    val name = CsvReads.viewName(paths, opts, sniff)
    CsvView(name, paths, opts, sniff)
  }

  test("glob source re-registers when the directory content changes") {
    val dir = Files.createTempDirectory("csvglob")
    write(dir.resolve("a.csv"), "k,v\nx,1\n")
    val v = view(Seq(dir.toString + "/*.csv"))
    CsvReads.ensure(spark, Seq(v))
    assert(spark.table(s"global_temp.${v.name}").count() == 1)

    // DuckDB re-lists per query; the old path-only fingerprint froze
    // Spark's file index for the JVM lifetime — this add was invisible
    write(dir.resolve("b.csv"), "k,v\ny,2\nz,3\n")
    CsvReads.ensure(spark, Seq(v))
    assert(spark.table(s"global_temp.${v.name}").count() == 3)

    // and a rewrite of an existing file (same names, new bytes/mtime)
    Files.delete(dir.resolve("b.csv"))
    CsvReads.ensure(spark, Seq(v))
    assert(spark.table(s"global_temp.${v.name}").count() == 1)
  }

  test("nested in-place rewrite under a glob re-registers (ADVICE r13)") {
    val dir = Files.createTempDirectory("csvnest")
    val sub = Files.createDirectory(dir.resolve("sub"))
    write(sub.resolve("x.csv"), "k,v\na,1\n")
    val v = view(Seq(dir.toString + "/*/x.csv"))
    CsvReads.ensure(spark, Seq(v))
    assert(spark.table(s"global_temp.${v.name}").count() == 1)

    // same file NAME, new bytes: the parent dir's mtime does NOT change
    // (no entry add/remove), so the old one-level listing missed this
    write(sub.resolve("x.csv"), "k,v\na,1\nb,2\nc,3\n")
    CsvReads.ensure(spark, Seq(v))
    assert(spark.table(s"global_temp.${v.name}").count() == 3)
  }

  test("a dropped global temp view re-registers despite a cached fingerprint") {
    val dir = Files.createTempDirectory("csvdrop")
    val f = dir.resolve("t.csv")
    write(f, "k,v\nx,1\n")
    val v = view(Seq(f.toString))
    CsvReads.ensure(spark, Seq(v))
    assert(spark.table(s"global_temp.${v.name}").count() == 1)
    spark.catalog.dropGlobalTempView(v.name)
    CsvReads.ensure(spark, Seq(v)) // fingerprint unchanged; view gone
    assert(spark.table(s"global_temp.${v.name}").count() == 1)
  }

  test("header sniff: header iff row 1 is all-untyped, DuckDB's verdicts") {
    val dir = Files.createTempDirectory("csvsniff")

    // classic header over numeric body → header
    val a = dir.resolve("a.csv"); write(a, "name,age\nalice,30\n")
    val va = view(Seq(a.toString))
    CsvReads.ensure(spark, Seq(va))
    val dfa = spark.table(s"global_temp.${va.name}")
    assert(dfa.columns.toSeq == Seq("name", "age") && dfa.count() == 1)

    // all-string body: duckdb 1.0 sniff_csv says HasHeader=true here
    // (columns alice/nyc, 1 data row) — row 2's types are NOT consulted
    val b = dir.resolve("b.csv"); write(b, "alice,nyc\nbob,sfo\n")
    val vb = view(Seq(b.toString))
    CsvReads.ensure(spark, Seq(vb))
    val dfb = spark.table(s"global_temp.${vb.name}")
    assert(dfb.columns.toSeq == Seq("alice", "nyc") && dfb.count() == 1)

    // numeric row 1 → data, regardless of what follows
    val c = dir.resolve("c.csv"); write(c, "1,2\n3,4\n")
    val vc = view(Seq(c.toString))
    CsvReads.ensure(spark, Seq(vc))
    assert(spark.table(s"global_temp.${vc.name}").count() == 2)

    // lone non-numeric line: header, zero data rows (duckdb agrees)
    val d = dir.resolve("d.csv"); write(d, "name,city\n")
    val vd = view(Seq(d.toString))
    CsvReads.ensure(spark, Seq(vd))
    val dfd = spark.table(s"global_temp.${vd.name}")
    assert(dfd.columns.toSeq == Seq("name", "city") && dfd.count() == 0)

    // a typed field ANYWHERE in row 1 demotes it to data, even with a
    // string alongside (duckdb: HasHeader=false for 'alice,1')
    val e = dir.resolve("e.csv"); write(e, "alice,1\nbob,2\n")
    val ve = view(Seq(e.toString))
    CsvReads.ensure(spark, Seq(ve))
    assert(spark.table(s"global_temp.${ve.name}").count() == 2)

    // quotes are stripped before type-testing: '"1",x' is data
    // (duckdb types the quoted field BIGINT and says HasHeader=false)
    val q = dir.resolve("q.csv"); write(q, "\"1\",x\n\"2\",y\n")
    val vq = view(Seq(q.toString))
    CsvReads.ensure(spark, Seq(vq))
    assert(spark.table(s"global_temp.${vq.name}").count() == 2)

    // a date-shaped field is typed → data (duckdb: DATE, HasHeader=false)
    val t = dir.resolve("t.csv"); write(t, "alice,2020-01-01\nbob,2021-02-02\n")
    val vt = view(Seq(t.toString))
    CsvReads.ensure(spark, Seq(vt))
    assert(spark.table(s"global_temp.${vt.name}").count() == 2)

    // an EMPTY row-1 field does not count as typed: still a header
    // (duckdb: HasHeader=true for 'alice,\nbob,sfo', 1 data row)
    val m = dir.resolve("m.csv"); write(m, "alice,\nbob,sfo\n")
    val vm = view(Seq(m.toString))
    CsvReads.ensure(spark, Seq(vm))
    assert(spark.table(s"global_temp.${vm.name}").count() == 1)
  }
}
