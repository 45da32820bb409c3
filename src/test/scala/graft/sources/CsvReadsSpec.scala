package graft.sources

import java.nio.file.{Files, Path}
import graft.SparkSpec
import graft.sources.CsvReads.CsvView

/** Pins the r13 ADVICE fixes to the read_csv view cache: glob/dir
  * fingerprints track the directory listing (no once-per-JVM freeze),
  * a dropped global temp view re-registers despite a matching
  * fingerprint, and the header sniff compares row 1 against row 2's
  * field types (DuckDB's primary signal). */
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

  test("header sniff: row 1 vs row 2 field types, DuckDB's verdicts") {
    val dir = Files.createTempDirectory("csvsniff")

    // classic header over numeric body → header
    val a = dir.resolve("a.csv"); write(a, "name,age\nalice,30\n")
    val va = view(Seq(a.toString))
    CsvReads.ensure(spark, Seq(va))
    val dfa = spark.table(s"global_temp.${va.name}")
    assert(dfa.columns.toSeq == Seq("name", "age") && dfa.count() == 1)

    // all-string body: row 1 indistinguishable from data → NOT a header
    // (the old first-line-only sniff silently dropped the first row)
    val b = dir.resolve("b.csv"); write(b, "alice,nyc\nbob,sfo\n")
    val vb = view(Seq(b.toString))
    CsvReads.ensure(spark, Seq(vb))
    val dfb = spark.table(s"global_temp.${vb.name}")
    assert(dfb.columns.toSeq == Seq("_c0", "_c1") && dfb.count() == 2)

    // numeric row 1 → data, regardless of what follows
    val c = dir.resolve("c.csv"); write(c, "1,2\n3,4\n")
    val vc = view(Seq(c.toString))
    CsvReads.ensure(spark, Seq(vc))
    assert(spark.table(s"global_temp.${vc.name}").count() == 2)

    // lone non-numeric line keeps the header=true default
    val d = dir.resolve("d.csv"); write(d, "name,city\n")
    val vd = view(Seq(d.toString))
    CsvReads.ensure(spark, Seq(vd))
    val dfd = spark.table(s"global_temp.${vd.name}")
    assert(dfd.columns.toSeq == Seq("name", "city") && dfd.count() == 0)
  }
}
