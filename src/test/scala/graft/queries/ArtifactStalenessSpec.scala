package graft.queries

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SaveMode
import graft.SparkSpec

/** The artifact-cache staleness guard (SCALE.md "artifact-cache
  * contract"): caches key on corpus dir + content snapshot id, so a
  * corpus dir MUTATED IN PLACE must rebuild its artifacts rather than
  * serve results trained on the previous bytes. Exercised through the
  * public driver-contract query (p20 is the cluster-map build face). */
class ArtifactStalenessSpec extends SparkSpec {
  import spark.implicits._

  test("a mutated corpus dir rebuilds the cluster-map artifact") {
    val dir = Files.createTempDirectory("graft-stale-").toString
    def write(docs: Seq[(Long, String)]): Unit = {
      docs.toDF("doc_id", "text")
        .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
        .withColumn("domain", org.apache.spark.sql.functions.lit("d"))
        .repartition(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    }
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // snapshot 1: docs 0/1 near-dup -> one cluster
    write(Seq(0L -> base, 1L -> (base + " lambda"),
      2L -> "one two three four five six seven eight nine ten"))
    def labels(): Map[Long, Long] =
      PipelineQueries.queries("p20_dedup_cluster")(spark, dir)
        .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    val first = labels()
    assert(first(1L) == 0L && first(2L) == 2L, first.toString)

    // mutate IN PLACE: now 1/2 are the near-dups and 0 stands alone.
    // The snapshot id reads top-level (name, size, mtime); mtime
    // granularity can be coarse, so nudge the table dir's explicitly —
    // the guard must fire even on a same-millisecond rewrite
    write(Seq(0L -> "red orange yellow green blue indigo violet white gray black",
      1L -> base, 2L -> (base + " lambda")))
    Files.setLastModifiedTime(Paths.get(dir, "documents.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 5000))

    val second = labels()
    // a stale cache would still report {0,1} clustered; the guard
    // rebuilds from the new bytes
    assert(second(0L) == 0L && second(1L) == 1L && second(2L) == 1L,
      s"stale artifact served: $second")
  }

  test("p49's seen-side screening state persists per corpus snapshot (r12)") {
    val dir = Files.createTempDirectory("graft-xscreen-").toString
    def write(seed: String): Unit =
      (0L until 100L).map(i => (i, s"$seed token$i alpha beta gamma delta"))
        .toDF("doc_id", "text")
        .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
        .withColumn("source", org.apache.spark.sql.functions.lit("s"))
        .repartition(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    write("v1")
    def run(): Seq[(Long, String)] =
      PipelineQueries.queries("p49_cross_screen")(spark, dir)
        .as[(Long, String)].collect().toSeq
    val nanos = PipelineQueries.artifactBuildNanos
    val b0 = nanos.get()
    val first = run()
    assert(first.nonEmpty)
    val afterBuild = nanos.get()
    assert(afterBuild > b0, "first call must build the seen-side state")
    // the fix under test: a second screen of the same corpus PROBES the
    // standing index — rebuilding it per invocation was the r10-r11
    // p49 sf1 creep (three consecutive above-baseline runs)
    val second = run()
    assert(nanos.get() == afterBuild,
      "second invocation rebuilt the seen-side state instead of probing it")
    assert(second == first) // persisted state == recomputed state
    // staleness guard still applies: mutated bytes rebuild
    write("v2")
    Files.setLastModifiedTime(Paths.get(dir, "documents.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 5000))
    val b2 = nanos.get()
    run()
    assert(nanos.get() > b2, "mutated corpus served stale screening state")
  }
}
