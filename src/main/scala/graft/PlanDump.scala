package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan/timing probe for INTERNAL frames that declared-query plans
  * hide behind eager checkpoints (r16): p62's pair joins execute at
  * DataFrame BUILD time inside connectedComponents, so `graft.Profile`
  * shows only the final label-join plan. This main explains + times a
  * named internal frame directly — measurement tooling, never on a
  * query path.
  *
  * Usage: runMain graft.PlanDump <frame> [sfDir|10x]
  * Frames: jaccard_uncapped (p62's pNN spelling over the refresh
  * split's new 40%), jaccard_capped (p02's spelling).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val what = args(0)
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sfDir = if (args.length > 1) args(1) else baseDir
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (sfDir == "10x") BenchData.ensureScaled(spark, baseDir)
              else sfDir
    def frame() = {
      val docs = Tables.loadSpread(spark, dir, "documents")
      what match {
        case "jaccard_uncapped" =>
          // p62's pNN input: the refresh split's new 40%
          val split = math.ceil(
            docs.agg(max(col("doc_id"))).head().getLong(0) * 0.6).toLong
          ops.DedupOps.ngramJaccardPairs(
            docs.filter(col("doc_id") >= split),
            graft.queries.PipelineQueries.NearDupTau, capFrac = None)
        case "jaccard_capped" =>
          ops.DedupOps.ngramJaccardPairs(
            docs, graft.queries.PipelineQueries.NearDupTau)
        case "dsir_preagg" =>
          // p44's (doc, bucket) pre-aggregate in dsirScores' exact
          // spelling, minus the localCheckpoint that hides it from the
          // declared query's plan (VERDICT r15 #8: the committed p44
          // plan pair showed neither hash spelling)
          val w = col("__w")
          docs
            .select(col("doc_id"),
              (col("lang") === ops.SampleOps.DsirTargetLang).as("__tgt"),
              ops.TextOps.tokens(col("text")).as("__w"))
            .select(col("doc_id"), col("__tgt"),
              explode(concat(w, graft.functions.TextExprs.ngrams(w, 2))).as("__g"))
            .select(col("doc_id"), col("__tgt"),
              ops.SampleOps.dsirBucket(col("__g")).as("b"))
            .groupBy("doc_id", "b", "__tgt")
            .agg(count(lit(1)).as("__k"))
        case "dsir_preagg_composed" =>
          // the PRE-r15 composed bucket spelling of the same frame —
          // the reference side of the p44 plan pair (value-identical,
          // Md5SliceSpec-pinned)
          val w = col("__w")
          docs
            .select(col("doc_id"),
              (col("lang") === ops.SampleOps.DsirTargetLang).as("__tgt"),
              ops.TextOps.tokens(col("text")).as("__w"))
            .select(col("doc_id"), col("__tgt"),
              explode(concat(w, graft.functions.TextExprs.ngrams(w, 2))).as("__g"))
            .select(col("doc_id"), col("__tgt"),
              (conv(substring(md5(col("__g")), 1, 6), 16, 10).cast("long") %
                ops.SampleOps.DsirBuckets).as("b"))
            .groupBy("doc_id", "b", "__tgt")
            .agg(count(lit(1)).as("__k"))
        case other => sys.error(s"unknown frame: $other")
      }
    }
    frame().explain("formatted")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      frame().write.format("noop").mode("overwrite").save()
      println(f"[plandump] $what run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
