package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.server.GigHttpServer

/** Child-JVM body of LocalClusterSpec — NOT a ScalaTest suite.
  *
  * Boots a real `local-cluster[2,1,1024]` master (separate executor
  * PROCESSES, each in its own Worker-created working directory) and runs
  * the service loop end-to-end through the HTTP surface: line-protocol
  * write → durable flush → background L1→L2 compaction → /query. This is
  * the proof behind the Hadoop-FS staging claim (IngestWriter.scala:139-148):
  * executors here genuinely cannot see the driver's `user.dir`, so any
  * driver-relative `java.nio` touch on Spark-written bytes would fail.
  *
  * Run by LocalClusterSpec in a fresh JVM (the suite JVM already holds
  * the shared local[4] SparkContext; one JVM = one context). Exits 0 and
  * prints E2E_OK on success; any require() failure exits nonzero.
  */
object LocalClusterE2E {
  def main(args: Array[String]): Unit = {
    // executor JVMs need the same JDK17 --add-opens set as the driver;
    // lift them from this JVM's own launch args (both `--add-opens pkg`
    // pair form and `--add-opens=pkg` single-token form)
    val in = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toVector
    val addOpens = (in.zipWithIndex.collect {
      case (a, i) if a == "--add-opens" && i + 1 < in.size => s"--add-opens=${in(i + 1)}"
    } ++ in.filter(_.startsWith("--add-opens="))).distinct.mkString(" ")

    val spark = SparkSession.builder()
      .master("local-cluster[2,1,1024]")
      .appName("graft-localcluster-e2e")
      // ship this build's classes to the executor processes
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executor.extraJavaOptions", addOpens)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft-lc-wh-").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // wait until both standalone executors registered (driver + 2)
      val st = spark.sparkContext.statusTracker
      val regDeadline = System.currentTimeMillis() + 120000
      while (st.getExecutorInfos.length < 3 &&
             System.currentTimeMillis() < regDeadline) Thread.sleep(200)
      require(st.getExecutorInfos.length >= 3,
        s"executors never registered: ${st.getExecutorInfos.length - 1} of 2")

      // process separation: tasks must run in other processes, in other cwds
      val driverPid = ProcessHandle.current().pid()
      val driverCwd = new java.io.File(".").getCanonicalPath
      val exec = spark.sparkContext.parallelize(1 to 16, 16)
        .map { _ =>
          Thread.sleep(100) // spread tasks over both 1-core executors
          (ProcessHandle.current().pid(), new java.io.File(".").getCanonicalPath)
        }.collect().toSet
      require(!exec.exists(_._1 == driverPid), s"tasks ran inside the driver: $exec")
      require(exec.forall(_._2 != driverCwd),
        s"an executor shares the driver working directory $driverCwd: $exec")
      require(exec.map(_._1).size == 2, s"expected 2 executor processes: $exec")

      val root = Files.createTempDirectory("graft-lc-root-").toString
      val server = new GigHttpServer(spark, root, port = 0, saveTimeoutMs = 50,
        mergeIntervalMs = 500L).start()
      try {
        val client = HttpClient.newHttpClient()
        val base = s"http://localhost:${server.boundPort}"
        // three acked flushes -> three L1 files for the merge ticker
        (1 to 3).foreach { i =>
          val w = client.send(HttpRequest.newBuilder(URI.create(s"$base/write"))
            .POST(HttpRequest.BodyPublishers.ofString(
              s"lc,node=n$i v=${i}i ${1700000000000000000L + i}")).build(),
            HttpResponse.BodyHandlers.ofString())
          require(w.statusCode() == 204, s"write: ${w.statusCode()} ${w.body()}")
        }
        val tdir = java.nio.file.Paths.get(root, "default", "lc")
        def l2Count() = graft.index.MetadataIndex.partitionDirs(tdir)
          .map(d => graft.index.MetadataIndex.load(d, "lc")
            .entries.keys.count(_.endsWith(".2.parquet"))).sum
        val deadline = System.currentTimeMillis() + 90000
        while (l2Count() == 0 && System.currentTimeMillis() < deadline) Thread.sleep(200)
        require(l2Count() > 0, "no L2 file from background merge on local-cluster")
        val q = client.send(HttpRequest.newBuilder(URI.create(s"$base/query"))
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"query": "SELECT sum(v) AS s, count(*) AS c FROM lc"}""")).build(),
          HttpResponse.BodyHandlers.ofString())
        require(q.statusCode() == 200, s"query: ${q.statusCode()} ${q.body()}")
        require(q.body().contains(""""s":"6"""") && q.body().contains(""""c":"3""""),
          s"wrong query result: ${q.body()}")
        // pipeline ops across real executor processes: the broadcast
        // piece table + mapPartitions Viterbi DP (p61) and the CC
        // localCheckpoint rounds (p20/p62) must survive executors that
        // share nothing with the driver but the cluster protocol
        import spark.implicits._
        import org.apache.spark.sql.functions.col
        val docs = (0L until 12L).map(i =>
          (i, if (i % 2 == 0) "alpha beta gamma alpha beta"
              else s"delta epsilon zeta unique$i tail$i")).toDF("doc_id", "text")
        val pieces = graft.ops.UnigramOps.train(docs)
        require(pieces.nonEmpty, "unigram training empty on local-cluster")
        val enc = graft.ops.UnigramOps.encodeDocs(docs, pieces).collect()
        require(enc.length == 12, s"unigram encode rows: ${enc.length}")
        val labels = graft.ops.DedupOps.clusterLabels(docs, 0.5, capFrac = None)
        require(labels.filter(col("cluster_id") === 0L).count() == 6,
          "identical even docs must cluster to doc 0 on local-cluster")
        // round-6 faces across real executor processes: plan-literal
        // sketches (Bloom bits) and the centroid-embedded ivf_probe
        // expression must serialize to executors intact
        val screen = graft.ops.DedupOps.bloomScreen(
          docs.filter(col("doc_id") >= 1), docs.filter(col("doc_id") === 0L),
          n = 3).collect()
        require(screen.length == 5, // the 5 other even docs share doc 0's text
          s"bloom screen rows on local-cluster: ${screen.length}")
        val rm = docs.select(
          graft.ops.TextOps.periodicityMilli(col("text")).as("rm")).collect()
        require(rm.length == 12, "rep_milli rows on local-cluster")
        val vecs = (0L until 40L).map(i =>
          (i, Array.tabulate(8)(d => ((i + d) % 5).toFloat + 0.1f)))
          .toDF("vec_id", "embedding")
        val (km, _) = graft.ops.SimilarityOps.ivfIndex(vecs, nlist = 4)
        val probe = vecs.select(org.apache.spark.sql.GraftColumnBridge.column(
          graft.functions.IvfProbeCells(
            org.apache.spark.sql.GraftColumnBridge.toExpression(col("embedding")),
            org.apache.spark.sql.catalyst.expressions.Literal(2),
            km.clusterCenters.map(_.toArray))).as("cells")).collect()
        require(probe.forall(r => r.getSeq[Int](0).length == 2),
          "ivf_probe cells on local-cluster")
        // round-7 faces: the boxed-artifact scalar expressions (Viterbi
        // piece costs, NB model map, LM maps) and the Dataset-typed
        // media decode must serialize to executor PROCESSES intact —
        // local[] would hide a non-serializable capture
        val costs = pieces.map(p => p.piece -> p.qcost).toMap
        val uenc = docs.select(org.apache.spark.sql.GraftColumnBridge.column(
          graft.functions.UnigramEncode(
            org.apache.spark.sql.GraftColumnBridge.toExpression(col("text")),
            costs)).as("u"))
          .select(col("u")("n_words")).collect()
        require(uenc.length == 12, "unigram_encode expression on local-cluster")
        val nbm = graft.ops.ModelOps.nbModelOf(docs)
        val nbq = docs.select(
          graft.ops.ModelOps.nbQualityCol(col("text"), nbm).as("q"))
          .select(col("q")("score"), col("q")("agree")).collect()
        require(nbq.length == 12, "nb_quality on local-cluster")
        val (m12, m1) = graft.ops.ModelOps.bigramLmMaps(docs)
        val ppl = docs.select(
          graft.ops.ModelOps.pplBitsCol(col("text"), m12, m1).as("p"))
          .select(col("p")("bpt_milli")).collect()
        require(ppl.length == 12, "ppl_bits on local-cluster")
        val assets = graft.ops.MediaGen.syntheticAssets((0L until 6L).toDF("doc_id"))
        val fps = graft.ops.MultimodalOps.mediaFingerprints(assets).collect()
        require(fps.length == 4, // ids 0,3 image + 1,4 audio; 2,5 video skip
          s"media fingerprints on local-cluster: ${fps.length}")
        println(s"E2E_OK executors=${exec.map(_._1).toSeq.sorted.mkString(",")} " +
          s"driver=$driverPid l2=${l2Count()}")
      } finally server.close()
    } finally spark.stop()
    sys.exit(0)
  }
}
