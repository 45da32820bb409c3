package graft.ingest

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r4 #6: prove the cluster-safety claim end-to-end. Forks
  * LocalClusterE2E into a fresh JVM (this suite's JVM already owns the
  * shared local[4] context) whose Spark master is `local-cluster[2,1,1024]`
  * — real executor processes launched by a standalone Worker, each with
  * its own working directory, none of them the driver's. The child runs
  * ingest → compact → query through the HTTP surface and asserts the
  * process/cwd separation itself; this spec asserts the child's verdict.
  *
  * SPARK_HOME for the child is a temp dir with `jars` symlinked to
  * /opt/spark/jars: the executor launcher resolves its classpath from
  * SPARK_HOME/jars, while the Worker's scratch (`SPARK_HOME/work`) then
  * lands in the temp dir instead of under /opt.
  */
class LocalClusterSpec extends AnyFunSuite {
  test("ingest -> compact -> query on local-cluster[2,1,1024]: " +
       "executors in separate processes and working directories") {
    val sparkHome = Files.createTempDirectory("graft-lc-home-")
    Files.createSymbolicLink(sparkHome.resolve("jars"), Paths.get("/opt/spark/jars"))
    val childCwd = Files.createTempDirectory("graft-lc-cwd-")

    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val in = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toVector
    val addOpens = in.zipWithIndex.collect {
      case (a, i) if a == "--add-opens" && i + 1 < in.size =>
        Seq("--add-opens", in(i + 1))
    }.flatten ++ in.filter(_.startsWith("--add-opens="))

    val cmd = Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g",
      "-cp", sys.props("java.class.path"), "graft.ingest.LocalClusterE2E")
    val pb = new ProcessBuilder(cmd.asJava)
    pb.directory(childCwd.toFile)
    pb.environment().put("SPARK_HOME", sparkHome.toString)
    // the skeleton SPARK_HOME has no launcher build dirs, so the executor
    // launcher cannot infer the Scala version — pin it
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val sb = new java.lang.StringBuilder
    val reader = new Thread(() => {
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream, UTF_8))
      var line = br.readLine()
      while (line != null) { sb.append(line).append('\n'); line = br.readLine() }
    })
    reader.setDaemon(true)
    reader.start()
    val finished = p.waitFor(300, TimeUnit.SECONDS)
    if (!finished) p.destroyForcibly()
    reader.join(5000)
    val out = sb.toString
    assert(finished, "local-cluster e2e timed out\n" + out.takeRight(4000))
    assert(p.exitValue() == 0 && out.contains("E2E_OK"),
      s"exit=${p.exitValue()}\n" + out.takeRight(4000))
  }
}
