package graft.index

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Partition-discovery walk semantics (no Spark needed): only
  * vanished-entry races are tolerated; symlink cycles don't recurse;
  * genuine I/O failures surface instead of silently dropping
  * partitions (ADVICE r5: a swallowed AccessDeniedException would
  * make queries return partial results). */
class MetadataIndexWalkSpec extends AnyFunSuite {

  private def mkTable(): java.nio.file.Path = {
    val root = Files.createTempDirectory("graft-walk-")
    val p1 = root.resolve("date=2024-01-01/hour=00")
    Files.createDirectories(p1)
    Files.writeString(p1.resolve(MetadataIndex.FileName), "{}")
    val p2 = root.resolve("date=2024-01-02/hour=05")
    Files.createDirectories(p2)
    Files.writeString(p2.resolve(MetadataIndex.FileName), "{}")
    root
  }

  test("finds every partition dir containing metadata.json") {
    val root = mkTable()
    val dirs = MetadataIndex.partitionDirs(root).map(root.relativize(_).toString).sorted
    assert(dirs == Seq("date=2024-01-01/hour=00", "date=2024-01-02/hour=05"))
  }

  test("a symlink cycle under the table root does not recurse unboundedly") {
    val root = mkTable()
    // loop: root/date=2024-01-01/loop -> root (a cycle through the walk)
    try Files.createSymbolicLink(root.resolve("date=2024-01-01/loop"), root)
    catch { case _: UnsupportedOperationException => cancel("no symlinks here") }
    // the visited-realpath set terminates the cycle; each partition is
    // still discovered exactly once
    val dirs = MetadataIndex.partitionDirs(root)
    assert(dirs.size == 2, dirs)
  }

  test("a partition assembled via symlink IS discovered (archive layouts)") {
    val root = mkTable()
    val outside = Files.createTempDirectory("graft-walk-out-")
    val op = outside.resolve("p")
    Files.createDirectories(op)
    Files.writeString(op.resolve(MetadataIndex.FileName), "{}")
    try Files.createSymbolicLink(root.resolve("linked"), outside)
    catch { case _: UnsupportedOperationException => cancel("no symlinks here") }
    assert(MetadataIndex.partitionDirs(root).size == 3)
  }

  test("a missing table root yields no partitions (vanished-entry tolerance)") {
    assert(MetadataIndex.partitionDirs(Paths.get("/nonexistent/graft/table")).isEmpty)
  }
}
