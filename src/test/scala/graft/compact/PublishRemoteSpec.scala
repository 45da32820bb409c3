package graft.compact

import java.nio.file.Files
import org.apache.hadoop.fs.{Path => HPath}
import graft.SparkSpec

/** The copy-publish failure contract (review r15): a mid-copy failure can
  * leave a partial object at the FINAL key — in no manifest, on no drop
  * queue — and planMerge mints a fresh UUID key per retry, so each retry
  * would orphan a new partial. publishRemote must delete the key again
  * before propagating the failure. Driven hermetically over file://, the
  * same code path as S3 (ObjectStore.scala scaladoc). */
class PublishRemoteSpec extends SparkSpec {

  test("a failed copy-publish deletes the partial object at the final key") {
    val dir = Files.createTempDirectory("graft-pubfail-")
    val dest = dir.resolve("0a1b2c3d.2.parquet")
    // stand-in for the partial bytes a mid-copy failure leaves behind
    Files.writeString(dest, "partial bytes from the failed copy")
    val missingSrc = new HPath(dir.resolve("no-such-staged-file").toUri)
    intercept[Exception] {
      Compactor.publishRemote(spark, missingSrc, dest.toUri.toString)
    }
    assert(!Files.exists(dest), s"partial object leaked at $dest")
  }

  test("a successful copy-publish leaves the object in place") {
    val dir = Files.createTempDirectory("graft-pubok-")
    val src = dir.resolve("staged.parquet")
    Files.writeString(src, "merged bytes")
    val dest = dir.resolve("out/0a1b2c3d.2.parquet")
    Compactor.publishRemote(spark, new HPath(src.toUri), dest.toUri.toString)
    assert(Files.readString(dest) == "merged bytes")
  }
}
