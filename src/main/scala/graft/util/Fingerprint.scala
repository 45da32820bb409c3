package graft.util

/** Content fingerprint of a directory tree, shared by the artifact
  * caches (PipelineQueries.snapshotId) and the bench's derived-corpus
  * key (BenchData.ensureScaled) — ONE walker so a fix to the depth or
  * mtime-tick rationale cannot silently miss a call site.
  *
  * Walks `depth` levels (corpus dirs hold table DIRECTORIES holding
  * part files; a directory's own (name, size) is content-independent,
  * so the signature must reach the data files or an in-place rewrite
  * within one mtime tick would fingerprint identically). An entry that
  * vanishes between list and stat — exactly the concurrent-regeneration
  * race the fingerprint exists for — is recorded as `gone` rather than
  * degrading the whole signature to a content-blind fallback. */
object Fingerprint {

  /** Recursive delete — the ONE walker (review r10: Verify's failure
    * cleanup and BenchData's generation eviction carried identical
    * inline copies). Best-effort: deletion failures are ignored, like
    * both original call sites. */
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** Signature lines for every entry under `dir`, depth-limited;
    * deterministic order. Empty for a non-directory. */
  def dirSignature(dir: java.nio.file.Path, depth: Int): Seq[String] = {
    if (!java.nio.file.Files.isDirectory(dir)) return Seq.empty
    val s =
      try java.nio.file.Files.list(dir)
      catch { case _: java.io.IOException => return Seq("unlistable") }
    try {
      import scala.jdk.CollectionConverters._
      // the stream ITERATION can also fail mid-listing (readdir errors
      // surface as UncheckedIOException / DirectoryIteratorException —
      // RuntimeExceptions, not the IOException the open guard catches):
      // that is the same concurrent-regeneration race as a vanished
      // entry, so it degrades to the same sentinel instead of
      // propagating out of cache-key derivation
      try s.iterator().asScala.toSeq.map(_.toString).sorted.flatMap { f =>
        val fp = java.nio.file.Paths.get(f)
        val name = dir.relativize(fp).toString
        val own =
          try s"$name:${java.nio.file.Files.size(fp)}:" +
            s"${java.nio.file.Files.getLastModifiedTime(fp).toMillis}"
          catch { case _: java.io.IOException => s"$name:gone" }
        if (depth > 0 && java.nio.file.Files.isDirectory(fp))
          own +: dirSignature(fp, depth - 1).map(c => s"$name/$c")
        else Seq(own)
      } catch {
        case _: java.io.UncheckedIOException |
             _: java.nio.file.DirectoryIteratorException => Seq("unlistable")
      }
    } finally s.close()
  }

  /** The signature collapsed to a short stable token; the bare `dir`
    * string when the path is not a directory (e.g. a remote scheme
    * string — there the immutable-snapshot contract applies). md5, not
    * String.hashCode: the artifact-cache staleness guard rests on this
    * key, and 32 bits over many snapshots invites silent collisions.
    * Only the invalid-path case falls back to content-blind keying;
    * real I/O errors surface (dirSignature already absorbs the
    * benign list/stat races as `unlistable`/`gone` entries). */
  def dirToken(dir: String, depth: Int = 2): String =
    try {
      val p = java.nio.file.Paths.get(dir)
      if (!java.nio.file.Files.isDirectory(p)) dir
      else {
        val sig = dirSignature(p, depth).mkString("|")
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(sig.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        d.map("%02x".format(_)).mkString
      }
    } catch { case _: java.nio.file.InvalidPathException => dir }
}
