package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest
import java.util.UUID
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Remote-HTTP parquet scan via a download-through cache.
  *
  * The reference's published benchmark query reads
  * `read_parquet('https://...house_1.parquet')` (BENCHMARK.md:11,44) —
  * DuckDB range-reads over HTTP natively; Hadoop has no https
  * FileSystem, so the Spark-native equivalent is download-through: fetch
  * once into a content-addressed local cache (key = sha256(url)), then
  * `spark.read.parquet` the local copy. Re-reads are cache hits; a
  * concurrent fetch of the same URL is safe (download to a unique temp
  * name, atomic publish, lose-and-reuse on race).
  *
  * At cluster scale the cache dir belongs on shared storage (or the
  * fetch happens once per executor via the same keying) — the point is
  * the scan itself stays a normal pruned columnar parquet read instead
  * of a per-query network stream.
  */
object HttpParquet {

  def defaultCacheDir: Path = Paths.get(
    sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft-http-cache")

  // ONE shared client: a per-fetch HttpClient leaks a selector thread
  // and connection pool until GC finalization — a burst of /query
  // fetches over distinct URLs churned threads for nothing (timeouts
  // are per-request anyway)
  private lazy val sharedClient = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10))
    .followRedirects(HttpClient.Redirect.NORMAL).build()

  def cacheKey(url: String): String =
    MessageDigest.getInstance("SHA-256").digest(url.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString + ".parquet"

  /** Fetch `url` into the cache (no-op on hit); returns the local path. */
  def fetch(url: String, cacheDir: Path = defaultCacheDir): Path = {
    val dest = cacheDir.resolve(cacheKey(url))
    if (Files.exists(dest)) return dest
    Files.createDirectories(cacheDir)
    val tmp = cacheDir.resolve(s".${UUID.randomUUID()}.part")
    try {
      // bounded I/O (ADVICE r8): the fetch runs on an HTTP handler
      // thread for /query-supplied URLs — an unresponsive remote must
      // time out, not pin the handler. NOTE HttpRequest.timeout alone
      // would NOT do this: the JDK cancels that timer once response
      // HEADERS arrive, so a remote that trickles (or stalls) the BODY
      // pins the thread forever. orTimeout on the async future bounds
      // the WHOLE exchange and cancel(true) aborts the transfer.
      // Tune via -Dgraft.http.fetchTimeoutSec.
      val timeoutSec = sys.props.getOrElse("graft.http.fetchTimeoutSec", "120").toLong
      val fut = sharedClient.sendAsync(
        HttpRequest.newBuilder(URI.create(url))
          .timeout(java.time.Duration.ofSeconds(timeoutSec)).GET().build(),
        HttpResponse.BodyHandlers.ofFile(tmp))
      val resp =
        try fut.orTimeout(timeoutSec, java.util.concurrent.TimeUnit.SECONDS).join()
        catch {
          case e: java.util.concurrent.CompletionException =>
            fut.cancel(true)
            throw new java.io.IOException(
              s"GET $url did not complete within ${timeoutSec}s: ${e.getCause}")
        }
      require(resp.statusCode() / 100 == 2,
        s"GET $url -> HTTP ${resp.statusCode()}")
      try Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileAlreadyExistsException => () } // lost race: reuse
      dest
    } finally Files.deleteIfExists(tmp): Unit
  }

  /** `spark.read.parquet` over an http(s) URL, download-through cached. */
  def read(spark: SparkSession, url: String,
           cacheDir: Path = defaultCacheDir): DataFrame =
    spark.read.parquet(fetch(url, cacheDir).toString)
}
