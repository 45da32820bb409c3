package graft.sources

import java.net.InetSocketAddress
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import com.sun.net.httpserver.HttpServer
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The reference BENCHMARK.md shape — a group-by/top-k over an
  * `https://...parquet` URL — against a local HTTP stub. */
class HttpParquetSpec extends SparkSpec {
  import spark.implicits._

  test("remote parquet: q02-shaped query over http; second read is a cache hit") {
    // a small parquet to serve
    val dir = Files.createTempDirectory("graft-httpsrc-")
    Seq(("london", 100L), ("london", 300L), ("leeds", 50L), ("york", 20L))
      .toDF("town", "price").coalesce(1).write.parquet(s"$dir/house")
    val pq = Files.list(dir.resolve("house")).iterator()
    var served: java.nio.file.Path = null
    while (pq.hasNext) { val p = pq.next(); if (p.toString.endsWith(".parquet")) served = p }

    val hits = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/house_1.parquet", ex => {
      hits.incrementAndGet()
      val bytes = Files.readAllBytes(served)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val url = s"http://localhost:${server.getAddress.getPort}/house_1.parquet"
      val cache = Files.createTempDirectory("graft-httpcache-")
      // BENCHMARK.md:11 — SELECT town, count() c, avg(price) FROM read_parquet(url) GROUP BY town ORDER BY c DESC LIMIT 10
      val top = HttpParquet.read(spark, url, cache)
        .groupBy("town")
        .agg(count(lit(1)).as("c"), round(avg("price")).as("p"))
        .orderBy(desc("c"), col("town"))
        .limit(10)
        .as[(String, Long, Double)].collect().toSeq
      assert(top.head == (("london", 2L, 200.0)))
      assert(top.length == 3)
      assert(hits.get() == 1)
      // cache hit: no second request
      assert(HttpParquet.read(spark, url, cache).count() == 4)
      assert(hits.get() == 1)
    } finally server.stop(0)
  }

  test("fetch on HTTP error reports status and leaves no cache entry") {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/missing.parquet", ex => { ex.sendResponseHeaders(404, -1); ex.close() })
    server.start()
    try {
      val cache = Files.createTempDirectory("graft-httpcache2-")
      val url = s"http://localhost:${server.getAddress.getPort}/missing.parquet"
      val e = intercept[IllegalArgumentException](HttpParquet.fetch(url, cache))
      assert(e.getMessage.contains("404"))
      assert(!Files.exists(cache.resolve(HttpParquet.cacheKey(url))))
    } finally server.stop(0)
  }
}
