package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import graft.SparkSpec

/** Real HTTP round-trips against the reference API surface (§3.1/§3.2). */
class GigHttpServerSpec extends SparkSpec {

  private lazy val root = Files.createTempDirectory("graft-http-").toString
  private lazy val server =
    new GigHttpServer(spark, root, port = 0, saveTimeoutMs = 100).start()
  private lazy val base = s"http://localhost:${server.boundPort}"
  private val client = HttpClient.newHttpClient()

  override def afterAll(): Unit = { server.close(); super.afterAll() }

  private def post(path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"$base$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def get(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"$base$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("ping/health") {
    assert(get("/ping").statusCode() == 204)
    val h = get("/health")
    assert(h.statusCode() == 200 && h.body().contains("ok"))
  }

  test("write line protocol -> 204 after durable flush; query returns results (F1)") {
    val lines =
      """weather,location=us-midwest,season=summer temperature=82
        |weather,location=us-east,season=summer temperature=80
        |weather,location=us-west,season=summer temperature=99
        |weather,location=us-south,season=summer temperature=87.1""".stripMargin
    val w = post("/write?db=mydb", lines)
    assert(w.statusCode() == 204)

    val q = post("/query",
      """{"query": "SELECT count(*) AS c, avg(temperature) AS t FROM mydb_weather"}""")
    assert(q.statusCode() == 200)
    // reference renders bigints as strings (README.md:131-133)
    assert(q.body().contains(""""c":"4""""), q.body())
    assert(q.body().contains(""""t":87.025"""), q.body())
  }

  test("gzip write body is accepted") {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write("gztable v=7i 1700000000000000000".getBytes(UTF_8)); gz.close()
    val req = HttpRequest.newBuilder(URI.create(s"$base/write"))
      .header("Content-Encoding", "gzip")
      .POST(HttpRequest.BodyPublishers.ofByteArray(bos.toByteArray)).build()
    assert(client.send(req, HttpResponse.BodyHandlers.ofString()).statusCode() == 204)
    val q = post("/query", """{"query": "SELECT v FROM gztable"}""")
    assert(q.body().contains(""""v":"7""""), q.body())
  }

  test("create table via reference YAML shape (F8) then JSON") {
    val yaml =
      """create_table: metrics
        |fields:
        |  ts: INT8
        |  name: VARCHAR
        |  value: FLOAT8
        |  cnt: UBIGINT
        |engine: Merge
        |order_by: [ts]
        |timestamp:
        |  field: ts
        |  precision: ns""".stripMargin
    assert(post("/gigapi/create", yaml).statusCode() == 200)
    val spec = server.catalog.get("default", "metrics").get
    assert(spec.engine == "Merge" && spec.orderBy == Seq("ts"))
    assert(spec.columns.toMap.get("cnt").contains("UINT64"))

    val json = """{"create_table":"jt","fields":{"a":"INT64"},"order_by":["a"]}"""
    assert(post("/gigapi/create", json).statusCode() == 200)
    assert(server.catalog.get("default", "jt").nonEmpty)
  }

  test("create-table validation errors -> 500 with message") {
    val bad = """{"create_table":"x","fields":{"a":"INT64"},"order_by":["nope"]}"""
    val r = post("/gigapi/create", bad)
    assert(r.statusCode() == 500 && r.body().contains("order_by"))
  }

  test("query on unknown table errors gracefully") {
    val r = post("/query", """{"query": "SELECT * FROM no_such_table"}""")
    assert(r.statusCode() == 500)
  }
}
