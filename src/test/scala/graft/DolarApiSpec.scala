package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.ingest.{DolarIngest, RawZone}
import graft.serve.DolarApi

/** End-to-end serving parity (/root/reference/main.py:57-86 +
  * tests.py): fixture payloads -> ingest -> REST API over the engine's
  * interval query, asserting status codes, the exact Spanish 400 detail,
  * the 422 validation status, the 500 DB-error mapping, and the
  * count/data response shape with golden values.
  */
class DolarApiSpec extends SparkSpec {

  private lazy val client = HttpClient.newHttpClient()

  private def post(port: Int, body: String, path: String = "/api/v1/dolar/intervalo") =
    client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def get(port: Int, path: String) =
    client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .GET().build(), HttpResponse.BodyHandlers.ofString())

  test("health, interval golden values, 400/422/500 mappings") {
    val raw = Files.createTempDirectory("graft_api_raw").toString
    RawZone.write(raw, 1704164645L,
      """[["1757509256000","3920.12"],["1757509266000","3921.55"]]""")
    DolarIngest.batchToTable(spark, raw, "dolar_api")
    val server = DolarApi.start(spark, 0, "dolar_api")
    val port = server.getAddress.getPort
    try {
      val health = get(port, "/health")
      assert(health.statusCode() == 200 && health.body() == """{"status":"ok"}""")

      val ok = post(port,
        """{"start":"2025-09-10T00:00:00","end":"2025-09-11T00:00:00"}""")
      assert(ok.statusCode() == 200)
      assert(ok.body() ==
        """{"count":2,"data":[{"fechahora":"2025-09-10T13:00:56","valor":3920.12},""" +
          """{"fechahora":"2025-09-10T13:01:06","valor":3921.55}]}""")

      // B3: equal bounds are an error with the reference's exact detail
      val bad = post(port,
        """{"start":"2025-09-10T00:00:00","end":"2025-09-10T00:00:00"}""")
      assert(bad.statusCode() == 400)
      assert(bad.body() == """{"detail":"`end` debe ser mayor que `start`."}""")

      // malformed payloads are a validation error (FastAPI's 422)
      assert(post(port, """{"start":"not-a-date","end":"x"}""").statusCode() == 422)
      assert(post(port, """{"start":"2025-09-10T00:00:00"}""").statusCode() == 422)

      // query-side failure surfaces as the reference's 500 detail prefix
      val broken = DolarApi.start(spark, 0, "missing_table")
      try {
        val err = post(broken.getAddress.getPort,
          """{"start":"2025-09-10T00:00:00","end":"2025-09-11T00:00:00"}""")
        assert(err.statusCode() == 500)
        assert(err.body().startsWith("""{"detail":"Error consultando la base de datos:"""))
      } finally broken.stop(0)
    } finally {
      server.stop(0)
      spark.sql("DROP TABLE IF EXISTS dolar_api")
    }
  }
}
