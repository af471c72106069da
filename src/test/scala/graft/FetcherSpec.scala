package graft

import java.nio.file.{Files, Paths}

import graft.ingest.Fetcher

/** A1/A2 extract-step parity — golden values from
  * /root/reference/tests/tests.py:69-97: fixed-clock key naming,
  * byte-identical payload at rest, response shape, and whole-run failure
  * on transport error.
  */
class FetcherSpec extends SparkSpec {

  private val payload =
    """[["1757509256000","3920.12"],["1757509266000","3921.55"]]""".getBytes("UTF-8")

  test("happy path: key dolar-1704164645.json, byte-identical payload, OK response") {
    val zone = Files.createTempDirectory("graft_fetch").toString
    val res = Fetcher.fetchToRawZone(zone, 1704164645L)(() => payload)
    assert(res.key == "dolar-1704164645.json")   // tests.py:95
    assert(res.sizeBytes == payload.length.toLong) // tests.py:96
    assert(res.message == "OK")
    val atRest = Files.readAllBytes(Paths.get(zone, res.key))
    assert(java.util.Arrays.equals(atRest, payload)) // tests.py:99-100
  }

  test("transport failure fails the whole run, nothing written") {
    val zone = Files.createTempDirectory("graft_fetch_fail").toString
    intercept[RuntimeException] {
      Fetcher.fetchToRawZone(zone, 1L)(() => throw new RuntimeException("HTTP 500"))
    }
    assert(Files.list(Paths.get(zone)).count() == 0)
  }
}
