package graft.ingest

/** A1/A2: the reference's extract step
  * (/root/reference/lambda/app.py:12-36) re-expressed as an
  * out-of-engine scheduled fetch whose only engine-visible effect is a
  * new raw-zone object:
  *
  *   - `transport` abstracts the HTTP GET (app.py:17-19): it returns the
  *     raw payload bytes or throws — a non-2xx/raise_for_status failure
  *     fails the WHOLE run (no partial write);
  *   - the payload is written byte-identical to `dolar-<epoch_s>.json`
  *     (app.py:21-29);
  *   - the result mirrors the handler's response shape
  *     (app.py:31-36: bucket/key/size_bytes/message).
  *
  * The engine proper starts at the raw zone (SURVEY §2.A1): at 100 TB
  * the fetch tier is horizontally-scaled ingestion infrastructure, not a
  * Spark job, so modeling it as "bytes arrive in the zone" is the
  * correct seam.
  */
object Fetcher {

  case class FetchResult(zone: String, key: String, sizeBytes: Long, message: String)

  def fetchToRawZone(zoneDir: String, epochSeconds: Long)
                    (transport: () => Array[Byte]): FetchResult = {
    val payload = transport() // propagates transport failure = whole-run failure
    val path = RawZone.write(zoneDir, epochSeconds, payload)
    FetchResult(zoneDir, path.getFileName.toString, payload.length.toLong, "OK")
  }
}
