package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

/** The raw object zone: immutable JSON blobs, one per fetch, named
  * `dolar-<epoch_seconds>.json` (reference: /root/reference/lambda/
  * app.py:21-29). The engine's ingest contract starts here; the HTTP
  * fetch itself (A1) is an out-of-engine scheduled step whose only
  * engine-visible effect is a new raw file.
  */
object RawZone {

  /** A5/F5/F6: raw-zone key naming + the key filter the loader applies. */
  def key(epochSeconds: Long): String = s"dolar-$epochSeconds.json"

  val pathGlob: String = "dolar-*.json"

  def matchesKey(name: String): Boolean =
    name.startsWith("dolar-") && name.endsWith(".json")

  /** A2: write one raw payload, byte-identical, into the zone. */
  def write(dir: String, epochSeconds: Long, payload: Array[Byte]): Path = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    Files.write(d.resolve(key(epochSeconds)), payload)
  }

  def write(dir: String, epochSeconds: Long, payload: String): Path =
    write(dir, epochSeconds, payload.getBytes(StandardCharsets.UTF_8))
}
