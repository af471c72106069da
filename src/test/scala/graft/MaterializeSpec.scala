package graft

import java.nio.file.{Files, Paths}

/** [[Graft.materialize]] must produce identical results in both
  * durability modes, and the reliable mode must actually write RDD
  * checkpoint files (otherwise the conf would be a silent no-op and
  * the "cluster spelling" claim untested).
  */
class MaterializeSpec extends SparkSpec {

  test("reliable-checkpoint mode matches localCheckpoint results and writes files") {
    val iso = isolatedSession // mutates session conf — own SQLConf
    val ckptDir = Files.createTempDirectory("graft_ckpt").toString
    // context-wide (shared across suites) but inert for them: nothing
    // else calls reliable checkpoint
    iso.sparkContext.setCheckpointDir(ckptDir)
    iso.conf.set(Graft.CheckpointReliableKey, "true")
    try {
      val reliable = graft.queries.GraphQueries.pagerank(iso, sf).collect().toSeq
      val local = graft.queries.GraphQueries.pagerank(spark, sf).collect().toSeq
      assert(reliable == local,
        s"reliable-mode pagerank diverged:\n$reliable\nvs\n$local")
      val stream = Files.walk(Paths.get(ckptDir))
      val nFiles =
        try stream.filter(Files.isRegularFile(_)).count()
        finally stream.close()
      assert(nFiles > 0, "reliable mode set but no checkpoint files written")
    } finally iso.conf.unset(Graft.CheckpointReliableKey)
  }
}
