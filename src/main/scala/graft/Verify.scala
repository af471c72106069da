package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Crash posture (r15 post-mortem: the round's bench JVM died with exit
  * 56 = ExecutorExitCode.HEARTBEAT_FAILURE and the round's correctness
  * artifact arrived empty): oracle_sql.json is written FIRST so a
  * mid-suite death never zeroes the compare inputs; the local[*]
  * heartbeat self-kill is disarmed in the session builder; a stopped
  * SparkContext is detected per-query and the session rebuilt so one
  * death costs one query; and a per-query status line is flushed to
  * `outDir/verify_rows.jsonl` as each dump completes, so even a hard
  * SIGKILL leaves a parseable record of what finished.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    // Optional 3rd arg: comma-separated query names — dev-only fast path
    // for iterating on one oracle; the driver always passes two args.
    val (sfDir, outDir, only) = args match {
      case Array(a, b)    => (a, b, None)
      case Array(a, b, c) => (a, b, Some(c.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    def buildSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        // disarm the in-process executor's heartbeat System.exit —
        // pure downside in local[*]; see Bench.scala for the full r15
        // exit-56 rationale
        .config("spark.executor.heartbeatInterval", "60s")
        .config("spark.network.timeout", "600s")
        .config("spark.executor.heartbeat.maxFailures", "10000")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    var spark = buildSession()
    var rebuilds = 0
    def ensureLive(): SparkSession = {
      if (spark.sparkContext.isStopped) {
        rebuilds += 1
        System.err.println(s"[verify] SparkContext stopped — rebuilding session (rebuild #$rebuilds)")
        spark = buildSession()
      }
      spark
    }
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // the compare inputs FIRST — they depend on nothing Spark does
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val rowsWriter =
      try Some(Files.newBufferedWriter(Paths.get(s"$outDir/verify_rows.jsonl"),
        java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Throwable =>
        System.err.println(s"[verify] WARN cannot open verify_rows.jsonl: $e"); None
      }
    def emitRow(line: String): Unit = rowsWriter.foreach { w =>
      try { w.write(line); w.write("\n"); w.flush() }
      catch { case _: Throwable => () }
    }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(ensureLive(), sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        val sec = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[verify] $name ok in $sec%.1fs")
        emitRow(s"""{"q":${q(name)},"ok":true,"sec":${math.round(sec * 100) / 100.0}}""")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        emitRow(s"""{"q":${q(name)},"ok":false,"err":${q(String.valueOf(e.getMessage).take(300))}}""")
      }
    }
    rowsWriter.foreach(w => try w.close() catch { case _: Throwable => () })
    spark.stop()
  }
}
