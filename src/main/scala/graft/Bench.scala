package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: pay JVM/codegen/parquet-footer/noop-writer startup outside
    // the timings — a representative scan+agg+sort pipeline through the
    // same write path the timed queries use, so the alphabetically-first
    // query doesn't absorb the whole-stage-codegen infrastructure cost
    try {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("q"))
        .orderBy(col("q"))
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop-format write: runs the DECLARED plan end to end (a bare
      // .count() would let the optimizer delete top-level sorts, so
      // every orderBy query's final sort would go unmeasured).
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable =>
        // a crashing query must be LOUD — recorded as a failure, never
        // as a suspiciously fast success that lowers the suite total
        failed ::= name
        System.err.println(s"[bench] FAILED $name: ${e.getClass.getSimpleName}: " +
          String.valueOf(e.getMessage).take(200))
      }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
