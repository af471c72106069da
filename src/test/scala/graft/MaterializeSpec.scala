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

  test("rankedByRange == global row_number on random data, asc and desc, skewed") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(42)
    // heavy ties in the value column (skewed), unique id tiebreak
    val rows = (1L to 5000L).map(id => (id, rnd.nextInt(20).toLong))
    val df = rows.toDF("id", "v").repartition(7)
    def globalRank(sort: Seq[org.apache.spark.sql.Column]) =
      df.withColumn("i", row_number().over(Window.orderBy(sort: _*)).cast("long"))
        .select(col("id"), col("i")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((sort, label) <- Seq(
        (Seq(col("v"), col("id")), "asc"),
        (Seq(col("v").desc, col("id")), "desc"))) {
      val want = globalRank(sort)
      val got = Graft.rankedByRange(df, 5, sort: _*)
        .select(col("id"), col("i")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"$label ranks diverge from the global window")
    }
    // degenerate: all rows one key (every row lands in one range slice)
    val one = (1L to 100L).map(id => (id, 7L)).toDF("id", "v")
    val g1 = Graft.rankedByRange(one, 5, col("v"), col("id"))
      .select(col("id"), col("i")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g1 == (1L to 100L).map(i => i -> i).toMap)
  }

  test("ntileFromRank == SQL ntile for every (n, k) in a boundary grid") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // n spanning below/at/above k and non-divisible remainders; k
    // covering the registered uses (10, 32) plus edge tiles
    for (k <- Seq(1, 3, 10, 32); n <- Seq(1, 2, 9, 10, 11, 31, 32, 33, 100, 321)) {
      val df = (1L to n.toLong).toDF("i")
        .crossJoin(Seq(n.toLong).toDF("graft_n"))
      val got = df.select(col("i"),
          Graft.ntileFromRank(k).cast("long").as("t"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = (1L to n.toLong).toDF("v")
        .withColumn("t", ntile(k).over(Window.orderBy(col("v"))).cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"ntileFromRank($k) diverges from ntile at n=$n")
    }
  }

  test("rankedByRange reads ranks with ZERO shuffles; cumSumByRange with ONE") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1L to 1000L).map(i => (i, i % 7)).toDF("id", "v")
    def shuffles(p: String): Int =
      raw"(?<!Broadcast)Exchange".r.findAllIn(p).size
    // rank read: checkpoint scan -> bit-field decode -> broadcast
    // offset join. The r9 spelling paid a hash exchange on the pid
    // (plus a second sort) here — this pin keeps it deleted.
    val pr = planOf(Graft.rankedByRange(df, 4, col("v"), col("id")))
    assert(shuffles(pr) == 0, s"rank read pays a shuffle:\n$pr")
    assert(!pr.contains("Window"), s"rank read grew a window:\n$pr")
    // prefix-sum read: exactly the ONE documented pid-keyed exchange
    // (partition-parallel), and its window is pid-PARTITIONED
    val pc = planOf(Graft.cumSumByRange(df, Seq(col("id")),
      Seq(col("v") -> "c")))
    assert(shuffles(pc) == 1, s"cumsum read shuffle count changed:\n$pc")
    assert(pc.contains("Window"), s"cumsum lost its local running sum:\n$pc")
    assert(!raw"windowspecdefinition\([^,()]*? (ASC|DESC)".r
        .findAllMatchIn(pc).hasNext,
      s"cumsum window lost its pid partition key:\n$pc")
  }

  test("cumSumByRange == global running sums on random data, asc and desc") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    val rows = (1L to 4000L).map(id =>
      (id, rnd.nextInt(1000).toLong, rnd.nextInt(50).toLong))
    val df = rows.toDF("id", "a", "b").repartition(6)
    for ((sort, label) <- Seq(
        (Seq(col("id")), "asc"),
        (Seq(col("id").desc), "desc"))) {
      val w = Window.orderBy(sort: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = df
        .withColumn("ca", sum(col("a")).over(w))
        .withColumn("cab", sum(col("a") + col("b")).over(w))
        .select(col("id"), col("ca"), col("cab")).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val got = Graft.cumSumByRange(df, sort,
          Seq(col("a") -> "ca", (col("a") + col("b")) -> "cab"))
        .select(col("id"), col("ca"), col("cab")).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == want, s"$label running sums diverge from the global window")
    }
    // empty input keeps the schema (zero-filled sum columns)
    val empty = Seq.empty[(Long, Long)].toDF("id", "a")
    val e = Graft.cumSumByRange(empty, Seq(col("id")), Seq(col("a") -> "ca"))
    assert(e.columns.toSeq == Seq("id", "a", "ca") && e.isEmpty)
  }
}
