package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: with runtime statistics, Spark splits an
  * oversized shuffle partition into sub-partitions and replicates the
  * matching build side — the no-code-change counterpart of the manual
  * salted join in [[graft.plans.SkewJoin]] (manual salting remains the
  * tool when the skewed side feeds a later stage that AQE cannot
  * re-plan, e.g. a window over the same key).
  */
class AqeSkewSpec extends SparkSpec {
  // conf-mutating suite: isolated SQLConf (see SparkSpec.isolatedSession)
  override lazy val spark = isolatedSession
  import spark.implicits._

  test("AQE splits a planted skewed partition at runtime") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "20KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    // 95% of the big side is key 1; payload pads partition size. The
    // aggregate MUST consume payload — otherwise Catalyst column-prunes
    // it below the join and the "skewed" partition is 57000 bare longs,
    // which compress under the 20KB detection threshold (observed: the
    // pruned plan coalesces instead of splitting).
    val big = (1 to 60000)
      .map(i => (if (i <= 57000) 1L else (i % 97 + 2).toLong,
        s"payload-$i-" + (i * 2654435761L).toHexString * 8))
      .toDF("k", "payload")
    val small = (1L to 98L).map(k => (k, k * 10)).toDF("k", "attr")
    val j = big.join(small, "k").groupBy(col("k"))
      .agg(count(lit(1)).as("n"), max(length(col("payload"))).as("max_len"))
    assert(j.collect().map(r => (r.getLong(0), r.getLong(1))).toMap.apply(1L) == 57000L)
    val finalPlan = j.queryExecution.executedPlan.toString()
    assert(finalPlan.contains("skew="),
      s"expected AQE to mark the skewed join (skew= in the final plan):\n$finalPlan")
  }
}
