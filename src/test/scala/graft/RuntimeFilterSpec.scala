package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Runtime filtering — the two Catalyst mechanisms that make selective
  * joins cheap at 100 TB without hand-written pushdown:
  *
  *  - dynamic partition pruning: a filter on the dim side prunes the
  *    FACT side's partition directories at runtime, so a 100 TB
  *    partitioned fact reads only the partitions the join can match;
  *  - runtime bloom filters: the selective side's join keys are
  *    collapsed into a bloom filter applied at the big side's scan,
  *    discarding non-matching rows before the shuffle.
  *
  * Both are plan-asserted here so a future config or upgrade regression
  * (either feature silently off) fails a test instead of silently
  * shuffling everything.
  */
class RuntimeFilterSpec extends SparkSpec {
  // conf-mutating suite: isolated SQLConf (see SparkSpec.isolatedSession)
  override lazy val spark = isolatedSession

  private lazy val base: String = {
    val tmp = Files.createTempDirectory("graft_rtfilter").toString
    val orders = Tables.load(spark, sf, "orders")
    orders.write.partitionBy("o_orderpriority")
      .mode("overwrite").parquet(s"$tmp/orders_part")
    orders.write.mode("overwrite").parquet(s"$tmp/orders_flat")
    tmp
  }

  test("dynamic partition pruning reaches the fact scan") {
    val fact = spark.read.parquet(s"$base/orders_part")
    // dim: a tiny frame selecting ONE priority — broadcastable, filtered
    val dim = Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority").as("p")).distinct()
      .filter(col("p").startsWith("1-"))
    val j = fact.join(dim, col("o_orderpriority") === col("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("n"))
    // FileScan metadata values (the PartitionFilters list) are cut at
    // spark.sql.maxMetadataStringLength = 100 chars, which truncates
    // "dynamicpruningexpression" mid-word when the preceding filters'
    // attribute ids are wide (flaked by suite ordering) — raise the cap
    // for this assertion
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    val plan = try j.queryExecution.executedPlan.toString()
    finally spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert(plan.contains("dynamicpruningexpression"),
      s"expected dynamic partition pruning on the fact scan:\n$plan")
    assert(j.collect().length == 1)
  }

  test("runtime bloom filter is injected for a selective build side") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.read.parquet(s"$base/orders_flat")
      val dim = Tables.load(spark, sf, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val j = fact.join(dim, col("o_custkey") === col("c_custkey"))
        .agg(count(lit(1)).as("n"))
      val opt = j.queryExecution.optimizedPlan.toString()
      assert(opt.contains("might_contain"),
        s"expected a runtime bloom filter on the fact scan:\n$opt")
      assert(j.head().getLong(0) > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
