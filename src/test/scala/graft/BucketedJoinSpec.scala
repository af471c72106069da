package graft

import java.nio.file.Files

import graft.plans.Bucketing
import org.apache.spark.sql.functions.col

/** Co-located join via bucketed tables: same bucket count + key on both
  * sides must produce a SortMergeJoin with NO exchange — the
  * write-once-shuffle layout that makes repeated fact-table joins
  * scan-speed at 100 TB.
  */
class BucketedJoinSpec extends SparkSpec {
  // conf-mutating suite: isolated SQLConf (see SparkSpec.isolatedSession)
  override lazy val spark = isolatedSession

  test("same-bucketed tables join with no exchange") {
    val tmp = Files.createTempDirectory("graft_bucketed")
    val orders = Tables.load(spark, sf, "orders")
    val customer = Tables.load(spark, sf, "customer")
    Bucketing.writeBucketed(orders.select(col("o_orderkey"), col("o_custkey"),
      col("o_totalprice")), "orders_b", "o_custkey", 8,
      tmp.resolve("orders_b").toString)
    Bucketing.writeBucketed(
      customer.select(col("c_custkey").as("o_custkey"), col("c_name")),
      "customer_b", "o_custkey", 8, tmp.resolve("customer_b").toString)
    try {
      // keep the broadcast planner out of the way: the point is the
      // co-located SortMergeJoin, which broadcast would mask at test scale
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedEquiJoin(spark, "orders_b", "customer_b",
        "o_custkey")
      val plan = planOf(joined)
      assert(plan.contains("SortMergeJoin"), s"plan:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // the residual Sort is partition-local (bucket files aren't
      // guaranteed single-file, so Spark won't trust write-time order);
      // the EXCHANGE elision is the scale win being asserted
      assert(plan.contains("Bucketed: true"), s"plan:\n$plan")
      // row parity with the plain (shuffling) join
      val expected = orders.join(
        customer.select(col("c_custkey").as("o_custkey")), "o_custkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
