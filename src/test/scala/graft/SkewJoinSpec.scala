package graft

import graft.plans.SkewJoin
import org.apache.spark.sql.functions._

/** Salted shuffle join: result parity with the plain join, the salt in
  * the shuffle keys, and an actually-split hot key — the skew leg of
  * the 100 TB posture (a single hot key must not pin one reducer).
  */
class SkewJoinSpec extends SparkSpec {

  test("salted join is row-identical to the plain join") {
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_custkey").as("custkey"), col("o_orderkey"))
    val c = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    val salted = SkewJoin.saltedEquiJoin(o, c, "custkey", 8, col("o_orderkey"))
      .select("custkey", "o_orderkey", "c_mktsegment")
    val plain = o.join(c, "custkey").select("custkey", "o_orderkey", "c_mktsegment")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
      "salted join must equal plain join as a multiset")
  }

  test("salt participates in the shuffle and the join is not broadcast") {
    val o = Tables.load(spark, sf, "orders")
      .select(col("o_custkey").as("custkey"), col("o_orderkey"))
    val c = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    val plan = planOf(SkewJoin.saltedEquiJoin(o, c, "custkey", 8, col("o_orderkey")))
    assert(plan.contains("SortMergeJoin"), s"merge hint must hold:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), s"no broadcast:\n$plan")
    assert(plan.contains("__salt"), s"salt must be a join/shuffle key:\n$plan")
  }

  test("a planted 90%-hot key is spread across salt sub-keys") {
    import spark.implicits._
    val salts = 8
    // 9000 rows of key 1 + 1000 spread over keys 2..101
    val big = (1 to 10000).map(i => (if (i <= 9000) 1L else (i % 100 + 2).toLong, i.toLong))
      .toDF("k", "id")
    val small = (1L to 101L).toDF("k").withColumn("attr", col("k") * 10)
    val salted = SkewJoin.saltedEquiJoin(big, small, "k", salts, col("id"))
    assert(salted.count() == 10000)
    // the hot key's rows must occupy every salt bucket, roughly evenly:
    // max/min sub-key volume within key 1 stays under 2x at n=9000
    val spread = big.withColumn("s", pmod(hash(col("id")), lit(salts)))
      .filter(col("k") === 1).groupBy("s").count()
      .agg(max("count").as("mx"), min("count").as("mn"), count(lit(1)).as("nb"))
      .head()
    assert(spread.getAs[Long]("nb") == salts, "hot key must hit all salt buckets")
    assert(spread.getAs[Long]("mx") < 2 * spread.getAs[Long]("mn"),
      s"salt spread too uneven: $spread")
  }
}
