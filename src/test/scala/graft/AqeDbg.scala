package graft
import org.apache.spark.sql.functions._
class AqeDbg extends SparkSpec {
  import spark.implicits._
  test("dbg") {
    Seq("spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "20KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1").foreach{case(k,v)=>spark.conf.set(k,v)}
    val big = (1 to 60000).map(i => (if (i <= 57000) 1L else (i % 97 + 2).toLong, "x"*64+i.toString)).toDF("k","payload")
    val small = (1L to 98L).map(k => (k, k*10)).toDF("k","attr")
    val j = big.join(small, "k").groupBy(col("k")).agg(count(lit(1)).as("n"))
    j.collect()
    println("PLAN>>>")
    println(j.queryExecution.executedPlan.toString().take(4000))
  }
}
