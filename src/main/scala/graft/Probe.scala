package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only diagnostics: answers environment questions that drive query
  * design (nanos timestamps, split semantics). Not part of the engine.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    try {
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      ev.show(2, false)
      println("EVENTS_READ_OK " + ev.schema.simpleString)
    } catch {
      case e: Throwable =>
        println(s"EVENTS_READ_FAIL: ${e.getClass.getName}: ${String.valueOf(e.getMessage).take(300)}")
    }

    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      println("NANOS_AS_LONG_OK " + ev.schema.simpleString)
    } catch {
      case e: Throwable =>
        println(s"NANOS_AS_LONG_FAIL: ${e.getClass.getName}: ${String.valueOf(e.getMessage).take(300)}")
    } finally {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    }

    try {
      val ev = Tables.events(spark, "/root/testdata/sf0.001")
      println("EVENTS_CANONICAL_OK " + ev.schema.simpleString)
      ev.select(col("event_id"), col("ts")).show(3, false)
    } catch {
      case e: Throwable =>
        println(s"EVENTS_CANONICAL_FAIL: ${e.getClass.getName}: ${String.valueOf(e.getMessage).take(300)}")
    }
    spark.stop()
  }
}
