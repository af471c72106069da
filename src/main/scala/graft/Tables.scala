package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver test tables (TESTDATA.md): one parquet per
  * table under the given scale-factor directory.
  *
  * All query builders in this repo take `(SparkSession, sfDir)` and go
  * through here, so scan-level concerns (nanosecond-timestamp handling,
  * future bucketing/partitioning of the test tables) live in one place.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Format-portable source/sink leg: the driver tables are parquet, but
    * the engine reads and writes any Spark-native columnar/text format
    * the classpath carries (parquet, orc, json, csv). Text formats get
    * an explicit schema on read — csv/json carry none (csv also needs
    * its header) — so a round trip is type-identical, not just
    * value-identical. SourceFormatsSpec round-trips the test tables
    * through each format and asserts set equality.
    */
  def writeAs(df: DataFrame, format: String, path: String): Unit = {
    val w = df.write.mode("overwrite").format(format)
    (if (format == "csv") w.option("header", "true") else w).save(path)
  }

  def readAs(spark: SparkSession, format: String, path: String,
             schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val r = spark.read.format(format).schema(schema)
    (if (format == "csv") r.option("header", "true") else r).load(path)
  }

  /** events.parquet carries TIMESTAMP(NANOS), which Spark 4.1 refuses to
    * read as a timestamp ([PARQUET_TYPE_ILLEGAL]). Read the column as
    * nanos-since-epoch and floor to microseconds —
    * `timestamp_micros(ns div 1000)` — which matches DuckDB's
    * `ts::TIMESTAMP` truncation bit-for-bit (verified empirically).
    *
    * REQUIRES `spark.sql.legacy.parquet.nanosAsLong=true` on the
    * session, set once by the session owner (Bench/QBench/Verify/test
    * builders all do) — a query builder must not mutate session conf
    * (racy under concurrent query construction, and it would silently
    * change how unrelated code reads nanos parquet).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
}
