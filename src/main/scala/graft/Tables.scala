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

  /** The events table's `ts` has shipped in two physical encodings
    * across driver testdata generations, so the reader adapts to what
    * the file actually carries instead of assuming one:
    *
    *  - TIMESTAMP(NANOS), which Spark 4.1 refuses to read as a
    *    timestamp ([PARQUET_TYPE_ILLEGAL]): with
    *    `spark.sql.legacy.parquet.nanosAsLong=true` on the session
    *    (set once by the session owner — Bench/QBench/Verify/test
    *    builders all do; a query builder must not mutate session conf)
    *    the column arrives as a nanos-since-epoch LONG and is floored
    *    to microseconds — `timestamp_micros(ns div 1000)` — matching
    *    DuckDB's `ts::TIMESTAMP` truncation bit-for-bit (verified
    *    empirically).
    *  - TIMESTAMP(MICROS) without UTC adjustment, which Spark reads as
    *    TIMESTAMP_NTZ: cast to the session-local TIMESTAMP. The
    *    sessions here run in UTC, so the cast is instant-preserving
    *    and lands on the exact micros DuckDB reads natively.
    *
    * Either way downstream sees one canonical shape: `ts` as
    * microsecond-precision TIMESTAMP (LTZ) — the type every events
    * query, oracle hash, and spec in this repo was verified against.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw // already session-local TIMESTAMP
    }
  }
}
