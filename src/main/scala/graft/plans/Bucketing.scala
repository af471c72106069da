package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout helpers — the co-located-join leg of the
  * engine's scale posture. A fact table bucketed AND sorted by its join
  * key joins another table bucketed the same way with NO exchange on
  * either side (and no per-query sort): the shuffle is paid ONCE at
  * write time and amortized over every subsequent join — at 100 TB the
  * difference between re-shuffling the fact table per query and
  * scanning it in place. BucketedJoinSpec asserts the exchange-free
  * SortMergeJoin plan.
  *
  * (The driver's test tables are plain parquet files, so bucketing is
  * exercised via these helpers + spec rather than a registered query —
  * `Tables.load` cannot impose bucket metadata on files it doesn't
  * own.)
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted external table (path-backed so
    * callers control the storage location; the bucket metadata lives in
    * the session catalog).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, path: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Equi-join two same-bucketed tables on their bucket key. With equal
    * bucket counts Spark plans a SortMergeJoin with NO ShuffleExchange
    * on either side (the remaining Sort is partition-local — Spark only
    * trusts write-time ordering when every bucket is a single file).
    */
  def bucketedEquiJoin(spark: SparkSession, left: String, right: String,
                       key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
