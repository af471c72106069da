package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Session-level knobs for the engine, read lazily per call site so a
  * conf change takes effect without rebuilding query objects.
  */
object Graft {

  /** When "true", [[materialize]] uses RELIABLE `checkpoint()` (HDFS/
    * object-store durable, requires `sparkContext.setCheckpointDir`);
    * default "false" uses `localCheckpoint()` (non-replicated executor
    * storage — cheapest, but a lost executor forces recompute).
    */
  val CheckpointReliableKey = "spark.graft.checkpoint.reliable"

  /** Cut a DataFrame's lineage and materialize it once, so every
    * downstream leg reuses the computed rows instead of re-running the
    * build (the duplicated-subtree hazard GraphQueries documents:
    * 94 Exchanges vs 22 for the triangle edge build without this).
    *
    * The durability trade is a deployment decision, not a query-shape
    * one, so it lives in session conf ([[CheckpointReliableKey]]):
    * local mode / short jobs take `localCheckpoint`; a long iterative
    * job on preemptible executors sets the conf and a checkpoint dir
    * and gets reliable `checkpoint` at every materialization point in
    * the engine (pagerank + triangle adjacency builds, perplexity's
    * gram counts, dedup label propagation) with no code change.
    *
    * `eager = true` for both spellings: the caller is about to fan out
    * multiple consumers, so deferring the materialization would let the
    * first consumer race the others into recomputing.
    */
  def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get(CheckpointReliableKey, "false").toBoolean)
      df.checkpoint()
    else df.localCheckpoint()

  /** Exact global dense row ranks (1-based, column `i`) WITHOUT a
    * single-partition window — the two-pass range-partitioned rank the
    * decile/gini/eq-depth docstrings promised as the 100 TB evolution
    * path, now the actual spelling:
    *
    *   1. `repartitionByRange` on the sort key spreads the total order
    *      across `nParts` range partitions (RangePartitioner samples
    *      boundaries; rows never cross a boundary out of key order),
    *      then `sortWithinPartitions` orders each partition locally —
    *      a narrow sort, no further exchange;
    *   2. `monotonically_increasing_id`, projected ABOVE that sort and
    *      pinned by the checkpoint, encodes (partition id << 33 |
    *      row-ordinal-in-iteration-order) — so pid and the 1-based
    *      local rank are bit-field reads of one stored long. (The
    *      first spelling ranked locally with a window PARTITIONED on
    *      the pid, which Catalyst satisfies with a full hash exchange
    *      on graft_pid — RangePartitioning(sortCols) doesn't imply
    *      HashPartitioning(pid) — plus a second local sort. The id
    *      spelling deletes that whole exchange+sort: the r9 BENCHNOTES
    *      cost accounting charged rankedByRange one shuffle too few.)
    *   3. partition row-counts (an `nParts`-row driver aggregate —
    *      metadata-sized at any scale) become cumulative offsets,
    *      broadcast-joined back on the partition id.
    *
    * The final rank `i = local + offset` is EXACTLY the global
    * `row_number() OVER (ORDER BY sortCols)`: ranks are defined by the
    * total order alone, so sampled boundary placement cannot change
    * them — callers MUST pass a tie-free key list (append a unique id
    * column as the last sort key, the same discipline the global
    * windows used). Output = input columns + `i` (long).
    */
  def rankedByRange(df: DataFrame, sortCols: Column*): DataFrame =
    rankedByRange(df,
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt,
      sortCols: _*)

  def rankedByRange(df: DataFrame, nParts: Int, sortCols: Column*): DataFrame = {
    // the id is assigned in the projection ABOVE the local sort, so the
    // per-partition counter increments in sorted iteration order; the
    // checkpoint pins the assignment before anything else reads it
    val parted = materialize(
      df.repartitionByRange(nParts, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
        .withColumn("graft_mid", monotonically_increasing_id()))
    val withPid = parted
      .withColumn("graft_pid", shiftright(col("graft_mid"), 33).cast("int"))
      .withColumn("graft_local",
        col("graft_mid").bitwiseAND(lit((1L << 33) - 1)) + lit(1L))
    val counts = withPid.groupBy(col("graft_pid"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    if (counts.isEmpty)
      return parted.drop("graft_mid").withColumn("i", lit(0L))
    // cumulative offsets over the pid-ascending counts; groupBy skips
    // empty partitions, which is fine — no row carries their pid
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) =>
      (pid, acc + c)
    }.init.zip(counts).map { case ((_, off), (pid, _)) => (pid, off) }
    val offDf = df.sparkSession.createDataFrame(
      offsets.toSeq.map { case (pid, off) => (pid, off) })
      .toDF("graft_pid", "graft_off")
    withPid
      .join(broadcast(offDf), Seq("graft_pid"))
      .withColumn("i", col("graft_local") + col("graft_off"))
      .drop("graft_pid", "graft_local", "graft_off", "graft_mid")
  }
}
