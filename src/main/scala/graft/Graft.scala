package graft

import org.apache.spark.sql.DataFrame

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
}
