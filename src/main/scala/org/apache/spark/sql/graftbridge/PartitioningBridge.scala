package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.ExpressionSet
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.LogicalRDD

/** `Dataset.localCheckpoint()` is SUPPOSED to carry the physical plan's
  * output partitioning into the resulting `LogicalRDD`, so that a frame
  * checkpointed right after `repartition(n, keys)` joins/aggregates on
  * those keys with NO further exchange (the `rankedAll` discipline this
  * repo documents). Under AQE the executed plan is an
  * `AdaptiveSparkPlanExec` whose `outputPartitioning` the checkpoint
  * path reads as `UnknownPartitioning(0)` — measured r17: every
  * pagerank iteration re-exchanged the full checkpointed adjacency
  * (3 identical 1.17 M-row shuffles, ~17 s task CPU each), and the
  * "already hash-partitioned" comments in GraphQueries were silently
  * not true at runtime.
  *
  * This bridge re-declares what the caller just made physically true:
  * given a frame whose plan is a bare `LogicalRDD` produced by a
  * checkpoint of `repartition(n, keys)`, it rebuilds the relation with
  * `HashPartitioning(keys, n)` as its advertised partitioning (origin
  * stats/constraints preserved via reflection on the private fields —
  * they are constructor-curried with no accessors). The CALLER is
  * responsible for the physical truth of the claim: rows must actually
  * be hash-partitioned by exactly those keys into exactly n partitions
  * (which `repartition(n, keys)` + checkpoint guarantees — AQE never
  * coalesces a user repartition with an explicit n, and the checkpoint
  * persists partitions 1:1). Declaring a partitioning the rows do not
  * have would produce WRONG JOIN RESULTS, not a slowdown — use only
  * through [[graft.Graft.materializeHashed]].
  */
object PartitioningBridge {
  def declareHashPartitioning(df: DataFrame, colNames: Seq[String],
                              n: Int): DataFrame =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val attrs = colNames.map(nm => lr.output.filter(_.name == nm))
        if (attrs.exists(_.size != 1)) df // missing/ambiguous key: no-op
        else {
          val part = HashPartitioning(attrs.map(_.head), n)
          val session = df.sparkSession.asInstanceOf[ClassicSession]
          val (origStats, origConstraints) = privateOrigins(lr)
          Dataset.ofRows(session,
            new LogicalRDD(lr.output, lr.rdd, part, lr.outputOrdering,
              lr.isStreaming, lr.stream)(session, origStats, origConstraints))
        }
      case _ => df // not a bare checkpointed relation: no-op
    }

  /** originStats / originConstraints are curried-private on LogicalRDD
    * (no accessors); read them reflectively so the rebuilt relation
    * keeps the pre-checkpoint statistics the planner's size estimates
    * use. Falls back to None (Spark's own defaults) if the private
    * field layout ever changes.
    */
  private def privateOrigins(lr: LogicalRDD)
      : (Option[Statistics], Option[ExpressionSet]) = {
    def read[T](name: String): Option[T] =
      try {
        val f = classOf[LogicalRDD].getDeclaredField(name)
        f.setAccessible(true)
        f.get(lr).asInstanceOf[Option[T]]
      } catch { case _: Throwable => None }
    (read[Statistics]("originStats"), read[ExpressionSet]("originConstraints"))
  }
}
