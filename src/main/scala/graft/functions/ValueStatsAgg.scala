package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact per-group count/sum/sum-of-squares over integer cents — the
  * typed `Aggregator` leg of the API surface (case-class buffer with
  * product Encoders, registered on DataFrames via `functions.udaf`),
  * complementing the two `TypedImperativeAggregate`s (CMS, Bloom) that
  * need raw byte buffers. The buffer is three longs, merged
  * associatively, so partial aggregation applies and the shuffle
  * carries 24 bytes per group; mean/variance derive from the exact
  * sums AFTER aggregation, in the caller, keeping the aggregate itself
  * integer-only (portable to the DuckDB oracle by construction —
  * Exact.scala discipline).
  *
  * Long bounds: cents ≤ 5.7e4 and cents² ≤ 3.2e9; a group of 1e9 rows
  * stays within 3.2e18 < Long.MaxValue — sized for 100 TB groups.
  */
case class StatsBuf(n: Long, sum: Long, sumSq: Long)

object ValueStatsAgg extends Aggregator[Long, StatsBuf, StatsBuf] {
  override def zero: StatsBuf = StatsBuf(0L, 0L, 0L)
  override def reduce(b: StatsBuf, cents: Long): StatsBuf =
    StatsBuf(b.n + 1, b.sum + cents, b.sumSq + cents * cents)
  override def merge(a: StatsBuf, b: StatsBuf): StatsBuf =
    StatsBuf(a.n + b.n, a.sum + b.sum, a.sumSq + b.sumSq)
  override def finish(b: StatsBuf): StatsBuf = b
  override def bufferEncoder: Encoder[StatsBuf] = Encoders.product[StatsBuf]
  override def outputEncoder: Encoder[StatsBuf] = Encoders.product[StatsBuf]
}
