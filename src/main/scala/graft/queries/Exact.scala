package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sum
import org.apache.spark.sql.types.DecimalType

/** THE oracle-determinism spelling for floating-point aggregation,
  * shared by every query file: SUM over doubles goes through
  * DECIMAL(18,6) (exact, order-independent addition) and back to
  * DOUBLE; averages divide the decimal sum by the count. One definition
  * so a precision change can never leave the files inconsistent with
  * each other — cross-file oracle parity depends on all queries using
  * the identical cast.
  *
  * WHAT MAY BE CAST: raw columns, and derived values whose TRUE decimal
  * expansion fits within 6 decimals (e.g. q1's price×(1−discount):
  * 2 dp × 2 dp = exactly 4 dp, so both engines round the double to the
  * same decimal regardless of how they read it). What may NOT: derived
  * doubles whose true expansion exceeds 6 decimals — Spark rounds the
  * double's SHORTEST decimal representation (BigDecimal.valueOf) while
  * DuckDB rounds its exact binary expansion, and with >6 true decimals
  * the two disagree at real rates (observed ~1e-11-relative drift in an
  * early spelling of events_time_weighted_avg, whose cents×μs/1e6
  * weights carry 8 true decimals). Such quantities are restated in
  * exact integer arithmetic instead (cents, μs, hex digits) with one
  * final IEEE division — see timeWeightedAvg, anomalyZscore,
  * aggRegrSlope.
  */
private[queries] object Exact {
  def dec(c: Column): Column = c.cast(DecimalType(18, 6))
  def dsum(c: Column): Column = sum(dec(c)).cast("double")
}
