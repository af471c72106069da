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
  */
private[queries] object Exact {
  def dec(c: Column): Column = c.cast(DecimalType(18, 6))
  def dsum(c: Column): Column = sum(dec(c)).cast("double")
}
