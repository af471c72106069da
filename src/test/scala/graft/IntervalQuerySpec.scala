package graft

import java.time.LocalDateTime

import graft.queries.IntervalQuery
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's interval query (/root/reference/main.py:61-86) —
  * golden values from /root/reference/tests/tests.py:215-247:
  * equal-bounds rejection (B3), inclusive bounds (B2), ascending order
  * (C1), count + double serving (D1/F3).
  */
class IntervalQuerySpec extends SparkSpec {

  private lazy val table = {
    val schema = StructType(Seq(
      StructField("fechahora", TimestampType),
      StructField("valor", DecimalType(12, 4))))
    val rows = Seq(
      Row(java.sql.Timestamp.valueOf("2025-01-01 10:00:00"), BigDecimal("3900.12").bigDecimal),
      Row(java.sql.Timestamp.valueOf("2025-01-01 10:05:00"), BigDecimal("3901.34").bigDecimal),
      Row(java.sql.Timestamp.valueOf("2025-01-01 10:10:00"), BigDecimal("3899.99").bigDecimal))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  test("B3: equal bounds are an error, not an empty result (tests.py:224-230)") {
    val now = LocalDateTime.parse("2025-01-01T12:00:00")
    val e = intercept[IllegalArgumentException] {
      IntervalQuery.over(table, now, now)
    }
    assert(e.getMessage.contains("debe ser mayor"))
  }

  test("B3: inverted bounds are an error") {
    intercept[IllegalArgumentException] {
      IntervalQuery.over(table,
        LocalDateTime.parse("2025-01-02T00:00:00"),
        LocalDateTime.parse("2025-01-01T00:00:00"))
    }
  }

  test("count=3, values in insertion-time order, asc fechahora (tests.py:232-247)") {
    val res = IntervalQuery.over(table,
      LocalDateTime.parse("2025-01-01T09:59:00"),
      LocalDateTime.parse("2025-01-01T10:11:00")).collect()
    assert(res.length == 3)
    assert(res.map(_.getDouble(1)).toSeq == Seq(3900.12, 3901.34, 3899.99))
    val fechas = res.map(_.getTimestamp(0).getTime).toSeq
    assert(fechas == fechas.sorted)
  }

  test("B2: bounds are inclusive at BOTH ends") {
    val res = IntervalQuery.over(table,
      LocalDateTime.parse("2025-01-01T10:00:00"),
      LocalDateTime.parse("2025-01-01T10:10:00")).collect()
    assert(res.length == 3) // both endpoints included
  }

  test("request bounds are second-truncated before binding (main.py:66-67)") {
    // 10:00:00.999 truncates to 10:00:00, so the 10:00:00 row is included
    val res = IntervalQuery.over(table,
      LocalDateTime.parse("2025-01-01T10:00:00.999"),
      LocalDateTime.parse("2025-01-01T10:04:00")).collect()
    assert(res.length == 1)
  }

  test("F2: output formatting matches the reference's %Y-%m-%d %H:%M:%S") {
    val df = IntervalQuery.over(table,
      LocalDateTime.parse("2025-01-01T00:00:00"),
      LocalDateTime.parse("2025-01-02T00:00:00"))
    val out = IntervalQuery.formatted(df).collect()
    assert(out.head.getString(0) == "2025-01-01 10:00:00")
  }

  test("valor is served as double (main.py:85)") {
    val df = IntervalQuery.over(table,
      LocalDateTime.parse("2025-01-01T00:00:00"),
      LocalDateTime.parse("2025-01-02T00:00:00"))
    assert(df.schema("valor").dataType == DoubleType)
  }
}
