package graft.ingest

import org.apache.spark.sql.types._

/** Schemas of the reference's data model (SURVEY.md §1).
  *
  * Wire format: a JSON array of 2-element arrays of strings,
  * `[["1757509256000","3920.12"], ...]` — epoch-millis + value
  * (/root/reference/lambda/subirDB.py:98-107, fixture
  * tests/tests.py:83).
  *
  * Stored `dolar` table: second-precision UTC timestamp + DECIMAL(12,4)
  * (/root/reference/lambda/subirDB.py:72-77); values are served back as
  * doubles (/root/reference/main.py:85).
  */
object Schemas {

  /** top-level wire payload: array of [epoch_ms, valor] string pairs */
  val wire: ArrayType = ArrayType(ArrayType(StringType))

  val dolar: StructType = StructType(Seq(
    StructField("fechahora", TimestampType, nullable = false),
    StructField("valor", DecimalType(12, 4), nullable = false)))

  /** DDL for the managed table (A8: idempotent CREATE). */
  val dolarDdl: String =
    """CREATE TABLE IF NOT EXISTS dolar (
      |  fechahora TIMESTAMP NOT NULL,
      |  valor DECIMAL(12,4) NOT NULL
      |) USING parquet""".stripMargin
}
