package graft

import java.nio.file.Files
import java.time.LocalDateTime

import graft.ingest.{DolarIngest, RawZone}
import graft.queries.IntervalQuery

/** A7/A9 JDBC parity legs (SURVEY §2, reference subirDB.py:64-67 +
  * main.py:39-53), driven end to end against the embedded Derby that
  * ships on the Spark classpath: raw zone -> batch ingest through the
  * JDBC sink -> interval query through the JDBC source, asserting the
  * same golden values the parquet path produces, plus JDBC filter
  * pushdown in the plan.
  */
class JdbcSpec extends SparkSpec {

  private lazy val url = {
    val db = Files.createTempDirectory("graft_jdbc").resolve("dolardb")
    s"jdbc:derby:$db;create=true"
  }

  /** ingest-once fixture shared by both tests, so each test can run in
    * isolation (a bare `-z`-filtered run of the pushdown test must not
    * depend on the round-trip test having populated the table first).
    */
  private lazy val loadReport = {
    val tmp = Files.createTempDirectory("graft_jdbc_raw").toString
    RawZone.write(tmp, 1704164645L,
      """[["1757509256000","3920.12"],["1757509266000","3921.55"]]""")
    RawZone.write(tmp, 1704164646L,
      """[["1757509276000","abc"],["1757509286000","3922.77"],["x"]]""")
    DolarIngest.batchToJdbc(spark, tmp, url, "dolar")
  }

  test("A7/A9: JDBC sink ingest + JDBC source interval query round-trip") {
    val report = loadReport
    assert(report.filesProcessed == 2)
    assert(report.totalRowsInserted == 3) // bad valor + bad arity dropped

    val rows = IntervalQuery.formatted(IntervalQuery.runJdbc(spark, url,
      LocalDateTime.parse("2025-09-10T00:00:00"),
      LocalDateTime.parse("2025-09-11T00:00:00"), "dolar"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.toSeq == Seq(
      ("2025-09-10 13:00:56", 3920.12),
      ("2025-09-10 13:01:06", 3921.55),
      ("2025-09-10 13:01:26", 3922.77)))
  }

  test("interval predicate is pushed into the JDBC scan") {
    loadReport // ensure the table exists independent of test order
    val plan = planOf(IntervalQuery.runJdbc(spark, url,
      LocalDateTime.parse("2025-09-10T00:00:00"),
      LocalDateTime.parse("2025-09-11T00:00:00"), "dolar"))
    assert(plan.contains("PushedFilters"), s"no pushdown info in plan:\n$plan")
    assert(plan.replaceAll("\\s", "").contains("fechahora"), s"plan:\n$plan")
  }
}
