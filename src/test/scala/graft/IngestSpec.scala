package graft

import java.nio.file.Files

import graft.ingest.{DolarIngest, RawZone}
import org.apache.spark.sql.functions._

/** Load-path parity with the reference handler
  * (/root/reference/lambda/subirDB.py:81-126, golden values from
  * /root/reference/tests/tests.py:143-205): key filtering (A5),
  * array-of-pairs parse (A6), second-truncated UTC timestamps (F1),
  * decimal casting (F3), corrupt-file hard fail (H1), bad-row
  * drop-and-count (H2), empty/zero-valid files not counted (H3), and the
  * D2 counters.
  */
class IngestSpec extends SparkSpec {

  private def freshDirs(): (String, String) = {
    val tmp = Files.createTempDirectory("graft_ingest_spec")
    (tmp.resolve("raw").toString, tmp.resolve("dolar").toString)
  }

  test("happy path: files_processed=1, rows=2, reference timestamp semantics") {
    val (raw, dest) = freshDirs()
    // payload from tests.py:162-165 (dolar-123.json)
    RawZone.write(raw, 123L, """[["1757509256000","3920.00"],["1757509266000","3921.50"]]""")
    // non-matching key must be ignored, like "otro.txt" in tests.py:172
    Files.write(java.nio.file.Paths.get(raw, "otro.txt"),
      """[["1757509256000","1.00"]]""".getBytes)

    val report = DolarIngest.batchToPath(spark, raw, dest)
    assert(report.filesProcessed == 1)
    assert(report.totalRowsInserted == 2)

    val rows = spark.read.parquet(dest)
      .orderBy(col("fechahora"))
      .select(date_format(col("fechahora"), "yyyy-MM-dd HH:mm:ss"),
        col("valor").cast("double"))
      .collect()
    // datetime.fromtimestamp(1757509256000/1000) in UTC == 2025-09-10 13:00:56
    assert(rows.map(r => (r.getString(0), r.getDouble(1))).toSeq == Seq(
      ("2025-09-10 13:00:56", 3920.0),
      ("2025-09-10 13:01:06", 3921.5)))
  }

  test("H2/D2: bad rows dropped and counted, good rows kept") {
    val (raw, dest) = freshDirs()
    // one bad valor, one wrong arity, two good rows (subirDB.py:102-111)
    RawZone.write(raw, 1L,
      """[["1757509256000","abc"],["x"],["1757509266000","3921.55"],["1757509276000","3922.00"]]""")
    val report = DolarIngest.batchToPath(spark, raw, dest)
    assert(report.filesProcessed == 1)
    assert(report.totalRowsInserted == 2)
    assert(report.details.head.bad == 2)
    assert(spark.read.parquet(dest).count() == 2)
  }

  test("H1: structurally corrupt file fails the whole batch, nothing written") {
    val (raw, dest) = freshDirs()
    RawZone.write(raw, 1L, """[["1757509256000","3920.12"]]""")
    RawZone.write(raw, 2L, """{"not":"an array"}""")
    val e = intercept[DolarIngest.CorruptFileException] {
      DolarIngest.batchToPath(spark, raw, dest)
    }
    assert(e.files.exists(_.contains("dolar-2.json")))
    // H1 semantics: the batch failed BEFORE any append
    assert(!Files.exists(java.nio.file.Paths.get(dest)) ||
      spark.read.parquet(dest).isEmpty)
  }

  test("H3: zero-valid and empty-array files insert nothing and are not counted") {
    val (raw, dest) = freshDirs()
    RawZone.write(raw, 1L, """[]""")
    RawZone.write(raw, 2L, """[["bad","row"]]""")
    RawZone.write(raw, 3L, """[["1757509256000","3920.12"]]""")
    val report = DolarIngest.batchToPath(spark, raw, dest)
    assert(report.filesProcessed == 1)
    assert(report.totalRowsInserted == 1)
    assert(report.details.map(_.file).forall(_.contains("dolar-3.json")))
  }

  test("A5/F5/F6: raw-zone key naming and filter") {
    assert(RawZone.key(1704164645L) == "dolar-1704164645.json") // tests.py:95
    assert(RawZone.matchesKey("dolar-123.json"))
    assert(!RawZone.matchesKey("otro.txt"))
    assert(!RawZone.matchesKey("dolar-123.txt"))
  }

  test("D2 via observe: load metrics ride the job as accumulators") {
    val (raw, _) = freshDirs()
    RawZone.write(raw, 1L,
      """[["1757509256000","3920.12"],["bad","row"],["1757509266000","3921.55"]]""")
    val (df, obs) = DolarIngest.observed(
      DolarIngest.parse(DolarIngest.readRaw(spark, raw)))
    df.collect() // one action; metrics observed on the same pass
    val m = obs.get
    assert(m("wire_rows") == 3L)
    assert(m("valid_rows") == 2L)
    assert(m("bad_rows") == 1L)
    assert(m("corrupt_markers") == 0L)
  }

  test("A8: idempotent DDL + append to managed table, duplicate-tolerant") {
    val (raw, _) = freshDirs()
    RawZone.write(raw, 1L, """[["1757509256000","3920.12"]]""")
    val t = "dolar_spec"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    try {
      DolarIngest.batchToTable(spark, raw, t)
      DolarIngest.batchToTable(spark, raw, t) // reference replay duplicates rows
      assert(spark.table(t).count() == 2)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
