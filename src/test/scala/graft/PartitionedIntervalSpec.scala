package graft

import java.nio.file.Files
import java.time.LocalDateTime

import graft.ingest.{DolarIngest, RawZone}
import graft.queries.IntervalQuery

/** Date-partitioned dolar layout: identical query semantics to the flat
  * layout, plus actual partition pruning — the engine's replacement for
  * the index the reference never declares.
  */
class PartitionedIntervalSpec extends SparkSpec {

  private lazy val dest: String = {
    val tmp = Files.createTempDirectory("graft_part_spec")
    val raw = tmp.resolve("raw").toString
    // two different days (epoch ms): 2025-09-10 and 2025-09-11
    RawZone.write(raw, 1L,
      """[["1757509256000","3920.12"],["1757595656000","3930.00"]]""")
    val d = tmp.resolve("dolar").toString
    val report = DolarIngest.batchToPartitionedPath(spark, raw, d)
    assert(report.totalRowsInserted == 2)
    d
  }

  test("partitioned layout lays out p_date=... directories") {
    val dirs = new java.io.File(dest).listFiles().map(_.getName).filter(_.startsWith("p_date="))
    assert(dirs.toSet == Set("p_date=2025-09-10", "p_date=2025-09-11"))
  }

  test("interval query over partitioned table prunes partitions") {
    val df = IntervalQuery.overPartitioned(spark.read.parquet(dest),
      LocalDateTime.parse("2025-09-10T00:00:00"),
      LocalDateTime.parse("2025-09-10T23:59:59"))
    val rows = df.collect()
    assert(rows.length == 1 && rows.head.getDouble(1) == 3920.12)
    val scan = df.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters: [isnotnull(p_date"),
      s"no partition pruning in:\n$scan")
    // day-granular pruning: only the 09-10 partition is read
    assert(df.queryExecution.executedPlan.toString().contains("p_date"))
  }

  test("partitioned and flat layouts answer identically") {
    val flat = IntervalQuery.over(
      spark.read.parquet(dest).select("fechahora", "valor"),
      LocalDateTime.parse("2025-09-09T00:00:00"),
      LocalDateTime.parse("2025-09-12T00:00:00")).collect()
    val part = IntervalQuery.overPartitioned(spark.read.parquet(dest),
      LocalDateTime.parse("2025-09-09T00:00:00"),
      LocalDateTime.parse("2025-09-12T00:00:00")).collect()
    assert(flat.map(_.toString).toSeq == part.map(_.toString).toSeq)
  }
}
