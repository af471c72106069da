package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

/** Source/sink format portability: each supported format must round-trip
  * the test tables type- and value-identically (csv/json re-read under
  * the original schema; orc natively typed). `documents` exercises free
  * text (csv quoting/escaping), `orders` exercises timestamps, doubles,
  * and strings.
  */
class SourceFormatsSpec extends SparkSpec {

  private val formats = Seq("orc", "json", "csv")

  private def roundTrip(table: String): Unit = {
    val src = Tables.load(spark, sf, table)
    val want = src.collect().map(_.toString).sorted.toSeq
    formats.foreach { fmt =>
      val path = Files.createTempDirectory(s"graft_fmt_${table}_$fmt").toString
      Tables.writeAs(src, fmt, path)
      val back = Tables.readAs(spark, fmt, path, src.schema)
      assert(back.schema == src.schema, s"$fmt schema drift for $table")
      val got = back.collect().map(_.toString).sorted.toSeq
      assert(got == want, s"$fmt round trip of $table diverged")
    }
  }

  test("documents round-trips through orc/json/csv (free-text quoting)") {
    roundTrip("documents")
  }

  test("orders round-trips through orc/json/csv (timestamps + doubles)") {
    roundTrip("orders")
  }

  test("a query runs identically over a non-parquet copy of its table") {
    val path = Files.createTempDirectory("graft_fmt_query").toString
    val docs = Tables.load(spark, sf, "documents")
    Tables.writeAs(docs, "orc", path)
    val orc = Tables.readAs(spark, "orc", path, docs.schema)
    val fromOrc = orc.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fromParquet = docs.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromOrc == fromParquet)
  }
}
