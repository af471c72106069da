package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM-wide session —
  * getOrCreate — so suites don't pay repeated startup).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  val sf: String = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSpec.session

  /** Suites that MUTATE session conf (broadcast thresholds, codegen
    * strictness, AQE knobs) must override `spark` with this: sbt runs
    * suites in parallel threads over the one shared session, so a
    * set/restore pair on the shared SQLConf races every plan assert in
    * every other suite (an unrestored `autoBroadcastJoinThreshold=-1`
    * in a debug suite made q3's broadcast assert fail order-dependently).
    * `newSession()` = own SQLConf + temp views, shared SparkContext, so
    * isolation costs no startup time.
    */
  def isolatedSession: SparkSession = SparkSpec.session.newSession()

  /** physical plan text of a DataFrame (for plan-shape assertions) */
  def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString()
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
