package graft

import graft.queries.Relational

/** Plan-shape assertions for the relational surface (value correctness
  * is covered by the driver's DuckDB oracle): filter/projection pushdown
  * to the parquet scan, broadcast joins on dimension sides, and
  * partial (map-side) aggregation.
  */
class RelationalSpec extends SparkSpec {

  test("scan_filter_project pushes filter and prunes columns at the scan") {
    val df = Relational.scanFilterProject(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("PushedFilters: ["), "filter not pushed to parquet scan")
    assert(plan.contains("l_shipdate"), "pushed filter should mention l_shipdate")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment"),
      "scan reads unprojected columns — pruning failed")
  }

  test("dimension joins broadcast the small side (no fact-table shuffle)") {
    for (df <- Seq(
        Relational.joinBroadcastDim(spark, sf),
        Relational.q3TopRevenue(spark, sf),
        Relational.q5LocalSupplier(spark, sf))) {
      val plan = planOf(df)
      assert(plan.contains("BroadcastHashJoin"),
        s"expected a broadcast join in:\n$plan")
    }
  }

  test("aggregations are partial (map-side combine) before the exchange") {
    val plan = planOf(Relational.q1PricingSummary(spark, sf))
    // Spark plans partial_ aggregate functions below the shuffle
    assert(plan.contains("partial_"), s"no partial aggregation in:\n$plan")
  }

  test("whole-stage codegen covers the scan+filter+project hot path") {
    val df = Relational.scanFilterProject(spark, sf)
    df.collect() // materialize so the adaptive plan is final
    // codegen'd stages print as "*(n) Operator" in the executed plan
    assert(planOf(df).contains("*(1)"), s"no codegen stage in:\n${planOf(df)}")
  }

  test("topkOrders plans a TakeOrderedAndProject, not a global sort") {
    val plan = planOf(Relational.topkOrders(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }

  test("approx_count_distinct stays within 5% of exact at sf0.001") {
    val approx = Relational.aggApproxDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Relational.aggCountDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, ex) <- exact) {
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex < 0.05,
        s"flag $k: approx $ap vs exact $ex")
    }
  }

  test("subqueries decorrelate: EXISTS -> semi join, NOT EXISTS -> anti join") {
    val existsPlan = planOf(Relational.subqueryExists(spark, sf))
    assert(existsPlan.contains("LeftSemi"), s"plan:\n$existsPlan")
    val notExistsPlan = planOf(Relational.subqueryNotExists(spark, sf))
    assert(notExistsPlan.contains("LeftAnti"), s"plan:\n$notExistsPlan")
    // neither re-executes the inner query per outer row
    Seq(existsPlan, notExistsPlan).foreach { p =>
      assert(!p.contains("CartesianProduct"), s"plan:\n$p")
    }
  }
}
