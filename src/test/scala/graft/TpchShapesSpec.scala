package graft

import graft.queries.TpchShapes

/** Plan-shape audits for the TPC-H completion queries (values are
  * oracle-checked by the driver's DuckDB gate): pushdown reaching the
  * fact scan, dimension broadcasts, and no cartesian anywhere — the
  * properties that decide whether these shapes survive 100 TB.
  */
class TpchShapesSpec extends SparkSpec {

  private val all = Seq(
    "q2" -> TpchShapes.q2MinCostSupplier _,
    "q4" -> TpchShapes.q4OrderPriority _,
    "q6" -> TpchShapes.q6ForecastRevenue _,
    "q9" -> TpchShapes.q9ProductProfit _,
    "q11" -> TpchShapes.q11ImportantStock _,
    "q12" -> TpchShapes.q12ShipPriority _,
    "q13" -> TpchShapes.q13CustOrderDist _,
    "q15" -> TpchShapes.q15TopSupplier _,
    "q16" -> TpchShapes.q16PartSupplierCnt _,
    "q17" -> TpchShapes.q17SmallQtyRevenue _,
    "q19" -> TpchShapes.q19DisjunctiveRevenue _,
    "q20" -> TpchShapes.q20ExcessSuppliers _,
    "q21" -> TpchShapes.q21WaitingSupplier _,
    "q22" -> TpchShapes.q22SalesOpportunity _)

  test("no TPC-H completion query plans a cartesian product") {
    for ((name, q) <- all) {
      val plan = planOf(q(spark, sf))
      assert(!plan.contains("CartesianProduct"), s"$name:\n$plan")
      // the only legitimate nested-loop is a one-row scalar broadcast
      // (q11/q15/q22 cross-join their scalar aggregate back in)
      if (!Set("q11", "q15", "q22").contains(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name:\n$plan")
    }
  }

  test("q6: all three range predicates reach the parquet scan") {
    val plan = planOf(TpchShapes.q6ForecastRevenue(spark, sf))
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters"))
      .mkString("\n")
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(pushed.contains(c), s"$c not pushed:\n$plan")
  }

  test("q19: disjunctive filter still keys the part join (no plan blowup)") {
    val plan = planOf(TpchShapes.q19DisjunctiveRevenue(spark, sf))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      s"part join must stay an equi-join:\n$plan")
    // the common lower bound of l_quantity (>= 1.0 across all three
    // disjuncts) is pushable; at minimum the join must not degrade
    assert(!plan.contains("CartesianProduct"), s"plan:\n$plan")
  }

  test("q9: the five-way star broadcasts part and nation dimensions") {
    val plan = planOf(TpchShapes.q9ProductProfit(spark, sf))
    val nBroadcast = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(nBroadcast >= 2, s"expected >=2 broadcast joins:\n$plan")
  }

  test("q4: the late-line EXISTS is a semi-join, not an aggregate-distinct") {
    val plan = planOf(TpchShapes.q4OrderPriority(spark, sf))
    assert(plan.contains("LeftSemi"), s"plan:\n$plan")
  }

  test("q21: one fact pass — per-order verdicts aggregate, never rescan") {
    val plan = planOf(TpchShapes.q21WaitingSupplier(spark, sf))
    val factScans = plan.linesIterator
      .count(l => l.contains("Scan parquet") && l.contains("lineitem"))
    assert(factScans == 1,
      s"EXISTS/NOT-EXISTS must not rescan the fact table ($factScans scans):\n$plan")
  }
}
