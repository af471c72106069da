package graft

import graft.plans.Compaction

/** Planner invariants for small-files compaction (the plan itself is
  * rows-only at the gate — file layout is not SQL-derivable).
  */
class CompactionSpec extends SparkSpec {

  private val T = 100L

  test("FFD pack: every file assigned exactly once, no bin over target") {
    val files = Seq(("a", 60L), ("b", 55L), ("c", 40L), ("d", 30L),
      ("e", 10L), ("f", 5L))
    val bins = Compaction.planBins(files, T)
    val assigned = bins.flatMap(_.files)
    assert(assigned.sorted == files.map(_._1).sorted,
      "every file appears in exactly one bin")
    bins.foreach { b =>
      assert(b.nFiles == b.files.length.toLong)
      assert(b.totalBytes <= T || b.nFiles == 1,
        s"multi-file bin over target: $b")
    }
    // FFD on these sizes: 60+40=100, 55+30+10+5=100 — optimal here
    assert(bins.length == 2, s"expected 2 bins, got: $bins")
    assert(bins.forall(_.totalBytes == 100L))
  }

  test("oversized files become singleton already_compact bins") {
    val bins = Compaction.planBins(
      Seq(("big", 250L), ("small1", 20L), ("small2", 30L)), T)
    val big = bins.find(_.files.contains("big")).get
    assert(big.nFiles == 1L && big.alreadyCompact,
      s"oversized file must be a flagged singleton: $big")
    val rest = bins.filter(!_.files.contains("big"))
    assert(rest.flatMap(_.files).toSet == Set("small1", "small2"))
    assert(rest.forall(!_.alreadyCompact))
  }

  test("plan is deterministic: same directory state, identical plan") {
    val files = (1 to 50).map(i => (s"part-$i", (i * 7 % 90 + 5).toLong))
    val p1 = Compaction.planBins(files, T)
    val p2 = Compaction.planBins(scala.util.Random.shuffle(files), T)
    assert(p1 == p2, "input order must not change the plan")
  }

  test("compaction_plan over real testdata: consistent, bounded, non-empty") {
    val rows = Compaction.compactionPlan(spark, sf, targetBytes = 1L << 20)
      .collect()
    assert(rows.nonEmpty, "lineitem dir should list at least one file")
    val listed = Compaction.listParquet(spark, s"$sf/lineitem.parquet")
    assert(rows.map(_.getLong(1)).sum == listed.length.toLong,
      "plan covers every listed file")
    assert(rows.map(_.getLong(2)).sum == listed.map(_._2).sum,
      "plan conserves total bytes")
  }

  test("empty directory yields an empty plan, not an error") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$tmp/lineitem.parquet"))
    assert(Compaction.compactionPlan(spark, tmp).collect().isEmpty)
  }
}
