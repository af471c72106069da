package graft

import graft.llm.DedupClusters
import org.apache.spark.sql.functions._

/** Connected components: transitive grouping on planted graphs (the
  * property pairwise dedup alone cannot give), convergence on a long
  * chain (diameter >> clique case), and the registered query's
  * keep-min contract.
  */
class DedupClustersSpec extends SparkSpec {
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    DedupClusters.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("transitive chain A~B~C groups all three under min id") {
    // 1-2, 2-3: 1 and 3 were never directly compared
    val c = components(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(c == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("long chain converges (diameter = rounds, not clique-shaped)") {
    val n = 30L
    val c = components((1L until n).map(i => (i, i + 1)))
    assert(c.size == n)
    assert(c.values.forall(_ == 1L), "a 30-node path is ONE component")
  }

  test("star and disjoint cliques keep per-component minima") {
    val star = (2L to 6L).map(i => (5L * 100 + i, 500L)) // hub 500
    val clique = for (a <- 7L to 9L; b <- (a + 1) to 9L) yield (a, b)
    val c = components(star ++ clique)
    assert(c(500L) == 500L && star.forall { case (s, _) => c(s) == 500L })
    assert((7L to 9L).forall(c(_) == 7L))
  }

  test("edge orientation does not matter") {
    assert(components(Seq((3L, 1L), (2L, 3L))) ==
      components(Seq((1L, 3L), (3L, 2L))))
  }

  test("non-convergence throws rather than returning partial groups") {
    intercept[IllegalStateException] {
      DedupClusters.connectedComponents(
        (1L until 20L).map(i => (i, i + 1)).toDF("src", "dst"), maxRounds = 3)
    }
  }

  test("registered query labels every paired doc with its group minimum") {
    val out = DedupClusters.dedupComponents(spark, sf).collect()
    assert(out.nonEmpty)
    val byComp = out.groupBy(_.getLong(1))
    byComp.foreach { case (comp, members) =>
      assert(members.map(_.getLong(0)).min == comp,
        s"component id must be the member minimum: $comp")
      assert(members.length >= 2, "every emitted doc is in a real group")
    }
  }
}
