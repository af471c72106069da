package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate PAIRS — the step that turns
  * pairwise dedup output (A~B, B~C) into dedup GROUPS ({A,B,C} keep
  * min), so "drop duplicates" can't keep both B and C just because they
  * were never directly compared. This is the grouping stage a
  * training-data pipeline runs between candidate verification
  * ([[MinHashDedup.nearDupPairs]] / exact Jaccard) and the final keep
  * decision.
  *
  * Algorithm: distributed min-label propagation. Every node starts
  * labeled with itself; each round every node takes the min of its own
  * label and its neighbors' labels; a fixpoint means every node carries
  * the minimum doc_id of its component. Each round is one shuffle
  * (join + groupBy on id); the loop is DRIVER-SIDE CONTROL ONLY — the
  * per-round `changed` count is the single scalar collected. Rounds
  * needed = graph diameter; near-dup graphs are overwhelmingly
  * small-diameter cliques/stars, so this converges in a handful of
  * rounds. (At extreme scale the textbook upgrade is alternating
  * large-star/small-star [Kiveris et al., "Connected Components in
  * MapReduce and Beyond"], which contracts paths and converges in
  * O(log n) rounds with the identical per-round shuffle shape — the
  * swap is local to this function.)
  *
  * Lineage hygiene: each round's labels are `localCheckpoint`ed so the
  * plan does not grow by one join per iteration (an unbounded logical
  * plan is itself a scale bug: analysis time explodes long before the
  * data does).
  */
object DedupClusters {

  /** @param edges two numeric columns `src`, `dst` (undirected pairs,
    *   any orientation); isolated nodes are not represented — every
    *   emitted node appears in at least one pair
    * @return (`id`, `component`) where component = min node id reachable
    * @throws IllegalStateException if not converged within maxRounds
    *   (silent non-convergence would return plausible-but-wrong groups)
    */
  def connectedComponents(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    val sym = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .union(edges.select(col("dst").cast("long").as("src"),
        col("src").cast("long").as("dst")))
      .distinct()
      .localCheckpoint()

    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("component"))
      .localCheckpoint()

    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "nid"), col("dst") === col("nid"))
        .groupBy(col("src")).agg(min(col("component")).as("nmin"))
      val next = labels
        .join(neighborMin, col("id") === col("src"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nmin"), col("component")))
            .as("component"),
          (coalesce(col("nmin"), col("component")) < col("component"))
            .as("changed"))
        .localCheckpoint()
      converged = next.filter(col("changed")).limit(1).isEmpty
      labels = next.select(col("id"), col("component"))
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds rounds")
    labels
  }

  /** Registered query: dedup groups over the exact-Jaccard near-dup
    * pairs (the oracle-checked `dedup_ngram_jaccard` output, threshold
    * 0.2, golden `doc_id < 500` bucket) — each involved document labeled
    * with its group's minimum doc_id. The DuckDB oracle computes the
    * same closure with a recursive CTE.
    */
  def dedupComponents(s: SparkSession, dir: String): DataFrame =
    connectedComponents(
        graft.queries.TextQueries.dedupNgramJaccard(s, dir)
          .select(col("a_id").as("src"), col("b_id").as("dst")))
      .select(col("id").as("doc_id"), col("component"))
      .orderBy(col("doc_id"))

  val dedupComponentsSql: String =
    """WITH RECURSIVE sh AS (
      |  SELECT doc_id, lang,
      |    list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
      |      i -> string_split(text,' ')[i] || '_' || string_split(text,' ')[i+1]
      |           || '_' || string_split(text,' ')[i+2])) AS s
      |  FROM documents
      |  WHERE doc_id < 500 AND len(string_split(text, ' ')) >= 3),
      |p AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |      / len(list_distinct(list_concat(a.s, b.s))) >= 0.2),
      |edges AS (SELECT a_id AS src, b_id AS dst FROM p
      |          UNION SELECT b_id, a_id FROM p),
      |reach(id, r) AS (
      |  SELECT DISTINCT src, src FROM edges
      |  UNION
      |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id)
      |SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id
      |ORDER BY doc_id""".stripMargin
}
