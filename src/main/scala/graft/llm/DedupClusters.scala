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
  * Lineage hygiene: each round's labels are materialized
  * ([[graft.Graft.materialize]] — conf-selected local vs reliable
  * checkpoint) so the plan does not grow by one join per iteration (an
  * unbounded logical plan is itself a scale bug: analysis time
  * explodes long before the data does).
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
    val sym = graft.Graft.materialize(
      edges.select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
        .union(edges.select(col("dst").cast("long").as("src"),
          col("src").cast("long").as("dst")))
        .distinct())

    var labels = graft.Graft.materialize(
      sym.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("component")))

    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "nid"), col("dst") === col("nid"))
        .groupBy(col("src")).agg(min(col("component")).as("nmin"))
      val next = graft.Graft.materialize(labels
        .join(neighborMin, col("id") === col("src"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nmin"), col("component")))
            .as("component"),
          (coalesce(col("nmin"), col("component")) < col("component"))
            .as("changed")))
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

  /** The dedup END PRODUCT: which document survives each near-dup
    * group. Groups come from [[dedupComponents]] (min-label closure over
    * verified pairs); the keep rule is highest `token_diversity` (the
    * quality signal from TextQueries.qualityScore), doc_id as the
    * deterministic tie-break — "keep the best copy", the policy
    * production corpus dedup actually wants, vs. the naive "keep
    * minimum id" a bare components output implies.
    *
    * Scale shape: the closure's label table is (id, component) pairs —
    * node-sized, not corpus-sized; the quality join and per-component
    * argmax add one hash exchange on component. The corpus itself is
    * only touched for the (doc_id, diversity) projection.
    */
  def dedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val comp = dedupComponents(s, dir)
    val words = split(col("text"), " ")
    val qual = graft.Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        (size(array_distinct(words)).cast("double") / size(words))
          .as("token_diversity"))
    val w = Window.partitionBy(col("component"))
      .orderBy(col("token_diversity").desc, col("doc_id"))
    comp.join(qual, "doc_id")
      .select(col("component"), col("doc_id"), col("token_diversity"),
        row_number().over(w).as("rk"),
        count(lit(1)).over(Window.partitionBy(col("component")))
          .as("n_members"))
      .filter(col("rk") === 1)
      .select(col("component"), col("doc_id").as("kept_doc_id"),
        col("token_diversity").as("kept_diversity"), col("n_members"))
      .orderBy(col("component"))
  }

  val dedupKeepBestSql: String =
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
      |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
      |comp AS (SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id),
      |q AS (SELECT doc_id,
      |        CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |          / len(string_split(text, ' ')) AS token_diversity
      |      FROM documents),
      |j AS (SELECT comp.component, comp.doc_id, q.token_diversity,
      |        ROW_NUMBER() OVER (PARTITION BY comp.component
      |          ORDER BY q.token_diversity DESC, comp.doc_id) AS rk,
      |        COUNT(*) OVER (PARTITION BY comp.component) AS n_members
      |      FROM comp JOIN q USING (doc_id))
      |SELECT component, doc_id AS kept_doc_id,
      |       token_diversity AS kept_diversity,
      |       CAST(n_members AS BIGINT) AS n_members
      |FROM j WHERE rk = 1 ORDER BY component""".stripMargin

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
