package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`Array[Float]`,
  * 64-dim): brute-force cosine top-k as the correctness baseline, and a
  * sign-random-projection LSH bucketed variant as the 100 TB path.
  *
  * All vector math goes through the codegen'd
  * [[graft.functions.DotProductF64]] expression over `array<double>` —
  * no UDFs, no interpreted higher-order lambdas, no driver-side
  * collects (k-means training syncs only the k centroids). Its strict
  * left-to-right accumulation makes the dot product bit-identical to
  * DuckDB's `list_sum(list_transform(...))` (verified empirically),
  * which is what lets the oracle hash-match on doubles.
  */
object EmbeddingQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** in-order double dot product — native codegen'd expression (see
    * graft.functions.DotProductF64; bit-identical to the HOF spelling
    * and to DuckDB's list arithmetic)
    */
  private def dot(a: Column, b: Column): Column =
    graft.functions.DotProductF64(a, b)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  // --- brute-force top-k ANN -------------------------------------------------
  /** Exact cosine top-10 neighbors for a small query set (vec_id < 5).
    * Scale shape: the query side is tiny and broadcast; the candidate side
    * is a single pass over the full table (no shuffle until the final
    * per-query top-k, which is k-bounded). This is the correct plan for
    * "few queries against a 100 TB corpus"; for self-join-all-pairs use
    * the LSH variant below.
    */
  def annTopK(s: SparkSession, dir: String): DataFrame = {
    // zero-norm vectors have no cosine: 0/0 = NaN, which Spark sorts
    // ABOVE every real similarity under desc (NaN > all doubles), so an
    // unguarded zero vector would be every query's rank-1 "neighbor".
    // Exclude them on both sides (the oracle does the same).
    val e = emb(s, dir)
      .filter(graft.functions.DotProductF64(
        col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>")) > 0)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").cast("array<double>").as("qv"))
    val c = e.select(col("vec_id").as("neighbor_id"),
      col("embedding").cast("array<double>").as("v"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(q).join(c, col("q_id") =!= col("neighbor_id"))
      .select(col("q_id"), col("neighbor_id"),
        cosine(col("qv"), col("v")).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .select(col("q_id"), col("rank"), col("neighbor_id"), col("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  val annTopKSql: String =
    """WITH nz AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |            WHERE list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) > 0),
      |q AS (SELECT vec_id AS q_id, v AS qv FROM nz WHERE vec_id < 5),
      |c AS (SELECT vec_id AS neighbor_id, v FROM nz),
      |sim AS (
      |  SELECT q_id, neighbor_id,
      |    list_sum(list_transform(list_zip(qv, v), x -> x[1] * x[2]))
      |      / (sqrt(list_sum(list_transform(qv, x -> x * x)))
      |         * sqrt(list_sum(list_transform(v, x -> x * x)))) AS cos
      |  FROM q, c WHERE q_id <> neighbor_id),
      |r AS (SELECT q_id, neighbor_id, cos,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id)
      |      AS BIGINT) AS rank
      |  FROM sim)
      |SELECT q_id, rank, neighbor_id, cos FROM r WHERE rank <= 10
      |ORDER BY q_id, rank""".stripMargin

  // --- int8-quantized top-k ANN ---------------------------------------------
  /** Brute-force cosine top-k over INT8-QUANTIZED embeddings — the
    * bandwidth-tier ANN: the corpus is stored/scanned as one BINARY
    * column (8x smaller than `array<double>`), and cosine runs entirely
    * on integers ([[graft.functions.DotProductI8]]; per-vector scales
    * cancel in cosine, so quantized search never touches a float until
    * the final division). Same plan shape as [[annTopK]] (broadcast
    * queries, single corpus pass, k-bounded top-k). EmbeddingSpec
    * measures recall@10 and cosine error against the f64 baseline.
    */
  def annTopKI8(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val scaleOf = greatest(array_max(col("v")), -array_min(col("v"))) / 127d
    val e = emb(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(scaleOf > 0) // zero vectors have no cosine (see annTopK)
      .select(col("vec_id"),
        graft.functions.QuantizeI8(col("v"), scaleOf).as("q"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("q").as("qq"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("q"))
    def dotI8(a: Column, b: Column) =
      graft.functions.DotProductI8(a, b).cast("double")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(q).join(c, col("q_id") =!= col("neighbor_id"))
      .select(col("q_id"), col("neighbor_id"),
        (dotI8(col("qq"), col("q")) /
          (sqrt(dotI8(col("qq"), col("qq"))) * sqrt(dotI8(col("q"), col("q")))))
          .as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("neighbor_id"), col("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** DuckDB oracle for [[annTopKI8]] — upgrades the int8 tier from
    * rows-only to hash-checked. The quantizer is `rint` (round
    * half-EVEN, the IEEE default), which DuckDB's `round()` does NOT
    * implement for doubles (half-away), so the oracle spells half-even
    * explicitly: r = floor(y + 0.5), stepped back by one when y sat
    * exactly on a half AND r is odd. Integer dots are exact BIGINT
    * sums; the final cosine is IEEE division of identical integers, so
    * the ranking — and the hash — must agree.
    */
  val annTopKI8Sql: String = {
    // half-even rounding of expression y, clamped to [-127, 127]
    def rintClamp(y: String): String =
      s"""greatest(-127, least(127, CAST(
         |  CASE WHEN floor(($y) + 0.5) = ($y) + 0.5
         |        AND CAST(floor(($y) + 0.5) AS BIGINT) % 2 <> 0
         |       THEN floor(($y) + 0.5) - 1
         |       ELSE floor(($y) + 0.5) END AS BIGINT)))""".stripMargin
    s"""WITH nz AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |    greatest(list_max(embedding::DOUBLE[]),
       |             -list_min(embedding::DOUBLE[])) / 127.0 AS s
       |  FROM embeddings
       |  WHERE greatest(list_max(embedding::DOUBLE[]),
       |                 -list_min(embedding::DOUBLE[])) / 127.0 > 0),
       |qt AS (
       |  SELECT vec_id,
       |    list_transform(v, x -> ${rintClamp("x / s")}) AS q
       |  FROM nz),
       |qs AS (SELECT vec_id AS q_id, q AS qq FROM qt WHERE vec_id < 5),
       |c AS (SELECT vec_id AS neighbor_id, q FROM qt),
       |sim AS (
       |  SELECT q_id, neighbor_id,
       |    CAST(list_sum(list_transform(list_zip(qq, q), p -> p[1] * p[2]))
       |         AS DOUBLE)
       |      / (sqrt(CAST(list_sum(list_transform(qq, x -> x * x)) AS DOUBLE))
       |         * sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)))
       |      AS cos
       |  FROM qs, c WHERE q_id <> neighbor_id),
       |r AS (SELECT q_id, neighbor_id, cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id)
       |      AS BIGINT) AS rank
       |  FROM sim)
       |SELECT q_id, rank, neighbor_id, cos FROM r WHERE rank <= 10
       |ORDER BY q_id, rank""".stripMargin
  }

  // --- int8 quantization error report -----------------------------------------
  /** Reconstruction-error report for the int8 quantization tier — the
    * quality side of [[annTopKI8]]'s bandwidth story: per label, the
    * count, sum and max of each vector's RELATIVE squared
    * reconstruction error ‖v − dequant(quant(v))‖²/‖v‖², in integer
    * NANO-units. The per-vector error is pure double arithmetic with
    * an identical op tree in both engines (quantize spelled
    * `floor(x/s + 0.5)` — floor, never an engine-flavored round), and
    * the nano conversion happens per vector BEFORE aggregation, so the
    * aggregate is an exact BIGINT sum — fp never crosses an
    * accumulation-order boundary (the [[Relational.statsCorrelation]]
    * lesson). One scan, narrow map, label-sized output.
    */
  def quantErrorReport(s: SparkSession, dir: String): DataFrame = {
    val v = col("embedding").cast("array<double>")
    val scale = (greatest(array_max(v), -array_min(v)) / lit(127.0)).as("s")
    val e = emb(s, dir)
      .select(col("label"), v.as("v"), scale)
      .filter(col("s") > 0)
    val err = transform(col("v"),
      x => x - floor(x / col("s") + lit(0.5)) * col("s"))
    val rel = graft.functions.DotProductF64(err, err) /
      graft.functions.DotProductF64(col("v"), col("v"))
    e.select(col("label"),
        floor(rel * lit(1e9) + lit(0.5)).cast("long").as("nano"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(col("nano")).as("sum_rel_nano"),
        max(col("nano")).as("max_rel_nano"))
      .orderBy(col("label"))
  }

  val quantErrorReportSql: String =
    """WITH b AS (
      |  SELECT label, embedding::DOUBLE[] AS v,
      |    greatest(list_max(embedding::DOUBLE[]),
      |             -list_min(embedding::DOUBLE[])) / 127.0 AS s
      |  FROM embeddings),
      |nz AS (SELECT * FROM b WHERE s > 0),
      |pv AS (
      |  SELECT label,
      |    CAST(FLOOR(
      |      list_sum(list_transform(v, x -> (x - floor(x / s + 0.5) * s)
      |                                    * (x - floor(x / s + 0.5) * s)))
      |      / list_sum(list_transform(v, x -> x * x))
      |      * 1000000000.0 + 0.5) AS BIGINT) AS nano
      |  FROM nz)
      |SELECT label, COUNT(*) AS n_vectors,
      | CAST(SUM(nano) AS BIGINT) AS sum_rel_nano,
      | CAST(MAX(nano) AS BIGINT) AS max_rel_nano
      |FROM pv GROUP BY label ORDER BY label""".stripMargin

  // --- LSH near-dup ------------------------------------------------------------
  /** Near-duplicate embedding pairs via sign-random-projection LSH:
    * 8 bands x 4 bits; candidates = pairs sharing any band bucket;
    * verified with exact cosine >= 0.4.
    *
    * Plan shape (100 TB posture):
    *   - all 32 hyperplane projections AND the band-bucket packing are
    *     ONE codegen'd expression per vector
    *     ([[graft.functions.SignBandBuckets]]) — a shuffle-free narrow
    *     map (the former posexplode + 32-aggregate groupBy shuffled
    *     (vec, dim, x) rows and is the wide-agg shape that falls out of
    *     whole-stage codegen);
    *   - the (band, bucket) self-join carries ONLY vec ids; pairs are
    *     deduplicated before the verify join pulls the two vectors back
    *     by id, so no shuffle ever carries an embedding more than once
    *     per candidate;
    *   - never an all-pairs cross join — bucket sizes, not table sizes,
    *     drive the pair count, so the plan survives a 100x scale-up.
    */
  def nearDupLsh(s: SparkSession, dir: String,
                 bands: Int = 8, bits: Int = 4, minCos: Double = 0.4): DataFrame = {
    val e = emb(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(graft.functions.DotProductF64(col("v"), col("v")) > 0) // see annTopK
    val buckets = e.select(col("vec_id"),
      posexplode(graft.functions.SignBandBuckets(col("v"), bands, bits))
        .as(Seq("band", "bucket")))
    val a = buckets.select(col("band"), col("bucket"), col("vec_id").as("a_id"))
    val b = buckets.select(col("band"), col("bucket"), col("vec_id").as("b_id"))
    val cand = a.join(b, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .dropDuplicates("a_id", "b_id") // a pair may collide in several bands
    // norms precomputed per vector (not per pair); the verify dot is a
    // codegen'd loop, so each candidate pair costs one 64-wide FMA scan
    val en = e.withColumn("nrm", norm(col("v")))
    cand
      .join(en.select(col("vec_id").as("a_id"), col("v").as("a_v"),
        col("nrm").as("a_nrm")), Seq("a_id"))
      .join(en.select(col("vec_id").as("b_id"), col("v").as("b_v"),
        col("nrm").as("b_nrm")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        (dot(col("a_v"), col("b_v")) / (col("a_nrm") * col("b_nrm"))).as("cos"))
      .filter(col("cos") >= minCos)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Registry spelling of `embed_neardup_lsh` since r16 (the ANN-audit
    * pattern): the SRP bucket set is fixed-seed-hash-dependent, but
    * the recall contract against brute-force cosine is checkable on a
    * bounded universe — over vec_id < 500, every exact pair with
    * cosine ≥ 0.95 (at this isotropic corpus only planted
    * near-identicals reach 0.95, where an 8-band × 4-bit SRP miss has
    * probability (θ/π)³²-ish ≲ 1e-7; random 64-dim cosines concentrate
    * near 0) must appear in the reported pairs (`missed_true_pairs`
    * pinned 0), and every reported pair carries a verified cosine ≥
    * the 0.4 report threshold (`below_threshold_reported` pinned 0).
    * Exact columns (pair count, id checksum) are recomputed by DuckDB
    * from raw embeddings; the pair list stays the DedupSpec-pinned
    * [[nearDupLsh]] API.
    */
  def nearDupLshAudit(s: SparkSession, dir: String): DataFrame = {
    // precision leg over the FULL reported pair set (r16 ADVICE: the
    // bounded filter below exists only for the brute-force RECALL leg;
    // the verify-stage contract "every reported pair carries cosine ≥
    // the report threshold" must cover pairs outside that universe too
    // — it is a cheap aggregate over already-produced pairs)
    val lshFull = nearDupLsh(s, dir)
    val lsh = lshFull
      .filter(col("a_id") < 500 && col("b_id") < 500)
    val e = emb(s, dir)
      .filter(col("vec_id") < 500)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(graft.functions.DotProductF64(col("v"), col("v")) > 0)
    val truePairs = broadcast(e.select(col("vec_id").as("a_id"),
        col("v").as("a_v")))
      .join(e.select(col("vec_id").as("b_id"), col("v").as("b_v")),
        col("a_id") < col("b_id"))
      .filter(cosine(col("a_v"), col("b_v")) >= 0.95)
      .select(col("a_id"), col("b_id"))
    // coalesce: an empty frame's sum is NULL, but the contract
    // constant in the oracle is 0
    val lshAgg = lshFull.agg(
      coalesce(sum(when(col("cos") < 0.4, 1L).otherwise(0L)), lit(0L))
        .as("below_threshold_reported"))
    truePairs
      .join(lsh.select(col("a_id"), col("b_id"), lit(1L).as("hit")),
        Seq("a_id", "b_id"), "left")
      .agg(count(lit(1)).as("n_true_pairs"),
        sum(col("a_id") + col("b_id")).as("true_pair_id_sum"),
        coalesce(sum(when(col("hit").isNull, 1L).otherwise(0L)), lit(0L))
          .as("missed_true_pairs"))
      .crossJoin(broadcast(lshAgg))
  }

  /** DuckDB twin of [[nearDupLshAudit]] — brute-force cosine ≥ 0.95
    * pairs over the bounded vec_id < 500 universe.
    */
  val nearDupLshAuditSql: String =
    """WITH nz AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |            WHERE vec_id < 500
      |              AND list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) > 0),
      |p AS (
      |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
      |  FROM nz a JOIN nz b ON a.vec_id < b.vec_id
      |  WHERE list_sum(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]))
      |      / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
      |         * sqrt(list_sum(list_transform(b.v, x -> x * x)))) >= 0.95)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_true_pairs,
      |  CAST(SUM(a_id + b_id) AS BIGINT) AS true_pair_id_sum,
      |  CAST(0 AS BIGINT) AS missed_true_pairs,
      |  CAST(0 AS BIGINT) AS below_threshold_reported
      |FROM p""".stripMargin

  // --- semantic dedup: cluster-then-prune --------------------------------------
  /** SemDeDup-style semantic deduplication (Abbas et al., 2023,
    * arXiv:2303.09540): k-means-cluster the embeddings, then within
    * each cluster mark as duplicates the vectors whose cosine to a
    * LOWER-ID cluster-mate reaches `tau`. The keep rule — a vector
    * survives iff it is the minimum id in its own tau-neighborhood —
    * is the [[graft.queries.TextQueries.dedupExact]] min-keep rule
    * lifted to semantic space, and unlike a greedy sequential sweep it
    * is order-free: every (a, b) decision depends only on that pair,
    * so the prune parallelizes as a plain pair join.
    *
    * Output: one row per clustered vector — (vec_id, cell, keep,
    * dup_of) where dup_of is the LOWEST-id tau-neighbor that shadows a
    * dropped vector (NULL for survivors).
    *
    * Plan shape at 100 TB:
    *   - clustering reuses [[trainCodebook]] (shuffle-free literal-
    *     codebook assignment; driver holds k x dim doubles only);
    *   - the within-cell pairing is HEAD × ALL, never all-pairs: each
    *     vector is compared against its cell's `maxCell` LOWEST-id
    *     members only, so a hot cell costs maxCell·|cell| comparisons
    *     (linear in cell size) instead of |cell|² — the skew cap every
    *     other pairwise operator in this repo already has (LSH bucket
    *     caps, CDC maxHolders, fuzzy-join blocks). When every cell fits
    *     the cap — SemDeDup's own contract, k grows with corpus size —
    *     head = whole cell and the result is EXACTLY the uncapped
    *     min-keep rule; an over-cap cell degrades gracefully (a vector
    *     shadowed only by non-head cell-mates is kept), never melts a
    *     straggler;
    *   - the head itself is skew-safe: `row_number() <= maxCell` is
    *     Spark's WindowGroupLimit — each map task pre-prunes to the cap
    *     per cell BEFORE the exchange, so a hot cell never materializes
    *     in one task even to be ranked. This ONLY holds while maxCell ≤
    *     `spark.sql.optimizer.windowGroupLimitThreshold` (default
    *     1000): above it `InsertWindowGroupLimit` declines and the rank
    *     filter runs post-shuffle — the r9 plan audit caught the
    *     original 4096 default planning exactly that way, so the
    *     default is now 1000 and DedupSpec pins the WindowGroupLimit
    *     node in the plan;
    *   - the head side replicates across `nBlocks` hash-blocks of the
    *     b-side so one hot cell fans out over nBlocks tasks;
    *   - vectors cross the wire once per candidate side with
    *     precomputed norms; the verdict join back to the corpus is
    *     id-keyed (8-byte keys), never vector-keyed.
    *
    * No DuckDB oracle (k-means cells are engine-specific);
    * EmbeddingSpec pins a planted near-identical pair (dropped, with
    * the right dup_of), a distant negative control (kept), and the
    * candidate-pair bound under a planted hot cell.
    */
  def semDedup(s: SparkSession, dir: String, nCent: Int = 16,
               tau: Double = 0.9, maxCell: Int = 1000): DataFrame =
    semDedupWith(s, dir, trainCodebook(s, dir, nCent), tau, maxCell)

  /** [[semDedup]] over a PRE-TRAINED codebook — so a caller that also
    * needs the same codebook for its own legs ([[semDedupAudit]]'s
    * uncapped in-cell recheck) trains ONCE instead of re-running the
    * whole Lloyd loop for an identical (deterministic) result.
    */
  private def semDedupWith(s: SparkSession, dir: String,
                           codebook: Seq[(Int, Seq[Double])],
                           tau: Double, maxCell: Int = 1000): DataFrame = {
    val e = emb(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(graft.functions.DotProductF64(col("v"), col("v")) > 0) // see annTopK
    val cells = assignCells(e, codebook)
      .select(col("vec_id"), col("cent_id").as("cell"), col("v"))
      .withColumn("nrm", norm(col("v")))
    val shadows = semDedupCandidates(cells, maxCell)
      .filter(col("cos") >= tau)
      .groupBy(col("b_id")).agg(min(col("a_id")).as("dup_of"))
    cells.select(col("vec_id"), col("cell"))
      .join(shadows.withColumnRenamed("b_id", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        col("dup_of").isNull.as("keep"), col("dup_of"))
      .orderBy(col("vec_id"))
  }

  /** Registry spelling of `embed_semdedup` since r17 (the
    * [[nearDupLshAudit]] bounded-universe contract pattern, VERDICT
    * r16 item 2): the keep/dup_of verdict depends on k-means cells
    * (engine-specific), but three geometric contracts are checkable
    * against raw embeddings over the vec_id < 500 universe:
    *
    *   - '''precision''' (`pruned_without_global_witness` pinned 0):
    *     a pruned vector's in-cell tau-neighbor is in particular a
    *     GLOBAL lower-id tau-neighbor, so every pruned vector must lie
    *     in the brute-force global shadow set DuckDB recomputes;
    *   - '''witness validity''' (`witness_below_tau` pinned 0): each
    *     pruned vector's reported `dup_of` must itself verify at
    *     cosine ≥ tau when recomputed from the raw table — an
    *     id-keyed re-join, independent of the capped candidate path;
    *   - '''min-keep completeness''' (`kept_with_incell_shadow`
    *     pinned 0): no kept vector may have a lower-id tau-neighbor in
    *     its OWN cell — recomputed here as an uncapped brute-force
    *     in-cell pair scan over the bounded slice (every lower-id
    *     cell-mate of a bounded vector is itself bounded, so the slice
    *     is exact, and at default maxCell the capped path coincides).
    *
    * Those counters ride beside the exact columns DuckDB recomputes
    * from raw embeddings (bounded-universe size, global shadow-set
    * count and id checksum). The per-vector verdict list stays the
    * DedupSpec/EmbeddingSpec-pinned [[semDedup]] API.
    */
  def semDedupAudit(s: SparkSession, dir: String,
                    tau: Double = 0.9): DataFrame = {
    // ONE Lloyd training serves both the verdict pipeline and the
    // uncapped in-cell recheck below (they used to train independently
    // — identical deterministic codebooks, double the training jobs)
    val codebook = trainCodebook(s, dir)
    val verdicts = semDedupWith(s, dir, codebook, tau = tau)
      .filter(col("vec_id") < 500)
    val e = emb(s, dir)
      .filter(col("vec_id") < 500)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(graft.functions.DotProductF64(col("v"), col("v")) > 0)
      .withColumn("nrm", norm(col("v")))
    val pairCos = (dot(col("a_v"), col("b_v")) /
      (col("a_nrm") * col("b_nrm"))).as("cos")
    // exact global shadow set: b is shadowed iff SOME lower-id a has
    // cosine >= tau (brute force over the 500-vector universe)
    val shadowed = broadcast(e.select(col("vec_id").as("a_id"),
        col("v").as("a_v"), col("nrm").as("a_nrm")))
      .join(e.select(col("vec_id").as("b_id"), col("v").as("b_v"),
        col("nrm").as("b_nrm")), col("a_id") < col("b_id"))
      .select(col("b_id"), pairCos)
      .filter(col("cos") >= tau)
      .select(col("b_id").as("vec_id")).distinct()
    // uncapped in-cell shadow set under the SAME codebook assignment
    val cells = assignCells(e.select(col("vec_id"), col("v")), codebook)
      .select(col("vec_id"), col("cent_id").as("cell"), col("v"))
      .withColumn("nrm", norm(col("v")))
    val inCellShadowed = cells.select(col("cell"), col("vec_id").as("a_id"),
        col("v").as("a_v"), col("nrm").as("a_nrm"))
      .join(cells.select(col("cell"), col("vec_id").as("b_id"),
        col("v").as("b_v"), col("nrm").as("b_nrm")), Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .select(col("b_id"), pairCos)
      .filter(col("cos") >= tau)
      .select(col("b_id").as("vec_id")).distinct()
    val globalAgg = shadowed.agg(
      count(lit(1)).as("n_shadowed"),
      coalesce(sum(col("vec_id")), lit(0L)).as("shadowed_id_sum"))
    // witness validity: recompute cosine(vec, dup_of) from the raw table
    val witnessAgg = verdicts.filter(!col("keep"))
      .select(col("vec_id").as("b_id"), col("dup_of").as("a_id"))
      .join(e.select(col("vec_id").as("a_id"), col("v").as("a_v"),
        col("nrm").as("a_nrm")), Seq("a_id"))
      .join(e.select(col("vec_id").as("b_id"), col("v").as("b_v"),
        col("nrm").as("b_nrm")), Seq("b_id"))
      .select(pairCos)
      .agg(coalesce(sum(when(col("cos") < tau, 1L).otherwise(0L)), lit(0L))
        .as("witness_below_tau"))
    val verdictAgg = verdicts
      .join(shadowed.withColumn("glob", lit(1L)), Seq("vec_id"), "left")
      .join(inCellShadowed.withColumn("incell", lit(1L)), Seq("vec_id"), "left")
      .agg(count(lit(1)).as("n_vecs"),
        coalesce(sum(when(!col("keep") && col("glob").isNull, 1L)
          .otherwise(0L)), lit(0L)).as("pruned_without_global_witness"),
        coalesce(sum(when(col("keep") && col("incell").isNotNull, 1L)
          .otherwise(0L)), lit(0L)).as("kept_with_incell_shadow"))
    verdictAgg
      .crossJoin(broadcast(globalAgg))
      .crossJoin(broadcast(witnessAgg))
      .select(col("n_vecs"), col("n_shadowed"), col("shadowed_id_sum"),
        col("pruned_without_global_witness"), col("witness_below_tau"),
        col("kept_with_incell_shadow"))
  }

  /** DuckDB twin of [[semDedupAudit]] — the bounded-universe size and
    * brute-force global shadow set recomputed from raw embeddings, the
    * three violation counters as contract constants.
    */
  val semDedupAuditSql: String =
    """WITH nz AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |            WHERE vec_id < 500
      |              AND list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) > 0),
      |sh AS (
      |  SELECT DISTINCT b.vec_id AS vec_id
      |  FROM nz a JOIN nz b ON a.vec_id < b.vec_id
      |  WHERE list_sum(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]))
      |      / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
      |         * sqrt(list_sum(list_transform(b.v, x -> x * x)))) >= 0.9)
      |SELECT
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM nz) AS n_vecs,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM sh) AS n_shadowed,
      |  (SELECT CAST(COALESCE(SUM(vec_id), 0) AS BIGINT) FROM sh)
      |    AS shadowed_id_sum,
      |  CAST(0 AS BIGINT) AS pruned_without_global_witness,
      |  CAST(0 AS BIGINT) AS witness_below_tau,
      |  CAST(0 AS BIGINT) AS kept_with_incell_shadow""".stripMargin

  /** Candidate (a_id, b_id, cos) pairs for [[semDedup]], a_id < b_id,
    * with the a-side restricted to each cell's `maxCell` lowest-id
    * members — the work bound is maxCell · |cell| per cell. Package-
    * visible so the spec can count candidates under a planted hot cell.
    * Expects columns (vec_id, cell, v, nrm).
    */
  private[graft] def semDedupCandidates(cells: DataFrame,
                                        maxCell: Int): DataFrame = {
    val nBlocks = 8
    val w = Window.partitionBy(col("cell")).orderBy(col("vec_id"))
    val head = cells
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= maxCell) // WindowGroupLimit: map-side cap
    val a = head.select(col("cell"),
      explode(sequence(lit(0), lit(nBlocks - 1))).as("blk"),
      col("vec_id").as("a_id"), col("v").as("a_v"), col("nrm").as("a_nrm"))
    val b = cells.select(col("cell"),
      pmod(xxhash64(col("vec_id")), lit(nBlocks)).cast("int").as("blk"),
      col("vec_id").as("b_id"), col("v").as("b_v"), col("nrm").as("b_nrm"))
    a.join(b, Seq("cell", "blk"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (dot(col("a_v"), col("b_v")) / (col("a_nrm") * col("b_nrm"))).as("cos"))
  }

  // --- IVF-style ANN -----------------------------------------------------------
  /** Nearest-centroid cell id for every row of `e` (expects columns
    * `vec_id`, `v`) as a PURE NARROW MAP: the codebook rides into the
    * plan as literals, all k cosines land in one projected array, and
    * the argmax is `array_position(arr, array_max(arr))` — first
    * maximum wins, i.e. the lowest cell id on ties, matching a
    * `(csim desc, cent_id asc)` ordering. No join, no window, and
    * crucially NO shuffle of the corpus: at 100 TB a window-argmax
    * would re-exchange every vector once per k-means iteration; this
    * assigns cells at scan speed.
    */
  private def assignCells(e: DataFrame,
                          codebook: Seq[(Int, Seq[Double])]): DataFrame = {
    // ONE codegen'd argmax loop whose generated source is independent
    // of the codebook VALUES and of k (both ride the references table
    // as array literals; see NearestCentroidPos's scaladoc for the
    // janino/JIT-churn this replaces — the previous k-expression
    // spelling inlined each centroid's scalar norm into the source, so
    // every Lloyd iteration compiled a fresh class). Arithmetic and
    // tie-breaking are bit-identical to the array_position(array_max)
    // chain it replaces.
    val cents = typedLit(codebook.flatMap(_._2))
    val norms = typedLit(codebook.map { case (_, cv) =>
      math.sqrt(cv.map(x => x * x).sum)
    })
    val idArr = typedLit(codebook.map(_._1))
    e.withColumn("cent_id",
      element_at(idArr,
        graft.functions.NearestCentroidPos(col("v"), cents, norms)))
  }

  /** Lloyd's k-means codebook over the embeddings, trained with
    * DataFrame ops: assignment = the shuffle-free literal-codebook
    * argmax map (assignCells above), update = per-(cell, dim) mean via
    * a partial-aggregated groupBy. The driver holds ONLY the k
    * centroids between iterations (k x dim doubles — metadata, not
    * data; k-means is inherently iterative-with-sync, and this sync is
    * the centroids themselves). Deterministic: k-means++ over a
    * hash-ordered pool (seedVectors), exact decimal means over fixed
    * sets, fixed iteration count.
    *
    * Empty cells keep their previous centroid (standard Lloyd fallback).
    */
  def trainCodebook(s: SparkSession, dir: String, nCent: Int = 16,
                    iters: Int = 3): Seq[(Int, Seq[Double])] = {
    // zero-norm vectors have no cosine (see annTopK) — unguarded they
    // make assignCells' cos_arr all-NaN and the argmax position 0, which
    // throws under ANSI element_at; exclude them like every other path
    val e = emb(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(graft.functions.DotProductF64(col("v"), col("v")) > 0)
    // Lloyd's iterations re-scan the corpus once per pass — cache it for
    // the training loop (the standard iterative-algorithm posture; at
    // cluster scale this is the same .cache()/checkpoint every k-means
    // implementation puts around its iteration set) and release after.
    if (iters > 0) { val _ = e.cache() }
    try {
      var codebook: Seq[(Int, Seq[Double])] =
        seedVectors(e, nCent, angular = true)
          .zipWithIndex.map { case (v, i) => (i, v) }
      (0 until iters).foreach { _ =>
        // per-(cell, dim) means: nCent x dim groups — metadata-sized result
        val means = assignCells(e, codebook)
          .select(col("cent_id"), posexplode(col("v")).as(Seq("k", "x")))
          .groupBy(col("cent_id"), col("k")).agg(exactMean(col("x")).as("m"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (cid, rows) =>
            cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
          }
        codebook = codebook.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
      }
      codebook
    } finally if (iters > 0) { val _ = e.unpersist() }
  }

  /** Deterministic id-agnostic k-means seed in two stages:
    *
    *  1. CANDIDATE POOL: the `8k` vectors with the lowest
    *     `(xxhash64(vec_id), vec_id)` — a fixed-seed uniform
    *     pseudo-random sample that no corpus numbering scheme can
    *     bias, planned as TakeOrderedAndProject (per-partition top-k +
    *     a pool-sized driver merge, never a global sort).
    *  2. K-MEANS++ D²-weighted draws (Arthur & Vassilvitskii,
    *     "k-means++: the advantages of careful seeding", SODA 2007)
    *     driver-side over the pool, with a fixed-seed splitmix64
    *     stream in place of the paper's random source so the draws
    *     are reproducible. D²-weighting spreads seeds across the
    *     data's mass (a bare k-sample can land two seeds in one dense
    *     region and starve a cell) without the pure-argmax
    *     (Gonzalez/farthest-point) failure of locking onto extreme
    *     outliers — both alternatives measured worse end-to-end
    *     (recall 0.74 / 0.64 vs k-means++'s 0.78 at nProbe=6).
    *
    * The distance metric matches the CLUSTERING geometry
    * (`angular = true` for the cosine coarse codebook, false for PQ's
    * L2 subspaces): angular mode runs the same loop on
    * unit-normalized copies (|â−b̂|² = 2(1−cos), so L2 weighting on
    * the sphere IS angular weighting); assignment still sees the raw
    * vectors, whose means the Lloyd update re-estimates.
    *
    * Both stages are deterministic (fixed hash seed, fixed RNG
    * stream, ties by pool order) and O(pool * k) on 8k rows of
    * metadata — the corpus is touched exactly once, by the sample
    * scan. The previous first-k-ids seed `require`d vec_ids 0..k-1
    * to exist — an artifact of the test corpus's numbering, not a
    * property of real data — and, worse, those seeds CONTAINED the
    * demo query vectors (vec_id < 5), quietly inflating measured
    * recall: every query started as its own centroid. The honest
    * recall of this corpus is bounded by probed coverage — its
    * embeddings are isotropic (measured: same-label mean cosine ≈
    * global mean ≈ 0), so no seeding can do much better.
    */
  private def seedVectors(e: DataFrame, k: Int,
                          angular: Boolean): IndexedSeq[Seq[Double]] = {
    val raw = e.orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(8 * k).select(col("v")).collect()
      .map(_.getSeq[Double](0)).toIndexedSeq
    val pool =
      if (!angular) raw
      else raw.map { v =>
        val n = math.sqrt(v.map(x => x * x).sum)
        v.map(_ / n) // zero vectors are filtered out upstream
      }
    // fewer candidates than centroids cannot train a k-cell codebook —
    // fail fast instead of handing assignCells a short argmax array
    require(pool.length >= k,
      s"k-means init needs >= $k non-zero vectors, found ${pool.length}")
    def d2(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val minD2 = Array.fill(pool.length)(Double.MaxValue)
    val chosen = scala.collection.mutable.ArrayBuffer(0)
    // deterministic splitmix64 stream for the D^2-weighted draws
    var rngState = 0x9e3779b97f4a7c15L
    def nextUnit(): Double = {
      rngState += 0x9e3779b97f4a7c15L
      var z = rngState
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      (z >>> 11).toDouble / (1L << 53).toDouble
    }
    while (chosen.size < k) {
      val last = pool(chosen.last)
      var total = 0.0
      var i = 0
      while (i < pool.length) {
        val d = d2(pool(i), last)
        if (d < minD2(i)) minD2(i) = d
        total += minD2(i)
        i += 1
      }
      val u = nextUnit() * total
      var acc = 0.0; var pick = pool.length - 1
      var j = 0
      var found = false
      while (j < pool.length && !found) {
        acc += minD2(j)
        if (acc >= u) { pick = j; found = true }
        j += 1
      }
      chosen += pick
    }
    chosen.map(pool).toIndexedSeq
  }

  /** Bit-deterministic mean for the Lloyd update: decimal accumulation
    * is EXACT, hence order-free across whatever partition/fetch order
    * the shuffle delivers — a plain `avg` on doubles varies in ulps
    * between runs (the decimal-sum discipline, applied to training so
    * the trained codebooks, and every ANN answer derived from them,
    * are run-stable). 15 decimal digits ≥ a double's precision; unit-
    * scale embedding sums stay far inside the 15 integer digits.
    */
  private def exactMean(x: Column): Column =
    (sum(x.cast("decimal(30,15)")) / count(lit(1))).cast("double")

  private def centDf(s: SparkSession, codebook: Seq[(Int, Seq[Double])]): DataFrame = {
    import s.implicits._
    codebook.toDF("cent_id", "cv")
  }

  /** IVF-flat approximate top-k: a k-means-trained coarse codebook
    * (trainCodebook above; k-means++ hash-pool seed), every vector assigned to
    * its nearest centroid, queries probing their `nProbe` nearest cells.
    *
    * Scale shape: corpus-side cell assignment is the shuffle-free
    * literal-codebook argmax map (assignCells — the corpus is never
    * exchanged to pick its cell); the search joins queries to ONLY the
    * probed cells' vectors — a keyed hash join on cent_id — so the
    * scored candidate set is |corpus| * nProbe / nCent instead of
    * |corpus|. EmbeddingSpec measures recall@10 against the
    * brute-force baseline.
    */
  def annIvfTopK(s: SparkSession, dir: String,
                 nCent: Int = 16, nProbe: Int = 8, k: Int = 10,
                 trainIters: Int = 3): DataFrame = {
    val e = emb(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(graft.functions.DotProductF64(col("v"), col("v")) > 0) // see trainCodebook
    val codebook = trainCodebook(s, dir, nCent, trainIters)
    val cent = centDf(s, codebook)
    // nearest-centroid assignment for every corpus vector — narrow map
    val assigned = assignCells(e, codebook)
      .select(col("cent_id"), col("vec_id").as("neighbor_id"), col("v"))
    // queries probe their nProbe nearest cells
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("csim").desc, col("cent_id"))
    val probes = q.join(broadcast(cent))
      .select(col("q_id"), col("qv"), col("cent_id"),
        cosine(col("qv"), col("cv")).as("csim"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .select(col("q_id"), col("qv"), col("cent_id"))
    // score only vectors in probed cells; top-k per query
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    probes.join(assigned, Seq("cent_id"))
      .filter(col("q_id") =!= col("neighbor_id"))
      .select(col("q_id"), col("neighbor_id"),
        cosine(col("qv"), col("v")).as("cos"))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("neighbor_id"), col("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  // --- product quantization (PQ) ANN -----------------------------------------
  /** Per-subspace Lloyd k-means codebooks for product quantization:
    * the 64-dim space splits into `m` contiguous subspaces of dim/m
    * dims, each quantized independently to `kSub` centroids. Returns
    * `codebooks(j)(c)` = centroid c of subspace j. The driver holds
    * only m * kSub * (dim/m) doubles (= one full-dim vector per
    * centroid column — metadata, like [[trainCodebook]]).
    *
    * Assignment is a literal-codebook argmax (for L2,
    * argmin |x-c|^2 = argmax x·c - |c|^2/2, so the codegen'd
    * [[graft.functions.DotProductF64]] does the work); the means
    * update is ONE fused exchange for all subspaces — (dim index →
    * (subspace, offset)) keyed — not one aggregation per subspace.
    */
  def trainPqCodebooks(s: SparkSession, dir: String, m: Int = 16,
                       kSub: Int = 16, iters: Int = 2): Seq[Seq[Seq[Double]]] =
    trainPqOn(emb(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(graft.functions.DotProductF64(col("v"), col("v")) > 0),
      m, kSub, iters)

  /** [[trainPqCodebooks]] over an arbitrary (vec_id, v) frame — the
    * residual-PQ path ([[annIvfPqTopK]]) trains on coarse-cell
    * residuals instead of raw vectors; the training loop is identical.
    */
  private def trainPqOn(e: DataFrame, m: Int, kSub: Int,
                        iters: Int): Seq[Seq[Seq[Double]]] = {
    val dSub = 64 / m
    if (iters > 0) { val _ = e.cache() }
    try {
      val init = seedVectors(e, kSub, angular = false)
      var codebooks: Seq[Seq[Seq[Double]]] = (0 until m).map { j =>
        init.map(_.slice(j * dSub, (j + 1) * dSub))
      }
      (0 until iters).foreach { _ =>
        val cells = pqCells(codebooks, dSub)
        // fused per-(subspace, cell, offset) means: one exchange total
        val means = e.withColumn("cells", cells)
          .select(col("cells"), posexplode(col("v")).as(Seq("dim", "x")))
          .select((col("dim") / dSub).cast("int").as("j"),
            element_at(col("cells"), (col("dim") / dSub).cast("int") + 1).as("cell"),
            (col("dim") % dSub).as("dk"), col("x"))
          .groupBy(col("j"), col("cell"), col("dk")).agg(exactMean(col("x")).as("mu"))
          .collect()
          .groupBy(r => (r.getInt(0), r.getInt(1)))
          .map { case (k, rows) =>
            k -> rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
          }
        codebooks = codebooks.zipWithIndex.map { case (cb, j) =>
          cb.zipWithIndex.map { case (old, c) => means.getOrElse((j, c), old) }
        }
      }
      codebooks
    } finally if (iters > 0) { val _ = e.unpersist() }
  }

  /** array<int> of per-subspace nearest-centroid codes (0-based) for
    * the row's `v` — a narrow literal-codebook map, corpus never
    * shuffled to encode (same property as assignCells).
    */
  /** Codes for every vector against the flat [j][c][d] codebook — one
    * codegen'd triple loop ([[graft.functions.PqEncode]]). The previous
    * combinator spelling (m·kSub slice+dot expressions per row)
    * generated past janino's 64 KB method cap, and Spark's silent
    * fallback ran the whole corpus-side encoding projection
    * INTERPRETED.
    */
  private def pqCells(codebooks: Seq[Seq[Seq[Double]]], dSub: Int): Column = {
    val kSub = codebooks.head.length
    graft.functions.PqEncode(
      col("v"),
      typedLit(codebooks.flatten.flatten),
      typedLit(codebooks.flatMap(_.map(_.map(x => x * x).sum / 2.0))),
      kSub, dSub)
  }

  /** Two-stage product-quantization ANN: PQ-ADC shortlist + exact
    * re-rank — the standard high-recall PQ deployment (Jégou et al.
    * 2011). Completes the family: annTopK (exact) → annTopKI8
    * (8x bandwidth) → annIvfTopK (prune cells) → PQ (8x again: each
    * 64-float vector rides as 8 int codes).
    *
    * Scale shape: corpus encoding is a narrow map (codes never
    * shuffle to be assigned); the shortlist scan reads ONLY (id,
    * 8-byte code) per candidate — at 100 TB of raw vectors that is a
    * ~64x scan-bandwidth cut — scored by the codegen'd
    * [[graft.functions.PqAdcScore]] lookup loop against a broadcast
    * per-query LUT; only the `shortlist`-bounded candidate ids join
    * back to the full-width vectors for the exact re-rank, so full
    * vectors for at most q*shortlist rows ever cross an exchange.
    * EmbeddingSpec pins recall@10 against the exact-L2 baseline.
    */
  // defaults picked by measured recall on the test corpus: (m=8,
  // shortlist=50) -> 0.64, (m=16, shortlist=100) -> 0.96 recall@10;
  // finer subspaces beat more centroids on this data
  def annPqTopK(s: SparkSession, dir: String, m: Int = 16, kSub: Int = 16,
                k: Int = 10, shortlist: Int = 100): DataFrame = {
    val dSub = 64 / m
    val codebooks = trainPqCodebooks(s, dir, m, kSub)
    val e = emb(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(graft.functions.DotProductF64(col("v"), col("v")) > 0)
    val codes = e.withColumn("code", pqCells(codebooks, dSub))
      .select(col("vec_id").as("neighbor_id"), col("code"))
    // per-query ADC lookup table: lut[j*kSub + c] = |q_j - c|^2
    //                            = q_j·q_j - 2 q_j·c + |c|^2
    // (codegen'd fused loop over the literal codebook; see PqAdcLut)
    val lut = graft.functions.PqAdcLut(
      col("qv"),
      typedLit(codebooks.flatten.flatten),
      typedLit(codebooks.flatMap(_.map(_.map(x => x * x).sum))),
      kSub, dSub)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
      .withColumn("lut", lut)
    val wShort = Window.partitionBy(col("q_id"))
      .orderBy(col("adc"), col("neighbor_id"))
    val short = broadcast(q.select(col("q_id"), col("lut")))
      .join(codes, col("q_id") =!= col("neighbor_id"))
      .select(col("q_id"), col("neighbor_id"),
        graft.functions.PqAdcScore(col("lut"), col("code"), kSub).as("adc"))
      .withColumn("srn", row_number().over(wShort))
      .filter(col("srn") <= shortlist)
      .select(col("q_id"), col("neighbor_id"))
    // exact re-rank of the shortlist only
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("dist2"), col("neighbor_id"))
    short
      .join(e.select(col("vec_id").as("neighbor_id"), col("v")), "neighbor_id")
      .join(broadcast(q.select(col("q_id"), col("qv"))), "q_id")
      .select(col("q_id"), col("neighbor_id"),
        (dot(col("qv"), col("qv")) - lit(2.0) * dot(col("qv"), col("v")) +
          dot(col("v"), col("v"))).as("dist2"))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("neighbor_id"), col("dist2"))
      .orderBy(col("q_id"), col("rank"))
  }

  // --- IVF-PQ (coarse routing + residual ADC) ----------------------------------
  /** IVF-PQ: the production 100 TB ANN shape (Jégou et al. 2011, §IV —
    * IVFADC), composing the family's two approx legs into the form
    * real vector stores deploy: a coarse codebook routes every vector
    * to a cell ([[annIvfTopK]]'s pruning), and PQ encodes the RESIDUAL
    * v − c(v) within each cell ([[annPqTopK]]'s compression, on a
    * vector set whose variance the coarse quantizer has already
    * removed — residual PQ is what makes 8-byte codes usable at
    * billion scale). Queries probe their `nProbe` nearest cells and
    * ADC-score candidates with a PER-CELL lookup table built from the
    * query's residual against THAT cell (q − c), then the
    * `shortlist`-bounded survivors re-rank exactly.
    *
    * Scale shape, composed from the legs' postures: cell assignment
    * AND residual encoding are narrow literal-codebook maps (the
    * corpus never shuffles to be indexed); the candidate scan reads
    * (cell, id, m-byte code) — the IVF factor prunes it to
    * |corpus|·nProbe/nCent rows and the PQ factor shrinks each row
    * ~64×; LUTs are per-(query, probed cell) — q·nProbe rows of
    * m·kSub doubles, broadcast; only q·shortlist full-width vectors
    * ever cross an exchange (the re-rank join). Codebooks are driver
    * metadata, exactly like both parents. EmbeddingSpec pins recall@10
    * against the ORACLE-CHECKED exact leg at sf0.001 and sf0.1.
    */
  // shortlist 200, not the pure-PQ leg's 100: residual-ADC ranking is
  // noisier on this isotropic corpus (the coarse quantizer removes
  // little variance when clusters are weak), and the deeper shortlist
  // recovers it through the exact re-rank — measured recall@10 at
  // sf0.1: 0.68 at shortlist=100 vs 0.80 at 200 (nProbe 8→12 moves
  // nothing; coverage isn't the binding constraint, ADC rank noise is)
  def annIvfPqTopK(s: SparkSession, dir: String,
                   nCent: Int = 16, nProbe: Int = 8, m: Int = 16,
                   kSub: Int = 16, k: Int = 10,
                   shortlist: Int = 200): DataFrame = {
    val dSub = 64 / m
    val e = emb(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(graft.functions.DotProductF64(col("v"), col("v")) > 0)
    val coarse = trainCodebook(s, dir, nCent)
    // centroid matrix as a literal, ordered by cell id — residuals are
    // then a narrow zip_with map, no join touches the corpus
    val centMat = typedLit(coarse.sortBy(_._1).map(_._2))
    val resid = assignCells(e, coarse)
      .withColumn("rv", zip_with(col("v"),
        element_at(centMat, col("cent_id") + 1), (a, b) => a - b))
    val pqCb = trainPqOn(
      resid.select(col("vec_id"), col("rv").as("v")), m, kSub, iters = 2)
    val codes = resid
      .select(col("cent_id"), col("vec_id").as("neighbor_id"),
        col("rv").as("v"))
      .withColumn("code", pqCells(pqCb, dSub))
      .select(col("cent_id"), col("neighbor_id"), col("code"))
    // queries probe their nProbe nearest cells (cosine, as annIvfTopK)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val cent = centDf(s, coarse)
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("csim").desc, col("cent_id"))
    // per-(query, cell) ADC LUT over the query's residual vs that cell
    val lut = graft.functions.PqAdcLut(
      zip_with(col("qv"), col("cv"), (a, b) => a - b),
      typedLit(pqCb.flatten.flatten),
      typedLit(pqCb.flatMap(_.map(_.map(x => x * x).sum))),
      kSub, dSub)
    val probes = q.join(broadcast(cent))
      .select(col("q_id"), col("qv"), col("cent_id"), col("cv"),
        cosine(col("qv"), col("cv")).as("csim"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .withColumn("lut", lut)
      .select(col("q_id"), col("cent_id"), col("lut"))
    val wShort = Window.partitionBy(col("q_id"))
      .orderBy(col("adc"), col("neighbor_id"))
    val short = broadcast(probes)
      .join(codes, Seq("cent_id"))
      .filter(col("q_id") =!= col("neighbor_id"))
      .select(col("q_id"), col("neighbor_id"),
        graft.functions.PqAdcScore(col("lut"), col("code"), kSub).as("adc"))
      .withColumn("srn", row_number().over(wShort))
      .filter(col("srn") <= shortlist)
      .select(col("q_id"), col("neighbor_id"))
    // exact re-rank of the shortlist only (same read as annPqTopK)
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("dist2"), col("neighbor_id"))
    short
      .join(e.select(col("vec_id").as("neighbor_id"), col("v")), "neighbor_id")
      .join(broadcast(q), "q_id")
      .select(col("q_id"), col("neighbor_id"),
        (dot(col("qv"), col("qv")) - lit(2.0) * dot(col("qv"), col("v")) +
          dot(col("v"), col("v"))).as("dist2"))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("neighbor_id"), col("dist2"))
      .orderBy(col("q_id"), col("rank"))
  }

  // --- approx-ANN structural-oracle audits -------------------------------------
  /** Shared audit body for the approx-ANN registry graduations (the
    * CDC structural-oracle pattern, r15): the approximate top-k itself
    * is not SQL-replayable (k-means codebooks, PQ codes), but its
    * CONTRACT against the oracle-checked exact leg is — per query:
    * exactly `k` ranked rows came back (`size_violations`) and the
    * reported metric is monotone with rank (`rank_order_violations`);
    * plus the AGGREGATE recall floor (`recall_floor_violations`,
    * replicated per row): total hits across the query set ≥
    * `minTotalHits` (35/50 = 0.70, matching how EmbeddingSpec pins
    * recall — aggregate over the 5 queries at floor 0.75; a SINGLE
    * query's recall legitimately dips below 0.7 on this isotropic
    * corpus, measured 0.6 for q_id 4 at sf0.01, so a per-query pin
    * would be a false alarm, while an aggregate break still lands
    * near the ~0.5 random-coverage baseline a real bug produces). Those counters ride beside exact
    * columns DuckDB recomputes from the raw parquet — the per-query
    * exact-leg row count, k-th best cosine, and top-k id checksum — so
    * the audit row is hash-checked end to end; the ranked neighbor
    * lists stay the spec-pinned `annIvfTopK`/`annPqTopK`/
    * `annIvfPqTopK` APIs.
    */
  private def annApproxAudit(approx: DataFrame, exact: DataFrame,
                             metric: Column, metricAsc: Boolean,
                             k: Int, recallFloor: Double): DataFrame = {
    val wOrd = Window.partitionBy(col("q_id")).orderBy(col("rank"))
    val wAll = Window.partitionBy()
    // n_q comes from the EXACT leg (the ground-truth query universe),
    // so a query the approx leg dropped entirely cannot loosen the floor
    val ex = exact.groupBy(col("q_id")).agg(
      count(lit(1)).as("k_exact"),
      max(when(col("rank") === k, col("cos"))).as("exact_kth_cos"),
      sum(col("neighbor_id")).as("exact_id_sum"))
      .withColumn("n_q", count(lit(1)).over(wAll))
    val ap = approx
      .join(exact.select(col("q_id"), col("neighbor_id"),
        lit(1L).as("hit")), Seq("q_id", "neighbor_id"), "left")
      .withColumn("prev_m", lag(metric, 1).over(wOrd))
      .groupBy(col("q_id")).agg(
        count(lit(1)).as("n_returned"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"),
        sum(when(if (metricAsc) col("prev_m") > metric
                 else col("prev_m") < metric, 1L).otherwise(0L))
          .as("ord_bad"))
      // the recall pin is AGGREGATE over the query set (a ≤5-row frame
      // at this point — the global window is metadata-sized); the floor
      // is derived IN-FRAME from the exact leg's own query count (r16
      // ADVICE: a hardcoded 35 silently encoded the 5-query × k=10
      // shape — if the query universe or k changes, a constant floor
      // misscales without any loud failure)
      .withColumn("total_hits", sum(col("n_hits")).over(wAll))
    ex.join(ap, Seq("q_id"))
      .select(col("q_id"), col("k_exact"), col("exact_kth_cos"),
        col("exact_id_sum"),
        when(col("n_returned") =!= k, 1L).otherwise(0L)
          .as("size_violations"),
        when(col("total_hits") <
            ceil(lit(recallFloor) * col("n_q") * lit(k)).cast("long"), 1L)
          .otherwise(0L)
          .as("recall_floor_violations"),
        when(col("ord_bad") > 0, 1L).otherwise(0L)
          .as("rank_order_violations"))
      .orderBy(col("q_id"))
  }

  /** Registry spelling of `ann_ivf_topk` since r16: the IVF contract
    * audit (see [[annApproxAudit]]); IVF ranks by cosine descending.
    */
  def annIvfAudit(s: SparkSession, dir: String): DataFrame =
    annApproxAudit(annIvfTopK(s, dir), annTopK(s, dir),
      col("cos"), metricAsc = false, k = 10, recallFloor = 0.70)

  /** Registry spelling of `ann_pq_topk` since r16: the PQ-ADC +
    * exact-re-rank contract audit; PQ re-ranks by L2 `dist2` ascending.
    */
  def annPqAudit(s: SparkSession, dir: String): DataFrame =
    annApproxAudit(annPqTopK(s, dir), annTopK(s, dir),
      col("dist2"), metricAsc = true, k = 10, recallFloor = 0.70)

  /** Registry spelling of `ann_ivfpq_topk` since r16: the residual
    * IVF-PQ contract audit; ranks by L2 `dist2` ascending.
    */
  def annIvfPqAudit(s: SparkSession, dir: String): DataFrame =
    annApproxAudit(annIvfPqTopK(s, dir), annTopK(s, dir),
      col("dist2"), metricAsc = true, k = 10, recallFloor = 0.70)

  /** DuckDB twin of the three ANN audits — the exact-leg columns
    * recomputed from raw parquet (same CTEs as [[annTopKSql]]), the
    * violation counters as the contract constants the Spark side must
    * reproduce. One string serves all three registry keys: the exact
    * leg is identical, only the (non-SQL-replayable) approx leg under
    * audit differs.
    */
  val annAuditSql: String =
    """WITH nz AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |            WHERE list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) > 0),
      |q AS (SELECT vec_id AS q_id, v AS qv FROM nz WHERE vec_id < 5),
      |c AS (SELECT vec_id AS neighbor_id, v FROM nz),
      |sim AS (
      |  SELECT q_id, neighbor_id,
      |    list_sum(list_transform(list_zip(qv, v), x -> x[1] * x[2]))
      |      / (sqrt(list_sum(list_transform(qv, x -> x * x)))
      |         * sqrt(list_sum(list_transform(v, x -> x * x)))) AS cos
      |  FROM q, c WHERE q_id <> neighbor_id),
      |r AS (SELECT q_id, neighbor_id, cos,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id)
      |      AS BIGINT) AS rank
      |  FROM sim)
      |SELECT q_id, CAST(COUNT(*) AS BIGINT) AS k_exact,
      |  MAX(CASE WHEN rank = 10 THEN cos END) AS exact_kth_cos,
      |  CAST(SUM(neighbor_id) AS BIGINT) AS exact_id_sum,
      |  CAST(0 AS BIGINT) AS size_violations,
      |  CAST(0 AS BIGINT) AS recall_floor_violations,
      |  CAST(0 AS BIGINT) AS rank_order_violations
      |FROM r WHERE rank <= 10 GROUP BY q_id ORDER BY q_id""".stripMargin

  // --- centroids ---------------------------------------------------------------
  /** Per-label count and mean vector norm — grouped vector aggregation.
    * Oracle-deterministic: the per-row norms are bit-exact on both
    * engines (DotProductF64's in-order accumulation == DuckDB's
    * list_sum(list_transform(...))), and the repo-wide decimal-sum
    * discipline ([[Exact.dec]]) makes their aggregation
    * order-independent — a plain fp `avg(norm)` would vary with
    * partitioning and could never hash-match.
    */
  def centroidByLabel(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
      .select(col("label"), col("embedding").cast("array<double>").as("v"))
    e.groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        (Exact.dsum(norm(col("v"))) / count(lit(1))).as("avg_norm"))
      .orderBy(col("label"))
  }

  val centroidByLabelSql: String =
    """SELECT label, COUNT(*) AS n,
      | CAST(SUM(CAST(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
      |   AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_norm
      |FROM embeddings GROUP BY label ORDER BY label""".stripMargin

  // --- centroid-distance outlier mining ---------------------------------------
  /** Mislabeled-candidate mining: per label, the top-10 vectors
    * FARTHEST from their label centroid — the curation pass that
    * surfaces annotation errors and embedding-space contamination
    * before training (points far from their class mean are the first
    * audit candidates).
    *
    * Exactness: dims quantize to a MILLI-unit integer grid
    * (round(x·1000) — a float's ≤24-bit mantissa times 1000 stays
    * exact in double, and both engines round exact halves away from
    * zero, so the grid is bit-identical). The distance² to the
    * centroid is multiplied through by n to stay integral:
    * Σ_d (n·q_d − S_d)² with S_d the label's per-dim sum — every
    * intermediate an exact BIGINT (|q| ≤ ~10³·|x|, so the sum fits
    * until n per label ≈ 4·10⁶; past that the scale path divides
    * first in doubles). The reported distance is one sqrt + one
    * division of exact integers.
    *
    * Scale shape: ONE posexplode pass over the corpus feeds a
    * map-side-combined (label, dim) aggregate (labels·64 rows), which
    * re-packs into per-label centroid-sum ARRAYS (a label-sized
    * broadcast); scoring is then a narrow zip_with/aggregate map over
    * the corpus — the 64× row inflation never crosses an exchange
    * twice, and no vector pair is ever formed. Top-10 per label is a
    * rank-window cut.
    */
  def outliersByLabel(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val e = emb(s, dir).select(col("vec_id"), col("label"),
      transform(col("embedding").cast("array<double>"),
        x => round(x * lit(1000)).cast("long")).as("q"))
    val sums = e.select(col("label"), posexplode(col("q")).as(Seq("d", "v")))
      .groupBy(col("label"), col("d")).agg(sum(col("v")).as("sv"))
    val cent = sums.groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("sv")))),
        st => st.getField("sv")).as("sv"))
    val nPer = e.groupBy(col("label")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("label"))
      .orderBy(col("score").desc, col("vec_id"))
    e.join(broadcast(cent.join(nPer, "label")), "label")
      .withColumn("score",
        aggregate(zip_with(col("q"), col("sv"),
          (qi, si) => (col("n") * qi - si) * (col("n") * qi - si)),
          lit(0L), (acc, x) => acc + x))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("label"), col("rnk"), col("vec_id"), col("score"),
        (sqrt(col("score").cast("double"))
          / (col("n").cast("double") * 1000.0)).as("dist"))
      .orderBy(col("label"), col("rnk"))
  }

  val outliersByLabelSql: String =
    """WITH e AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding::DOUBLE[],
      |      x -> CAST(round(x * 1000) AS BIGINT)) AS q
      |  FROM embeddings),
      |x AS (
      |  SELECT label, unnest(q) AS v, unnest(range(1, length(q) + 1)) AS d
      |  FROM e),
      |sums AS (SELECT label, d, CAST(SUM(v) AS BIGINT) AS sv
      |         FROM x GROUP BY label, d),
      |cent AS (SELECT label, list(sv ORDER BY d) AS sv FROM sums GROUP BY label),
      |np AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY label),
      |sc AS (
      |  SELECT e.vec_id, e.label, np.n,
      |    CAST(list_sum(list_transform(range(1, length(q) + 1),
      |      i -> (np.n * q[i] - sv[i]) * (np.n * q[i] - sv[i]))) AS BIGINT)
      |      AS score
      |  FROM e JOIN cent ON e.label = cent.label
      |         JOIN np ON e.label = np.label),
      |r AS (
      |  SELECT label, vec_id, n, score,
      |    CAST(row_number() OVER (PARTITION BY label
      |      ORDER BY score DESC, vec_id) AS BIGINT) AS rnk
      |  FROM sc)
      |SELECT label, rnk, vec_id, score,
      |  sqrt(CAST(score AS DOUBLE)) / (CAST(n AS DOUBLE) * 1000.0) AS dist
      |FROM r WHERE rnk <= 10 ORDER BY label, rnk""".stripMargin

  // --- centroid silhouette -----------------------------------------------------
  /** Per-label simplified (centroid) silhouette — the cluster-quality
    * scorecard before trusting labels for stratified sampling or
    * SemDeDup-style per-cluster dedup: s = (b − a)/max(a, b) with
    * a = distance to the OWN label centroid and b = distance to the
    * nearest OTHER centroid (the O(n·k) simplification of Rousseeuw
    * 1987's O(n²) silhouette — the variant sklearn calls "simplified"
    * and BigQuery ML ships, the only one that scales). Reports the
    * per-label mean and the count of NEGATIVE-silhouette vectors
    * (nearer to a foreign centroid than their own — the mislabel
    * candidates [[outliersByLabel]] ranks within-label).
    *
    * Exactness: dims quantize to the MILLI grid ([[outliersByLabel]]'s
    * contract); each vector-centroid distance² clears the centroid
    * mean to the exact BIGINT Σ_d (n_l·q_d − S_l,d)², so dist² =
    * num/n_l² is ONE correctly-rounded IEEE division of exact
    * integers and the a/b comparisons and s chain (two sqrt, one
    * subtract, one divide) are bit-identical across engines; s lands
    * on the integer micro grid so per-label means are exact-BIGINT
    * sums with one final division. Same overflow envelope as
    * outliersByLabel (exact until n per label ≈ 4e6; past that the
    * scale path divides first in doubles).
    *
    * Scale: one posexplode fold to the (label, dim) grid, then the
    * labels·dims centroid table broadcasts into a NARROW map over the
    * corpus (labels× row inflation, no pairwise stage, nothing
    * data-sized crosses a second exchange) — the [[outliersByLabel]]
    * shape extended from 1 to k centroids per row.
    */
  def silhouette(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select(col("vec_id"), col("label"),
      transform(col("embedding").cast("array<double>"),
        x => round(x * lit(1000)).cast("long")).as("q"))
    val sums = e.select(col("label"), posexplode(col("q")).as(Seq("d", "v")))
      .groupBy(col("label"), col("d")).agg(sum(col("v")).as("sv"))
    val cent = sums.groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("sv")))),
        st => st.getField("sv")).as("sv"))
    val nPer = e.groupBy(col("label")).agg(count(lit(1)).as("n"))
    val cn = cent.join(nPer, "label")
      .select(col("label").as("c_label"), col("sv"), col("n"))
    val scored = e.crossJoin(broadcast(cn))
      .select(col("vec_id"), col("label"), col("c_label"),
        (aggregate(zip_with(col("q"), col("sv"),
          (qi, si) => (col("n") * qi - si) * (col("n") * qi - si)),
          lit(0L), (acc, x) => acc + x).cast("double")
          / (col("n") * col("n")).cast("double")).as("dist2"))
    val ab = scored.groupBy(col("vec_id"), col("label"))
      .agg(max(when(col("label") === col("c_label"), col("dist2"))).as("a2"),
        min(when(col("label") =!= col("c_label"), col("dist2"))).as("b2"))
    val sil = ab.select(col("label"),
      round(when(greatest(col("a2"), col("b2")) > 0.0,
        (sqrt(col("b2")) - sqrt(col("a2")))
          / sqrt(greatest(col("a2"), col("b2"))))
        .otherwise(lit(0.0)) * lit(1e6)).cast("long").as("s_micro"))
    sil.groupBy(col("label"))
      .agg(count(lit(1)).as("n"), sum(col("s_micro")).as("sum_micro"),
        sum(when(col("s_micro") < 0L, 1L).otherwise(0L)).as("n_negative"))
      .select(col("label"), col("n"),
        (col("sum_micro").cast("double")
          / (col("n").cast("double") * lit(1e6))).as("mean_silhouette"),
        col("n_negative"))
      .orderBy(col("label"))
  }

  /** DuckDB twin of [[silhouette]]. list_sum over BIGINTs returns
    * HUGEINT, whose direct →DOUBLE conversion is not correctly rounded
    * (the r13 landmine) — both it and the micro-sum reduce to BIGINT
    * before the final DOUBLE cast.
    */
  val silhouetteSql: String =
    """WITH e AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding::DOUBLE[],
      |      x -> CAST(round(x * 1000) AS BIGINT)) AS q
      |  FROM embeddings),
      |x AS (
      |  SELECT label, unnest(q) AS v, unnest(range(1, length(q) + 1)) AS d
      |  FROM e),
      |sums AS (SELECT label, d, CAST(SUM(v) AS BIGINT) AS sv
      |         FROM x GROUP BY label, d),
      |cent AS (SELECT label, list(sv ORDER BY d) AS sv FROM sums GROUP BY label),
      |np AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY label),
      |cn AS (SELECT cent.label AS c_label, sv, n
      |       FROM cent JOIN np ON cent.label = np.label),
      |d2 AS (
      |  SELECT e.vec_id, e.label, cn.c_label,
      |    CAST(CAST(list_sum(list_transform(range(1, length(q) + 1),
      |      i -> (cn.n * q[i] - sv[i]) * (cn.n * q[i] - sv[i]))) AS BIGINT)
      |      AS DOUBLE) / CAST(cn.n * cn.n AS DOUBLE) AS dist2
      |  FROM e, cn),
      |ab AS (
      |  SELECT vec_id, label,
      |    MAX(CASE WHEN label = c_label THEN dist2 END) AS a2,
      |    MIN(CASE WHEN label <> c_label THEN dist2 END) AS b2
      |  FROM d2 GROUP BY vec_id, label),
      |sm AS (
      |  SELECT label,
      |    CAST(round((CASE WHEN GREATEST(a2, b2) > 0
      |      THEN (sqrt(b2) - sqrt(a2)) / sqrt(GREATEST(a2, b2))
      |      ELSE 0.0 END) * 1e6) AS BIGINT) AS s_micro
      |  FROM ab)
      |SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(CAST(SUM(s_micro) AS BIGINT) AS DOUBLE)
      |    / (CAST(COUNT(*) AS DOUBLE) * 1e6) AS mean_silhouette,
      |  CAST(SUM(CASE WHEN s_micro < 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_negative
      |FROM sm GROUP BY label ORDER BY label""".stripMargin

  // --- mutual-kNN graph --------------------------------------------------------
  /** Exact mutual-kNN graph over the (bounded) corpus: edge (a, b)
    * exists iff a is in b's cosine top-k AND b is in a's — the
    * symmetric neighborhood graph that seeds graph-based dedup
    * clusters, label propagation, and UMAP-style layouts. Mutuality is
    * the standard asymmetry filter: a hub vector appears in everyone's
    * top-k, but its OWN top-k keeps only its true neighbors, so
    * requiring both directions prunes hub edges without a degree cap.
    *
    * Scale posture mirrors [[TextQueries.dedupPrefixJaccard]]: the
    * EXACT spelling is deliberately bounded (`maxId` vectors — the
    * broadcast side must fit an executor) and oracle-checked against
    * DuckDB's definitional all-pairs; at corpus scale the same
    * mutual-filter kernel runs over [[nearDupLsh]]/[[annIvfTopK]]
    * candidates instead of the dense pair set. Within the bound the
    * plan is the [[annTopK]] shape — ONE broadcast, ONE pass over the
    * corpus side, top-k cut by a rank window (k-bounded), then the
    * mutuality check groups the k·n-bounded EDGE SET (never vectors)
    * by unordered pair and keeps pairs seen from both sides. Cosine is
    * computed once per direction and is bit-identical both ways
    * (per-element multiply commutes; the codegen'd sum runs in index
    * order), so min(cos) == max(cos) per pair and the group-by loses
    * nothing.
    */
  def knnGraph(s: SparkSession, dir: String,
               k: Int = 5, maxId: Long = 500): DataFrame = {
    // norms PRECOMPUTED per vector (n of them), not per pair (n·k of
    // them): cos = dot/(an·bn) is the identical expression tree to the
    // inline spelling — same IEEE ops in the same order — so the values
    // (and the oracle hash) are bit-for-bit unchanged, at a third of
    // the pairwise flops
    val e = emb(s, dir)
      .filter(col("vec_id") < maxId)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
      .filter(col("nrm") > 0) // zero-norm: see annTopK
    val q = e.select(col("vec_id").as("q_id"), col("v").as("qv"),
      col("nrm").as("q_nrm"))
    val c = e.select(col("vec_id").as("n_id"), col("v").as("nv"),
      col("nrm").as("n_nrm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    val topk = broadcast(q).join(c, col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (dot(col("qv"), col("nv")) / (col("q_nrm") * col("n_nrm"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    topk
      .select(least(col("q_id"), col("n_id")).as("a_id"),
        greatest(col("q_id"), col("n_id")).as("b_id"), col("cos"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("sides"), min(col("cos")).as("cos"))
      .filter(col("sides") === 2)
      .select(col("a_id"), col("b_id"), col("cos"))
      .orderBy(col("a_id"), col("b_id"))
  }

  val knnGraphSql: String =
    """WITH nz AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |            WHERE vec_id < 500
      |              AND list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) > 0),
      |sim AS (
      |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
      |    list_sum(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]))
      |      / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
      |         * sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS cos
      |  FROM nz a JOIN nz b ON a.vec_id <> b.vec_id),
      |tk AS (SELECT q_id, n_id, cos FROM (
      |    SELECT q_id, n_id, cos,
      |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn
      |    FROM sim) WHERE rn <= 5),
      |pe AS (SELECT least(q_id, n_id) AS a_id, greatest(q_id, n_id) AS b_id, cos
      |       FROM tk)
      |SELECT a_id, b_id, MIN(cos) AS cos FROM pe
      |GROUP BY a_id, b_id HAVING COUNT(*) = 2 ORDER BY a_id, b_id""".stripMargin

  // --- hard-negative mining ----------------------------------------------------
  /** Contrastive hard-negative audit: per anchor, the best same-label
    * cosine (the positive it would be pulled toward) versus the best
    * DIFFERENT-label cosine (its hardest negative), rolled up per label
    * — the report that drives triplet/contrastive training-set mining
    * and flags label noise (an anchor whose hardest negative beats its
    * best positive is either mislabeled or sits on a class boundary).
    *
    * Determinism discipline: cosines are bit-identical cross-engine
    * (in-order dot product), and the rollup uses ONLY multiset-safe
    * aggregates — counts, min, max — never a float SUM (the
    * [[Exact]] hazard: full-precision doubles through DECIMAL(18,6)
    * drift at ~1e-11 rates; a min/max SELECTS one of the identical
    * values instead of re-associating them). Same bounded-corpus
    * posture and plan shape as [[knnGraph]].
    */
  def hardNegatives(s: SparkSession, dir: String, maxId: Long = 500): DataFrame = {
    val e = emb(s, dir)
      .filter(col("vec_id") < maxId)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v"))) // per-vector, see knnGraph
      .filter(col("nrm") > 0)
    val a = e.select(col("vec_id").as("a_id"), col("label").as("a_label"),
      col("v").as("av"), col("nrm").as("a_nrm"))
    val b = e.select(col("vec_id").as("b_id"), col("label").as("b_label"),
      col("v").as("bv"), col("nrm").as("b_nrm"))
    val anchors = broadcast(a).join(b, col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("a_label"),
        (col("a_label") === col("b_label")).as("same"),
        (dot(col("av"), col("bv")) / (col("a_nrm") * col("b_nrm"))).as("cos"))
      .groupBy(col("a_id"), col("a_label"))
      .agg(max(when(col("same"), col("cos"))).as("pos_cos"),
        max(when(!col("same"), col("cos"))).as("neg_cos"))
      .filter(col("pos_cos").isNotNull && col("neg_cos").isNotNull)
    anchors.groupBy(col("a_label").as("label"))
      .agg(count(lit(1)).as("n_anchors"),
        sum(when(col("neg_cos") > col("pos_cos"), 1L).otherwise(0L))
          .as("n_violations"),
        min(col("pos_cos") - col("neg_cos")).as("min_margin"),
        max(col("pos_cos") - col("neg_cos")).as("max_margin"))
      .orderBy(col("label"))
  }

  val hardNegativesSql: String =
    """WITH nz AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
      |            WHERE vec_id < 500
      |              AND list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) > 0),
      |pairs AS (
      |  SELECT a.vec_id AS a_id, a.label AS a_label,
      |    a.label = b.label AS same,
      |    list_sum(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]))
      |      / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
      |         * sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS cos
      |  FROM nz a JOIN nz b ON a.vec_id <> b.vec_id),
      |anchors AS (
      |  SELECT a_id, a_label,
      |    MAX(CASE WHEN same THEN cos END) AS pos_cos,
      |    MAX(CASE WHEN NOT same THEN cos END) AS neg_cos
      |  FROM pairs GROUP BY a_id, a_label
      |  HAVING pos_cos IS NOT NULL AND neg_cos IS NOT NULL)
      |SELECT a_label AS label, COUNT(*) AS n_anchors,
      | CAST(SUM(CASE WHEN neg_cos > pos_cos THEN 1 ELSE 0 END) AS BIGINT)
      |   AS n_violations,
      | MIN(pos_cos - neg_cos) AS min_margin,
      | MAX(pos_cos - neg_cos) AS max_margin
      |FROM anchors GROUP BY a_label ORDER BY label""".stripMargin

  // --- MMR diverse top-k -------------------------------------------------------
  /** Maximal-Marginal-Relevance re-ranking (Carbonell & Goldstein,
    * SIGIR 1998): pick `k` results that are RELEVANT to the query but
    * not redundant with each other, greedily maximizing
    * `λ·cos(query, d) − (1−λ)·max_{s∈selected} cos(d, s)` — the
    * standard diversity pass over a retrieval pool (RAG context
    * selection, dedup of search results).
    *
    * Scale split: the greedy argmax is inherently sequential in k, so
    * the CLUSTER does what scales — one corpus pass computing
    * relevance, cut to a `poolN`-bounded candidate pool by
    * TakeOrderedAndProject (no global sort) — and the DRIVER runs the
    * O(poolN·k) greedy over pool METADATA only (the k-means++ seeding
    * discipline: driver work is bounded by the pool constant, never
    * corpus size). Output is deterministic: the pool cut tie-breaks on
    * vec_id and the greedy breaks score ties by lowest vec_id.
    */
  def mmrTopK(s: SparkSession, dir: String, k: Int = 10,
              poolN: Int = 20, lambda: Double = 0.7): DataFrame = {
    val e = emb(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(dot(col("v"), col("v")) > 0)
    val qv = e.filter(col("vec_id") === 0).select(col("v"))
    val pool = e.crossJoin(broadcast(qv).withColumnRenamed("v", "qv"))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("v"), cosine(col("v"), col("qv")).as("rel"))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(poolN)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var i = 0; var ab = 0.0; var aa = 0.0; var bb = 0.0
      while (i < a.length) { ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1 }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
    val remaining = scala.collection.mutable.LinkedHashMap(
      pool.map(p => p._1 -> p): _*)
    while (selected.length < k && remaining.nonEmpty) {
      val scored = remaining.values.map { case (id, v, rel) =>
        val maxSim = if (selected.isEmpty) 0.0
          else pool.filter(p => selected.exists(_._1 == p._1))
            .map(p => cos(v, p._2)).max
        (id, rel, lambda * rel - (1 - lambda) * maxSim)
      }
      val best = scored.minBy { case (id, _, score) => (-score, id) }
      selected += best
      val _ = remaining.remove(best._1)
    }
    import s.implicits._
    selected.zipWithIndex
      .map { case ((id, rel, score), i) => (i + 1L, id, rel, score) }
      .toSeq.toDF("rank", "vec_id", "relevance", "mmr_score")
  }

  /** DuckDB twin of [[mmrTopK]] — a FULL value oracle for a greedy
    * algorithm, by unrolling: the k-step greedy chain is inherently
    * sequential, but k and poolN are CONSTANTS (10 and 20), so each
    * step becomes one single-row CTE (`argmax over the pool minus the
    * prefix, ORDER BY score DESC, id LIMIT 1`) referencing the
    * previous step's selection prefix. Every float op is spelled in
    * the same order as the Spark side (the in-order dot-product rule
    * that makes [[annTopKSql]] hash-match; the driver-side greedy's
    * `ab/(sqrt(aa)*sqrt(bb))` loop is the same left-to-right chain),
    * `MAX` over selected-set cosines is order-free, and ties break on
    * the same (score DESC, id) key — so the chains agree bit-for-bit
    * and `embed_mmr_topk` graduates from rows-only to hash-checked.
    * The unroll is gate-scale-only in LENGTH, not semantics: k is a
    * query constant, never data-dependent.
    */
  val mmrTopKSql: String = {
    val k = 10
    // CAST(0.7 AS DOUBLE), never a bare 0.7: DuckDB parses the bare
    // literal as DECIMAL(2,1), folds (1 - 0.7) to exact decimal 0.3
    // (double 0.29999999999999999), while the Scala driver computes
    // (1 - lambda) in doubles (0.30000000000000004) — a last-ulp score
    // divergence that actually flipped hash equality at sf0.01
    val lam = "CAST(0.7 AS DOUBLE)"
    val steps = (2 to k).map { i =>
      s"""s$i AS MATERIALIZED (
         |  SELECT p.id, p.rel,
         |    $lam * p.rel - (1 - $lam) * (
         |      SELECT MAX(s.cs) FROM sim s
         |      WHERE s.a_id = p.id
         |        AND s.b_id IN (SELECT id FROM sel${i - 1})) AS score
         |  FROM pool p
         |  WHERE p.id NOT IN (SELECT id FROM sel${i - 1})
         |  ORDER BY score DESC, p.id LIMIT 1),
         |sel$i AS MATERIALIZED (SELECT id FROM sel${i - 1}
         |          UNION ALL SELECT id FROM s$i)""".stripMargin
    }.mkString(",\n")
    val out = (1 to k).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS rank, id AS vec_id,
         |  rel AS relevance, score AS mmr_score FROM s$i""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH nz AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |            WHERE list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) > 0),
       |q AS MATERIALIZED (SELECT v AS qv FROM nz WHERE vec_id = 0),
       |pool AS MATERIALIZED (
       |  SELECT nz.vec_id AS id, nz.v,
       |    list_sum(list_transform(list_zip(nz.v, q.qv), x -> x[1] * x[2]))
       |      / (sqrt(list_sum(list_transform(nz.v, x -> x * x)))
       |         * sqrt(list_sum(list_transform(q.qv, x -> x * x)))) AS rel
       |  FROM nz, q WHERE nz.vec_id <> 0
       |  ORDER BY rel DESC, nz.vec_id LIMIT 20),
       |sim AS MATERIALIZED (
       |  SELECT a.id AS a_id, b.id AS b_id,
       |    list_sum(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]))
       |      / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
       |         * sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS cs
       |  FROM pool a JOIN pool b ON a.id <> b.id),
       |s1 AS MATERIALIZED (SELECT p.id, p.rel, $lam * p.rel - (1 - $lam) * 0.0 AS score
       |       FROM pool p ORDER BY score DESC, p.id LIMIT 1),
       |sel1 AS MATERIALIZED (SELECT id FROM s1),
       |$steps
       |$out
       |ORDER BY rank""".stripMargin
  }

  // --- norm distribution by label ---------------------------------------------
  /** Per-label vector-norm quantiles — the drift/QA report an embedding
    * pipeline runs after each encoder batch (a label whose p50 norm
    * shifts is a re-embedding or normalization bug). Norms are bit-exact
    * in both engines (in-order codegen'd dot product + IEEE sqrt), and
    * `percentile` is SQL-standard interpolation = DuckDB quantile_cont,
    * so the fp outputs hash-match exactly. One partial-aggregated
    * shuffle on label; the vectors themselves never shuffle — only
    * (label, norm) pairs.
    */
  def normQuantilesByLabel(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .select(col("label"),
        norm(col("embedding").cast("array<double>")).as("nrm"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        min(col("nrm")).as("min_norm"),
        percentile(col("nrm"), lit(0.5)).as("p50_norm"),
        percentile(col("nrm"), lit(0.9)).as("p90_norm"),
        max(col("nrm")).as("max_norm"))
      .orderBy(col("label"))

  val normQuantilesByLabelSql: String =
    """WITH e AS (SELECT label,
      |  sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
      |  FROM embeddings)
      |SELECT label, COUNT(*) AS n, MIN(nrm) AS min_norm,
      | quantile_cont(nrm, 0.5) AS p50_norm,
      | quantile_cont(nrm, 0.9) AS p90_norm,
      | MAX(nrm) AS max_norm
      |FROM e GROUP BY label ORDER BY label""".stripMargin

  // --- Matryoshka dimension-ablation sweep --------------------------------------
  /** Truncated-dimension retention sweep (the Matryoshka-representation
    * read, Kusupati et al., NeurIPS 2022): for each prefix length d ∈
    * {8, 16, 32, 64}, how much of each vector survives truncation —
    * cos(x, x[1:d] ⊕ 0) collapses to ‖x[1:d]‖/‖x‖ because truncation is
    * a projection, so no pairwise math is needed anywhere. The report a
    * team reads before shipping truncated embeddings to cut ANN index
    * cost 8x.
    *
    * Determinism: partial and full norms are the in-order codegen'd
    * dot + IEEE sqrt ([[normQuantilesByLabel]]'s rule), the per-row
    * ratio lands on the integer MICRO grid, so the cross-row aggregation
    * is exact BIGINT sums (never an order-dependent double
    * accumulation); min/avg are derived from those integers. Zero
    * vectors are excluded (ratio undefined).
    *
    * Shape: one narrow pass over the vectors (a 4-entry explode per
    * row); the exchange carries (dim, r_micro) pairs — 16 bytes/row —
    * into a 4-row grid.
    */
  def dimAblation(s: SparkSession, dir: String): DataFrame = {
    val dims = Seq(8, 16, 32, 64)
    val base = emb(s, dir).select(col("embedding"),
      norm(col("embedding").cast("array<double>")).as("nfull"))
    val entries = dims.map(d => struct(lit(d.toLong).as("dim"),
      (norm(slice(col("embedding"), 1, d).cast("array<double>"))
        / col("nfull")).as("r")))
    base
      .filter(col("nfull") > 0.0)
      .select(explode(array(entries: _*)).as("e"))
      .select(col("e.dim").as("dim"),
        round(col("e.r") * lit(1e6)).cast("long").as("r_micro"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("r_micro")).as("min_micro"),
        sum(col("r_micro")).as("sum_micro"))
      .select(col("dim"), col("n_vecs"),
        (col("min_micro").cast("double") / lit(1e6)).as("min_retained"),
        (col("sum_micro").cast("double")
          / (col("n_vecs").cast("double") * lit(1e6))).as("avg_retained"))
      .orderBy(col("dim"))
  }

  val dimAblationSql: String =
    """WITH base AS (
      |  SELECT embedding::DOUBLE[] AS v,
      |    sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
      |      AS nfull
      |  FROM embeddings),
      |r AS (
      |  SELECT CAST(d.dim AS BIGINT) AS dim,
      |    CAST(round(sqrt(list_sum(list_transform(v[1:d.dim], x -> x * x)))
      |               / nfull * 1e6) AS BIGINT) AS r_micro
      |  FROM base, (VALUES (8), (16), (32), (64)) d(dim)
      |  WHERE nfull > 0)
      |SELECT dim, COUNT(*) AS n_vecs,
      |  CAST(MIN(r_micro) AS DOUBLE) / 1e6 AS min_retained,
      |  CAST(CAST(SUM(r_micro) AS BIGINT) AS DOUBLE)
      |    / (CAST(COUNT(*) AS DOUBLE) * 1e6) AS avg_retained
      |FROM r GROUP BY dim ORDER BY dim""".stripMargin

  // --- intrinsic dimension (TwoNN) ----------------------------------------
  /** TwoNN intrinsic-dimension estimate (Facco et al., Sci Rep 2017)
    * of the embedding manifold: for each sample point the ratio
    * μ = r₂/r₁ of its second- to first-nearest-neighbor cosine
    * distance follows Pareto(d) where d is the INTRINSIC dimension,
    * and the MLE is d̂ = n / Σ ln μ — the "how many dimensions do
    * these embeddings actually use" read that tells an ANN/PQ tuning
    * pass how aggressively it can compress (complements
    * [[pcaExplained]]: TwoNN sees curved manifolds PCA cannot).
    *
    * Determinism: distances are 1 − cosine on the bit-identical
    * [[graft.functions.DotProductF64]] chain; each ln μ is rounded to
    * integer MICRONATS so the cross-point sum is an exact BIGINT
    * (order-free), and d̂ is one IEEE division of exact integers.
    * Duplicate-vector points (r₁ ≤ 0, including the float-rounding
    * cos>1 pathology — identical bits in both engines) are dropped,
    * as the estimator prescribes.
    *
    * Scale posture: the sample side is FIXED (vec_id < sampleN) and
    * broadcast — the "few queries against a 100 TB corpus" plan of
    * [[annTopK]]: one pass over the candidate table, per-sample top-2
    * via a rank window PARTITIONED by the bounded q_id (map-side
    * WindowGroupLimit), never an all-pairs corpus join.
    */
  def intrinsicDim(s: SparkSession, dir: String,
                   sampleN: Int = 512): DataFrame = {
    val lnMicro = (c: Column) =>
      round(log(c) * lit(1e6)).cast("long")
    val e = emb(s, dir)
      .filter(graft.functions.DotProductF64(
        col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>")) > 0)
    val q = e.filter(col("vec_id") < sampleN)
      .select(col("vec_id").as("q_id"),
        col("embedding").cast("array<double>").as("qv"))
    val c = e.select(col("vec_id").as("neighbor_id"),
      col("embedding").cast("array<double>").as("v"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("d").asc, col("neighbor_id"))
    val nn2 = broadcast(q).join(c, col("q_id") =!= col("neighbor_id"))
      .select(col("q_id"),
        (lit(1.0) - cosine(col("qv"), col("v"))).as("d"),
        col("neighbor_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 2)
    val mu = nn2.groupBy(col("q_id"))
      .agg(min(col("d")).as("r1"), max(col("d")).as("r2"))
      .filter(col("r1") > 0.0)
      .select(lnMicro(col("r2") / col("r1")).as("mu_micro"))
    mu.agg(count(lit(1)).as("n_used"), sum(col("mu_micro")).as("sum_ln_mu"))
      .select(col("n_used"), col("sum_ln_mu"),
        when(col("sum_ln_mu") > 0L,
          col("n_used").cast("double") * lit(1e6)
            / col("sum_ln_mu").cast("double"))
          .otherwise(lit(null).cast("double")).as("id_twonn"))
  }

  /** DuckDB twin of [[intrinsicDim]], derived from the SAME sampleN. */
  def intrinsicDimSql(sampleN: Int = 512): String =
    s"""WITH nz AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |            WHERE list_sum(list_transform(embedding::DOUBLE[],
      |                                          x -> x * x)) > 0),
      |q AS (SELECT vec_id AS q_id, v AS qv FROM nz WHERE vec_id < $sampleN),
      |c AS (SELECT vec_id AS neighbor_id, v FROM nz),
      |dist AS (
      |  SELECT q_id,
      |    1.0 - list_sum(list_transform(list_zip(qv, v), x -> x[1] * x[2]))
      |      / (sqrt(list_sum(list_transform(qv, x -> x * x)))
      |         * sqrt(list_sum(list_transform(v, x -> x * x)))) AS d,
      |    neighbor_id
      |  FROM q, c WHERE q_id <> neighbor_id),
      |r AS (SELECT q_id, d,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY d ASC, neighbor_id)
      |      AS rank
      |  FROM dist),
      |mu AS (
      |  SELECT q_id, MIN(d) AS r1, MAX(d) AS r2
      |  FROM r WHERE rank <= 2 GROUP BY q_id),
      |ln AS (
      |  SELECT CAST(round(ln(r2 / r1) * 1e6) AS BIGINT) AS mu_micro
      |  FROM mu WHERE r1 > 0),
      |agg AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_used,
      |    CAST(SUM(mu_micro) AS BIGINT) AS sum_ln_mu
      |  FROM ln)
      |SELECT n_used, sum_ln_mu,
      |  CASE WHEN sum_ln_mu > 0 THEN
      |    CAST(n_used AS DOUBLE) * 1e6 / CAST(sum_ln_mu AS DOUBLE)
      |  END AS id_twonn
      |FROM agg""".stripMargin

  // --- dedup-threshold tuning sweep -------------------------------------
  /** Pair-count-per-cosine-bin histogram over a bounded sample — the
    * TUNING step before a near-dup dedup run: pick the threshold by
    * seeing how many pairs each 0.1-wide cosine bin would admit, plus
    * the cumulative pairs-at-or-above count per bin.
    *
    * Scale posture: exact all-pairs cosine is O(sample²) BY DESIGN and
    * runs on a fixed small sample (vec_id < 300 here, ~45k pairs) — the
    * deliberate bounded analogue of `dedup_ngram_jaccard`'s golden
    * bucket. The sample side broadcasts, so the "join" is a
    * broadcast-nested-loop over ~300 rows, never a shuffled cartesian of
    * the corpus. Production-threshold selection on a 100 TB corpus
    * samples ~10³-10⁴ vectors the same way; the FULL corpus is only ever
    * paired via LSH candidates ([[nearDupLsh]]).
    *
    * Bin edges are exact multiples of 0.1; a cosine landing exactly on
    * an edge floors identically in both engines (same IEEE input ⇒ same
    * floor), so counts are hash-exact.
    */
  def thresholdSweep(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
      .filter(col("vec_id") < 300)
      .filter(graft.functions.DotProductF64(
        col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>")) > 0)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val binned = broadcast(e.as("a"))
      .join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(floor(cosine(col("a.v"), col("b.v")) * 10).cast("long")
        .as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n_pairs"))
    val wCum = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned
      .select(col("bin"), (col("bin").cast("double") / 10).as("cos_lo"),
        col("n_pairs"), sum(col("n_pairs")).over(wCum).as("n_at_or_above"))
      .orderBy(col("bin").desc)
  }

  val thresholdSweepSql: String =
    """WITH nz AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |            WHERE vec_id < 300
      |              AND list_sum(list_transform(embedding::DOUBLE[],
      |                                          x -> x * x)) > 0),
      |p AS (
      |  SELECT CAST(FLOOR(
      |    list_sum(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]))
      |      / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
      |         * sqrt(list_sum(list_transform(b.v, x -> x * x)))) * 10)
      |    AS BIGINT) AS bin
      |  FROM nz a JOIN nz b ON a.vec_id < b.vec_id),
      |h AS (SELECT bin, COUNT(*) AS n_pairs FROM p GROUP BY bin)
      |SELECT bin, CAST(bin AS DOUBLE) / 10 AS cos_lo, n_pairs,
      |  CAST(SUM(n_pairs) OVER (ORDER BY bin DESC
      |                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |    AS n_at_or_above
      |FROM h ORDER BY bin DESC""".stripMargin

  // --- PCA projection --------------------------------------------------------
  /** Distributed PCA: project every embedding onto the corpus's top-k
    * principal components. The classic dimensionality-reduction /
    * whitening step of an embedding pipeline (dedup at lower dim,
    * visualization, drift monitoring).
    *
    * 100 TB shape — the covariance NEVER materializes row-wise:
    *   1. ONE pass over the corpus folds each partition into a
    *      (n, Σx, Σx·xᵀ) buffer ([[graft.functions.GramAgg]]); the
    *      shuffle carries one d²-sized buffer per partition (32 KiB at
    *      d=64), nothing row-sized.
    *   2. The driver finishes cov = Σxxᵀ/n − μμᵀ and runs a cyclic
    *      Jacobi eigensolve — O(d³) on a d×d matrix, microseconds at
    *      d=64, independent of corpus size.
    *   3. Projection is a narrow codegen'd map: k dot products per row
    *      against literal (broadcast-by-value) eigenvectors
    *      ([[graft.functions.DotProductF64]]), centered by the scalar
    *      μ·v_k. No shuffle; the final orderBy is presentation-only.
    *
    * Eigenvectors are sign-canonicalized (largest-|component| positive)
    * so the projection's orientation is stable across runs. No DuckDB
    * oracle (iterative eigensolve + fp partial-sum order); EmbeddingSpec
    * pins eigenvalue ordering, orthonormality, and per-component
    * projection variance == eigenvalue within tolerance.
    */
  def pcaProject(s: SparkSession, dir: String, k: Int = 4): DataFrame = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val e = emb(s, dir).select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("x"))
    val gram = udaf(graft.functions.GramAgg, ExpressionEncoder[Seq[Double]]())
    val m = e.agg(gram(col("x")).as("m")).select(col("m.n"), col("m.s"), col("m.g")).head()
    val n = m.getLong(0).toDouble
    val sum = m.getSeq[Double](1).toArray
    val g = m.getSeq[Double](2).toArray
    val d = sum.length
    require(n > 0 && d > 0, "pcaProject: empty embeddings table")
    val mean = sum.map(_ / n)
    val cov = Array.tabulate(d * d)(i => g(i) / n - mean(i / d) * mean(i % d))
    val (eigVals, eigVecs) = jacobiEigen(cov, d)
    val top = eigVals.zipWithIndex.sortBy { case (v, i) => (-v, i) }.take(k)
    val comps: Seq[Array[Double]] = top.map { case (_, ci) =>
      val v = Array.tabulate(d)(r => eigVecs(r * d + ci))
      // sign canon: make the largest-|component| coordinate positive
      val mi = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(mi) < 0) v.map(x => -x) else v
    }.toSeq
    val projCols = comps.zipWithIndex.map { case (v, j) =>
      val mu = (0 until d).map(i => mean(i) * v(i)).sum
      (dot(col("x"), lit(v)) - lit(mu)).as(s"pc$j")
    }
    e.select(col("vec_id") +: col("label") +: projCols: _*)
      .orderBy(col("vec_id"))
  }

  /** Eigenvalues of the top-k principal components plus the total
    * variance (trace) — the explained-variance report that accompanies
    * [[pcaProject]]; same one-pass moment aggregation, driver-sized
    * output.
    */
  def pcaExplained(s: SparkSession, dir: String, k: Int = 4): DataFrame = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val e = emb(s, dir).select(col("embedding").cast("array<double>").as("x"))
    val gram = udaf(graft.functions.GramAgg, ExpressionEncoder[Seq[Double]]())
    val m = e.agg(gram(col("x")).as("m")).select(col("m.n"), col("m.s"), col("m.g")).head()
    val n = m.getLong(0).toDouble
    val sum = m.getSeq[Double](1).toArray
    val g = m.getSeq[Double](2).toArray
    val d = sum.length
    val mean = sum.map(_ / n)
    val cov = Array.tabulate(d * d)(i => g(i) / n - mean(i / d) * mean(i % d))
    val (eigVals, _) = jacobiEigen(cov, d)
    val trace = (0 until d).map(i => cov(i * d + i)).sum
    val top = eigVals.sortBy(-_).take(k)
    import s.implicits._
    top.zipWithIndex.map { case (ev, i) =>
      (i.toLong, ev, ev / trace)
    }.toSeq.toDF("component", "eigenvalue", "explained_frac")
  }

  // --- PCA structural-oracle audits ---------------------------------------
  /** Shared driver-side PCA solve for the two audits: the same
    * GramAgg one-pass moments + Jacobi eigensolve as
    * [[pcaProject]]/[[pcaExplained]], returning everything the audits
    * check (mean, trace, top-k eigenvalues, sign-canonical
    * eigenvectors).
    */
  private def pcaSolve(s: SparkSession, dir: String, k: Int)
      : (Long, Array[Double], Double, Seq[Double], Seq[Array[Double]]) = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val e = emb(s, dir).select(col("embedding").cast("array<double>").as("x"))
    val gram = udaf(graft.functions.GramAgg, ExpressionEncoder[Seq[Double]]())
    val m = e.agg(gram(col("x")).as("m"))
      .select(col("m.n"), col("m.s"), col("m.g")).head()
    val nL = m.getLong(0)
    val n = nL.toDouble
    val sumv = m.getSeq[Double](1).toArray
    val g = m.getSeq[Double](2).toArray
    val d = sumv.length
    val mean = sumv.map(_ / n)
    val cov = Array.tabulate(d * d)(i => g(i) / n - mean(i / d) * mean(i % d))
    val (eigVals, eigVecs) = jacobiEigen(cov, d)
    val trace = (0 until d).map(i => cov(i * d + i)).sum
    val top = eigVals.zipWithIndex.sortBy { case (v, i) => (-v, i) }.take(k)
    val comps: Seq[Array[Double]] = top.map { case (_, ci) =>
      val v = Array.tabulate(d)(r => eigVecs(r * d + ci))
      val mi = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(mi) < 0) v.map(x => -x) else v
    }.toSeq
    (nL, mean, trace, top.map(_._1).toSeq, comps)
  }

  /** Registry spelling of `embed_pca_explained` since r16 (the CDC
    * structural-oracle pattern): the eigensolve itself is driver-side
    * iterative fp and not SQL-replayable, but its CONTRACT is —
    * eigenvector orthonormality, non-increasing eigenvalue order,
    * explained fractions inside [0, 1] with cumulative ≤ 1, and the
    * strongest leg: each λ_j recomputed FROM THE DATA as the exact
    * decimal population variance of the component's projection scores
    * (var(x·v_j) must equal vᵀCv = λ_j up to solver precision; a
    * wrong eigenpair fails this by construction). Violation counters
    * ride beside exact columns DuckDB recomputes from raw parquet
    * (row count and the decimal-summed Σ‖x‖², the same moments the
    * PCA consumed), so the row is hash-checked; the eigenvalues stay
    * the EmbeddingSpec-pinned [[pcaExplained]] API.
    */
  def pcaExplainedAudit(s: SparkSession, dir: String, k: Int = 4): DataFrame = {
    val (nL, mean, trace, eigVals, comps) = pcaSolve(s, dir, k)
    val n = nL.toDouble
    val d = mean.length
    // exact legs + per-component decimal score moments, one pass
    val e = emb(s, dir).select(col("embedding").cast("array<double>").as("x"))
    val scoreCols = comps.zipWithIndex.flatMap { case (v, j) =>
      val mu = (0 until d).map(i => mean(i) * v(i)).sum
      val sc = dot(col("x"), lit(v)) - lit(mu)
      Seq(sum(sc.cast("decimal(30,15)")).as(s"s$j"),
        sum((sc * sc).cast("decimal(30,15)")).as(s"q$j"))
    }
    val aggRow = e.agg(
      // integer NANO grid (see pcaProjectAudit's sum_norm2_nano note):
      // engine-exact where a decimal cast can straddle a half boundary
      sum(round(dot(col("x"), col("x")) * lit(1e9)).cast("long"))
        .as("norm2_nano"),
      scoreCols: _*).head()
    val sumNorm2Nano = aggRow.getLong(0)
    val tol = 1e-9 * (math.abs(trace) + 1.0)
    val varViol = (0 until k).count { j =>
      val sSum = aggRow.getDecimal(1 + 2 * j).doubleValue()
      val qSum = aggRow.getDecimal(2 + 2 * j).doubleValue()
      val v = qSum / n - (sSum / n) * (sSum / n)
      math.abs(v - eigVals(j)) > tol
    }
    val orthoViol = (for {
      i <- 0 until k; j <- i until k
    } yield {
      val dd = (0 until d).map(t => comps(i)(t) * comps(j)(t)).sum
      val target = if (i == j) 1.0 else 0.0
      if (math.abs(dd - target) > 1e-8) 1 else 0
    }).sum
    val orderViol =
      (1 until k).count(j => eigVals(j) > eigVals(j - 1))
    val fracs = eigVals.map(_ / trace)
    val boundsViol =
      (if (fracs.exists(f => f < -1e-12 || f > 1.0 + 1e-9)) 1 else 0) +
        (if (fracs.sum > 1.0 + 1e-9) 1 else 0)
    import s.implicits._
    (0 until k).map { j =>
      (j.toLong, nL, sumNorm2Nano, orderViol.toLong, orthoViol.toLong,
        boundsViol.toLong, varViol.toLong)
    }.toDF("component", "n_vecs", "sum_norm2_nano", "eig_order_violations",
      "orthonormality_violations", "explained_bounds_violations",
      "variance_recompute_violations")
      .orderBy(col("component"))
  }

  /** DuckDB twin of [[pcaExplainedAudit]] — k grid rows, the exact
    * moments recomputed from raw parquet, the solver-contract
    * counters as constants the Spark side must reproduce.
    */
  def pcaExplainedAuditSql(k: Int = 4): String =
    s"""WITH ex AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |    CAST(SUM(CAST(ROUND(list_sum(list_transform(
      |      embedding::DOUBLE[], x -> x * x)) * 1000000000.0, 0)
      |      AS BIGINT)) AS BIGINT) AS sum_norm2_nano
      |  FROM embeddings),
      |grid AS (SELECT CAST(range AS BIGINT) AS component
      |         FROM range(0, $k))
      |SELECT component, n_vecs, sum_norm2_nano,
      |  CAST(0 AS BIGINT) AS eig_order_violations,
      |  CAST(0 AS BIGINT) AS orthonormality_violations,
      |  CAST(0 AS BIGINT) AS explained_bounds_violations,
      |  CAST(0 AS BIGINT) AS variance_recompute_violations
      |FROM grid, ex ORDER BY component""".stripMargin

  /** Registry spelling of `embed_pca_project` since r16: the per-row
    * projections are driver-eigensolve-derived (not SQL-replayable),
    * but projection GEOMETRY is checkable row by row — the energy a
    * k-dim orthonormal projection captures can never exceed the
    * centered norm (Σ_j pc_j² ≤ ‖x−μ‖², Bessel's inequality), and the
    * score columns must be mean-centered (PCA projects the CENTERED
    * data). Both ride as violation counters beside per-label exact
    * columns (row count, decimal Σ‖x‖²) that DuckDB recomputes; the
    * projections themselves stay the EmbeddingSpec-pinned
    * [[pcaProject]] API.
    */
  def pcaProjectAudit(s: SparkSession, dir: String, k: Int = 4): DataFrame = {
    val (nL, mean, trace, _, comps) = pcaSolve(s, dir, k)
    val n = nL.toDouble
    val d = mean.length
    val mu2 = (0 until d).map(i => mean(i) * mean(i)).sum
    val e = emb(s, dir).select(col("label"),
      col("embedding").cast("array<double>").as("x"))
    val pcCols = comps.zipWithIndex.map { case (v, j) =>
      val mu = (0 until d).map(i => mean(i) * v(i)).sum
      (dot(col("x"), lit(v)) - lit(mu)).as(s"pc$j")
    }
    val projected = e.select(col("label") +: dot(col("x"), col("x")).as("xx")
      +: dot(col("x"), lit(mean)).as("xm") +: pcCols: _*)
    val energy = (0 until k).map(j => col(s"pc$j") * col(s"pc$j"))
      .reduce(_ + _)
    val cnorm2 = col("xx") - lit(2.0) * col("xm") + lit(mu2)
    // centering: per-component decimal score sums, one driver row
    val centerAgg = projected.agg(
      count(lit(1)).as("cnt"),
      (0 until k).map(j =>
        sum(col(s"pc$j").cast("decimal(30,15)")).as(s"s$j")): _*).head()
    val cTol = 1e-9 * (math.abs(trace) + 1.0)
    val centerViol = (0 until k).count { j =>
      math.abs(centerAgg.getDecimal(1 + j).doubleValue() / n) > cTol
    }
    projected
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        // integer NANO grid, not decimal->double: per-row double->
        // DECIMAL(30,15) casts can land exactly on a rounding half
        // (float32-origin values are dyadic) where the engines' half
        // rules differ; round(x*1e9) of the SAME double under the
        // shared positive-half-away rule is engine-exact, and the
        // BIGINT sum is order-free. Headroom: ~1e11/row, 2^63 total.
        sum(round(col("xx") * lit(1e9)).cast("long")).as("sum_norm2_nano"),
        sum(when(energy > cnorm2 + lit(1e-9) * (cnorm2 + lit(1.0)), 1L)
          .otherwise(0L)).as("contraction_violations"))
      .withColumn("centering_violations", lit(centerViol.toLong))
      .orderBy(col("label"))
  }

  /** DuckDB twin of [[pcaProjectAudit]] — per-label exact legs from
    * raw parquet plus the geometry-contract constants.
    */
  val pcaProjectAuditSql: String =
    """SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |  CAST(SUM(CAST(ROUND(list_sum(list_transform(
      |    embedding::DOUBLE[], x -> x * x)) * 1000000000.0, 0)
      |    AS BIGINT)) AS BIGINT) AS sum_norm2_nano,
      |  CAST(0 AS BIGINT) AS contraction_violations,
      |  CAST(0 AS BIGINT) AS centering_violations
      |FROM embeddings GROUP BY label ORDER BY label""".stripMargin

  /** Cyclic Jacobi eigendecomposition of a symmetric d×d matrix
    * (row-major). Returns (eigenvalues, eigenvector matrix with
    * eigenvector j in COLUMN j). Textbook rotation sweep (Golub & Van
    * Loan §8.5); converges quadratically — 30 sweeps is far past
    * machine precision for d ≤ a few hundred. Driver-side only, O(d³)
    * per sweep, never sees data rows.
    */
  private def jacobiEigen(a0: Array[Double], d: Int,
                          maxSweeps: Int = 30): (Array[Double], Array[Double]) = {
    val a = a0.clone()
    val v = new Array[Double](d * d)
    var i = 0
    while (i < d) { v(i * d + i) = 1.0; i += 1 }
    def off(): Double = {
      var s = 0.0; var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) { s += a(p * d + q) * a(p * d + q); q += 1 }
        p += 1
      }
      s
    }
    var sweep = 0
    while (sweep < maxSweeps && off() > 1e-20) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p * d + q)
          if (math.abs(apq) > 1e-18) {
            val theta = (a(q * d + q) - a(p * d + p)) / (2.0 * apq)
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * c
            var r = 0
            while (r < d) {
              val arp = a(r * d + p); val arq = a(r * d + q)
              a(r * d + p) = c * arp - sn * arq
              a(r * d + q) = sn * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p * d + r); val aqr = a(q * d + r)
              a(p * d + r) = c * apr - sn * aqr
              a(q * d + r) = sn * apr + c * aqr
              r += 1
            }
            r = 0
            while (r < d) {
              val vrp = v(r * d + p); val vrq = v(r * d + q)
              v(r * d + p) = c * vrp - sn * vrq
              v(r * d + q) = sn * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i * d + i)), v)
  }
}
