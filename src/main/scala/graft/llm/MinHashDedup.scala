package graft.llm

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection over `documents` — the
  * 100 TB-viable candidate-generation stage for fuzzy dedup.
  *
  * Pipeline (all built-in, codegen'd; no UDFs, no cross join):
  *   1. shingle: 3-gram word shingles per doc, EXPLODED to rows
  *   2. minhash: P=64 permutations computed as ONE hash-aggregation —
  *      `groupBy(doc_id).agg(min(xxhash64(p, shingle)) for p <- 0..63)`.
  *      Partial (map-side) min-combine keeps the shuffle at one row of
  *      64 longs per doc regardless of document size, and the whole
  *      stage is codegen'd — unlike a higher-order `transform` per
  *      permutation, which evaluates lambdas interpreted.
  *   3. band: 16 bands x 4 rows; band hash = xxhash64 of the 4 sig slots
  *   4. bucket join: posexplode (band, bucket) -> self-join on
  *      (band, bucket) carrying ONLY doc ids -> dropDuplicates(a,b).
  *      The shuffle payload is (band, bucket, id) — never the shingle
  *      sets — so exchange size is bands x ids, not bands x documents.
  *   5. verify: join the distinct candidate pairs back to the shingle
  *      sets (hash join on id) and compute exact Jaccard on candidates
  *      only.
  *
  * The all-pairs product is never materialized (asserted in DedupSpec by
  * checking the physical plan contains no CartesianProduct /
  * BroadcastNestedLoopJoin). Hashes are fixed-seed, so results are
  * deterministic across runs and cluster sizes.
  */
object MinHashDedup {

  val NumPerms = 64
  val Bands = 16
  val RowsPerBand: Int = NumPerms / Bands

  /** Distinct 3-gram word shingles of a PRE-SPLIT words column, hashed
    * straight to sorted 64-bit longs — `xxhash64(w1, w2, w3)` per
    * position, no intermediate concatenated strings.
    *
    * `ws` MUST be its own projected column (split once per row), never
    * an inline `split(...)`: an inline split gets re-evaluated inside
    * every lambda element on the interpreted path (only whole-stage
    * codegen CSEs it away), turning shingling O(words^2) whenever a
    * stage falls back from codegen — observed as a 40x blowup.
    */
  def hashedShingles(ws: Column): Column =
    when(size(ws) >= 3,
      array_sort(array_distinct(
        transform(
          sequence(lit(0), size(ws) - 3),
          i => xxhash64(element_at(ws, i + 1), element_at(ws, i + 2),
            element_at(ws, i + 3))))))
      .otherwise(array().cast("array<bigint>"))

  /** (doc_id, sh) — the shingle set per doc as sorted 64-bit hashes:
    * integer merge-compare in the verify stage, 8 bytes per shingle on
    * the wire (Jaccard is unchanged w.h.p. — a collision within one
    * pair is ~2^-50 at these set sizes).
    */
  private def shingleSets(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), hashedShingles(col("ws")).as("sh"))

  /** One row per doc with columns h0..h63: the MinHash signature,
    * computed as a single partial-aggregated groupBy over exploded
    * shingles (see class doc).
    */
  def signatureCols(s: SparkSession, dir: String): DataFrame = {
    val exploded = shingleSets(s, dir)
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val aggs = (0 until NumPerms).map(p => min(xxhash64(lit(p), col("s"))).as(s"h$p"))
    exploded.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** 16 band hashes as an array column over the h0..h63 signature cols */
  private def bandArray: Column =
    array((0 until Bands).map { b =>
      xxhash64((0 until RowsPerBand).map(r => col(s"h${b * RowsPerBand + r}")): _*)
    }: _*)

  /** exact Jaccard of two SORTED distinct-long array columns:
    * i / (|A| + |B| - i) with a codegen'd merge-scan intersection count.
    */
  def jaccard(a: Column, b: Column): Column = {
    val i = graft.functions.SortedLongIntersectSize(a, b).cast("double")
    i / (size(a) + size(b) - i)
  }

  /** Candidate pairs from LSH banding, verified with exact Jaccard.
    * Output: (a_id, b_id, jaccard) for pairs with jaccard >= minJaccard.
    */
  def nearDupPairs(s: SparkSession, dir: String,
                   minJaccard: Double = 0.2): DataFrame = {
    val buckets = signatureCols(s, dir)
      .select(col("doc_id"), posexplode(bandArray).as(Seq("band", "bucket")))
    val a = buckets.select(col("band"), col("bucket"), col("doc_id").as("a_id"))
    val b = buckets.select(col("band"), col("bucket"), col("doc_id").as("b_id"))
    val cand = a.join(b, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .dropDuplicates("a_id", "b_id") // a pair may share several bands
    val sets = shingleSets(s, dir)
    cand
      .join(sets.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
      .join(sets.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        jaccard(col("a_sh"), col("b_sh")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Per-doc MinHash summary (deterministic; one row per doc): the
    * signature's first slot and its first band hash — a registered
    * rows-only query exercising the signature path.
    */
  def signatures(s: SparkSession, dir: String): DataFrame =
    signatureCols(s, dir)
      .select(col("doc_id"),
        col("h0").as("sig0"),
        xxhash64((0 until RowsPerBand).map(r => col(s"h$r")): _*).as("band0"))
      .orderBy(col("doc_id"))
}
