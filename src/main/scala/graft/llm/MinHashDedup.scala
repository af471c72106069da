package graft.llm

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection over `documents` — the
  * 100 TB-viable candidate-generation stage for fuzzy dedup.
  *
  * Pipeline (all built-in, codegen'd HOFs; no UDFs, no cross join):
  *   1. shingle: 3-gram word shingles per doc (distinct)
  *   2. minhash: P=64 permutations; sig_p = min over shingles of
  *      xxhash64(p, shingle)
  *   3. band: 16 bands x 4 rows; band hash = xxhash64 of the 4 sig slots
  *   4. bucket join: posexplode (band, bucket) -> self-join on
  *      (band, bucket) -> distinct candidate pairs
  *   5. verify: exact shingle-set Jaccard on candidates only
  *
  * Only shuffles: the (band,bucket) exchange and the final distinct —
  * both keyed, partial-aggregated, and skew-bounded by bucket size. The
  * all-pairs product is never materialized (asserted in DedupSpec by
  * checking the physical plan contains no CartesianProduct /
  * BroadcastNestedLoopJoin).
  *
  * Hashes are fixed-seed, so results are deterministic across runs and
  * cluster sizes.
  */
object MinHashDedup {

  val NumPerms = 64
  val Bands = 16
  val RowsPerBand: Int = NumPerms / Bands

  /** distinct 3-gram word shingles of a text column */
  def shingles(textCol: Column): Column = {
    val ws = split(textCol, " ")
    array_distinct(
      transform(
        sequence(lit(0), size(ws) - 3),
        i => concat_ws("_", element_at(ws, i + 1), element_at(ws, i + 2),
          element_at(ws, i + 3))))
  }

  /** 64-slot MinHash signature of a shingle-array column */
  def signature(sh: Column): Column =
    array((0 until NumPerms).map { p =>
      array_min(transform(sh, s => xxhash64(lit(p), s)))
    }: _*)

  /** 16 band hashes over a signature column */
  def bandHashes(sig: Column): Column =
    array((0 until Bands).map { b =>
      xxhash64((0 until RowsPerBand)
        .map(r => element_at(sig, b * RowsPerBand + r + 1)): _*)
    }: _*)

  /** exact Jaccard of two distinct-element array columns */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Candidate pairs from LSH banding, verified with exact Jaccard.
    * Output: (a_id, b_id, jaccard) for pairs with jaccard >= minJaccard.
    */
  def nearDupPairs(s: SparkSession, dir: String,
                   minJaccard: Double = 0.2): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .withColumn("bands", bandHashes(signature(col("sh"))))
    val buckets = d.select(col("doc_id"), col("sh"),
      posexplode(col("bands")).as(Seq("band", "bucket")))
    val a = buckets.select(col("band"), col("bucket"),
      col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val b = buckets.select(col("band"), col("bucket"),
      col("doc_id").as("b_id"), col("sh").as("b_sh"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_sh"), col("b_sh"))
      .distinct() // a pair may share several bands
      .select(col("a_id"), col("b_id"),
        jaccard(col("a_sh"), col("b_sh")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Per-doc MinHash summary (deterministic; one row per doc): the
    * signature's first slot and its band hashes — used by DedupSpec and
    * as a registered rows-only query exercising the signature path.
    */
  def signatures(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .withColumn("sig", signature(col("sh")))
      .withColumn("bands", bandHashes(col("sig")))
      .select(col("doc_id"),
        element_at(col("sig"), 1).as("sig0"),
        element_at(col("bands"), 1).as("band0"))
      .orderBy(col("doc_id"))
}
