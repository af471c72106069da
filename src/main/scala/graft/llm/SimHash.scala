package graft.llm

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash document fingerprint as a native Catalyst Expression.
  *
  * SimHash (Charikar 2002): hash every token to 64 bits; for each bit
  * position, vote +1/-1 by the bit value across tokens; the fingerprint
  * takes the sign of each vote. Near-duplicate texts differ in a few bits
  * (small Hamming distance), so dedup = group by a fingerprint prefix and
  * compare Hamming distance within buckets — no pairwise scan.
  *
  * A custom Expression (not a Scala UDF) keeps null handling and
  * serialization inside Catalyst; the per-token hash is a standard
  * FNV-1a 64-bit over UTF-8 bytes, so the fingerprint is deterministic
  * everywhere. CodegenFallback is acceptable here: the expression is
  * evaluated once per document, not in a hot inner join loop.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val votes = new Array[Int](64)
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) {
          val h = SimHash64.fnv1a64(text, start, i)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** FNV-1a 64-bit over the UTF-16 chars' low bytes is NOT enough for
    * non-ASCII; hash real UTF-8 bytes of the slice.
    */
  private[llm] def fnv1a64(s: String, from: Int, until: Int): Long = {
    val bytes = s.substring(from, until).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def simhash64(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.toColumn(SimHash64(ColumnBridge.toExpression(c)))
  }
}

/** SimHash dedup surface over `documents`. */
object SimHashDedup {
  import SimHash64.simhash64

  /** Hamming distance between two long fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Per-document fingerprint + 16-bit prefix bucket (deterministic). */
  def fingerprints(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), simhash64(col("text")).as("simhash"))
      .withColumn("bucket16", shiftrightunsigned(col("simhash"), 48))
      .orderBy(col("doc_id"))

  /** Number of rotation tables probed by nearDupPairs. With 4 disjoint
    * 16-bit windows covering the 64-bit fingerprint, any pair within
    * Hamming distance 3 is GUARANTEED to collide in at least one table
    * (pigeonhole: <=3 differing bits touch <=3 of the 4 windows);
    * larger distances collide with high probability. One table alone
    * misses any near-dup whose differing bits land inside the prefix.
    */
  val ProbeTables = 4

  /** Rotation-table near-dup pairs over a `(doc_id, simhash)` frame:
    * for table t, the bucket key is the top 16 bits of the fingerprint
    * rotated left by 16*t — i.e. each table indexes a different 16-bit
    * window. Candidates = same (table, bucket); verify = Hamming <=
    * maxHamming. The join carries only (id, fp) — 16 bytes — and the
    * pair count is bounded by bucket collisions, never |docs|^2.
    */
  def nearDupPairsOf(fp: DataFrame, maxHamming: Int): DataFrame = {
    val windows = array((0 until ProbeTables).map { t =>
      val rot = if (t == 0) col("simhash")
        else shiftleft(col("simhash"), 16 * t)
          .bitwiseOR(shiftrightunsigned(col("simhash"), 64 - 16 * t))
      shiftrightunsigned(rot, 48)
    }: _*)
    val probes = fp.select(col("doc_id"), col("simhash"),
      posexplode(windows).as(Seq("tbl", "bucket")))
    val a = probes.select(col("tbl"), col("bucket"),
      col("doc_id").as("a_id"), col("simhash").as("a_fp"))
    val b = probes.select(col("tbl"), col("bucket"),
      col("doc_id").as("b_id"), col("simhash").as("b_fp"))
    a.join(b, Seq("tbl", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_fp"), col("b_fp"))
      .dropDuplicates("a_id", "b_id") // a pair may collide in several tables
      .select(col("a_id"), col("b_id"),
        hamming(col("a_fp"), col("b_fp")).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** nearDupPairsOf over the documents table's SimHash fingerprints. */
  def nearDupPairs(s: SparkSession, dir: String, maxHamming: Int = 8): DataFrame =
    nearDupPairsOf(
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), simhash64(col("text")).as("simhash")),
      maxHamming)

  /** Registry spelling of `dedup_simhash` since r17 (the
    * [[MinHashDedup.nearDupPairsAudit]] recall-contract pattern,
    * VERDICT r16 item 2): the fingerprints themselves are
    * FNV-1a-dependent and not SQL-replayable, but the detector's
    * RECALL CONTRACT against the oracle-checked exact leg is — every
    * exact 3-gram-Jaccard ≥ 0.8 pair (recomputed by DuckDB via the
    * `dedup_ngram_jaccard` SQL) must be reported by the 4-table
    * rotation probe at `maxHamming` (`missed_true_pairs` pinned 0),
    * and no reported pair may exceed the Hamming threshold
    * (`over_threshold_reported` pinned 0, the verify-stage
    * consistency leg). The probability argument: planted
    * near-identicals share almost every token, so per bit the vote
    * margin flips only where the few differing tokens outvote the
    * shared mass — empirically the true pairs at both gate SFs sit at
    * Hamming ≤ 3, inside the band where the 4 disjoint 16-bit windows
    * GUARANTEE a collision (pigeonhole, see [[ProbeTables]]); the
    * 0.8-Jaccard → small-Hamming link itself is the corpus property
    * this pin makes observable (a drifting corpus turns the gate red
    * rather than silently losing recall). Exact columns (pair count,
    * id checksum) are recomputed by DuckDB from raw text; the pair
    * list and fingerprint APIs stay DedupSpec-pinned
    * ([[nearDupPairs]], [[fingerprints]]).
    */
  def nearDupPairsAudit(s: SparkSession, dir: String,
                        maxHamming: Int = 8): DataFrame = {
    val pairs = nearDupPairs(s, dir, maxHamming)
    val truePairs = graft.queries.TextQueries.dedupNgramJaccard(s, dir)
      .filter(col("jaccard") >= 0.8)
      .select(col("a_id"), col("b_id"))
    // coalesce: an empty frame's sum is NULL, but the contract
    // constant in the oracle is 0
    val verify = pairs.agg(
      coalesce(sum(when(col("hamming") > maxHamming, 1L).otherwise(0L)), lit(0L))
        .as("over_threshold_reported"))
    truePairs
      .join(pairs.select(col("a_id"), col("b_id"), lit(1L).as("hit")),
        Seq("a_id", "b_id"), "left")
      .agg(count(lit(1)).as("n_true_pairs"),
        sum(col("a_id") + col("b_id")).as("true_pair_id_sum"),
        coalesce(sum(when(col("hit").isNull, 1L).otherwise(0L)), lit(0L))
          .as("missed_true_pairs"))
      .crossJoin(broadcast(verify))
  }

  /** DuckDB twin of [[nearDupPairsAudit]]: the exact ≥ 0.8 pair set
    * from raw documents (same CTEs as the oracle-checked
    * `dedup_ngram_jaccard`), the recall/verify counters as contract
    * constants.
    */
  val nearDupPairsAuditSql: String =
    s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_true_pairs,
      |  CAST(SUM(a_id + b_id) AS BIGINT) AS true_pair_id_sum,
      |  CAST(0 AS BIGINT) AS missed_true_pairs,
      |  CAST(0 AS BIGINT) AS over_threshold_reported
      |FROM (${graft.queries.TextQueries.dedupNgramJaccardSql
               .replace("\n", "\n|  ")}) t
      |WHERE jaccard >= 0.8""".stripMargin
}
