package graft

import graft.llm.{MinHashDedup, SimHashDedup}
import graft.queries.TextQueries

/** Dedup-family invariants: the candidate-generation plans must never
  * materialize the all-pairs product (no CartesianProduct /
  * BroadcastNestedLoopJoin), MinHash-LSH candidates must recover the
  * high-Jaccard pairs the exact n-gram verify finds, and SimHash must
  * assign near-identical docs nearby fingerprints.
  */
class DedupSpec extends SparkSpec {

  private def assertNoAllPairs(plan: String): Unit = {
    assert(!plan.contains("CartesianProduct"), s"all-pairs plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"all-pairs plan:\n$plan")
  }

  test("MinHash-LSH near-dup plan is bucket-joined, never all-pairs") {
    assertNoAllPairs(planOf(MinHashDedup.nearDupPairs(spark, sf)))
  }

  test("SimHash near-dup plan is bucket-joined, never all-pairs") {
    assertNoAllPairs(planOf(SimHashDedup.nearDupPairs(spark, sf)))
  }

  test("embedding LSH near-dup plan is bucket-joined, never all-pairs") {
    assertNoAllPairs(planOf(graft.queries.EmbeddingQueries.nearDupLsh(spark, sf)))
  }

  test("binned range join plans as an equi-join, never a nested loop") {
    assertNoAllPairs(planOf(graft.queries.EventQueries.rangeJoinNearby(spark, sf)))
  }

  test("MinHash-LSH recall: finds every exact-Jaccard>=0.5 same-lang pair") {
    val exact = TextQueries.dedupNgramJaccard(spark, sf).collect()
      .filter(_.getDouble(2) >= 0.5)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = MinHashDedup.nearDupPairs(spark, sf, minJaccard = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // banding (16 bands x 4 rows) catches s>=0.5 pairs w.p. ~1-(1-s^4)^16
    // >= 98.7% at s=0.5 and ->1 fast above; the planted corpus dups are
    // near-identical, so exact recall is expected here.
    assert(exact.subsetOf(lsh),
      s"LSH missed pairs: ${exact -- lsh}")
  }

  test("bucket/cell caps plan as map-side WindowGroupLimit, not post-shuffle filter") {
    // rank-filter caps only bound the EXCHANGE when InsertWindowGroupLimit
    // fires, and it declines above windowGroupLimitThreshold (1000) — the
    // original 4096 defaults planned a full-shuffle-then-filter, which is
    // exactly the hot-bucket failure the cap exists to prevent
    val lsh = planOf(MinHashDedup.nearDupPairs(spark, sf))
    assert(lsh.contains("WindowGroupLimit"),
      s"LSH bucket cap lost its map-side group limit:\n$lsh")
    import spark.implicits._
    // the rule also skips when the input's maxRows is under the cap
    // (a group limit would be a no-op), so the fixture must exceed it
    val cells = (1L to 5L).map(i => (i, 0, Seq(1.0, 0.0), 1.0))
      .toDF("vec_id", "cell", "v", "nrm")
    val sem = planOf(
      graft.queries.EmbeddingQueries.semDedupCandidates(cells, 2))
    assert(sem.contains("WindowGroupLimit"),
      s"SemDeDup cell cap lost its map-side group limit:\n$sem")
  }

  test("LSH cap over windowGroupLimitThreshold fails FAST, not silently") {
    // maxBucket=1001 with the default threshold (1000) would plan the
    // cap as a post-shuffle filter — identical rows, scale posture
    // silently gone. nearDupPairs now guards the coupling at runtime.
    val e = intercept[IllegalArgumentException] {
      MinHashDedup.nearDupPairs(spark, sf, 0.2, maxBucket = 1001)
    }
    assert(e.getMessage.contains("windowGroupLimitThreshold"),
      s"guard fired but without the diagnostic: ${e.getMessage}")
    // a rule-disabling threshold (-1) must trip the guard too — there
    // is no cap value that keeps the map-side contract then
    val old = spark.conf.getOption(
      "spark.sql.optimizer.windowGroupLimitThreshold")
    try {
      spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "-1")
      intercept[IllegalArgumentException] {
        MinHashDedup.nearDupPairs(spark, sf, 0.2, maxBucket = 10)
      }
    } finally old match {
      case Some(v) =>
        spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", v)
      case None =>
        spark.conf.unset("spark.sql.optimizer.windowGroupLimitThreshold")
    }
  }

  test("MinHash-LSH hot bucket capped: degenerate corpus stays linear, still chains") {
    import spark.implicits._
    // 40 identical docs: every band collapses to ONE (band, bucket), the
    // degenerate pile the cap exists for. Uncapped the bucket self-join
    // yields 40·39/2 = 780 pairs; with maxBucket = 4 only the 4
    // lowest-id heads pair outward, so candidates ≤ maxBucket·n — and
    // every non-head doc still chains into the dup cluster through a
    // head (the cluster survives capping, the quadratic does not).
    val base = (1 to 30).map(i => s"common$i").mkString(" ")
    val docs = (0L until 40L).map(i => (i, base, "en", "fix", base.length.toLong))
    val tmp = java.nio.file.Files.createTempDirectory("graft_hotbucket").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = MinHashDedup.nearDupPairs(spark, tmp, 0.2, maxBucket = 4).collect()
    assert(pairs.length <= 4 * 40,
      s"cap leaked: ${pairs.length} pairs > maxBucket*n")
    assert(pairs.length < 780, "cap did not reduce the quadratic pile")
    val bs = pairs.map(r => r.getLong(1)).toSet ++ pairs.map(r => r.getLong(0)).toSet
    assert((0L until 40L).toSet == bs,
      s"capped pile lost docs from the dup cluster: missing ${(0L until 40L).toSet -- bs}")
    pairs.foreach(r => assert(r.getDouble(2) == 1.0, s"identical docs, jaccard<1: $r"))
    // recall guard: on the real corpus the cap is far above any bucket,
    // so a tightly-capped run must return EXACTLY the default result
    val dflt = MinHashDedup.nearDupPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val capped = MinHashDedup.nearDupPairs(spark, sf, 0.2, maxBucket = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(dflt == capped, "cap changed results on a non-degenerate corpus")
    // observability: the overflow audit must report the planted pile in
    // EVERY band (40 identical docs = one size-40 bucket per band) with
    // the exact dropped count, and report NOTHING on the real corpus at
    // the default cap (the recall-guard assert above is only honest if
    // an empty audit really does mean "cap changed nothing")
    val audit = MinHashDedup.bucketOverflowAudit(spark, tmp, 4).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
    assert(audit.length == MinHashDedup.Bands,
      s"pile should overflow once per band: ${audit.toSeq}")
    assert(audit.forall { case (_, size, dropped) => size == 40L && dropped == 36L },
      s"audit sizes wrong: ${audit.toSeq}")
    assert(audit.map(_._1).toSet == (0 until MinHashDedup.Bands).toSet,
      s"audit missed a band: ${audit.toSeq}")
    assert(MinHashDedup.bucketOverflowAudit(spark, sf).isEmpty,
      "real corpus overflows the default cap — recall loss now silent")
    // the registered census spelling: never empty, dropped_docs = 0
    // across the real corpus at the default cap, and the planted pile's
    // overflow rows sort to the top with the same exact counts
    val census = MinHashDedup.bucketCensus(spark, sf).collect()
    assert(census.nonEmpty && census.forall(_.getLong(3) == 0L),
      s"census claims drops on the healthy corpus: ${census.toSeq}")
    val pileCensus = MinHashDedup.bucketCensus(spark, tmp, 20, 4).collect()
    assert(pileCensus.take(MinHashDedup.Bands)
        .forall(r => r.getLong(2) == 40L && r.getLong(3) == 36L),
      s"pile census lost the overflow rows: ${pileCensus.toSeq}")
    // the registered conservation audit: per band, memberships equal
    // the pile size and the planted overflow is COUNTED (36 per band
    // at cap 4) — the violation column has teeth; on the real corpus
    // at the default cap it must be 0 everywhere
    val cons = MinHashDedup.bucketConservationAudit(spark, tmp, 4).collect()
    assert(cons.length == MinHashDedup.Bands)
    assert(cons.forall(r => r.getLong(1) == 40L && r.getLong(2) == 36L),
      s"conservation audit wrong on the pile: ${cons.toSeq}")
    assert(MinHashDedup.bucketConservationAudit(spark, sf).collect()
      .forall(_.getLong(2) == 0L), "real corpus drops at default cap")
  }

  test("signatureAudit: invariants have teeth on a planted dup-text fixture") {
    import spark.implicits._
    // 3 copies of one text + 2 distinct texts: the audit must COUNT the
    // dup group (n_dup_texts = 1), sign its members identically
    // (dup_sig_mismatches = 0 is an invariant, not vacuous here), and
    // conserve the shingle total (distinct 3-grams: 8 + 3 + 4)
    val a = (1 to 10).map(i => s"a$i").mkString(" ") // 8 shingles
    val b = "b1 b2 b3 b4 b5"                         // 3 shingles
    val c = "c1 c2 c3 c4 c5 c6"                      // 4 shingles
    val docs = Seq((0L, a), (1L, a), (2L, a), (3L, b), (4L, c), (5L, "x y"))
      .map { case (i, t) => (i, t, "en", "fix", t.length.toLong) }
    val tmp = java.nio.file.Files.createTempDirectory("graft_sigaudit").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = MinHashDedup.signatureAudit(spark, tmp).collect().head
    assert(r.getLong(0) == 5L, s"n_docs ${r.getLong(0)} (the 2-word doc drops)")
    assert(r.getLong(1) == 3 * 8 + 3 + 4, s"n_shingles_total ${r.getLong(1)}")
    assert(r.getLong(2) == 1L, s"n_dup_texts ${r.getLong(2)}")
    assert(r.getLong(3) == 0L && r.getLong(4) == 0L && r.getLong(5) == 0L,
      s"violations on a healthy fixture: $r")
  }

  test("MinHash-LSH precision: every reported pair passes exact verify") {
    val pairs = MinHashDedup.nearDupPairs(spark, sf).collect()
    assert(pairs.nonEmpty, "corpus should contain planted near-dups")
    pairs.foreach { r =>
      assert(r.getDouble(2) >= 0.2, s"pair below verify threshold: $r")
      assert(r.getLong(0) < r.getLong(1), "pair not canonicalized a<b")
    }
  }

  test("SimHash rotation probing finds a near-dup differing INSIDE the prefix") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // fingerprints differing only in bit 60 — inside the top-16 window,
    // so single-prefix bucketing would separate them; rotation table
    // t=1 (bits 32..47 window... i.e. a window excluding bit 60) must
    // still bucket them together. A far fingerprint guards precision.
    val base = 0x0123456789abcdefL
    val fps = Seq(
      (1L, base),
      (2L, base ^ (1L << 60)),
      (3L, ~base))
    val pairs = graft.llm.SimHashDedup
      .nearDupPairsOf(fps.toDF("doc_id", "simhash"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"rotation probing must find exactly the planted cross-prefix pair, got $pairs")
  }

  test("SimHash: identical texts collide, different texts differ") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely unrelated text about database engines and parquet"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), graft.llm.SimHash64.simhash64(col("text")).as("fp"))
    val fp = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(3L)) > 8)
  }

  test("prefix-filtered Jaccard join plans as an equi-join, never all-pairs") {
    assertNoAllPairs(planOf(TextQueries.dedupPrefixJaccard(spark, sf)))
  }

  test("prefix-filtered Jaccard equals naive all-pairs (candidate completeness)") {
    import org.apache.spark.sql.functions._
    // corpus-wide (no golden-bucket bound): prefix filtering must lose
    // NOTHING vs the quadratic ground truth, computed driver-side here
    val got = TextQueries.dedupPrefixJaccard(spark, sf, maxDocId = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val sets = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), MinHashDedup.hashedShingles(col("ws")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
    val naive = (for {
      (a, as) <- sets; (b, bs) <- sets if a < b
      i = (as & bs).size.toDouble
      j = i / (as.size + bs.size - i) if j >= 0.2
    } yield (a, b, j)).toSet
    assert(naive.nonEmpty, "corpus should contain planted near-dups")
    assert(got == naive,
      s"missed: ${naive -- got}\nextra: ${got -- naive}")
  }

  test("prefix length is the exact integer ceil-div (boundary-pair regression)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // A: 12 distinct words -> 10 distinct shingles; B: A's last 4 words
    // -> 2 shingles, both shared with A. Every non-shared shingle of A
    // is a df=1 singleton, so rarity ordering puts the two shared
    // (df=2) shingles at positions 9-10 of A. J = 2/(10+2-2) = 0.2 is
    // exactly at threshold, and the pair is visible ONLY through
    // position 9 = the safe minimum n - ceil(n/5) + 1. The FP-truncated
    // prefix this test regresses against computed 8 and lost the pair.
    val aWords = (1 to 12).map(i => s"w$i")
    val a = aWords.mkString(" ")
    val b = aWords.takeRight(4).mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("graft_prefix").toString
    Seq((0L, a, "en", "fix", a.length.toLong),
        (1L, b, "en", "fix", b.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextQueries.dedupPrefixJaccard(spark, tmp).collect()
    assert(got.length == 1, s"boundary pair lost: ${got.mkString(",")}")
    assert(got.head.getLong(0) == 0L && got.head.getLong(1) == 1L)
    assert(got.head.getDouble(2) == 0.2)
  }

  test("containment finds a quoted-whole small doc that Jaccard structurally misses") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // doc 1 = 40 words (38 shingles); doc 0 = a 6-word passage quoted
    // from its middle (4 shingles, ALL shared). Jaccard = 4/38+4-4 =
    // 0.105 — below every Jaccard dedup threshold — but overlap
    // coefficient = 4/4 = 1.0: the exact sub-document duplicate class
    // this operator exists for. Doc 2 is a disjoint negative control.
    val big = (1 to 40).map(i => s"w$i").mkString(" ")
    val small = (10 to 15).map(i => s"w$i").mkString(" ")
    val other = (1 to 20).map(i => s"z$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("graft_contain").toString
    Seq((0L, small, "en", "fix", small.length.toLong),
        (1L, big, "en", "fix", big.length.toLong),
        (2L, other, "en", "fix", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextQueries.dedupContainment(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((0L, 1L, 1.0)),
      s"containment must report exactly the planted subset pair: ${got.toSeq}")
    val jac = TextQueries.dedupNgramJaccard(spark, tmp).collect()
      .filter(r => r.getDouble(2) >= 0.5)
    assert(!jac.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L),
      "fixture broken: the planted pair must be invisible to Jaccard>=0.5")
  }

  test("containment prefix filter is complete vs naive all-pairs") {
    import org.apache.spark.sql.functions.col
    // naive quadratic overlap on the real corpus == the prefix-filtered
    // operator's output (candidate completeness, dedupPrefixJaccard's
    // guarantee transported to the one-sided bound)
    val sets = graft.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") < 500)
      .collect().map(r => r.getLong(0) ->
        r.getString(1).split(" ").toSeq.sliding(3).filter(_.length == 3)
          .map(_.mkString("_")).toSet)
      .filter(_._2.nonEmpty).toMap
    val naive = (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a < b
      inter = (sa & sb).size.toDouble
      ov = inter / math.min(sa.size, sb.size)
      if ov >= 0.5
    } yield (a, b)).toSet
    val got = TextQueries.dedupContainment(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive, s"containment candidates diverge: missing ${naive -- got}, extra ${got -- naive}")
  }

  test("SemDeDup: planted semantic duplicate pruned, lower-id twin kept") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_semdedup").toString
    val base = graft.Tables.load(spark, sf, "embeddings")
    // twin of the lowest nonzero-norm vector, renumbered to the top id
    val twin = base.filter(col("vec_id") === 0)
      .withColumn("vec_id", lit(100000L))
    base.unionByName(twin)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = graft.queries.EmbeddingQueries
      .semDedup(spark, tmp, nCent = 4, tau = 0.95)
    assertNoAllPairs(planOf(out))
    val rows = out.collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    val planted = byId(100000L)
    assert(!planted.getBoolean(2), "identical twin must be dropped")
    assert(planted.getLong(3) == 0L, s"dup_of should be vec 0: $planted")
    assert(byId(0L).getBoolean(2), "the min-id vector of a neighborhood survives")
    assert(planted.getInt(1) == byId(0L).getInt(1), "twins share a k-means cell")
    // global invariants of the order-free min-keep rule
    rows.filter(!_.getBoolean(2)).foreach { r =>
      assert(r.getLong(3) < r.getLong(0), s"dup_of must have a lower id: $r")
    }
    rows.filter(_.getBoolean(2)).foreach(r => assert(r.isNullAt(3)))
  }

  test("SemDeDup: hot cell's candidate pairs bounded by maxCell × |cell|") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 200 near-identical vectors land in ONE k-means cell — the skew
    // case. Uncapped pairing would generate 200·199/2 = 19900 pairs;
    // the head×all cap must keep it ≤ maxCell·|cell| and stay EXACT
    // (identical pair set) once maxCell covers the cell.
    val n = 200
    val cells = (0 until n).map { i =>
      (i.toLong, 0, Seq(1.0, 0.001 * i), math.sqrt(1.0 + 0.000001 * i * i))
    }.toDF("vec_id", "cell", "v", "nrm")
    val capped = graft.queries.EmbeddingQueries
      .semDedupCandidates(cells, maxCell = 4)
    val nCapped = capped.count()
    assert(nCapped <= 4L * n, s"cap leaked: $nCapped pairs")
    // head = 4 lowest ids, paired against every higher id exactly once
    // Σ_{i=0..3} (n-1-i) = 4(n-1) - 6
    assert(nCapped == 4L * (n - 1) - 6,
      s"expected head×all pair count, got $nCapped")
    val full = graft.queries.EmbeddingQueries
      .semDedupCandidates(cells, maxCell = n)
    assert(full.count() == n.toLong * (n - 1) / 2,
      "uncapped head must reproduce ALL a<b pairs exactly once")
    // the cap must ride the map-side WindowGroupLimit, not a full sort
    val plan = planOf(capped)
    assert(plan.contains("WindowGroupLimit"),
      s"head ranking must pre-prune before the exchange:\n$plan")
  }

  test("exactSubstringDedup: spans replay a brute-force coverage scan") {
    val k = 8
    val docsRows = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    // corpus-wide k-gram occurrence counts (same doc or cross-doc)
    val counts = scala.collection.mutable.Map.empty[String, Int]
      .withDefaultValue(0)
    for ((_, w) <- docsRows; i <- 0 to w.length - k)
      counts(w.slice(i, i + k).mkString(" ")) += 1
    // per-doc maximal covered runs via a literal boolean coverage array —
    // an independent spelling of the query's interval merge
    val expected = docsRows.toSeq.flatMap { case (id, w) =>
      val starts = (0 to w.length - k)
        .filter(i => counts(w.slice(i, i + k).mkString(" ")) >= 2)
      if (starts.isEmpty) None
      else {
        val covered = Array.fill(w.length)(false)
        for (i <- starts; j <- i until i + k) covered(j) = true
        val runs = scala.collection.mutable.ListBuffer.empty[Long]
        var cur = 0L
        for (c <- covered) {
          if (c) cur += 1 else { if (cur > 0) runs += cur; cur = 0 }
        }
        if (cur > 0) runs += cur
        Some((id, w.length.toLong, runs.length.toLong, runs.max, runs.sum))
      }
    }
    val top = expected
      .map { case (id, n, ns, mx, dt) => (id, n, ns, mx, dt, dt.toDouble / n) }
      .sortBy { case (id, _, _, _, _, sh) => (-sh, id) }.take(20)
    val got = TextQueries.exactSubstringDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == top, s"exact-substring census diverges from brute force")
    assert(got.nonEmpty, "fixture must contain duplicated 8-grams")
    assert(got.forall { case (_, n, _, mx, dt, sh) =>
      mx >= k && dt >= mx && dt <= n && sh > 0.0 && sh <= 1.0
    }, "span invariants violated")
  }

  test("typoPairs: FastSS candidates are complete vs brute-force ed<=1; no all-pairs plan") {
    import org.apache.spark.sql.functions._
    val df = graft.queries.Relational.typoPairs(spark, sf)
    assertNoAllPairs(planOf(df))
    val got = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // brute force: every vocabulary pair within edit distance 1
    val vocab = graft.Tables.load(spark, sf, "part")
      .select(explode(concat(split(col("p_name"), " "),
        split(col("p_type"), " "))).as("tok"))
      .groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    def ed(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = for {
      ((ta, ca), i) <- vocab.zipWithIndex
      (tb, cb) <- vocab.drop(i + 1)
      if ed(ta, tb) <= 1
    } yield (ta, tb, ca, cb, ed(ta, tb).toLong)
    assert(got == expected.toSeq,
      "FastSS pairs diverge from the brute-force edit-distance scan")
    assert(got.nonEmpty, "fixture vocabulary must contain ed<=1 pairs")
  }

  test("exact dedup keeps the minimum doc_id per distinct text") {
    val rows = TextQueries.dedupExact(spark, sf).collect()
    val total = graft.Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getLong(2)).sum == total)   // copies partition the corpus
    assert(rows.map(_.getLong(1)).distinct.length == rows.length)
  }

  test("incremental dedup: broadcast anti join; screened-out docs have a base twin") {
    val df = TextQueries.dedupIncremental(spark, sf)
    // the incoming side must NOT shuffle: digest set broadcasts
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti join:\n$plan")
    // survivors are exactly the incoming docs whose fingerprint is absent
    // from the base — recompute both sides independently
    import org.apache.spark.sql.functions._
    def fps(lo: Long, hi: Long) = graft.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select(col("doc_id"),
        md5(concat_ws(" ", slice(split(col("text"), " "), 1, 8))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val base = fps(0L, 400L).map(_._2).toSet
    val expected = fps(400L, Long.MaxValue).collect {
      case (id, fp) if !base.contains(fp) => id
    }.toSet
    assert(df.collect().map(_.getLong(0)).toSet == expected)
  }

  test("paragraph-exact dedup: newline split, normalization, short-tail drop") {
    import spark.implicits._
    // the gate corpus ships single-line docs, so the newline path,
    // messy-whitespace normalization, and sub-minWords tail drop are
    // exercised ONLY here, against hand-computed expectations
    val eight = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (0L, s"$eight\n$eight", "en", "fix"),             // 2 identical paras
      (1L, "  ALPHA   beta gamma delta epsilon zeta eta THETA  ", "en", "fix"),
      (2L, "one two three four five six seven eight nine ten", "en", "fix"),
      (3L, "solo", "en", "fix"),                        // 1-word tail: dropped
      (4L, "x y\nx y", "en", "fix"))                    // same-doc dup paras
      .map { case (id, t, l, src) => (id, t, l, src, t.length.toLong) }
    val tmp = java.nio.file.Files.createTempDirectory("graft_paradedup").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val share = TextQueries.dedupExactParagraph(spark, tmp).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(share == Map(
      0L -> ((2L, 2L, 1000000L)),   // both paras recur (each other + doc 1)
      1L -> ((1L, 1L, 1000000L)),   // normalizes to doc 0's para
      2L -> ((2L, 0L, 0L)),         // 8-word block + unique 2-word tail
      4L -> ((2L, 2L, 1000000L))),  // within-doc recurrence counts too
      s"per-doc shares: $share")    // doc 3: zero blocks => absent
    val top = TextQueries.dedupParagraphTop(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(top.toSeq == Seq((eight, 2L, 3L), ("x y", 1L, 2L)),
      s"top blocks: ${top.toSeq}")
    assertNoAllPairs(planOf(TextQueries.dedupExactParagraph(spark, tmp)))
  }
}
