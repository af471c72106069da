package graft

import graft.queries.EmbeddingQueries
import org.apache.spark.sql.functions.col

/** ANN invariants: IVF-flat probing recovers most of the exact top-k
  * (recall), both variants return k-bounded ranked lists, and the IVF
  * candidate set is cell-bounded (its plan joins on cent_id, never
  * all-pairs against the full corpus).
  */
class EmbeddingSpec extends SparkSpec {

  test("ann_topk returns exactly k ranked neighbors per query") {
    val rows = EmbeddingQueries.annTopK(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 5)
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to 10L))
      // ranks are ordered by descending cosine
      val coss = rs.sortBy(_.getLong(1)).map(_.getDouble(3)).toSeq
      assert(coss == coss.sorted.reverse)
    }
  }

  test("k-means-trained IVF recall >= 80% of exact top-10 at sf0.001") {
    // Honest floor for this corpus: its embeddings are ISOTROPIC
    // (measured same-label mean cosine ≈ global mean ≈ 0 — the labels
    // carry no geometry), so IVF recall is governed by probed coverage,
    // not clustering quality. The pre-r7 pin of 0.9 was an id-coupling
    // artifact: the first-k-ids seed made the five demo QUERIES their
    // own centroids. k-means++ seeding at nProbe=8/16 measures 0.86;
    // everything is deterministic, so 0.8 has real margin.
    def keyset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = keyset(EmbeddingQueries.annTopK(spark, sf))
    val ivf = keyset(EmbeddingQueries.annIvfTopK(spark, sf))
    val recall = (exact & ivf).size.toDouble / exact.size
    info(s"IVF recall@10 = $recall")
    assert(recall >= 0.8, s"IVF recall $recall below 0.8")
  }

  test("approx ANN ladder holds its recall envelope at the BENCH scale (sf0.1)") {
    // The sf0.001 pins above falsify the approx tier only at the toy
    // corpus; the bench runs at sf0.1 (2000 vectors), where cell
    // occupancy and candidate-set geometry differ. Assert the same
    // recall@10 envelope there against the ORACLE-CHECKED exact leg
    // (ann_topk_cosine is rows+schema+hash green vs DuckDB at both
    // SFs), so the approx tier is falsifiable at the scale the
    // numbers are reported from, not just where the spec is cheap.
    val dir01 = "/root/testdata/sf0.1"
    def keyset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = keyset(EmbeddingQueries.annTopK(spark, dir01))
    assert(exact.size == 50, s"exact leg shape changed: ${exact.size}")
    // Floor 0.75, not the sf0.001 tests' 0.8: the driver REGENERATES
    // the synthetic corpus between rounds, so the measured values
    // (IVF 0.82, PQ 0.84 on the r10 tables — isotropic embeddings,
    // recall governed by probed coverage) carry regeneration variance
    // a deterministic-seed pin doesn't. 0.75 still falsifies any
    // structural break (a probing/codebook bug lands near the ~0.5
    // random-coverage baseline).
    val ivf = keyset(EmbeddingQueries.annIvfTopK(spark, dir01))
    val ivfRecall = (exact & ivf).size.toDouble / exact.size
    info(s"sf0.1 IVF recall@10 = $ivfRecall")
    assert(ivfRecall >= 0.75, s"sf0.1 IVF recall $ivfRecall below 0.75")
    val pq = keyset(EmbeddingQueries.annPqTopK(spark, dir01))
    val pqRecall = (exact & pq).size.toDouble / exact.size
    info(s"sf0.1 PQ recall@10 = $pqRecall")
    assert(pqRecall >= 0.75, s"sf0.1 PQ recall $pqRecall below 0.75")
    // composed IVF-PQ (residual ADC): measured 0.80 at sf0.1 with
    // shortlist=200 — same 0.75 floor as its parents, same
    // regeneration-variance reasoning
    val ivfpq = keyset(EmbeddingQueries.annIvfPqTopK(spark, dir01))
    val ivfpqRecall = (exact & ivfpq).size.toDouble / exact.size
    info(s"sf0.1 IVF-PQ recall@10 = $ivfpqRecall")
    assert(ivfpqRecall >= 0.75, s"sf0.1 IVF-PQ recall $ivfpqRecall below 0.75")
  }

  test("IVF-PQ plan: map-side WindowGroupLimit guards both rank cuts; no all-pairs") {
    val plan = planOf(EmbeddingQueries.annIvfPqTopK(spark, sf))
    // the shortlist (200) and top-k (10) caps are both under the
    // windowGroupLimitThreshold, so each rank window must prune
    // map-side BEFORE its exchange (the r10 LSH-cap lesson)
    assert(plan.contains("WindowGroupLimit"),
      s"expected map-side group limits:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"all-pairs plan:\n$plan")
  }

  test("IVF-PQ: residual ADC + exact re-rank recall at sf0.001; k-bounded ranked output") {
    def keyset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = keyset(EmbeddingQueries.annTopK(spark, sf))
    val rows = EmbeddingQueries.annIvfPqTopK(spark, sf).collect()
    val recall = (exact & rows.map(r => (r.getLong(0), r.getLong(2))).toSet)
      .size.toDouble / exact.size
    info(s"IVF-PQ recall@10 = $recall")
    assert(recall >= 0.75, s"IVF-PQ recall $recall below 0.75")
    // shape: exactly k ranked rows per query, dist2 ascending with rank
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 5)
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to 10L))
      val d = rs.sortBy(_.getLong(1)).map(_.getDouble(3)).toSeq
      assert(d == d.sorted, "re-ranked dist2 must ascend with rank")
    }
  }

  test("int8-quantized ANN: recall >= 90% of f64 top-10, cosine error < 0.02") {
    val f64 = EmbeddingQueries.annTopK(spark, sf).collect()
    val i8 = EmbeddingQueries.annTopKI8(spark, sf).collect()
    val f64Keys = f64.map(r => (r.getLong(0), r.getLong(2))).toSet
    val i8Keys = i8.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (f64Keys & i8Keys).size.toDouble / f64Keys.size
    info(s"int8 recall@10 = $recall")
    assert(recall >= 0.9, s"int8 recall $recall below 0.9")
    // quantized cosine tracks the exact cosine closely on shared pairs
    val exactCos = f64.map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    i8.foreach { r =>
      exactCos.get((r.getLong(0), r.getLong(2))).foreach { c =>
        assert(math.abs(r.getDouble(3) - c) < 0.02,
          s"int8 cosine ${r.getDouble(3)} vs exact $c")
      }
    }
  }

  test("k-means training moves centroids and keeps them finite") {
    val init = EmbeddingQueries.trainCodebook(spark, sf, nCent = 16, iters = 0)
    val trained = EmbeddingQueries.trainCodebook(spark, sf, nCent = 16, iters = 3)
    assert(init.map(_._1) == trained.map(_._1))        // stable cell ids
    assert(init != trained, "training must move centroids")
    trained.foreach { case (_, v) =>
      assert(v.length == init.head._2.length)
      assert(v.forall(x => !x.isNaN && !x.isInfinite))
    }
  }

  test("PQ ANN: two-stage (ADC shortlist + exact re-rank) recall vs brute-force L2") {
    // independent exact-L2 baseline, derived driver-side from the raw table
    val vecs = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .filter { case (_, v) => v.map(x => x * x).sum > 0 }
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val exact = (for {
      (qid, qv) <- vecs.filter(_._1 < 5)
      top = vecs.filter(_._1 != qid)
        .map { case (nid, v) => (d2(qv, v), nid) }
        .sortBy(identity).take(10).map(_._2)
      nid <- top
    } yield (qid, nid)).toSet
    val pq = EmbeddingQueries.annPqTopK(spark, sf).collect()
    val got = pq.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    info(s"PQ recall@10 = $recall")
    assert(recall >= 0.8, s"PQ recall $recall below 0.8")
    // the re-rank distances are the TRUE L2^2 for the emitted pairs
    // (bit-exact: same left-to-right accumulation as the spec's d2
    // via dot(q,q) - 2 dot(q,v) + dot(v,v) on identical doubles is NOT
    // the same summation order, so allow an fp envelope here)
    val byId = vecs.toMap
    pq.foreach { r =>
      val expΔ = d2(byId(r.getLong(0)), byId(r.getLong(2)))
      assert(math.abs(r.getDouble(3) - expΔ) <= 1e-9 * math.max(1.0, expΔ),
        s"dist2 ${r.getDouble(3)} vs exact $expΔ")
    }
    // deterministic end-to-end (k-means init, ties, ranks)
    val again = EmbeddingQueries.annPqTopK(spark, sf).collect()
    assert(pq.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("k-means seeding is id-agnostic (corpus whose ids start at 1000)") {
    // the pre-r7 seed required vec_ids 0..k-1 to exist and threw on a
    // renumbered corpus; the hash-order seed must train regardless
    val tmp = java.nio.file.Files.createTempDirectory("graft_shifted").toString
    Tables.load(spark, sf, "embeddings")
      .withColumn("vec_id", col("vec_id") + 1000)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val cb = EmbeddingQueries.trainCodebook(spark, tmp, nCent = 16, iters = 1)
    assert(cb.map(_._1) == (0 until 16))
    assert(cb.forall(_._2.forall(x => !x.isNaN && !x.isInfinite)))
    val pq = EmbeddingQueries.trainPqCodebooks(spark, tmp, m = 16, kSub = 16, iters = 1)
    assert(pq.size == 16 && pq.forall(_.size == 16))
    assert(pq.flatten.flatten.forall(x => !x.isNaN && !x.isInfinite))
  }

  test("IVF search joins probed cells only — keyed join on cent_id") {
    val plan = planOf(EmbeddingQueries.annIvfTopK(spark, sf))
    // the probe->corpus join must be a hash join on cent_id, and the only
    // nested-loop joins are against the 16-row broadcast codebook
    assert(plan.contains("cent_id"))
    assert(!plan.contains("CartesianProduct"), s"plan:\n$plan")
  }

  test("PCA: projection variance matches eigenvalue per component, decreasing") {
    val k = 4
    val rows = EmbeddingQueries.pcaProject(spark, sf, k).collect()
    val expl = EmbeddingQueries.pcaExplained(spark, sf, k).collect()
    val eig = expl.sortBy(_.getLong(0)).map(_.getDouble(1))
    // eigenvalues of a covariance matrix: non-negative, sorted desc
    assert(eig.forall(_ > -1e-9))
    assert(eig.toSeq == eig.sortBy(-_).toSeq)
    val n = rows.length.toDouble
    for (j <- 0 until k) {
      val p = rows.map(_.getDouble(2 + j))
      val mu = p.sum / n
      // projections are centered (x - mean onto unit vector)
      assert(math.abs(mu) < 1e-8, s"pc$j mean $mu")
      val varP = p.map(x => (x - mu) * (x - mu)).sum / n
      assert(math.abs(varP - eig(j)) <= 1e-6 * math.max(1.0, eig(j)),
        s"pc$j variance $varP vs eigenvalue ${eig(j)}")
    }
    // explained fractions are a prefix of a distribution over the trace
    val fr = expl.map(_.getDouble(2))
    assert(fr.forall(f => f >= 0 && f <= 1.0 + 1e-12) && fr.sum <= 1.0 + 1e-9)
  }

  test("GramAgg rejects ragged embedding dimensions with a clear error") {
    import graft.functions.{GramAgg, GramBuf}
    // reduce into a non-empty buffer of another dimension: must throw,
    // not silently re-zero (the old behavior returned a valid-looking
    // but wrong PCA built from only the post-switch rows)
    val b2 = GramAgg.reduce(GramAgg.zero, Seq(1.0, 2.0))
    val eR = intercept[IllegalArgumentException] {
      GramAgg.reduce(b2, Seq(1.0, 2.0, 3.0))
    }
    assert(eR.getMessage.contains("ragged embedding dimension"))
    // merge of two non-empty buffers of different dimensions: same
    val b3 = GramAgg.reduce(GramAgg.zero, Seq(1.0, 2.0, 3.0))
    val eM = intercept[IllegalArgumentException] {
      GramAgg.merge(b2, b3)
    }
    assert(eM.getMessage.contains("ragged embedding dimension"))
    // empty-side merges stay legal (zero carries no dimension)
    assert(GramAgg.merge(GramAgg.zero, b3).n == 1L)
    assert(GramAgg.merge(b3, GramAgg.zero).n == 1L)
  }

  test("mutual-kNN graph matches a driver-side brute force and is symmetric") {
    // independent recompute: plain-Scala cosines over the collected corpus
    val vecs = Tables.load(spark, sf, "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>) as v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .filter { case (_, v) => v.map(x => x * x).sum > 0 }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var i = 0; var ab = 0.0; var aa = 0.0; var bb = 0.0
      while (i < a.length) { ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1 }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    val topk = vecs.map { case (id, v) =>
      id -> vecs.filter(_._1 != id)
        .map { case (nid, nv) => (nid, cos(v, nv)) }
        .sortBy { case (nid, c) => (-c, nid) }.take(5).map(_._1).toSet
    }.toMap
    val expected = (for {
      (a, na) <- topk.toSeq; b <- na
      if a < b && topk(b).contains(a)
    } yield (a, b)).toSet
    val got = EmbeddingQueries.knnGraph(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"mutual edge set mismatch (${got.size} vs ${expected.size})")
    assert(got.nonEmpty)
  }

  test("hard negatives: per-label rollup matches a driver-side brute force") {
    val vecs = Tables.load(spark, sf, "embeddings")
      .selectExpr("vec_id", "label", "cast(embedding as array<double>) as v")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .filter { case (_, _, v) => v.map(x => x * x).sum > 0 }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var i = 0; var ab = 0.0; var aa = 0.0; var bb = 0.0
      while (i < a.length) { ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1 }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    val anchors = vecs.flatMap { case (id, lab, v) =>
      val others = vecs.filter(_._1 != id)
      val pos = others.filter(_._2 == lab).map(o => cos(v, o._3))
      val neg = others.filter(_._2 != lab).map(o => cos(v, o._3))
      if (pos.nonEmpty && neg.nonEmpty) Some((lab, pos.max, neg.max)) else None
    }
    val expected = anchors.groupBy(_._1).map { case (lab, as) =>
      lab -> ((as.length.toLong,
        as.count { case (_, p, n) => n > p }.toLong,
        as.map { case (_, p, n) => p - n }.min,
        as.map { case (_, p, n) => p - n }.max))
    }
    val got = EmbeddingQueries.hardNegatives(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, viol, lo, hi) = expected(r.getInt(0))
      assert(r.getAs[Long]("n_anchors") == n)
      assert(r.getAs[Long]("n_violations") == viol)
      assert(r.getAs[Double]("min_margin") == lo)
      assert(r.getAs[Double]("max_margin") == hi)
    }
  }

  test("MMR top-k: greedy-optimal per step, more diverse than plain top-k") {
    val vecs = Tables.load(spark, sf, "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>) as v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .filter { case (_, v) => v.map(x => x * x).sum > 0 }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var i = 0; var ab = 0.0; var aa = 0.0; var bb = 0.0
      while (i < a.length) { ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1 }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    val q = vecs(0L)
    val rel = vecs.view.filterKeys(_ != 0L)
      .mapValues(v => cos(v, q)).toMap
    val pool = rel.toSeq.sortBy { case (id, r) => (-r, id) }.take(20).map(_._1)
    val rows = EmbeddingQueries.mmrTopK(spark, sf).collect()
    val sel = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("vec_id"))
    assert(sel.length == 10 && sel.toSet.subsetOf(pool.toSet))
    assert(sel.head == pool.head, "first MMR pick must be the most relevant")
    // per-step greedy optimality of the reported objective, recomputed
    // independently: each pick's MMR score beats every not-yet-picked
    // pool item's
    val lambda = 0.7
    sel.indices.drop(1).foreach { i =>
      val prior = sel.take(i)
      def mmr(id: Long): Double =
        lambda * rel(id) -
          (1 - lambda) * prior.map(p => cos(vecs(id), vecs(p))).max
      val pickScore = mmr(sel(i))
      (pool.toSet -- prior - sel(i)).foreach { other =>
        assert(pickScore >= mmr(other) - 1e-12,
          s"step $i picked ${sel(i)} (${pickScore}) over better $other (${mmr(other)})")
      }
    }
    // diversity: the MMR set's mean pairwise similarity must not exceed
    // the plain top-k's (that is the operator's whole point)
    def meanPairSim(ids: Seq[Long]): Double = {
      val ps = for (a <- ids.indices; b <- a + 1 until ids.length)
        yield cos(vecs(ids(a)), vecs(ids(b)))
      ps.sum / ps.length
    }
    assert(meanPairSim(sel.toSeq) <= meanPairSim(pool.take(10)) + 1e-12)
  }

  test("PCA components decorrelate: cross-covariance of projections ~ 0") {
    val rows = EmbeddingQueries.pcaProject(spark, sf, 3).collect()
    val n = rows.length.toDouble
    val scale = {
      // tolerance relative to the largest component variance
      val p0 = rows.map(_.getDouble(2))
      p0.map(x => x * x).sum / n
    }
    for (a <- 0 until 3; b <- a + 1 until 3) {
      val cov = rows.map(r => r.getDouble(2 + a) * r.getDouble(2 + b)).sum / n
      assert(math.abs(cov) <= 1e-6 * math.max(1.0, scale),
        s"pc${a}*pc$b covariance $cov not ~0")
    }
  }

  test("intrinsicDim: brute-force TwoNN replay") {
    val vecs = Tables.load(spark, sf, "embeddings").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .filter { case (_, v) => v.map(x => x * x).sum > 0 }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    var sumLn = 0.0; var nUsed = 0
    for ((qid, qv) <- vecs if qid < 512) {
      val ds = vecs.filter(_._1 != qid)
        .map { case (nid, v) => (1.0 - cos(qv, v), nid) }.sorted.take(2)
      val (r1, r2) = (ds(0)._1, ds(1)._1)
      if (r1 > 0) { sumLn += math.log(r2 / r1); nUsed += 1 }
    }
    val row = EmbeddingQueries.intrinsicDim(spark, sf).collect().head
    assert(row.getLong(0) == nUsed, s"n_used ${row.getLong(0)} != replay $nUsed")
    val want = nUsed / sumLn
    assert(math.abs(row.getDouble(2) - want) < 1e-3 * math.max(1.0, want),
      s"id_twonn ${row.getDouble(2)} != replay $want")
    // 64-dim embeddings: the estimate must land in (0, 64]
    assert(row.getDouble(2) > 0.0 && row.getDouble(2) <= 64.0 + 1e-9)
  }

  test("silhouette: driver-side brute-force replay of the milli-grid contract") {
    // the query/oracle contract rounds HALF_UP (away from zero);
    // math.round is half-toward-+inf, which differs for negative values
    // landing exactly on a grid boundary — replay with the same rule
    def roundAway(x: Double): Long =
      math.signum(x).toLong * math.round(math.abs(x))
    val rows = Tables.load(spark, sf, "embeddings")
      .selectExpr("vec_id", "label", "cast(embedding as array<double>) as v")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Double](2).toArray.map(x => roundAway(x * 1000))))
    val byLabel = rows.groupBy(_._2)
    val sums = byLabel.view.mapValues { vs =>
      val s = new Array[Long](vs.head._3.length)
      for ((_, _, q) <- vs; d <- q.indices) s(d) += q(d)
      (vs.length.toLong, s)
    }.toMap
    def dist2(q: Array[Long], l: Int): Double = {
      val (n, sv) = sums(l)
      var num = 0L
      for (d <- q.indices) { val t = n * q(d) - sv(d); num += t * t }
      num.toDouble / (n * n).toDouble
    }
    val silByLabel = rows.groupBy(_._2).view.mapValues { vs =>
      val micros = vs.map { case (_, l, q) =>
        val a2 = dist2(q, l)
        val b2 = sums.keys.filter(_ != l).map(dist2(q, _)).min
        val s = if (math.max(a2, b2) > 0)
          (math.sqrt(b2) - math.sqrt(a2)) / math.sqrt(math.max(a2, b2))
        else 0.0
        roundAway(s * 1e6)
      }
      (vs.length.toLong, micros.sum.toDouble / (vs.length * 1e6),
        micros.count(_ < 0L).toLong)
    }.toMap
    val out = EmbeddingQueries.silhouette(spark, sf).collect()
    assert(out.length == silByLabel.size)
    for (r <- out) {
      val (n, mean, neg) = silByLabel(r.getInt(0))
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(2) - mean) < 1e-12,
        s"label ${r.getInt(0)} mean ${r.getDouble(2)} != replay $mean")
      assert(r.getLong(3) == neg, s"label ${r.getInt(0)} n_negative")
      assert(r.getDouble(2) >= -1.0 - 1e-9 && r.getDouble(2) <= 1.0 + 1e-9)
    }
  }
}
