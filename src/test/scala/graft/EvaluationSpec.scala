package graft

import org.apache.spark.sql.functions._
import graft.queries.Evaluation

/** First-principles driver-side replays for the evaluation family
  * (the mandatory closed-form-stats discipline): each metric is
  * recomputed from the collected (bounded) documents fixture with an
  * INDEPENDENT algorithm — brute-force pairwise AUC instead of the
  * midrank identity, a plain-double AP loop instead of the micro-grid
  * cumulation — so a formula transcription bug that both engines
  * faithfully compute cannot survive (the ljungBox lesson).
  */
class EvaluationSpec extends SparkSpec {

  private lazy val base: Array[(Long, Long, Boolean)] =
    Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars"), (col("lang") === "en").as("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))

  test("rocAuc: brute-force pairwise replay (wins + half-ties)") {
    val pos = base.filter(_._3).map(_._2)
    val neg = base.filterNot(_._3).map(_._2)
    var wins2 = 0L // doubled: 2 per win, 1 per tie
    for (a <- pos; b <- neg)
      wins2 += (if (a > b) 2L else if (a == b) 1L else 0L)
    val row = Evaluation.rocAuc(spark, sf).collect().head
    assert(row.getLong(0) == pos.length && row.getLong(1) == neg.length)
    assert(row.getLong(2) == wins2,
      s"u2_pos ${row.getLong(2)} != doubled pairwise wins $wins2")
    val auc = wins2.toDouble / (2.0 * pos.length * neg.length)
    assert(math.abs(row.getDouble(3) - auc) < 1e-12)
    assert(math.abs(row.getDouble(4) - (2 * auc - 1)) < 1e-12,
      s"gini ${row.getDouble(4)} != ${2 * auc - 1}")
  }

  test("averagePrecision: plain-double ranked-loop replay") {
    // independent algorithm: sort, walk, accumulate double precisions
    val ranked = base.sortBy { case (id, len, _) => (-len, id) }
    var cum = 0L
    var apSum = 0.0
    var p50 = 0.0
    for (((_, _, p), i) <- ranked.zipWithIndex) {
      val k = i + 1L
      if (p) { cum += 1; apSum += cum.toDouble / k }
      if (k == 50L) p50 = cum.toDouble / 50.0
    }
    val nPos = ranked.count(_._3)
    val row = Evaluation.averagePrecision(spark, sf).collect().head
    assert(row.getLong(0) == nPos && row.getLong(1) == ranked.length)
    // the query truncates each precision@k to the micro grid, so it
    // can sit at most 1e-6 below the true mean precision, never above
    val ap = row.getDouble(2)
    assert(ap <= apSum / nPos + 1e-12 && ap >= apSum / nPos - 1e-6,
      s"avg_precision $ap vs replay ${apSum / nPos}")
    assert(math.abs(row.getDouble(3) - p50) < 1e-12)
  }

  test("calibration: direct double ECE replay + bin-count conservation") {
    val maxc = base.map(_._2).max
    val binned = base.groupBy { case (_, len, _) =>
      math.min(9L, (len * 1000000L / maxc) / 100000L)
    }
    var ece = 0.0
    val n = base.length
    for ((_, rows) <- binned) {
      val pred = rows.map(r => (r._2 * 1000000L / maxc).toDouble / 1e6)
      val obs = rows.count(_._3).toDouble / rows.length
      ece += (rows.length.toDouble / n) * math.abs(obs - pred.sum / rows.length)
    }
    val out = Evaluation.calibration(spark, sf).collect()
    assert(out.map(_.getLong(1)).sum == n, "bin counts must conserve N")
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    val got = out.head.getDouble(6)
    assert(math.abs(got - ece) < 1e-9, s"ece $got != replay $ece")
    assert(out.forall(r => r.getDouble(6) == got), "ece must be global")
    for (r <- out) {
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("prThresholdSweep: driver-side confusion-cell replay") {
    val maxc = base.map(_._2).max
    val out = Evaluation.prThresholdSweep(spark, sf).collect()
    assert(out.length == 11)
    for (r <- out) {
      val i = r.getLong(0)
      val thr = maxc * i / 10
      val tp = base.count { case (_, len, p) => len >= thr && p }
      val fp = base.count { case (_, len, p) => len >= thr && !p }
      val fn = base.count { case (_, len, p) => len < thr && p }
      assert(r.getLong(1) == tp && r.getLong(2) == fp && r.getLong(3) == fn,
        s"threshold $i cells")
      if (tp + fp > 0)
        assert(math.abs(r.getDouble(4) - tp.toDouble / (tp + fp)) < 1e-12)
      if (tp + fn > 0)
        assert(math.abs(r.getDouble(5) - tp.toDouble / (tp + fn)) < 1e-12)
    }
    // recall must be monotone non-increasing in the threshold
    val recalls = out.sortBy(_.getLong(0)).map(_.getDouble(5))
    assert(recalls.zip(recalls.tail).forall { case (a, c) => a >= c - 1e-12 })
  }

  test("selfRetrievalMrr: driver-side brute-force replay of the contract") {
    val toks = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ", -1).filter(_.nonEmpty))
    val tf = toks.flatMap { case (id, ws) =>
      ws.groupBy(identity).map { case (w, o) => (id, w, o.length.toLong) }
    }
    val df = tf.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val dl = tf.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nCorpus = dl.size.toLong
    val avgdl = dl.values.sum.toDouble / nCorpus
    def lnm(x: Double): Long = math.round(math.log(x) * 1e6)
    // top-1 tf-idf keyword per query doc, term-asc tie-break
    val keyw = tf.filter(_._1 < 100L).groupBy(_._1).view.mapValues { rows =>
      rows.map { case (_, w, t) =>
        (w, t * (lnm(nCorpus.toDouble) - lnm(df(w).toDouble)))
      }.minBy { case (w, sc) => (-sc, w) }._1
    }.toMap
    def bm25(t: Long, d: Long, docId: Long): Double =
      ((nCorpus - d + 0.5) / (d + 0.5)) * (t * 2.2) /
        (t + 1.2 * (0.25 + 0.75 * dl(docId) / avgdl))
    val postings = tf.groupBy(_._2)
    var rrSum = 0L
    var h1 = 0L; var h10 = 0L; var nPost = 0L
    for ((q, term) <- keyw) {
      val cand = postings(term)
        .map { case (id, _, t) => (id, bm25(t, df(term), id)) }
      val qScore = cand.find(_._1 == q).get._2
      val rank = 1 + cand.count { case (id, sc) =>
        sc > qScore || (sc == qScore && id < q)
      }
      rrSum += 1000000L / rank
      if (rank == 1) h1 += 1
      if (rank <= 10) h10 += 1
      nPost += cand.length
    }
    val row = Evaluation.selfRetrievalMrr(spark, sf).collect().head
    assert(row.getLong(0) == keyw.size, "n_queries")
    assert(row.getLong(1) == h1, s"hits_at_1 ${row.getLong(1)} != $h1")
    assert(row.getLong(2) == h10, s"hits_at_10 ${row.getLong(2)} != $h10")
    assert(row.getLong(3) == nPost, "n_postings")
    val mrr = rrSum.toDouble / (keyw.size * 1e6)
    assert(math.abs(row.getDouble(4) - mrr) < 1e-12,
      s"mrr ${row.getDouble(4)} != replay $mrr")
    assert(mrr > 0.0 && mrr <= 1.0)
  }

  test("brierScore: plain-double replay of Brier + binned Murphy terms") {
    val maxc = base.map(_._2).max
    val rows = base.map { case (_, len, p) =>
      (len * 1000000L / maxc, if (p) 1L else 0L) }
    val n = rows.length
    val brier = rows.map { case (pm, y) =>
      val d = pm / 1e6 - y; d * d }.sum / n
    val yBar = rows.map(_._2).sum.toDouble / n
    val unc = yBar * (1 - yBar)
    // binned terms on the query's micro-grid contract (truncating div)
    val byBin = rows.groupBy { case (pm, _) => math.min(9L, pm / 100000L) }
    def t(x: Long): Double = x.toDouble
    val yTot = rows.map(_._2).sum
    val ybarM = yTot * 1000000L / n
    var relNum = 0L; var resNum = 0L
    for ((_, vs) <- byBin) {
      val nb = vs.length.toLong
      val pmB = vs.map(_._1).sum / nb
      val obB = vs.map(_._2).sum * 1000000L / nb
      relNum += nb * ((pmB - obB) * (pmB - obB) / 1000000L)
      resNum += nb * ((obB - ybarM) * (obB - ybarM) / 1000000L)
    }
    val row = Evaluation.brierScore(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong && row.getLong(1) == yTot)
    assert(math.abs(row.getDouble(2) - brier) < 1e-9,
      s"brier ${row.getDouble(2)} != replay $brier")
    assert(math.abs(row.getDouble(3) - unc) < 1e-12, "uncertainty")
    assert(math.abs(row.getDouble(4) - t(relNum) / (n * 1e6)) < 1e-12,
      "reliability")
    assert(math.abs(row.getDouble(5) - t(resNum) / (n * 1e6)) < 1e-12,
      "resolution")
    // the residual must close the decomposition identity by definition
    assert(math.abs(row.getDouble(6)
      - (row.getDouble(2) - (row.getDouble(3) + row.getDouble(4)
        - row.getDouble(5)))) < 1e-15)
    // sanity: Brier of a [0,1] forecast on binary outcomes is in [0,1]
    assert(row.getDouble(2) >= 0.0 && row.getDouble(2) <= 1.0)
  }

  test("scoreAgreement: textbook average-rank Spearman replay") {
    // independent algorithm: plain-double average ranks (not the
    // doubled-midrank integer identity), textbook Pearson on ranks
    val ab = Tables.load(spark, sf, "documents")
      .selectExpr("n_chars", "cast(size(split(text, ' ')) as long) as b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def avgRanks(xs: Array[Long]): Array[Double] = {
      val sorted = xs.zipWithIndex.sortBy(_._1)
      val out = new Array[Double](xs.length)
      var i = 0
      while (i < sorted.length) {
        var j = i
        while (j + 1 < sorted.length && sorted(j + 1)._1 == sorted(i)._1) j += 1
        val avg = (i + j + 2) / 2.0 // 1-based average rank of the tie run
        for (k <- i to j) out(sorted(k)._2) = avg
        i = j + 1
      }
      out
    }
    val ra = avgRanks(ab.map(_._1)); val rb = avgRanks(ab.map(_._2))
    val n = ab.length
    val ma = ra.sum / n; val mb = rb.sum / n
    val cov = ra.zip(rb).map { case (x, y) => (x - ma) * (y - mb) }.sum
    val va = ra.map(x => (x - ma) * (x - ma)).sum
    val vb = rb.map(y => (y - mb) * (y - mb)).sum
    val rho = cov / math.sqrt(va * vb)
    val row = Evaluation.scoreAgreement(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(1) - rho) < 1e-9,
      s"spearman_rho ${row.getDouble(1)} != replay $rho")
    assert(row.getDouble(1) >= -1.0 - 1e-9 && row.getDouble(1) <= 1.0 + 1e-9)
    // chars and words must agree strongly on this corpus — the read
    // the operator exists for
    assert(row.getDouble(1) > 0.5, s"suspiciously low rho ${row.getDouble(1)}")
  }

  test("ndcg: plain-double ranked-loop replay (graded relevance)") {
    // independent algorithm: sort the collected fixture, walk the top
    // 20 with double log2 discounts (no micro grid), and build the
    // ideal ordering by an actual sort of relevances — the query's
    // closed-form n2/n1 positional ideal must agree
    val k = 20
    val graded = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars"), col("lang"))
      .collect()
      .map { r =>
        val rel = r.getString(2) match {
          case "en" => 2; case "es" => 1; case _ => 0 }
        (r.getLong(0), r.getLong(1), rel)
      }
    def gain(rel: Int): Double = (1 << rel) - 1.0
    def disc(r: Int): Double = math.log(2.0) / math.log(r + 1.0)
    val ranked = graded.sortBy { case (id, len, _) => (-len, id) }
    val dcg = ranked.take(k).zipWithIndex
      .map { case ((_, _, rel), i) => gain(rel) * disc(i + 1) }.sum
    val idcg = graded.map(_._3).sorted(Ordering.Int.reverse).take(k)
      .zipWithIndex.map { case (rel, i) => gain(rel) * disc(i + 1) }.sum
    val row = Evaluation.ndcg(spark, sf).collect().head
    assert(row.getLong(0) == k.toLong)
    assert(row.getLong(1) == graded.count(_._3 == 2).toLong, "n_rel2")
    assert(row.getLong(2) == graded.count(_._3 == 1).toLong, "n_rel1")
    // each of the k discounts is on the micro grid (±5e-7 relative),
    // gains ≤ 3 — so DCG/IDCG sit within ~k·3·5e-7·max-disc of the
    // plain-double replay; 1e-4 absolute is comfortably outside that
    assert(math.abs(row.getDouble(3) - dcg) < 1e-4,
      s"dcg ${row.getDouble(3)} != replay $dcg")
    assert(math.abs(row.getDouble(4) - idcg) < 1e-4,
      s"idcg ${row.getDouble(4)} != replay $idcg")
    assert(math.abs(row.getDouble(5) - dcg / idcg) < 1e-4,
      s"ndcg ${row.getDouble(5)} != replay ${dcg / idcg}")
    assert(row.getDouble(5) > 0.0 && row.getDouble(5) <= 1.0 + 1e-9)
  }
}
