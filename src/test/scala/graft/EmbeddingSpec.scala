package graft

import graft.queries.EmbeddingQueries

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

  test("k-means-trained IVF recall >= 90% of exact top-10 at sf0.001") {
    def keyset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = keyset(EmbeddingQueries.annTopK(spark, sf))
    val ivf = keyset(EmbeddingQueries.annIvfTopK(spark, sf))
    val recall = (exact & ivf).size.toDouble / exact.size
    info(s"IVF recall@10 = $recall")
    assert(recall >= 0.9, s"IVF recall $recall below 0.9")
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

  test("IVF search joins probed cells only — keyed join on cent_id") {
    val plan = planOf(EmbeddingQueries.annIvfTopK(spark, sf))
    // the probe->corpus join must be a hash join on cent_id, and the only
    // nested-loop joins are against the 16-row broadcast codebook
    assert(plan.contains("cent_id"))
    assert(!plan.contains("CartesianProduct"), s"plan:\n$plan")
  }
}
