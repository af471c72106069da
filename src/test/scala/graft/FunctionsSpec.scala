package graft

import graft.functions.SortedLongIntersectSize
import org.apache.spark.sql.functions._

/** Unit behavior of the custom codegen'd intersection-size expression,
  * cross-checked against the built-in array_intersect on random sorted
  * inputs (both interpreted eval and the whole-stage-codegen path run —
  * Spark fuses the projection, so the generated Java is what executes).
  */
class FunctionsSpec extends SparkSpec {

  import spark.implicits._

  private def isect(a: Seq[Long], b: Seq[Long]): Int =
    Seq((a, b)).toDF("a", "b")
      .select(SortedLongIntersectSize(col("a"), col("b")).as("c"))
      .collect().head.getInt(0)

  test("empty, disjoint, identical, partial overlap") {
    assert(isect(Seq.empty, Seq.empty) == 0)
    assert(isect(Seq(1L, 2L), Seq.empty) == 0)
    assert(isect(Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)) == 0)
    assert(isect(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) == 3)
    assert(isect(Seq(-5L, 0L, 7L, 9L), Seq(0L, 9L, 11L)) == 2)
  }

  test("null input propagates null") {
    val r = Seq((Seq(1L, 2L))).toDF("a")
      .select(SortedLongIntersectSize(col("a"), lit(null).cast("array<bigint>")))
      .collect().head
    assert(r.isNullAt(0))
  }

  private def wsum(a: Seq[Long], w: Seq[Long], b: Seq[Long]): Long =
    Seq((a, w, b)).toDF("a", "w", "b")
      .select(graft.functions.SortedIntersectWeightSum(
        col("a"), col("w"), col("b")).as("s"))
      .collect().head.getLong(0)

  test("SortedIntersectWeightSum: sums left weights over the intersection") {
    assert(wsum(Seq.empty, Seq.empty, Seq.empty) == 0L)
    assert(wsum(Seq(1L, 2L), Seq(10L, 20L), Seq.empty) == 0L)
    assert(wsum(Seq(1L, 3L, 5L), Seq(1L, 2L, 4L), Seq(2L, 4L, 6L)) == 0L)
    assert(wsum(Seq(1L, 2L, 3L), Seq(7L, 11L, 13L), Seq(1L, 2L, 3L)) == 31L)
    assert(wsum(Seq(-5L, 0L, 7L, 9L), Seq(1L, 2L, 3L, 4L), Seq(0L, 9L, 11L)) == 6L)
    // agrees with an independent map-lookup recompute on random inputs
    val rnd = new scala.util.Random(13)
    (1 to 20).foreach { _ =>
      val a = rnd.shuffle((0L to 60L).toList).take(25).sorted
      val w = a.map(_ => rnd.nextInt(1000).toLong)
      val b = rnd.shuffle((0L to 60L).toList).take(25).sorted
      val want = a.zip(w).collect { case (k, wt) if b.contains(k) => wt }.sum
      assert(wsum(a, w, b) == want)
    }
  }

  test("SortedIntersectWeightSum: null propagation") {
    val r = Seq((Seq(1L, 2L), Seq(5L, 6L))).toDF("a", "w")
      .select(graft.functions.SortedIntersectWeightSum(
        col("a"), col("w"), lit(null).cast("array<bigint>")))
      .collect().head
    assert(r.isNullAt(0))
  }

  test("DotProductF64 bit-identical to the HOF spelling on random vectors") {
    val rnd = new scala.util.Random(7)
    val vecs = (1 to 30).map { _ =>
      (Seq.fill(64)(rnd.nextDouble() * 2 - 1), Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    val df = vecs.toDF("a", "b").select(
      graft.functions.DotProductF64(col("a"), col("b")).as("custom"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("hof"))
    // exact equality: both accumulate strictly left-to-right
    assert(df.filter(col("custom") =!= col("hof")).count() == 0)
  }

  test("DotProductF64 edge cases: empty arrays, null propagation") {
    val r1 = Seq((Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
      .select(graft.functions.DotProductF64(col("a"), col("b")))
      .collect().head
    assert(r1.getDouble(0) == 0.0)
    val r2 = Seq(Seq(1.0, 2.0)).toDF("a")
      .select(graft.functions.DotProductF64(col("a"), lit(null).cast("array<double>")))
      .collect().head
    assert(r2.isNullAt(0))
  }

  test("MinHashSignature matches a per-permutation reference min") {
    val rnd = new scala.util.Random(11)
    val sets = (1 to 20).map(_ => Seq.fill(1 + rnd.nextInt(80))(rnd.nextLong()).distinct)
    val seeds = graft.functions.MinHashSignature.seeds(16)
    def ref(set: Seq[Long]): Seq[Long] =
      seeds.toSeq.map(sd => set.map(s => graft.functions.MinHashSignature.mix64(s ^ sd)).min)
    val rows = sets.toDF("sh")
      .select(graft.functions.MinHashSignature(col("sh"), 16).as("sig"))
      .collect().map(_.getSeq[Long](0))
    rows.zip(sets).foreach { case (sig, set) =>
      assert(sig.length == 16)
      assert(sig == ref(set))
    }
  }

  test("MinHashSignature: similar sets share slots, null propagates, empty = null") {
    val base = (1L to 100L).toSeq
    val near = base.drop(2) ++ Seq(1001L, 1002L)   // jaccard ~ 0.92
    val far = (1000L to 1100L).toSeq
    val rows = Seq(base, near, far).toDF("sh")
      .select(graft.functions.MinHashSignature(col("sh"), 64).as("sig"))
      .collect().map(_.getSeq[Long](0))
    def agree(a: Seq[Long], b: Seq[Long]): Int = a.zip(b).count(p => p._1 == p._2)
    assert(agree(rows(0), rows(1)) > 40, "near-identical sets must share most slots")
    assert(agree(rows(0), rows(2)) < 10, "disjoint sets must share almost none")
    val nullRow = Seq(Seq(1L)).toDF("sh")
      .select(graft.functions.MinHashSignature(lit(null).cast("array<bigint>"), 8))
      .collect().head
    assert(nullRow.isNullAt(0))
    // an empty set has NO signature — null, never a shared sentinel that
    // would band-collide every shingle-less doc with every other
    val empty = Seq(Seq.empty[Long]).toDF("sh")
      .select(graft.functions.MinHashSignature(col("sh"), 8).as("sig"))
      .collect().head
    assert(empty.isNullAt(0))
  }

  test("WinnowMinMd5 bit-identical to the HOF spelling, incl. short and non-ASCII") {
    val rnd = new scala.util.Random(23)
    val strs = (1 to 40).map { _ =>
      val n = 1 + rnd.nextInt(300)
      new String(Array.fill(n)(("abcdefgh XYZ.,!").charAt(rnd.nextInt(15))))
    } ++ Seq("a", "1234567", "12345678", "ñandú über café corazón niño",
      // supplementary (astral) chars: one emoji = 2 UTF-16 units but ONE
      // code point for substr/length in both engines
      "ab😀cdefghij", "😀😁😂")
    val df = strs.toDF("s").select(
      graft.functions.WinnowMinMd5(col("s")).as("custom"),
      expr("array_min(transform(sequence(1, greatest(length(s)-7, 1)), i -> md5(substr(s, i, 8))))")
        .as("hof"))
    assert(df.filter(col("custom") =!= col("hof")).count() == 0)
    val nullRow = Seq("x").toDF("s")
      .select(graft.functions.WinnowMinMd5(lit(null).cast("string"))).collect().head
    assert(nullRow.isNullAt(0))
  }

  test("HashedShingles3 equals the HOF xxhash64 spelling, skips null words") {
    val rnd = new scala.util.Random(31)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "niño", "über")
    val docs = (1 to 25).map(_ =>
      Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))) ++
      Seq(Seq.empty, Seq("one"), Seq("one", "two"))
    val df = docs.toDF("ws").select(
      graft.functions.HashedShingles3(col("ws")).as("custom"),
      when(size(col("ws")) >= 3,
        array_sort(array_distinct(transform(
          sequence(lit(0), size(col("ws")) - 3),
          i => xxhash64(element_at(col("ws"), i + 1), element_at(col("ws"), i + 2),
            element_at(col("ws"), i + 3))))))
        .otherwise(array().cast("array<bigint>")).as("hof"))
    assert(df.filter(col("custom") =!= col("hof")).count() == 0)
    // null elements are skipped within their shingle, like xxhash64
    val withNull = Seq(1).toDF("i").select(
      graft.functions.HashedShingles3(
        array(lit("a"), lit(null).cast("string"), lit("b"), lit("c"))).as("custom"),
      array_sort(array_distinct(array(
        xxhash64(lit("a"), lit("b")), xxhash64(lit("b"), lit("c"))))).as("expected"))
    assert(withNull.filter(col("custom") =!= col("expected")).count() == 0)
  }

  test("SignBandBuckets equals the posexplode + wide-agg spelling") {
    val bands = 8; val bits = 4
    val rnd = new scala.util.Random(5)
    val vecs = (0L until 20L).map(i => (i, Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = vecs.toDF("vec_id", "v")
    def signComponent(plane: Int, dim: org.apache.spark.sql.Column) =
      when(pmod(xxhash64(lit(plane), dim), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))
    val projAggs = (0 until bands * bits)
      .map(p => sum(col("x") * signComponent(p, col("k"))).as(s"p$p"))
    val bandArr = array((0 until bands).map { b =>
      (0 until bits).map { j =>
        when(col(s"p${b * bits + j}") >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
    val legacy = df.select(col("vec_id"), posexplode(col("v")).as(Seq("k", "x")))
      .groupBy(col("vec_id")).agg(projAggs.head, projAggs.tail: _*)
      .select(col("vec_id"), bandArr.as("buckets"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val custom = df.select(col("vec_id"),
        graft.functions.SignBandBuckets(col("v"), bands, bits).as("buckets"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(custom == legacy)
  }

  test("agrees with built-in array_intersect on random sorted sets") {
    val rnd = new scala.util.Random(42)
    val cases = (1 to 50).map { _ =>
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted
      (a, b)
    }
    val df = cases.toDF("a", "b").select(
      SortedLongIntersectSize(col("a"), col("b")).as("custom"),
      size(array_intersect(col("a"), col("b"))).as("builtin"))
    assert(df.filter(col("custom") =!= col("builtin")).count() == 0)
  }

  private def normed(ss: String*): Seq[String] =
    ss.toDF("s").select(graft.functions.NormalizeText(col("s")).as("n"))
      .collect().map(_.getString(0)).toSeq

  test("NormalizeText: NFC composes, lowercases, collapses whitespace") {
    // decomposed e + COMBINING ACUTE composes to precomposed é, then
    // lowercases — both spellings normalize to identical bytes
    assert(normed("Café", "CafÉ") == Seq("café", "café"))
    assert(normed("A \t B\n\nC", "  x  ", "") == Seq("a b c", "x", ""))
    // Greek final sigma is contextual in Unicode lowercase
    assert(normed("ΟΣ") == Seq("ος"))
    // NBSP is NOT in the whitespace class (it is content, not layout)
    assert(normed("a b") == Seq("a b"))
  }

  test("NormalizeText: clean-ASCII fast path is identity; idempotent on random text") {
    val rnd = new scala.util.Random(7)
    val cases = (1 to 60).map { _ =>
      Seq.fill(rnd.nextInt(12))(
        rnd.alphanumeric.take(rnd.nextInt(6)).mkString)
        .mkString(Seq(" ", "  ", "\t", "\n")(rnd.nextInt(4)))
    } :+ "already clean lowercase" :+ "Mixed CASEß İstanbul"
    val df = cases.toDF("s").select(
      graft.functions.NormalizeText(col("s")).as("once"))
      .select(col("once"),
        graft.functions.NormalizeText(col("once")).as("twice"))
    assert(df.filter(col("once") =!= col("twice")).count() == 0)
    assert(normed("clean lowercase text") == Seq("clean lowercase text"))
    // null propagates
    val n = Seq[String](null).toDF("s")
      .select(graft.functions.NormalizeText(col("s")).as("n")).collect()
    assert(n.head.isNullAt(0))
  }

  test("PqEncode and PqAdcLut match a driver-side reference on random inputs") {
    val rnd = new scala.util.Random(7)
    val m = 4; val kSub = 5; val dSub = 3
    val cb: Seq[Seq[Seq[Double]]] =
      Seq.fill(m, kSub, dSub)(rnd.nextDouble() * 2 - 1)
    val vecs: Seq[Seq[Double]] =
      Seq.fill(25)(Seq.fill(m * dSub)(rnd.nextDouble() * 2 - 1))
    val flat = cb.flatten.flatten
    val hn = cb.flatMap(_.map(_.map(x => x * x).sum / 2.0))
    val cn = cb.flatMap(_.map(_.map(x => x * x).sum))
    val got = vecs.toDF("v").select(
      graft.functions.PqEncode(col("v"), typedLit(flat), typedLit(hn),
        kSub, dSub).as("code"),
      graft.functions.PqAdcLut(col("v"), typedLit(flat), typedLit(cn),
        kSub, dSub).as("lut")).collect()
    vecs.zip(got).foreach { case (v, row) =>
      val expCode = (0 until m).map { j =>
        val scores = (0 until kSub).map { c =>
          val dotv = (0 until dSub).map(d => v(j * dSub + d) * cb(j)(c)(d)).sum
          dotv - hn(j * kSub + c)
        }
        scores.indexOf(scores.max)
      }
      assert(row.getSeq[Int](0) == expCode)
      val expLut = (0 until m).flatMap { j =>
        val qq = (0 until dSub).map(d => v(j * dSub + d) * v(j * dSub + d)).sum
        (0 until kSub).map { c =>
          val qc = (0 until dSub).map(d => v(j * dSub + d) * cb(j)(c)(d)).sum
          qq - 2.0 * qc + cn(j * kSub + c)
        }
      }
      val lut = row.getSeq[Double](1)
      assert(lut.size == m * kSub)
      lut.zip(expLut).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-12 * math.max(1.0, math.abs(b)))
      }
    }
  }

  test("NearestCentroidPos bit-identical to the array_position(array_max) chain") {
    // the combinator chain this expression replaced (r17 optimization:
    // one value-independent generated class instead of a fresh class
    // per codebook) — same dot order, same nrm·cn association, same
    // first-max tie-break; equality here must be EXACT, including on a
    // codebook with duplicated centroids (tie → lowest position)
    val rnd = new scala.util.Random(41)
    val k = 16
    val dim = 64
    val cents: Seq[Seq[Double]] =
      (1 to k).map(_ => Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
        .updated(7, Seq.fill(dim)(0.25)) // plant a tie partner
        .updated(11, Seq.fill(dim)(0.25))
    val norms = cents.map(cv => math.sqrt(cv.map(x => x * x).sum))
    val vecs = (1 to 50).map(_ => Seq.fill(dim)(rnd.nextDouble() * 2 - 1)) :+
      Seq.fill(dim)(0.25) // exact-tie probe: hits both planted centroids
    val df = vecs.toDF("v").withColumn("nrm",
      sqrt(graft.functions.DotProductF64(col("v"), col("v"))))
    val oldChain = array(cents.map { cv =>
      val cn = math.sqrt(cv.map(x => x * x).sum)
      (graft.functions.DotProductF64(col("v"), typedLit(cv))
        / (col("nrm") * lit(cn)))
    }: _*)
    val got = df.select(
      graft.functions.NearestCentroidPos(col("v"),
        typedLit(cents.flatten), typedLit(norms)).as("pos"),
      array_position(oldChain, array_max(oldChain)).cast("int").as("want"))
    assert(got.filter(col("pos") =!= col("want")).count() == 0)
  }

  test("NearestCentroidPos: null propagation and zero-k") {
    val r = Seq(Seq(1.0, 2.0)).toDF("v")
      .select(graft.functions.NearestCentroidPos(
        lit(null).cast("array<double>"), col("v"), col("v")))
      .collect().head
    assert(r.isNullAt(0))
    val z = Seq(Seq(1.0, 2.0)).toDF("v")
      .select(graft.functions.NearestCentroidPos(col("v"),
        typedLit(Seq.empty[Double]), typedLit(Seq.empty[Double])).as("p"))
      .collect().head
    assert(z.getInt(0) == 0) // no centroids -> position 0 (callers never pass k=0)
  }
}
