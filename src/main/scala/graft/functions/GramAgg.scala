package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass second-moment accumulator over a vector column: buffer is
  * (n, Σx, Σx·xᵀ) — count, sum vector (d doubles) and full Gram matrix
  * (d² doubles, row-major). This is THE scale pattern for covariance /
  * PCA over a 100 TB embedding corpus: each partition folds its rows
  * into one d²-sized buffer, the shuffle carries one buffer per
  * partition (32 KiB at d=64), and the driver finishes with an O(d³)
  * eigensolve on a d×d matrix — the corpus itself never shuffles and
  * nothing row-sized ever reaches the driver.
  *
  * The buffer dimension is learned from the first row (zero carries
  * empty arrays, so the aggregator needs no d parameter and `zero`
  * stays cheap); reduce/merge mutate buffers in place, which the
  * Aggregator contract explicitly permits.
  *
  * Accumulation is plain double addition, so partial-merge order can
  * move the low bits across runs (~1e-15 relative). Downstream (PCA)
  * is an iterative eigensolve with its own convergence tolerance, so
  * callers must treat results as numeric, not bit-exact — EmbeddingSpec
  * pins properties (orthonormality, variance-eigenvalue agreement)
  * with tolerances, never bit equality.
  */
case class GramBuf(n: Long, s: Array[Double], g: Array[Double])

object GramAgg extends Aggregator[Seq[Double], GramBuf, GramBuf] {
  override def zero: GramBuf = GramBuf(0L, Array.empty, Array.empty)

  // A dimension change mid-stream is corrupt input, never something to
  // accumulate through: silently re-zeroing the buffer (the old
  // behavior) would discard every prior row and return a "valid" wrong
  // PCA. Fail with the offending dimensions instead.
  private def sized(b: GramBuf, d: Int): GramBuf =
    if (b.s.length == d) b
    else if (b.n == 0L) GramBuf(b.n, new Array[Double](d), new Array[Double](d * d))
    else throw new IllegalArgumentException(
      s"ragged embedding dimension: accumulated d=${b.s.length}, row has d=$d")

  override def reduce(b0: GramBuf, x: Seq[Double]): GramBuf = {
    val d = x.length
    val b = sized(b0, d)
    val xa = x.toArray
    var i = 0
    while (i < d) {
      b.s(i) += xa(i)
      var j = 0
      val row = i * d
      while (j < d) { b.g(row + j) += xa(i) * xa(j); j += 1 }
      i += 1
    }
    GramBuf(b.n + 1, b.s, b.g)
  }

  override def merge(a0: GramBuf, b: GramBuf): GramBuf = {
    if (b.n == 0) a0
    else if (a0.n == 0) b
    else {
      require(a0.s.length == b.s.length,
        s"ragged embedding dimension: merging d=${a0.s.length} with d=${b.s.length}")
      val a = a0
      var i = 0
      while (i < a.s.length) { a.s(i) += b.s(i); i += 1 }
      i = 0
      while (i < a.g.length) { a.g(i) += b.g(i); i += 1 }
      GramBuf(a.n + b.n, a.s, a.g)
    }
  }

  override def finish(b: GramBuf): GramBuf = b
  override def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
  override def outputEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
}
