package graft.plans

import graft.functions.{BloomFilterAgg, BloomMightContain, CmsEstimate, CmsSketchAgg, DotProductF64, DotProductI8, HashedShingles3, MinHashSignature, QuantizeI8, SignBandBuckets, SortedLongIntersectSize, WinnowMinMd5, ZOrderKey}
import graft.llm.SimHash64
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers the engine's custom Catalyst expressions as SQL functions,
  * the idiomatic Spark extension point — enable with
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)
  *   // or spark.sql.extensions=graft.plans.GraftExtensions
  *
  * after which `simhash64(text)` and `sorted_intersect_size(a, b)` work
  * from SQL, not just the Scala DSL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** A clean error for non-literal / non-integral static arguments
    * instead of a ClassCastException from a blind
    * `eval(null).asInstanceOf[Int]` (BIGINT literals and column
    * references both reach here through the SQL path).
    */
  private def intArg(fn: String, name: String, e: Expression): Int = {
    require(e.foldable,
      s"$fn: argument '$name' must be a literal integer, got ${e.sql}")
    e.eval(null) match {
      case n: java.lang.Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn: argument '$name' must be an integer literal, got $other")
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedLongIntersectSize].getName,
        "sorted_intersect_size"),
      (children: Seq[Expression]) =>
        SortedLongIntersectSize(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("hashed_shingles3"),
      new ExpressionInfo(classOf[HashedShingles3].getName, "hashed_shingles3"),
      (children: Seq[Expression]) => HashedShingles3(children.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
      (children: Seq[Expression]) => MinHashSignature(children(0),
        intArg("minhash_sig", "num_perms", children(1)))))
    ext.injectFunction((
      FunctionIdentifier("sign_band_buckets"),
      new ExpressionInfo(classOf[SignBandBuckets].getName, "sign_band_buckets"),
      (children: Seq[Expression]) => SignBandBuckets(children(0),
        intArg("sign_band_buckets", "bands", children(1)),
        intArg("sign_band_buckets", "bits", children(2)))))
    ext.injectFunction((
      FunctionIdentifier("winnow_min_md5"),
      new ExpressionInfo(classOf[WinnowMinMd5].getName, "winnow_min_md5"),
      (children: Seq[Expression]) => WinnowMinMd5(children.head)))
    ext.injectFunction((
      FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[CmsSketchAgg].getName, "cms_sketch"),
      // an AggregateFunction returned bare — the analyzer wraps it in
      // an AggregateExpression at resolution
      (children: Seq[Expression]) => CmsSketchAgg(children.head)))
    ext.injectFunction((
      FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      (children: Seq[Expression]) => CmsEstimate(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAgg].getName, "bloom_agg"),
      (children: Seq[Expression]) => BloomFilterAgg(children.head)))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName,
        "bloom_might_contain"),
      (children: Seq[Expression]) => BloomMightContain(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("quantize_i8"),
      new ExpressionInfo(classOf[QuantizeI8].getName, "quantize_i8"),
      (children: Seq[Expression]) => QuantizeI8(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_i8"),
      new ExpressionInfo(classOf[DotProductI8].getName, "dot_i8"),
      (children: Seq[Expression]) => DotProductI8(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("zorder_key"),
      new ExpressionInfo(classOf[ZOrderKey].getName, "zorder_key"),
      (children: Seq[Expression]) => ZOrderKey(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_f64"),
      new ExpressionInfo(classOf[DotProductF64].getName, "dot_f64"),
      (children: Seq[Expression]) => DotProductF64(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[graft.functions.PqEncode].getName, "pq_encode"),
      (children: Seq[Expression]) => graft.functions.PqEncode(
        children(0), children(1), children(2),
        intArg("pq_encode", "k_sub", children(3)),
        intArg("pq_encode", "d_sub", children(4)))))
    ext.injectFunction((
      FunctionIdentifier("pq_adc_lut"),
      new ExpressionInfo(classOf[graft.functions.PqAdcLut].getName, "pq_adc_lut"),
      (children: Seq[Expression]) => graft.functions.PqAdcLut(
        children(0), children(1), children(2),
        intArg("pq_adc_lut", "k_sub", children(3)),
        intArg("pq_adc_lut", "d_sub", children(4)))))
    ext.injectFunction((
      FunctionIdentifier("pq_adc_score"),
      new ExpressionInfo(classOf[graft.functions.PqAdcScore].getName,
        "pq_adc_score"),
      (children: Seq[Expression]) => graft.functions.PqAdcScore(
        children(0), children(1),
        intArg("pq_adc_score", "k_sub", children(2)))))
  }
}
