package graft.plans

import graft.functions.{DotProductF64, HashedShingles3, MinHashSignature, SignBandBuckets, SortedLongIntersectSize, WinnowMinMd5}
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
        children(1).eval(null).asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("sign_band_buckets"),
      new ExpressionInfo(classOf[SignBandBuckets].getName, "sign_band_buckets"),
      (children: Seq[Expression]) => SignBandBuckets(children(0),
        children(1).eval(null).asInstanceOf[Int],
        children(2).eval(null).asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("winnow_min_md5"),
      new ExpressionInfo(classOf[WinnowMinMd5].getName, "winnow_min_md5"),
      (children: Seq[Expression]) => WinnowMinMd5(children.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_f64"),
      new ExpressionInfo(classOf[DotProductF64].getName, "dot_f64"),
      (children: Seq[Expression]) => DotProductF64(children(0), children(1))))
  }
}
