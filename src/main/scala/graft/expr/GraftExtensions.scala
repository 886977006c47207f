package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `spark.sql.extensions` entry point: registers every graft native
  * function at session build time, so SQL users get `vec_dot(...)`,
  * `poly_hash(...)` etc. without touching the Scala helpers:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.expr.GraftExtensions ...
  * }}}
  *
  * The Scala query layer does not require this — [[NativeVecFns]] /
  * [[NativeTextFns]] self-register lazily into whatever session runs the
  * query — but a cluster-wide deployment should prefer the extension so
  * the functions exist in every session uniformly (including pure-SQL
  * clients over Thrift/Connect).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("vec_dot", { case Seq(a, b) => FloatVecDot(a, b) }))
    ext.injectFunction(fn("vec_l2_sq", { case Seq(a, b) => FloatVecL2Sq(a, b) }))
    ext.injectFunction(fn("vec_l1", { case Seq(a, b) => FloatVecL1(a, b) }))
    ext.injectFunction(fn("vec_rhp_bucket", { case Seq(v, n) => RhpBucket(v, n) }))
    ext.injectFunction(fn("poly_hash", { case Seq(c) => PolyHash(c) }))
    ext.injectFunction(fn("token_hashes", { case Seq(c) => TokenHashes(c) }))
    ext.injectFunction(fn("min_gram_hash", { case Seq(a, b) => MinGramHash(a, b) }))
    ext.injectFunction(fn("simhash32", { case Seq(c) => SimHash32(c) }))
    ext.injectFunction(fn("shingle_hashes", { case Seq(a, b) => ShingleHashes(a, b) }))
    ext.injectFunction(fn("minhash_sig", { case Seq(c) => MinHashSig(c) }))
    ext.injectFunction(fn("top_k_by_score", { case Seq(s, i, k) => TopKByScore(s, i, k) }))
    ext.injectFunction(fn("bloom_might_contain", { case Seq(k, b) => BloomMightContain(k, b) }))
  }
}
