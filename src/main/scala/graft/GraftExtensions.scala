package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{FloatVecDot, MinHash16, ShingleHash3, SimHash64, SimHashSig, TokenHash64, ZOrder2}
import graft.plans.{AsofJoinStrategy, GraftTextSearch, TextIndex}

/** Library entry point for Spark's extension mechanism: registers every
  * graft native expression at session build time, so a user enables the
  * whole engine with
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)   // or
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  * and then uses `graft_vec_dot` / `graft_simhash64` / `graft_minhash16`
  * / `graft_text_search` from SQL or `expr(...)` directly. The text-index
  * rewrite rule still activates per session via [[TextIndex.enable]]
  * (it needs the index path conf); the query modules' `register(...)`
  * calls remain as a fallback for sessions built without extensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def fn(name: String, clazz: Class[_], builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        builder))
    fn(FloatVecDot.name, classOf[FloatVecDot], cs => FloatVecDot(cs(0), cs(1)))
    fn(SimHash64.name, classOf[SimHash64], cs => SimHash64(cs.head))
    fn(MinHash16.name, classOf[MinHash16], cs => MinHash16(cs.head))
    fn(ShingleHash3.name, classOf[ShingleHash3], cs => ShingleHash3(cs.head))
    fn(TokenHash64.name, classOf[TokenHash64], cs => TokenHash64(cs.head))
    fn(SimHashSig.name, classOf[SimHashSig], cs => SimHashSig(cs.head))
    fn(ZOrder2.name, classOf[ZOrder2], cs => ZOrder2(cs(0), cs(1)))
    fn(TextIndex.name, classOf[GraftTextSearch], cs => GraftTextSearch(cs(0), cs(1)))
    // whole-operator tier: the native ASOF join's planner strategy
    ext.injectPlannerStrategy(_ => AsofJoinStrategy)
  }
}
