package graft

import graft.functions.{CosineSim, DotProduct, Fnv1a64, Mix64, RollingHash, SimHash64, WinnowStats, WordShingles}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: installs the engine's native
  * expressions into any session at build time —
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * after which `rolling_hash`, `simhash64` and `word_shingles` are plain SQL
  * functions cluster-wide. (`GraftFunctions.register` does the same
  * per-session imperatively; this is the deployment-grade wiring.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // Optimizer rule: cost-order Filter conjuncts so cheap comparisons
    // short-circuit ahead of regex/edit-distance/hash predicates.
    e.injectOptimizerRule(_ => graft.plans.PredicateCostReorder)
    e.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      exprs => RollingHash(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      exprs => SimHash64(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      exprs => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      exprs => CosineSim(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("fnv1a64"),
      new ExpressionInfo(classOf[Fnv1a64].getName, "fnv1a64"),
      exprs => Fnv1a64(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("mix64"),
      new ExpressionInfo(classOf[Mix64].getName, "mix64"),
      exprs => Mix64(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("winnow_stats"),
      new ExpressionInfo(classOf[WinnowStats].getName, "winnow_stats"),
      exprs =>
        if (exprs.length == 1) WinnowStats(exprs.head, 8, 4)
        else {
          def toInt(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
            e.eval(null) match {
              case i: Int => i
              case l: Long => l.toInt
            }
          WinnowStats(exprs.head, toInt(exprs(1)), toInt(exprs(2)))
        }))
    e.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      exprs =>
        if (exprs.length == 1) WordShingles(exprs.head, 3)
        else WordShingles(exprs.head, exprs(1).eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
        })))
  }
}
