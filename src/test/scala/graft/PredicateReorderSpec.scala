package graft

import graft.plans.PredicateCostReorder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{And, Expression, RLike}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.scalatest.BeforeAndAfterAll

/** The custom optimizer rule: plan-shape effect, semantic neutrality,
  * and the stability guarantee on equal-cost conjuncts. Unit tests apply
  * the rule to ANALYZED plans (local relations would constant-fold in
  * the full optimizer); the integration test registers the rule on the
  * shared session via experimental.extraOptimizations and checks a
  * parquet-backed query end to end.
  */
class PredicateReorderSpec extends SparkTestBase with BeforeAndAfterAll {
  import spark.implicits._

  private def split(e: Expression): Seq[Expression] = e match {
    case And(l, r) => split(l) ++ split(r)
    case other => Seq(other)
  }

  private def reorderedConjuncts(df: DataFrame): Seq[Expression] = {
    val out: LogicalPlan = PredicateCostReorder(df.queryExecution.analyzed)
    val filters = out.collect { case Filter(cond, _) => cond }
    assert(filters.nonEmpty, "no Filter in analyzed plan")
    split(filters.head)
  }

  test("expensive levenshtein conjunct moves behind the cheap equality") {
    val df = Seq(("abc", "abd", "s1"), ("xyz", "qqq", "s2"))
      .toDF("a", "b", "src")
      .filter("levenshtein(a, b) < 3 AND src = 's1'")
    val cs = reorderedConjuncts(df)
    assert(cs.length == 2)
    assert(PredicateCostReorder.cost(cs.head) <
      PredicateCostReorder.cost(cs.last))
    assert(cs.head.toString.toLowerCase.contains("src"),
      s"cheap equality must lead: $cs")
  }

  test("regex yields to both comparisons; equal-cost order is stable") {
    val df = Seq((1L, "aa", 5L), (2L, "bb", 9L)).toDF("x", "s", "y")
      .filter("s rlike 'a+' AND x > 0 AND y < 100")
    val cs = reorderedConjuncts(df)
    assert(cs.length == 3)
    assert(cs(0).toString.contains("x") && cs(1).toString.contains("y"),
      s"stable order among equal-cost conjuncts: $cs")
    assert(cs(2).isInstanceOf[RLike])
  }

  test("single-conjunct filters pass through unchanged") {
    val df = Seq((1L, 2L)).toDF("x", "y").filter("x > 0")
    assert(reorderedConjuncts(df).length == 1)
  }

  test("injected end-to-end: optimized plan reorders, results unchanged") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ PredicateCostReorder
    try {
      val docs = Tables.documents(spark, sf)
      val q = docs.filter(
        "levenshtein(substring(text, 1, 8), 'the fast') < 4 " +
          "AND source = 'src1'")
      val filters = q.queryExecution.optimizedPlan.collect {
        case Filter(cond, _) => cond
      }
      assert(filters.nonEmpty)
      val cs = split(filters.head)
      // the optimizer adds IsNotNull guards (cheapest tier, lead); the
      // levenshtein conjunct must land LAST, behind the equality
      assert(cs.last.toString.toLowerCase.contains("levenshtein"),
        s"expensive conjunct must trail: $cs")
      assert(cs.indexWhere(_.toString.contains("src1")) <
        cs.indexWhere(_.toString.toLowerCase.contains("levenshtein")),
        s"equality must precede levenshtein: $cs")
      // semantic neutrality: same rows as the sequential formulation
      val expect = docs.filter("source = 'src1'")
        .filter("levenshtein(substring(text, 1, 8), 'the fast') < 4")
        .select("doc_id").collect().map(_.getLong(0)).sorted
      val got = q.select("doc_id").collect().map(_.getLong(0)).sorted
      assert(got.toSeq == expect.toSeq)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ eq PredicateCostReorder)
    }
  }
}
