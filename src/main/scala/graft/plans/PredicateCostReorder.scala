package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: reorder the conjuncts of a Filter by estimated
  * evaluation cost, so cheap comparisons short-circuit before regex /
  * edit-distance / hash predicates run. Catalyst pushes and splits
  * predicates but keeps the user's conjunct ORDER; for a scan-heavy
  * corpus filter like
  *
  *   `levenshtein(a, b) < 3 AND source = 'src1'`
  *
  * that means the edit distance runs for every row when the selective
  * equality could have skipped 95% of them. The reference pushes all its
  * filtering into Postgres (api/src/infrastructure/database.py:95-97),
  * whose planner orders quals by cost; an engine that owns its scans
  * needs the same policy.
  *
  * Safety: the SORT IS STABLE — equal-cost conjuncts keep their relative
  * order — and only deterministic conjunct lists are touched. Predicate
  * evaluation order is already an optimizer degree of freedom in Spark
  * (pushdown duplicates and reorders predicates across operators), so
  * cost-sorting conjuncts stays inside the engine's existing semantics
  * envelope. The rule is idempotent (sorting a sorted list is a no-op),
  * fixed-point-safe, and leaves single-conjunct filters untouched.
  */
object PredicateCostReorder extends Rule[LogicalPlan] with PredicateHelper {

  /** Cost tiers by the most expensive node in the conjunct's tree:
    * UDF-ish black boxes worst, then per-character/regex work, then
    * per-row hash expressions, then everything else by tree size (so a
    * bare column reference beats a nested arithmetic compare).
    */
  private[graft] def cost(e: Expression): Int = {
    var worst = 0
    e.foreach {
      case _: ScalaUDF => worst = math.max(worst, 1000)
      case _: RLike | _: Like | _: RegExpExtract | _: RegExpReplace |
          _: Levenshtein | _: StringSplit =>
        worst = math.max(worst, 100)
      case h: HigherOrderFunction => worst = math.max(worst, 100)
      case x if x.getClass.getName.startsWith("graft.functions.") =>
        worst = math.max(worst, 50)
      case _ =>
    }
    if (worst > 0) worst else math.min(e.references.size + treeSize(e), 9)
  }

  private def treeSize(e: Expression): Int =
    1 + e.children.map(treeSize).sum

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) if cond.deterministic =>
      val parts = splitConjunctivePredicates(cond)
      if (parts.length <= 1) f
      else {
        val sorted = parts.sortBy(cost) // stable
        if (sorted eq parts) f
        else if (sorted.zip(parts).forall { case (a, b) => a eq b }) f
        else Filter(sorted.reduceLeft(And), child)
      }
  }
}
