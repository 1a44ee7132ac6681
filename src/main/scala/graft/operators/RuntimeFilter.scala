package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Runtime-filter (Bloom) semi-join pruning — the standard 100 TB join
  * preparation: before shuffling a huge fact table against a filtered
  * dimension, broadcast a Bloom filter of the dimension's join keys and
  * drop non-matching fact rows AT THE SCAN, so the shuffle carries only
  * rows that can possibly join.
  *
  * Spark's AQE injects this automatically in some shapes
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`); this utility is
  * the explicit, composable form for when the planner can't see the
  * opportunity (e.g. the dimension side is a derived frame the optimizer
  * won't reorder across, or the join happens in a later pipeline stage).
  *
  * False positives only (never drops a joining row — correctness is
  * equivalence with the plain join, asserted in PlanAuditSpec); the filter
  * is sized by expectedKeys/fpp and broadcast once.
  */
object RuntimeFilter {

  /** Prune `fact` to rows whose `factKey` probably appears among
    * `dim`'s `dimKey` values (Bloom semantics: no false negatives).
    */
  def bloomPrune(
      fact: DataFrame,
      factKey: Column,
      dim: DataFrame,
      dimKey: String,
      expectedKeys: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val bloom = dim.stat.bloomFilter(dimKey, expectedKeys, fpp)
    // native probe expression (codegen reference object), NOT a Scala UDF —
    // this runs once per fact row at the scan
    fact.filter(graft.functions.GraftColumns.bloomMightContainLong(factKey, bloom))
  }
}
