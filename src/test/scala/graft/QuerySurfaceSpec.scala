package graft

/** Driver simulation: every entry in SparkEntry.queries must EXECUTE at
  * sf0.001 and return the same row count on a second run (determinism
  * policy — no rand(), no time-dependence, stable under re-execution).
  * This is the in-CI guard against the failure class where the query map
  * compiles but a query throws at driver time (or silently flaps).
  */
class QuerySurfaceSpec extends SparkTestBase {

  test("every driver query executes and is re-run stable at sf0.001") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val c1 = fn(spark, sf).count()
        val c2 = fn(spark, sf).count()
        if (c1 != c2) failures += s"$name: non-deterministic count ($c1 vs $c2)"
      } catch {
        case e: Throwable => failures += s"$name: ${e.getClass.getSimpleName} ${e.getMessage}"
      } finally graft.operators.DistributedRank.release(spark)
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("oracle map refers only to existing queries; flagship entry returns rows") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("after a full query run, EVERY query has an oracle (Verify dump order)") {
    // As of round 4 no query is rows-only: the pinned ANN oracles
    // materialize once the ANN queries have run, which is exactly Verify's
    // dump order (queries first, oracle_sql.json second). Verify dumps
    // oracleSqlFor (pins keyed to the verified dataset + the SparkEntry
    // default parameters), so that is the map whose completeness gates the
    // driver — the context-free SparkEntry.oracleSql deliberately drops
    // ANN entries when other suites' differently-parameterized fits
    // coexist in this JVM (the documented sole-fit fallback), which is a
    // property of the fallback, not a missing oracle.
    SparkEntry.queries("ann_ivf")(spark, sf).count()
    SparkEntry.queries("ann_pq")(spark, sf).count()
    SparkEntry.queries("ann_ivfpq")(spark, sf).count()
    SparkEntry.queries("semantic_dedup")(spark, sf).count() // semSql pin too
    SparkEntry.queries("embedding_clusters")(spark, sf).count() // clusterSql pin
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSqlFor(spark, sf).keySet
    assert(missing.isEmpty, s"queries without oracles after a run: $missing")
  }
}
