package graft

import graft.operators.{Curation, DistributedRank}

/** Invariants of the per-source quality gate ([[Curation.perSourceQualityGate]]):
  * exact per-source and global keep ceilings, status consistency, and the
  * rescued/displaced disagreement sets. Value-level engine-vs-oracle
  * equality is the driver's DuckDB compare.
  */
class QualityGateSpec extends SparkTestBase {

  private val stop = Seq("the", "a", "of", "and")

  private lazy val rows = {
    val out = Curation.perSourceQualityGate(
      Tables.documents(spark, sf), stop).collect()
    DistributedRank.release(spark)
    out
  }

  test("per-source keep counts are exact ceilings of half the stratum") {
    val bySrc = rows.groupBy(_.getString(1))
    bySrc.foreach { case (src, rs) =>
      val n = rs.length
      val wantKeep = (500000L * n + 999999L) / 1000000L
      assert(rs.count(_.getBoolean(5)) == wantKeep, s"source=$src n=$n")
      // kept docs are exactly the lowest src_ranks
      assert(rs.filter(_.getBoolean(5)).map(_.getLong(3)).sorted.toSeq ==
        (1L to wantKeep).toSeq, s"source=$src")
    }
  }

  test("global keep count is the exact ceiling over the pooled corpus") {
    val n = rows.length
    val wantKeep = (500000L * n + 999999L) / 1000000L
    assert(rows.count(_.getBoolean(7)) == wantKeep)
    // global ranks are a permutation of 1..n (DistributedRank exactness)
    assert(rows.map(_.getLong(6)).sorted.toSeq == (1L to n).toSeq)
  }

  test("status partitions the corpus consistently with the two gates") {
    rows.foreach { r =>
      val (kept, keptG, status) =
        (r.getBoolean(5), r.getBoolean(7), r.getString(8))
      val want = (kept, keptG) match {
        case (true, true)   => "kept"
        case (true, false)  => "rescued"
        case (false, true)  => "displaced"
        case (false, false) => "dropped"
      }
      assert(status == want, r.toString)
    }
    // disagreement sets are the same size (both gates keep ~half)
    val rescued = rows.count(_.getString(8) == "rescued")
    val displaced = rows.count(_.getString(8) == "displaced")
    assert(math.abs(rescued - displaced) <= 20,
      s"ceiling slack only: $rescued vs $displaced")
  }

  test("result is invariant under input repartitioning") {
    val docs = Tables.documents(spark, sf)
    val a = Curation.perSourceQualityGate(docs, stop)
    val b = Curation.perSourceQualityGate(docs.repartition(7), stop)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    DistributedRank.release(spark)
  }
}
