package graft

import graft.operators.{DistributedRank, Layout}

/** Pins for the zone-map skip audit. */
class ZonemapSpec extends SparkTestBase {

  test("zonemapSkipAudit: sorted layout prunes, invariants hold") {
    val lineitem = Tables.lineitem(spark, sf)
    try {
      val rows = Layout.zonemapSkipAudit(lineitem, zoneRows = 100)
        .collect().map(r => r.getString(0) -> r).toMap
      val nat = rows("natural")
      val srt = rows("value_sorted")
      // both orderings agree on the true match count and zone count
      assert(nat.getAs[Long]("rows_matching") ==
        srt.getAs[Long]("rows_matching"))
      assert(nat.getAs[Long]("n_zones") == srt.getAs[Long]("n_zones"))
      // skipping never drops matches: scanned >= matching
      Seq(nat, srt).foreach { r =>
        assert(r.getAs[Long]("rows_scanned") >=
          r.getAs[Long]("rows_matching"))
      }
      // the value-sorted layout skips at least as much as natural —
      // and when anything matches, strictly concentrates the scan
      assert(srt.getAs[Long]("skipped_zones") >=
        nat.getAs[Long]("skipped_zones"))
      assert(srt.getAs[Long]("rows_scanned") <=
        nat.getAs[Long]("rows_scanned"))
    } finally DistributedRank.release(spark)
  }
}
