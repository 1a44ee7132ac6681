package graft

import graft.operators.Privacy

/** Fixtures for the k-anonymity audit and the generalization ladder. */
class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  // nation 1 / SEG A: six records in the 1000-1999 band (k=6, safe at
  // level 0); nation 1 / SEG B: two records in distinct $1000 bands but
  // the same $5000 band (level-1 promotion); nation 2 / SEG C: a single
  // record that no ladder level can save (suppressed).
  private val fixture = Seq(
    (1L, 1, "A", 1100.0), (2L, 1, "A", 1200.0), (3L, 1, "A", 1300.0),
    (4L, 1, "A", 1400.0), (5L, 1, "A", 1500.0), (6L, 1, "A", 1500.0),
    (7L, 1, "B", 1000.0), (8L, 1, "B", 2000.0), (9L, 1, "B", 3000.0),
    (10L, 1, "B", 4000.0), (11L, 1, "B", 4999.0),
    (12L, 2, "C", 9000.0)
  ).toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")

  test("kAnonymityAudit: k, l-diversity and at-risk per QI tuple") {
    val got = Privacy.kAnonymityAudit(fixture, k = 5).collect()
    val byQi = got.map(r =>
      (r.getInt(0), r.getString(1), r.getString(2)) -> r).toMap
    val a = byQi((1, "A", "b1k:1"))
    assert(a.getLong(3) == 6L && a.getLong(4) == 5L && !a.getBoolean(5))
    val b = byQi((1, "B", "b1k:1"))
    assert(b.getLong(3) == 1L && b.getBoolean(5))
    assert(byQi((2, "C", "b1k:9")).getBoolean(5))
  }

  test("kAnonymize: finest safe level wins; singletons suppressed") {
    val got = Privacy.kAnonymize(fixture, k = 5).collect()
    val rows = got.map(r => ((r.getInt(0), r.getString(1), r.getString(2),
      r.getInt(3)), r.getLong(4))).toMap
    // SEG A publishes at level 0 in its $1000 band
    assert(rows(((1, "A", "b1k:1", 0))) == 6L)
    // SEG B's five scattered records all land in the b5k:0 level-1 group
    assert(rows(((1, "B", "b5k:0", 1))) == 5L)
    // the singleton is suppressed at level 2
    assert(rows(((2, "C", "*", 2))) == 1L)
    // every input record is accounted for exactly once
    assert(got.map(_.getLong(4)).sum == 12L)
  }

  test("kAnonymize: promotion is monotone — published groups satisfy k") {
    val got = Privacy.kAnonymize(fixture, k = 5).collect()
    got.filter(_.getInt(3) < 2).foreach(r => assert(r.getLong(4) >= 5L))
  }
}
