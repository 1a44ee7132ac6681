package graft

import graft.operators.EntityResolution

/** Fixtures for the record-linkage operator: the multi-pass-blocking
  * recall guarantee and the Fellegi–Sunter separation on a keyspace small
  * enough to reason about. The driver's DuckDB oracle replays the whole
  * pipeline (corruption included) at corpus scale.
  */
class EntityResolutionSpec extends SparkTestBase {
  import spark.implicits._

  private def customers(n: Int) = (0 until n).map { k =>
    (k.toLong, k % 3, s"SEG${k % 2}", k * 10.0 + 0.25)
  }.toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")

  test("entityMatches: recall 1.0 — every corrupted twin links back") {
    // 200 keys -> drop positions sweep every region of the word-name
    // (first word, separators, middle, last word), so both blocking
    // passes are exercised and the union must still cover all keys.
    val got = EntityResolution.entityMatches(customers(200)).collect()
    val self = got.filter(r => r.getLong(0) == r.getLong(1))
    assert(self.length == 200)
    self.foreach { r =>
      assert(r.getInt(2) == 1) // exactly one dropped character
      assert(r.getBoolean(3) && r.getBoolean(4)) // segment + balance agree
      assert(r.getDouble(5) > 5.0)
    }
  }

  test("entityMatches: pair dedup across passes, deterministic output") {
    val df = customers(64)
    val a = EntityResolution.entityMatches(df).collect()
    val b = EntityResolution.entityMatches(df).collect()
    assert(a.toSeq == b.toSeq)
    // a pair found by BOTH passes appears once
    val keys = a.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length)
  }

  test("entityMatches: threshold separates non-matching co-blocked pairs") {
    // With a high threshold nothing survives; with a very low one the
    // co-blocked disagreeing pairs appear with strictly lower scores.
    val df = customers(100)
    val strict = EntityResolution.entityMatches(df, threshold = 20.0)
    assert(strict.count() == 0L)
    val loose = EntityResolution.entityMatches(df, threshold = -100.0)
      .collect()
    val (selfScores, crossScores) = loose.partition(r =>
      r.getLong(0) == r.getLong(1))
    assert(selfScores.length == 100)
    assert(crossScores.nonEmpty) // blocking does co-block non-matches
    val minSelf = selfScores.map(_.getDouble(5)).min
    val maxCross = crossScores.map(_.getDouble(5)).max
    assert(maxCross < minSelf)
  }

  test("fsMuEstimates: planted truth gives separating m/u per field") {
    val got = EntityResolution.fsMuEstimates(customers(200))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet === Set("balance", "name", "segment"))
    got.values.foreach { r =>
      // every true pair is a 1-char corruption: n_match == keyspace
      assert(r.getLong(1) === 200L)
      // m strictly separates from u on every field
      assert(r.getLong(5) > r.getLong(6), r.getString(0))
    }
    // the corruption never moves lev beyond 1: name m is exactly 1.0
    assert(got("name").getLong(5) === 1000000L)
    // balance is key-derived and exact: m = 1.0 there too
    assert(got("balance").getLong(5) === 1000000L)
    // weights where defined have the FS signs
    got.values.foreach { r =>
      if (!r.isNullAt(7)) assert(r.getDouble(7) > 0.0)
      if (!r.isNullAt(8)) assert(r.getDouble(8) < 0.0)
    }
  }
}
