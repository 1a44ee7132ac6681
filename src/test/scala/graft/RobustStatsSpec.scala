package graft

import java.sql.Timestamp

import graft.operators.{DistributedRank, Experiment, RobustStats}
import org.apache.spark.sql.functions._

/** Fixture pins for the robust-statistics family. */
class RobustStatsSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("trimmedMeans: hand-computed 10-value group") {
    import spark.implicits._
    // one segment, values 10..100 dollars: n=10, t=1 → trim keeps
    // 20..90 (sum 440.00), lo=20.00, hi=90.00;
    // trimmed mean = 44000 cents·10^4 / 8 = 55_000_000 micros;
    // winsor sum = 44000 + 2000 + 9000 = 55000 → 55_000_000 micros.
    val orders = (1 to 10).map(i =>
      (i.toLong, 1L, i * 10.0)).toDF("o_orderkey", "o_custkey",
      "o_totalprice")
    val customer = Seq((1L, "SEG")).toDF("c_custkey", "c_mktsegment")
    try {
      val r = RobustStats.trimmedMeans(orders, customer).collect().head
      assert(r.getAs[Long]("n") == 10L && r.getAs[Long]("t") == 1L)
      assert(r.getAs[Long]("lo_cents") == 2000L)
      assert(r.getAs[Long]("hi_cents") == 9000L)
      assert(r.getAs[Long]("trimmed_mean_micros") == 55000000L)
      assert(r.getAs[Long]("winsor_mean_micros") == 55000000L)
    } finally DistributedRank.release(spark)
  }

  test("theilSen: exact median slope on a planted series with an outlier") {
    import spark.implicits._
    // hourly counts 1,2,3,12 at hours 0..3: most pairwise slopes are 1;
    // the outlier drags only the tail. Slopes (micros): (1,2)=1e6,
    // (1,3)=1e6, (2,3)=1e6, (1,12): 11/3→3666666, (2,12): 10/2→5e6,
    // (3,12)=9e6. Lower median (k=3) = 1e6.
    val rows = Seq((0, 1), (1, 2), (2, 3), (3, 12)).flatMap {
      case (h, n) => (1 to n).map(i =>
        (h * 100L + i, 1L, "view", 1.0,
          ts(f"2024-01-01 0$h:00:00")))
    }
    val events = rows.toDF("event_id", "user_id", "event_type", "value",
      "ts")
    try {
      val r = RobustStats.theilSen(events).collect().head
      assert(r.getAs[Long]("n_pairs") == 6L)
      assert(r.getAs[Long]("slope_micros_median") == 1000000L)
    } finally DistributedRank.release(spark)
  }

  test("simpsonReversal: planted reversal is flagged") {
    import spark.implicits._
    // Classic 2x2x2: variant 1 wins in BOTH strata pooled... construct
    // the opposite: stratum A variant1 better, stratum B variant1 better,
    // pooled variant0 better via unbalanced sizes.
    //  A (Sunday):  v0: 1/10 conv, v1: 5/10  → sign +1
    //  B (Monday):  v0: 60/100,    v1: 9/10  → sign +1
    //  pooled: v0 61/110 (0.55), v1 14/20 (0.70) → +1. Need reversal...
    // Use: A: v0 9/10, v1 80/100 → v1 worse (sign −1);
    //      B: v0 5/100, v1 1/10  → v1 better? 0.05 vs 0.1 → +1.
    // pooled: v0 14/110 (0.127), v1 81/110 (0.736) → +1; A reverses.
    def burst(u: Long, day: String, total: Int, conv: Int) =
      (1 to total).map(i => (u * 100000 + day.hashCode.abs % 1000 * 1000
        + i.toLong, u, if (i <= conv) "purchase" else "view", 1.0,
        ts(s"$day 12:00:00")))
    // 2024-01-07 is a Sunday, 2024-01-08 a Monday; u=2 → v0, u=1 → v1
    val events = (burst(2L, "2024-01-07", 10, 9) ++
      burst(1L, "2024-01-07", 100, 80) ++
      burst(2L, "2024-01-08", 100, 5) ++
      burst(1L, "2024-01-08", 10, 1))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val got = Experiment.simpsonReversal(events)
      .collect().map(r => r.getString(0) ->
        (r.getInt(5), r.getBoolean(6))).toMap
    assert(got("0") === ((-1, true)))  // Sunday stratum reverses
    assert(got("1") === ((1, false)))
    assert(got("__agg__") === ((1, false)))
  }

  test("simpsonReversal day-of-week matches between engines' conventions") {
    import spark.implicits._
    // 2024-01-07 is a Sunday: Spark dayofweek=1 → stratum "0"
    val events = Seq((1L, 1L, "view", 1.0, ts("2024-01-07 01:00:00")))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val strata = Experiment.simpsonReversal(events)
      .select(col("stratum")).collect().map(_.getString(0)).toSet
    assert(strata.contains("0"))
  }
}
