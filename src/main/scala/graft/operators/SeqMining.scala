package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequential pattern mining: frequent event-type subsequences within
  * per-user DAILY activity sequences (the PrefixSpan/GSP family — Pei
  * et al., ICDE 2001; Srikant & Agrawal, EDBT 1996), bounded to pattern
  * length ≤ 3.
  *
  * The sequence unit is (user, calendar day) — the retention-cohort
  * activity block. (The 30-minute gap-sessions the sessionize queries
  * use average 1.05 events on this corpus, which would make every
  * length-≥2 pattern infrequent and the mining vacuous; the day block
  * averages ~15 events, and the 1 % support floor then lands INSIDE the
  * observed support distributions — all levels are exercised and the
  * floor genuinely discriminates, excluding part of the length-3
  * candidate set at every tested scale.)
  *
  * A pattern `a>b>c` is supported by a sequence iff it contains events
  * of types a, b, c at strictly increasing positions (NOT necessarily
  * adjacent — subsequence, not substring, which is what separates this
  * from the Markov-transition / session-path queries). Support = number
  * of supporting sequences; a pattern is frequent iff
  * support ≥ minSup = ⌊S/100⌋ + 1 (strictly more than 1 % of the S
  * sequences).
  *
  * Existence is decided by the GREEDY left-to-right witness: take the
  * earliest a-position p₁, the earliest b-position > p₁, then any
  * c-position after that. Greedy matching is exact for subsequence
  * existence (the standard exchange argument: any witness can be
  * left-normalized one element at a time), so the decision — and hence
  * the support counts — are oracle-reproducible from per-(sequence,type)
  * sorted position lists alone.
  *
  * Scale design:
  *  - The corpus never materializes candidate×event pairs. One window
  *    pass tags sessions (shuffle on user_id), one aggregate reduces the
  *    corpus to (session, type, positions[]) — at most |alphabet| rows
  *    per session — and every later stage joins CANDIDATES (≤ |Σ|² + |Σ|³
  *    literal rows, |Σ| = event-type alphabet ≤ a few dozen) against that
  *    reduced frame on (session, type): plain equi-joins with the tiny
  *    side broadcast.
  *  - Level-wise Apriori pruning (the algorithmic content vs. brute
  *    force): length-2 candidates extend only frequent length-1 types;
  *    length-3 candidates require BOTH their length-2 prefix and suffix
  *    frequent. The two driver collects this needs are alphabet-bounded
  *    (≤ |Σ|², the same bounded-collect class as the ANN codebook fits),
  *    and pruning is sound — an infrequent prefix/suffix bounds the
  *    extension's support from above — so the pruned engine result
  *    equals the oracle's brute-force-all-candidates result row for row.
  *  - Position lists are bounded by one user-day of events; a
  *    pathological million-event day would concentrate in one list, the
  *    same single-key hazard every sessionization has (and salted the
  *    same way); real activity volumes keep the lists small.
  */
object SeqMining {

  /** Frequent length-1..3 event-type subsequences over user-day
    * sequences. Output: (pattern "a>b>c", len, support), ordered by
    * (len, pattern).
    */
  def frequentSequences(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._

    // (sequence, type, sorted positions); sequence key = (user_id, day)
    val tagged = events
      .withColumn("blk", date_trunc("day", col("ts")))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), col("blk"))
          .orderBy(col("ts"), col("event_id"))))
    val tp = tagged
      .groupBy(col("user_id"), col("blk"), col("event_type"))
      .agg(sort_array(collect_list(col("pos"))).as("ps"))
      .cache()

    val totalSessions = tp
      .select(col("user_id"), col("blk")).distinct().count()
    val minSup = totalSessions / 100 + 1

    // L1: support = sessions containing the type at least once.
    // L-frames are alphabet-bounded; localCheckpoint (not cache) so the
    // final union can outlive tp's unpersist without recomputing the
    // events window per reference (the lazy-l3 plan re-ran it 3x).
    val l1 = tp.groupBy(col("event_type").as("t1"))
      .agg(count(lit(1)).as("support")) // one row per (session,type)
      .filter(col("support") >= minSup)
      .localCheckpoint()
    // alphabet-bounded collect (≤ |Σ| rows) — the Apriori frontier
    val f1 = l1.select(col("t1")).as[String].collect().toSeq.sorted

    def candidates2(ts1: Seq[String], ts2: Seq[String]): DataFrame =
      ts1.flatMap(a => ts2.map(b => (a, b))).toDF("t1", "t2")

    // L2: earliest t1 position, any t2 strictly after it.
    def support2(cand: DataFrame): DataFrame =
      cand
        .join(tp.select(col("user_id"), col("blk"),
          col("event_type").as("t1"),
          element_at(col("ps"), 1).as("p1")), Seq("t1"))
        .join(tp.select(col("user_id"), col("blk"),
          col("event_type").as("t2"), col("ps").as("ps2")),
          Seq("user_id", "blk", "t2"))
        // ps2 is sorted ascending, so "any element after p1" is just a
        // last-element compare — the interpreted filter() HOF re-entered
        // its lambda per element on every joined row (guide §4)
        .filter(element_at(col("ps2"), -1) > col("p1"))
        .groupBy(col("t1"), col("t2"))
        .agg(count(lit(1)).as("support"))

    val l2 = support2(candidates2(f1, f1))
      .filter(col("support") >= minSup).localCheckpoint()
    val f2 = l2.select(col("t1"), col("t2")).as[(String, String)]
      .collect().toSeq.sorted
    val f2set = f2.toSet

    // L3 candidates: frequent prefix (t1,t2) extended by t3 with the
    // suffix (t2,t3) also frequent — both prunes are sound upper bounds.
    val cand3 = f2.flatMap { case (a, b) =>
      f1.collect { case c if f2set.contains((b, c)) => (a, b, c) }
    }

    val l3 =
      if (cand3.isEmpty)
        Seq.empty[(String, String, String, Long)]
          .toDF("t1", "t2", "t3", "support")
      else
        cand3.toDF("t1", "t2", "t3")
          .join(tp.select(col("user_id"), col("blk"),
            col("event_type").as("t1"),
            element_at(col("ps"), 1).as("p1")), Seq("t1"))
          .join(tp.select(col("user_id"), col("blk"),
            col("event_type").as("t2"), col("ps").as("ps2")),
            Seq("user_id", "blk", "t2"))
          // native greedy witness: first t2 position strictly after p1
          // (null when none — no CaseWhen/ANSI guard needed, unlike the
          // element_at(filter(...), 1) HOF pair it replaces)
          .withColumn("p2", graft.functions.GraftColumns
            .firstGreaterInt(col("ps2"), col("p1")))
          .filter(col("p2").isNotNull)
          .join(tp.select(col("user_id"), col("blk"),
            col("event_type").as("t3"), col("ps").as("ps3")),
            Seq("user_id", "blk", "t3"))
          .filter(element_at(col("ps3"), -1) > col("p2"))
          .groupBy(col("t1"), col("t2"), col("t3"))
          .agg(count(lit(1)).as("support"))
          .filter(col("support") >= minSup)
          .localCheckpoint()

    val out = l1
      .select(col("t1").as("pattern"), lit(1).as("len"), col("support"))
      .unionByName(l2.select(
        concat_ws(">", col("t1"), col("t2")).as("pattern"),
        lit(2).as("len"), col("support")))
      .unionByName(l3.select(
        concat_ws(">", col("t1"), col("t2"), col("t3")).as("pattern"),
        lit(3).as("len"), col("support")))
      .orderBy(col("len"), col("pattern"))
    // l1/l2/l3 are materialized checkpoints, so tp (and the events
    // window under it) is safe to drop before the caller's action
    tp.unpersist()
    out
  }

  /** Brute-force DuckDB replay: all length-1/2/3 candidates over the
    * distinct alphabet (Apriori pruning on the engine side never changes
    * the post-filter result set), greedy-witness existence via
    * list_filter, 1 %-plus-one support floor.
    */
  def frequentSequencesOracleSql: String =
    """WITH pos AS (
      |  SELECT user_id, date_trunc('day', ts) AS blk, event_type,
      |         row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
      |                            ORDER BY ts, event_id) AS p
      |  FROM events
      |),
      |tp AS (
      |  SELECT user_id, blk, event_type,
      |         list_sort(list(p)) AS ps
      |  FROM pos GROUP BY user_id, blk, event_type
      |),
      |ns AS (SELECT count(*) AS s
      |       FROM (SELECT DISTINCT user_id, blk FROM tp)),
      |msup AS (SELECT s // 100 + 1 AS m FROM ns),
      |alpha AS (SELECT DISTINCT event_type AS t FROM tp),
      |l1 AS (
      |  SELECT event_type AS pattern, 1 AS len, count(*) AS support
      |  FROM tp GROUP BY event_type
      |),
      |c2 AS (SELECT a.t AS t1, b.t AS t2 FROM alpha a, alpha b),
      |l2 AS (
      |  SELECT c2.t1 || '>' || c2.t2 AS pattern, 2 AS len,
      |         count(*) AS support
      |  FROM c2
      |  JOIN tp a ON a.event_type = c2.t1
      |  JOIN tp b ON b.user_id = a.user_id AND b.blk = a.blk
      |           AND b.event_type = c2.t2
      |  WHERE len(list_filter(b.ps, x -> x > a.ps[1])) > 0
      |  GROUP BY c2.t1, c2.t2
      |),
      |c3 AS (SELECT a.t AS t1, b.t AS t2, c.t AS t3
      |       FROM alpha a, alpha b, alpha c),
      |w3 AS (
      |  SELECT c3.t1, c3.t2, c3.t3, a.user_id, a.blk,
      |         list_min(list_filter(b.ps, x -> x > a.ps[1])) AS p2,
      |         c.ps AS ps3
      |  FROM c3
      |  JOIN tp a ON a.event_type = c3.t1
      |  JOIN tp b ON b.user_id = a.user_id AND b.blk = a.blk
      |           AND b.event_type = c3.t2
      |  JOIN tp c ON c.user_id = a.user_id AND c.blk = a.blk
      |           AND c.event_type = c3.t3
      |),
      |l3 AS (
      |  SELECT t1 || '>' || t2 || '>' || t3 AS pattern, 3 AS len,
      |         count(*) AS support
      |  FROM w3
      |  WHERE p2 IS NOT NULL
      |    AND len(list_filter(ps3, x -> x > p2)) > 0
      |  GROUP BY t1, t2, t3
      |),
      |allp AS (
      |  SELECT * FROM l1 UNION ALL SELECT * FROM l2
      |  UNION ALL SELECT * FROM l3
      |)
      |SELECT pattern, len, CAST(support AS BIGINT) AS support
      |FROM allp
      |WHERE support >= (SELECT m FROM msup)
      |ORDER BY len, pattern""".stripMargin
}
