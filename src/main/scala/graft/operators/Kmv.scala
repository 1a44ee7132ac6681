package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** KMV (k-minimum-values) distinct sketch — the order-statistics cousin of
  * HyperLogLog (Bar-Yossef et al., RANDOM'02; Beyer et al., SIGMOD'07 §3).
  * Hash every element with the engine's splitmix64 finalizer ([[
  * graft.functions.Mix64]], a 64-bit bijection — distinct keys map to
  * distinct hashes), keep the k smallest distinct hash values; with
  * θ = k-th smallest hash / 2^64, the distinct count is ≈ (k−1)/θ.
  *
  * Why keep this NEXT TO the relational HLL ([[Hll]]): a KMV sketch is a
  * uniform SAMPLE of the distinct domain, so two sketches support direct
  * set-overlap estimation — J(A,B) ≈ |K_k(A∪B) ∩ A ∩ B| / k (Beyer §5) —
  * where HLL intersection must go through inclusion-exclusion and its
  * error compounds. [[kmvJaccard]] is that estimator, with the exact
  * Jaccard riding in-row as the self-check.
  *
  * Determinism/oracle: the ENTIRE sketch is integer math on a public hash
  * — the DuckDB oracle replays hash, k-smallest selection, θ, the
  * estimate (integer micros via DIV, no float), the union-sketch merge
  * and the match counts bit-exactly.
  *
  * Scale: the aggregation state is a BOUNDED long array (≤ 2k slots) per
  * group with map-side partial aggregation — constant-size mergeable
  * state, the same shape a catalog would persist per column/partition and
  * merge at query time (the merge IS [[KmvSketchLong.merge]]). The exact
  * distinct / exact Jaccard columns are self-checks computed from
  * (group, key) distinct frames — bounded by |event types| × |users|,
  * fine at any corpus size for a bounded type domain; drop them when the
  * domain is not bounded.
  */
object Kmv {

  /** Sketch size: rel. std. error ≈ 1/√(k−2) ≈ 9% — the point is the
    * mechanism and its bit-exact oracle, not the error target.
    */
  val K = 128

  /** (K−1) · 2^64 · 10^6 — the estimate numerator, micros-scaled so the
    * estimate is one exact integer division (DECIMAL DIV here, HUGEINT //
    * in the oracle); round() on an integer-ratio double is the known
    * cross-engine tie hazard.
    */
  private val EstNumMicros: java.math.BigDecimal =
    new java.math.BigDecimal(((BigInt(K - 1) << 64) * 1000000).bigInteger)

  /** Bounded buffer: up to 2k candidate entries in the FLIPPED domain
    * (hash ^ Long.MinValue, so signed order == unsigned hash order);
    * compacted (sort + dedup + truncate to k) when full. Worst-case state
    * is 16k bytes regardless of input cardinality.
    */
  case class KmvBuf(var data: Array[Long], var n: Int) {
    def add(flipped: Long): KmvBuf = {
      if (n == data.length) compact()
      // after compact n ≤ K < data.length, so there is room
      data(n) = flipped; n += 1; this
    }
    def compact(): Unit = {
      val d = java.util.Arrays.copyOf(data, n)
      java.util.Arrays.sort(d)
      var w = 0; var i = 0
      while (i < d.length && w < K) {
        if (w == 0 || d(w - 1) != d(i)) { d(w) = d(i); w += 1 }
        i += 1
      }
      System.arraycopy(d, 0, data, 0, w)
      n = w
    }
    def sorted: Array[Long] = { compact(); java.util.Arrays.copyOf(data, n) }
  }

  /** KMV over a pre-hashed (mix64) long column. Emits the sketch as a
    * flipped-domain ascending array (≤ K entries) — array functions
    * downstream then see unsigned hash order as natural signed order.
    */
  class KmvSketchLong extends Aggregator[Long, KmvBuf, Array[Long]] {
    override def zero: KmvBuf = KmvBuf(new Array[Long](2 * K), 0)
    override def reduce(b: KmvBuf, rawHash: Long): KmvBuf =
      b.add(rawHash ^ Long.MinValue)
    override def merge(b1: KmvBuf, b2: KmvBuf): KmvBuf = {
      val d = b2.sorted
      var i = 0
      while (i < d.length) { b1.add(d(i)); i += 1 }
      b1
    }
    override def finish(r: KmvBuf): Array[Long] = r.sorted
    override def bufferEncoder: Encoder[KmvBuf] =
      org.apache.spark.sql.Encoders.product[KmvBuf]
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Per-type sketch frame: event_type, sketch (flipped asc array),
    * users_exact. One scan, bounded agg state.
    */
  private[graft] def sketches(events: DataFrame): DataFrame = {
    import graft.functions.GraftColumns.mix64
    events
      .select(col("event_type"), col("user_id"),
        mix64(col("user_id")).as("h"))
      .groupBy(col("event_type"))
      .agg(
        udaf(new KmvSketchLong).apply(col("h")).as("sketch"),
        countDistinct(col("user_id")).as("users_exact"))
  }

  /** θ as an exact DECIMAL in the unsigned hash domain: flipped + 2^63.
    * Index guarded with least(K, size) — ANSI element_at throws past the
    * end; the unsaturated branch never reads the value.
    */
  private def thetaDec(sketchCol: Column): Column =
    element_at(sketchCol, least(lit(K), size(sketchCol)))
      .cast(DecimalType(38, 0)) +
      lit(new java.math.BigDecimal("9223372036854775808"))
        .cast(DecimalType(38, 0))

  /** Distinct-users-per-event-type estimate from the K smallest hashes.
    * kmv_est_micros = (K−1)·2^64·10^6 DIV θ — exact integer; when the
    * sketch is unsaturated (distinct < K) the sketch IS the distinct set
    * and the estimate is exact.
    */
  def kmvDistinct(events: DataFrame): DataFrame =
    sketches(events)
      .withColumn("sketch_size", size(col("sketch")).cast("long"))
      .withColumn("theta_dec", thetaDec(col("sketch")))
      .select(
        col("event_type"),
        col("sketch_size"),
        when(col("sketch_size") < K, col("users_exact") * lit(1000000L))
          .otherwise(expr(
            s"CAST('${EstNumMicros.toBigInteger}' AS DECIMAL(38,0)) " +
              "DIV theta_dec"))
          .as("kmv_est_micros"),
        col("users_exact"))
      .orderBy(col("event_type"))

  /** Pairwise audience Jaccard from sketches alone: merge the two
    * sketches, keep the K smallest of the union, count how many of those
    * appear in BOTH input sketches; J ≈ matched / |union-k|. Exact
    * Jaccard in-row from the distinct (type,user) frame.
    */
  def kmvJaccard(events: DataFrame): DataFrame = {
    val sk = sketches(events)
    val pairs = sk.as("a").join(
        broadcast(sk.as("b")),
        col("a.event_type") < col("b.event_type"))
      .select(
        col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
        col("a.sketch").as("ska"), col("b.sketch").as("skb"),
        col("a.users_exact").as("na"), col("b.users_exact").as("nb"))
      .withColumn("uk",
        slice(array_sort(array_union(col("ska"), col("skb"))), 1, K))
      .select(
        col("type_a"), col("type_b"), col("na"), col("nb"),
        size(col("uk")).cast("long").as("union_k"),
        size(array_intersect(array_intersect(col("uk"), col("ska")),
          col("skb"))).cast("long").as("matched"))

    val du = events.select(col("event_type"), col("user_id")).distinct()
    val inter = du.as("a").join(du.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(
        col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("inter"))

    pairs.join(broadcast(inter), Seq("type_a", "type_b"), "left")
      .withColumn("inter", coalesce(col("inter"), lit(0L)))
      .select(
        col("type_a"), col("type_b"), col("union_k"), col("matched"),
        expr("matched * 1000000L DIV union_k").as("j_est_micros"),
        expr("inter * 1000000L DIV (na + nb - inter)").as("j_exact_micros"))
      .orderBy(col("type_a"), col("type_b"))
  }

  // ---- DuckDB replays -----------------------------------------------------

  import graft.SketchOracles.{mixChain, U64}

  /** Shared CTE prefix: mix64 of each DISTINCT user once, joined back to
    * the distinct (event_type, user) membership, k-smallest per type.
    */
  private def sketchCte: String =
    s"""WITH uu AS (SELECT DISTINCT user_id FROM events),
ux AS (SELECT user_id,
  ((CASE WHEN user_id < 0 THEN CAST(user_id AS HUGEINT) + $U64
         ELSE CAST(user_id AS HUGEINT) END)
   + 11400714819323198485::HUGEINT) % $U64 AS z0 FROM uu),
${mixChain("mh", "ux", Seq("user_id"), "z0")},
du AS (SELECT DISTINCT event_type, user_id FROM events),
hu AS (SELECT d.event_type, m.mx FROM du d JOIN mh4 m ON d.user_id = m.user_id),
rk AS (SELECT event_type, mx,
  row_number() OVER (PARTITION BY event_type ORDER BY mx) AS rn FROM hu),
ex AS (SELECT event_type, CAST(count(*) AS BIGINT) AS users_exact
  FROM du GROUP BY 1)"""

  def kmvDistinctOracleSql: String =
    s"""$sketchCte,
sk AS (SELECT event_type, CAST(count(*) AS BIGINT) AS sketch_size,
  max(mx) AS theta FROM rk WHERE rn <= $K GROUP BY 1)
SELECT s.event_type, s.sketch_size,
  CASE WHEN s.sketch_size < $K THEN e.users_exact * 1000000
       ELSE CAST(${EstNumMicros.toBigInteger}::HUGEINT // s.theta AS BIGINT)
  END AS kmv_est_micros,
  e.users_exact
FROM sk s JOIN ex e USING (event_type)
ORDER BY event_type"""

  def kmvJaccardOracleSql: String =
    s"""$sketchCte,
lk AS (SELECT event_type, list(mx ORDER BY mx) AS sk
  FROM rk WHERE rn <= $K GROUP BY 1),
pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
  a.sk AS ska, b.sk AS skb
  FROM lk a JOIN lk b ON a.event_type < b.event_type),
un AS (SELECT type_a, type_b, ska, skb,
  list_sort(list_distinct(ska || skb))[1:$K] AS uk FROM pr),
mt AS (SELECT type_a, type_b,
  CAST(len(uk) AS BIGINT) AS union_k,
  CAST(len(list_filter(uk,
    x -> list_contains(ska, x) AND list_contains(skb, x))) AS BIGINT)
    AS matched FROM un),
ij AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
  CAST(count(*) AS BIGINT) AS inter
  FROM du a JOIN du b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT m.type_a, m.type_b, m.union_k, m.matched,
  m.matched * 1000000 // m.union_k AS j_est_micros,
  COALESCE(i.inter, 0) * 1000000
    // (ea.users_exact + eb.users_exact - COALESCE(i.inter, 0))
    AS j_exact_micros
FROM mt m
LEFT JOIN ij i ON m.type_a = i.type_a AND m.type_b = i.type_b
JOIN ex ea ON m.type_a = ea.event_type
JOIN ex eb ON m.type_b = eb.event_type
ORDER BY m.type_a, m.type_b"""
}
