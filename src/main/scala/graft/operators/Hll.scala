package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational HyperLogLog (Flajolet et al. 2007): the sketch state — m=256
  * registers per group — is materialized as ROWS ((group, bucket) ->
  * max(rho)) instead of an opaque binary blob, so the whole estimator is
  * plain relational algebra: registers build with one map-side-combined
  * groupBy-max; merging shards/batches is the same groupBy-max again (max
  * is associative, commutative, idempotent); and the harmonic-mean fold is
  * an exact integer aggregation. Every stage is expressible in ANSI SQL,
  * which gives this approximate query a full DuckDB oracle — unlike an
  * engine-internal HLL (Spark's approx_count_distinct, DuckDB's own),
  * whose register encodings differ across engines. The Spark-builtin path
  * is still exercised in PropertySpec as a cross-check.
  *
  * Bit-exactness across engines, by construction:
  *   - the hash is [[graft.functions.Mix64]] (splitmix64 finalizer) of the
  *     user id — HUGEINT-mod-2^64-emulatable;
  *   - rho comes from integer bit-smear + bit_count, never floating log2;
  *   - the harmonic sum Σ 2^-rho is EXACT fixed point: Σ 2^(52-rho) as a
  *     64-bit integer, rho capped at 52 (P[rho > 52] = 2^-52 per user —
  *     the cap's bias is far below double resolution), so the only
  *     floating ops on the path are one long->double conversion and one
  *     division;
  *   - the small-range correction m·ln(m/V) has only m possible values:
  *     computed ONCE on the JVM ([[LinearCounting]]) and shared with the
  *     oracle as literals, so neither engine's libm is on the result path.
  *
  * Scale: the register frame is at most |groups| × m small-int rows, and
  * the per-user pre-aggregation shuffles (group, user) pairs once — the
  * exact count-distinct this replaces at 100 TB expands every distinct
  * pair through the final aggregation too, but must keep them; the sketch
  * path's standing state is constant per group.
  */
object Hll {
  val P = 8
  /** Register count m = 2^P. */
  val M: Int = 1 << P
  /** HLL bias constant alpha_m (m >= 128 branch of Flajolet et al.). */
  val Alpha: Double = 0.7213 / (1.0 + 1.079 / M)
  /** alpha·m²·2^52 — numerator of the fixed-point harmonic mean. */
  val EstNumerator: Double = Alpha * M * M * 4503599627370496.0
  /** Small-range (linear counting) lookup: lc(V) = m·ln(m/V), V = 1..m. */
  lazy val LinearCounting: Array[Double] =
    Array.tabulate(M)(v0 => M * math.log(M.toDouble / (v0 + 1)))

  /** rho of the (64-P)-bit suffix w: 1 + leading zeros within that width,
    * i.e. (64-P) - bitlength(w) + 1, capped at 52 so 2^(52-rho) stays an
    * integer. bitlength via bit-smear + bit_count — pure integer ops with
    * identical semantics in any engine (w >= 0 after the unsigned shift,
    * so logical and arithmetic right shifts agree).
    */
  private def rho(w: Column): Column = {
    val sm = Seq(1, 2, 4, 8, 16, 32)
      .foldLeft(w)((v, s) => v.bitwiseOR(shiftrightunsigned(v, s)))
    least(lit(52), lit(64 - P + 1) - bit_count(sm))
  }

  /** Exact + HLL-approximate distinct-user counts AND the total row count
    * per group, fused into ONE pass over the input — three cascading
    * aggregations with strictly shrinking keys, no second scan and no
    * join:
    *
    *   L1 (group, user)   -> user_events        (the de-dup + row count)
    *   L2 (group, bucket) -> max(rho), bucket-local distinct count,
    *                         partial event sum   (<= |groups| * (m+1) rows)
    *   L3 (group)         -> harmonic fold + exact counts
    *
    * L2/L3 are tiny next to L1, and L1 is the unavoidable distinct
    * shuffle. Null users follow count(DISTINCT) semantics: they count in
    * event_count but contribute no register (null hash propagates to a
    * null bucket; its rho is explicitly nulled so the harmonic sum and
    * `present` skip it identically here and in the DuckDB oracle).
    * Output: groupNames..., event_count, users_exact, approx_users.
    */
  def approxDistinctUsersWithCount(
      df: DataFrame, groupNames: Seq[String], userCol: String): DataFrame = {
    val g = groupNames.map(col)
    val h = graft.functions.GraftColumns.mix64(col(userCol))
    val l1 = df
      .groupBy(g :+ col(userCol): _*)
      .agg(count(lit(1)).as("user_events"))
    val l2 = l1
      .select(g ++ Seq(
        h.bitwiseAND(lit((M - 1).toLong)).as("bucket"), // null user -> null bucket
        when(col(userCol).isNotNull, rho(shiftrightunsigned(h, P))).as("rho"),
        col("user_events")): _*)
      .groupBy(g :+ col("bucket"): _*)
      .agg(
        max(col("rho")).as("rho"),
        count(col("bucket")).as("bucket_users"), // 0 for the null-bucket group
        sum(col("user_events")).as("events"))
    l2
      .groupBy(g: _*)
      .agg(
        sum(col("events")).as("event_count"),
        sum(col("bucket_users")).as("users_exact"),
        count(col("rho")).as("present"), // null-rho (null-user) row not a register
        sum(expr("shiftleft(1L, 52 - rho)")).as("sum_present"))
      .select(g ++ Seq(col("event_count"), col("users_exact"),
        estimator.as("approx_users")): _*)
  }

  /** The HLL estimate from the folded register stats (`present` register
    * rows, `sum_present` = Σ 2^(52-rho)) — the single definition every
    * estimating query shares (harmonic fold + linear-counting branch).
    */
  private def estimator: Column = {
    val lcLit = array(LinearCounting.map(lit).toIndexedSeq: _*)
    val v = (lit(M) - col("present")).cast("int")
    val sumNum = col("sum_present") + v.cast("long") * lit(1L << 52)
    val eRaw = lit(EstNumerator) / sumNum.cast("double")
    when(v > lit(0) && eRaw <= lit(2.5 * M), element_at(lcLit, v))
      .otherwise(eRaw)
  }

  /** The sketch STATE itself: one (group..., bucket, rho) row per
    * non-empty register — the mergeable representation. Null users
    * produce no register (count(DISTINCT) semantics).
    */
  def registers(
      df: DataFrame, groupNames: Seq[String], userCol: String): DataFrame = {
    val g = groupNames.map(col)
    val h = graft.functions.GraftColumns.mix64(col(userCol))
    df
      .filter(col(userCol).isNotNull)
      .select(g ++ Seq(
        h.bitwiseAND(lit((M - 1).toLong)).as("bucket"),
        rho(shiftrightunsigned(h, P)).as("rho")): _*)
      .groupBy(g :+ col("bucket"): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** Merge register frames down to a COARSER grouping and estimate — the
    * property the row-based sketch exists for: max(rho) is associative /
    * commutative / idempotent, so rolling hourly registers into daily
    * ones (or shard sketches into a global one) is the same groupBy-max
    * that built them, and the merged estimate EQUALS the estimate built
    * directly at the coarse grain (spec-asserted; the oracle replays the
    * direct computation). At scale this is the streaming/warehouse
    * rollup pattern: keep |groups| x m tiny register rows, never
    * re-touch the raw 100 TB to re-aggregate a coarser window.
    */
  def mergeAndEstimate(
      regs: DataFrame, coarseNames: Seq[String]): DataFrame = {
    val g = coarseNames.map(col)
    regs
      .groupBy(g :+ col("bucket"): _*)
      .agg(max(col("rho")).as("rho"))
      .groupBy(g: _*)
      .agg(
        count(col("rho")).as("present"),
        sum(expr("shiftleft(1L, 52 - rho)")).as("sum_present"))
      .select(g :+ estimator.as("approx_users"): _*)
  }

  /** The estimator alone (no row count): same fused pipeline, count
    * column dropped — one implementation to keep bit-behavior single-
    * sourced.
    */
  def approxDistinctUsers(
      df: DataFrame, groupNames: Seq[String], userCol: String): DataFrame =
    approxDistinctUsersWithCount(df, groupNames, userCol).drop("event_count")

  /** HLL SET ALGEBRA over audience sketches: for every unordered pair of
    * groups, |A∪B| straight from the merged registers (union is the
    * sketch's native operation) and |A∩B| by inclusion–exclusion
    * |A|+|B|−|A∪B| (the standard HLL intersection; its error grows as the
    * true overlap shrinks — Flajolet et al. 2007 §4), with approximate
    * Jaccard riding along and the EXACT counts in-row as the
    * self-check.
    *
    * Why it matters at scale: the exact intersection of two 100 TB
    * audiences is a distinct-pair shuffle per query; the sketch answer
    * reuses the |groups|×m register rows already maintained for the
    * per-group counts — ZERO additional passes over the data. The exact
    * path here (one (type,user) distinct + a user-keyed equi-join of the
    * deduped frame) exists to measure the estimator, and is itself the
    * scalable exact formulation.
    */
  def setAlgebra(events: DataFrame, typeCol: String = "event_type",
      userCol: String = "user_id"): DataFrame = {
    val regs = registers(events, Seq(typeCol), userCol)
    // per-type raw estimates (unrounded; rounding happens at emit)
    val est1 = mergeAndEstimate(regs, Seq(typeCol))
    // unordered pairs from the (tiny) distinct-type frame
    val types = events.select(col(typeCol)).distinct()
    val pairs = types.select(col(typeCol).as("t_a"))
      .join(types.select(col(typeCol).as("t_b")), col("t_a") < col("t_b"))
    val members = pairs.select(col("t_a"), col("t_b"),
      explode(array(col("t_a"), col("t_b"))).as("m"))
    val pairRegs = members
      .join(regs, col("m") === col(typeCol))
      .select(col("t_a"), col("t_b"), col("bucket"), col("rho"))
    val estU = mergeAndEstimate(pairRegs, Seq("t_a", "t_b"))
      .withColumnRenamed("approx_users", "approx_union_raw")
    // exact counts from ONE (type, user) dedup
    val u = events.select(col(typeCol), col(userCol)).distinct()
    val ex1 = u.groupBy(col(typeCol)).agg(count(lit(1)).as("n"))
    val exInter = u.select(col(typeCol).as("t_a"), col(userCol).as("ua"))
      .join(u.select(col(typeCol).as("t_b"), col(userCol).as("ub")),
        col("ua") === col("ub") && col("t_a") < col("t_b"))
      .groupBy(col("t_a"), col("t_b"))
      .agg(count(lit(1)).as("exact_inter"))
    pairs
      .join(broadcast(ex1.select(col(typeCol).as("t_a"),
        col("n").as("exact_a"))), Seq("t_a"))
      .join(broadcast(ex1.select(col(typeCol).as("t_b"),
        col("n").as("exact_b"))), Seq("t_b"))
      .join(broadcast(exInter), Seq("t_a", "t_b"), "left")
      .join(broadcast(est1.select(col(typeCol).as("t_a"),
        col("approx_users").as("ea"))), Seq("t_a"))
      .join(broadcast(est1.select(col(typeCol).as("t_b"),
        col("approx_users").as("eb"))), Seq("t_b"))
      .join(broadcast(estU), Seq("t_a", "t_b"))
      .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
      .select(
        col("t_a"), col("t_b"), col("exact_a"), col("exact_b"),
        col("exact_inter"),
        (col("exact_a") + col("exact_b") - col("exact_inter"))
          .as("exact_union"),
        round(col("ea"), 4).as("approx_a"),
        round(col("eb"), 4).as("approx_b"),
        round(col("approx_union_raw"), 4).as("approx_union"),
        round(col("ea") + col("eb") - col("approx_union_raw"), 4)
          .as("approx_inter"),
        round((col("ea") + col("eb") - col("approx_union_raw")) /
          col("approx_union_raw"), 4).as("jaccard_approx"))
      .orderBy(col("t_a"), col("t_b"))
  }
}
