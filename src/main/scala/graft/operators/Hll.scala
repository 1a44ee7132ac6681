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

  /** Exact + HLL-approximate distinct-user counts per group in one
    * relational pipeline: distinct (group, user) -> per-bucket max(rho) +
    * bucket-local exact count -> fixed-point harmonic fold. Output:
    * groupNames..., users_exact, approx_users. `users_exact` rides the
    * same register frame (sum of bucket-local distinct counts), so the
    * self-check column costs no extra shuffle.
    */
  def approxDistinctUsers(
      df: DataFrame, groupNames: Seq[String], userCol: String): DataFrame = {
    val g = groupNames.map(col)
    val h = graft.functions.GraftColumns.mix64(col(userCol))
    val perUser = df
      .filter(col(userCol).isNotNull) // count(DISTINCT x) semantics: nulls don't count
      .select(g :+ col(userCol): _*).distinct()
      .select(g ++ Seq(
        h.bitwiseAND(lit((M - 1).toLong)).as("bucket"),
        rho(shiftrightunsigned(h, P)).as("rho")): _*)
    val regs = perUser
      .groupBy(g :+ col("bucket"): _*)
      .agg(max(col("rho")).as("rho"), count(lit(1)).as("bucket_users"))
    val lcLit = array(LinearCounting.map(lit).toIndexedSeq: _*)
    regs
      .groupBy(g: _*)
      .agg(
        sum(col("bucket_users")).as("users_exact"),
        count(lit(1)).as("present"),
        sum(expr("shiftleft(1L, 52 - rho)")).as("sum_present"))
      .select(g ++ Seq(col("users_exact")) ++ Seq {
        val v = (lit(M) - col("present")).cast("int")
        val sumNum = col("sum_present") + v.cast("long") * lit(1L << 52)
        val eRaw = lit(EstNumerator) / sumNum.cast("double")
        when(v > lit(0) && eRaw <= lit(2.5 * M), element_at(lcLit, v))
          .otherwise(eRaw)
          .as("approx_users")
      }: _*)
  }
}
