package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact equi-depth histogram of a value column — the optimizer
  * statistic `column_stats`' min/max can't supply: `k` buckets of
  * (near-)equal row count with exact boundaries, the structure a
  * cost-based planner uses for selectivity on skewed predicates
  * (beside [[SkewStats]]' key-level Gini). `quantiles_approx` trades
  * exactness for one pass; this is its exact rank-based sibling.
  *
  * Shape: values reduce to cents (exact longs), ranks come from
  * [[DistributedRank.withRankStats]]' range-partitioned ntile (no
  * single-task sort — same machinery as the quartile queries, ntile
  * semantics bit-identical to the window function), then one aggregate
  * per bucket. Caller releases the pinned ranked frame via
  * DistributedRank.release (Verify/Bench already do).
  */
object Histogram {

  def equidepthHistogram(lineitem: DataFrame, k: Int = 10): DataFrame = {
    val cents = graft.queries.Analytics.centsOf(col("l_extendedprice"))
      .cast("long")
    val vals = lineitem.select(cents.as("v"),
      col("l_orderkey"), col("l_linenumber"))
    val tiled = DistributedRank.withRankStats(
      vals, Seq(col("v"), col("l_orderkey"), col("l_linenumber")),
      k, "bucket", "__pct", "__cume")
    tiled
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("v")).as("lo_cents"),
        max(col("v")).as("hi_cents"),
        countDistinct(col("v")).as("ndv"))
      .orderBy(col("bucket"))
  }

  def equidepthOracleSql(k: Int = 10): String =
    s"""WITH v AS (
       |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
       |      AS v,
       |    l_orderkey, l_linenumber
       |  FROM lineitem),
       |t AS (
       |  SELECT v, CAST(ntile($k) OVER (ORDER BY v, l_orderkey, l_linenumber)
       |    AS INTEGER) AS bucket
       |  FROM v)
       |SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(min(v) AS BIGINT) AS lo_cents,
       |  CAST(max(v) AS BIGINT) AS hi_cents,
       |  CAST(count(DISTINCT v) AS BIGINT) AS ndv
       |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin
}
