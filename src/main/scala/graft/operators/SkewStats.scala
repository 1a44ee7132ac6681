package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-skew profile of the join/partition keys a planner cares about:
  * per key column, the exact Gini concentration coefficient of the key
  * distribution, the heaviest key's share, and the key count — the
  * numbers that decide between a plain shuffle join, AQE skew handling,
  * and salting ([[Skew]]). This is the diagnostic table feeding those
  * operators, kept fully integer-exact:
  *
  * Gini over per-key counts x_(1) ≤ … ≤ x_(n) (ranked ascending) =
  * Σ(2i − n − 1)·x_(i) / (n·Σx) — the numerator is an exact decimal sum
  * over the ranked frame, the single division emits micros.
  *
  * Scale: one scan folds each table to its per-key count frame
  * (map-side combine); the rank over that BOUNDED frame rides
  * [[DistributedRank]]'s range partitioning (no single-task sort);
  * everything after is a scalar aggregate. Caller releases the pinned
  * ranked frames via DistributedRank.release (Verify/Bench already do).
  */
object SkewStats {

  private def giniOf(df: DataFrame, key: Column, label: String): DataFrame = {
    val counts = df.groupBy(key.as("k")).agg(count(lit(1)).as("x"))
    val ranked = DistributedRank.withGlobalRank(
      counts, Seq(col("x"), col("k")), "i")
    ranked.agg(
        count(lit(1)).as("n_keys"),
        sum(col("x")).as("total_rows"),
        max(col("x")).as("max_key_rows"),
        // operands cast to decimal BEFORE the product: rank x count can
        // overflow a long on a high-cardinality key at warehouse scale
        sum((col("i").cast("decimal(38,0)") * 2L - 1L) *
          col("x").cast("decimal(38,0)")).cast("decimal(38,0)").as("wsum"))
      .select(
        lit(label).as("key_col"),
        col("n_keys"), col("total_rows"), col("max_key_rows"),
        expr("(max_key_rows * 1000000L) DIV total_rows").as("top_share_ppm"),
        // Σ(2i-n-1)x = Σ(2i-1)x - n·Σx, both exact
        expr("""cast((wsum - cast(n_keys as decimal(38,0))
               |        * cast(total_rows as decimal(38,0)))
               |  * 1000000 DIV (cast(n_keys as decimal(38,0))
               |                 * cast(total_rows as decimal(38,0)))
               |  as bigint)""".stripMargin).as("gini_micros"))
  }

  /** The harness profile: the three keys the TPC-H-ish joins shuffle on. */
  def keySkewGini(events: DataFrame, lineitem: DataFrame,
      orders: DataFrame): DataFrame =
    giniOf(events, col("user_id"), "events.user_id")
      .unionByName(giniOf(lineitem, col("l_partkey"), "lineitem.l_partkey"))
      .unionByName(giniOf(orders, col("o_custkey"), "orders.o_custkey"))
      .orderBy(col("key_col"))

  def keySkewGiniOracleSql: String = {
    def one(table: String, key: String, label: String): String =
      s"""SELECT '$label' AS key_col,
         |  CAST(count(*) AS BIGINT) AS n_keys,
         |  CAST(sum(x) AS BIGINT) AS total_rows,
         |  CAST(max(x) AS BIGINT) AS max_key_rows,
         |  CAST(max(x) * 1000000 // sum(x) AS BIGINT) AS top_share_ppm,
         |  CAST((sum((2*i - 1) * x)
         |        - CAST(count(*) AS HUGEINT) * CAST(sum(x) AS HUGEINT))
         |    * 1000000 // (CAST(count(*) AS HUGEINT)
         |                  * CAST(sum(x) AS HUGEINT)) AS BIGINT)
         |    AS gini_micros
         |FROM (SELECT CAST(x AS HUGEINT) AS x,
         |        CAST(row_number() OVER (ORDER BY x, k) AS HUGEINT) AS i
         |      FROM (SELECT $key AS k, count(*) AS x
         |            FROM $table GROUP BY 1) c) r""".stripMargin
    s"""SELECT * FROM (
       |${one("events", "user_id", "events.user_id")}
       |UNION ALL
       |${one("lineitem", "l_partkey", "lineitem.l_partkey")}
       |UNION ALL
       |${one("orders", "o_custkey", "orders.o_custkey")})
       |ORDER BY key_col""".stripMargin
  }
}
