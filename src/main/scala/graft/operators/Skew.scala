package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys.
  *
  * A `groupBy(key)` over 100 TB with a power-law key (one user producing 1%
  * of all events) funnels that key's entire volume through one reduce task.
  * Standard fix: two-phase salted aggregation — phase 1 aggregates on
  * (key, salt) spreading the hot key over `salts` tasks, phase 2 merges the
  * per-salt partials. Works for any algebraic aggregate (sum/count/min/max);
  * for AQE-managed joins `spark.sql.adaptive.skewJoin` already rebalances,
  * so this utility targets aggregation skew specifically.
  */
object Skew {

  /** Two-phase salted count+sum rollup: `agg(key, count(*), sum(valueCol))`
    * with the shuffle spread over `salts` buckets per key.
    */
  def saltedCountSum(
      df: DataFrame, key: String, valueCol: String, salts: Int = 16): DataFrame =
    df
      .withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__cnt"), sum(col(valueCol)).as("__sum"))
      .groupBy(col(key))
      .agg(sum(col("__cnt")).as("row_count"), sum(col("__sum")).as("value_sum"))

  /** Salted join: replicate each right (small-side) row `salts` times, tag
    * each left row with a random salt in [0, salts), join on (keys, __salt).
    * The hot key's left rows land on `salts` different tasks instead of one.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int = 16, seed: Long = 7L): DataFrame =
    left.withColumn("__salt", floor(rand(seed) * salts).cast("int"))
      .join(
        right.withColumn("__salt", explode(array((0 until salts).map(lit): _*))),
        keys :+ "__salt")
      .drop("__salt")
}
