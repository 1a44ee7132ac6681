package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join: pairs within a time distance, as an EQUI-join.
  *
  * A naive `a JOIN b ON abs(a.t - b.t) <= w AND a.k = b.k` plans as a
  * shuffle join on k alone and evaluates the band predicate per pair —
  * fine until one key is hot; with no equi-key at all it degenerates to a
  * nested-loop product. The standard fix (the same binning trick range-join
  * optimizers apply): quantize time into width-w bins, explode ONE side to
  * its bin and both neighbors, equi-join on (key, bin) — every true pair
  * lands in exactly one of the three bins (|t_a/w - t_b/w| <= 1 when
  * |t_a - t_b| <= w), then the exact band predicate filters survivors.
  * Join fan-out is bounded by bin occupancy, the key stays
  * hash-partitionable, and the 3x explode rides the smaller side.
  */
object RangeJoin {

  /** Per-user stats over (error, purchase) event pairs within `hours` of
    * each other: pair count, closest gap, distinct purchases involved —
    * the "failures around conversions" incident-correlation query. All
    * time math in integer epoch-micros (bit-exact in any engine). The
    * exploded (3-bin) side is the purchase side — the rarer event type.
    */
  def errorsNearPurchases(events: DataFrame, hours: Int = 1): DataFrame = {
    val width = hours * 3600L * 1000000L // micros
    val e = events.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ets"))
      .withColumn("bin", expr(s"ets DIV $width"))
    val p = events.filter(col("event_type") === "purchase")
      .select(
        col("user_id"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("pts"))
      .withColumn("bin0", expr(s"pts DIV $width"))
      .select(
        col("user_id"), col("purchase_id"), col("pts"),
        explode(array(col("bin0") - 1, col("bin0"), col("bin0") + 1)).as("bin"))
    e.join(p, Seq("user_id", "bin"))
      .filter(abs(col("ets") - col("pts")) <= width)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("pair_count"),
        min(abs(col("ets") - col("pts"))).as("min_gap_micros"),
        countDistinct(col("purchase_id")).as("matched_purchases"))
      .orderBy(col("user_id"))
  }
}
