package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact CART decision stump (Breiman, Friedman, Olshen & Stone 1984,
  * ch. 2): the single best binary split `value ≤ t` for predicting the
  * purchase label, chosen by minimum weighted Gini impurity — the
  * primitive inside every tree ensemble, and the kind of "is this
  * feature informative at all" probe a feature-engineering pipeline
  * runs per column.
  *
  * EXACT INTEGER FORM. With prefix counts (n_L, p_L) at threshold t and
  * totals (N, P): weighted cost = n_L·G_L + n_R·G_R where
  * n·G = (n² − p² − (n−p)²)/n, so over the common denominator n_L·n_R
  *
  *   cost(t) = [ (n_L²−p_L²−q_L²)·n_R + (n_R²−p_R²−q_R²)·n_L ] / (n_L·n_R)
  *
  * — all DECIMAL(38,0)/HUGEINT products of exact longs. The argmin is
  * taken over cost_micros = num·10⁶ DIV den (threshold ascending as the
  * tiebreak): a DEFINED total order that both engines compute
  * bit-identically; two true costs within 10⁻⁶ relative of each other
  * can floor to the same micros, in which case the smaller threshold
  * wins on both sides — determinism is the contract, as everywhere on
  * the micros lattice.
  *
  * Distributed shape: one corpus scan folds to the distinct-cents
  * histogram (value-domain-bounded); the prefix sums are windows over
  * that frame; the argmin is a 1-row struct-min. The corpus never
  * passes through the window.
  */
object DecisionStump {

  def giniStump(events: DataFrame): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
    val hist = events
      .select(cents.as("v"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("p"))
    val byV = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    def dec(c: Column): Column = c.cast(d38)
    val pre = hist
      .withColumn("nl", sum(col("n")).over(byV))
      .withColumn("pl", sum(col("p")).over(byV))
      .withColumn("nt", sum(col("n")).over(all))
      .withColumn("pt", sum(col("p")).over(all))
      .filter(col("nl") < col("nt")) // the all-left split is no split
      .withColumn("nr", col("nt") - col("nl"))
      .withColumn("pr", col("pt") - col("pl"))
      .withColumn("ql", col("nl") - col("pl"))
      .withColumn("qr", col("nr") - col("pr"))
      .withColumn("num",
        (dec(col("nl")) * col("nl") - dec(col("pl")) * col("pl") -
          dec(col("ql")) * col("ql")) * dec(col("nr")) +
          (dec(col("nr")) * col("nr") - dec(col("pr")) * col("pr") -
            dec(col("qr")) * col("qr")) * dec(col("nl")))
      .withColumn("cost_micros", expr(
        "CAST((num * 1000000) DIV (CAST(nl AS DECIMAL(38,0)) * nr)" +
          " AS BIGINT)"))
    pre
      .groupBy()
      .agg(min(struct(col("cost_micros").as("cost"), col("v").as("v"),
        col("nl").as("nl"), col("pl").as("pl"),
        col("nr").as("nr"), col("pr").as("pr"),
        col("nt").as("nt"), col("pt").as("pt"))).as("b"))
      .select(
        col("b.nt").as("n"), col("b.pt").as("n_pos"),
        col("b.v").as("threshold_cents"),
        col("b.nl").as("n_left"), col("b.pl").as("pos_left"),
        col("b.nr").as("n_right"), col("b.pr").as("pos_right"),
        col("b.cost").as("cost_micros"),
        // root impurity scaled to the same per-N micros for the gain
        // readout: N·G_root = (N²−P²−Q²)/N
        expr("CAST(((CAST(b.nt AS DECIMAL(38,0)) * b.nt" +
          " - CAST(b.pt AS DECIMAL(38,0)) * b.pt" +
          " - CAST(b.nt - b.pt AS DECIMAL(38,0)) * (b.nt - b.pt))" +
          " * 1000000) DIV CAST(b.nt AS DECIMAL(38,0)) AS BIGINT)")
          .as("root_cost_micros"))
  }

  def giniStumpOracleSql: String =
    """WITH hist AS (
      |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS p
      |  FROM events GROUP BY 1),
      |pre AS (
      |  SELECT v,
      |    CAST(sum(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS nl,
      |    CAST(sum(p) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS pl,
      |    CAST(sum(n) OVER () AS BIGINT) AS nt,
      |    CAST(sum(p) OVER () AS BIGINT) AS pt
      |  FROM hist),
      |costs AS (
      |  SELECT v, nl, pl, nt, pt, nt - nl AS nr, pt - pl AS pr,
      |    ((CAST(nl AS HUGEINT) * nl - CAST(pl AS HUGEINT) * pl
      |      - CAST(nl - pl AS HUGEINT) * (nl - pl)) * (nt - nl)
      |     + (CAST(nt - nl AS HUGEINT) * (nt - nl)
      |        - CAST(pt - pl AS HUGEINT) * (pt - pl)
      |        - CAST((nt - nl) - (pt - pl) AS HUGEINT)
      |          * ((nt - nl) - (pt - pl))) * nl) AS num
      |  FROM pre WHERE nl < nt),
      |best AS (
      |  SELECT min({'cost': CAST((num * 1000000)
      |      // (CAST(nl AS HUGEINT) * nr) AS BIGINT),
      |    'v': v, 'nl': nl, 'pl': pl, 'nr': nr, 'pr': pr,
      |    'nt': nt, 'pt': pt}) AS b
      |  FROM costs)
      |SELECT (b).nt AS n, (b).pt AS n_pos, (b).v AS threshold_cents,
      |  (b).nl AS n_left, (b).pl AS pos_left,
      |  (b).nr AS n_right, (b).pr AS pos_right,
      |  (b).cost AS cost_micros,
      |  CAST(((CAST((b).nt AS HUGEINT) * (b).nt
      |    - CAST((b).pt AS HUGEINT) * (b).pt
      |    - CAST((b).nt - (b).pt AS HUGEINT) * ((b).nt - (b).pt))
      |    * 1000000) // (b).nt AS BIGINT) AS root_cost_micros
      |FROM best""".stripMargin
}
