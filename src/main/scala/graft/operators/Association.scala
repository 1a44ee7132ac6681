package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-basket association mining beyond raw pair counts (reference
  * surface: the co-purchase analytics family,
  * `api/src/application/queries.py` grouped-rollup shape): directed
  * association rules A→B with support / confidence / lift, per-item
  * nearest neighbours by basket-cosine, and a held-out hit-rate
  * evaluation — the outputs a recommender-ish curation pipeline
  * actually consumes.
  *
  * Exactness: confidence / lift / cos² are exact integer MICROS via
  * `DIV` (Spark) = `//` (DuckDB) on positive operands. Every
  * multi-factor numerator (support·n_orders·10^6, supp²·10^6,
  * n_a·n_b) casts its operands to DECIMAL(38,0) BEFORE multiplying —
  * at warehouse scale support·n_orders·10^6 overflows a long, where
  * Spark (non-ANSI) silently wraps while DuckDB errors; the decimal
  * spelling (HUGEINT in the oracle) keeps both engines exact at any
  * scale (same discipline as [[SkewStats]]' Gini numerator).
  *
  * Scale: baskets are one `collect_set` shuffle keyed by order; pair
  * expansion happens IN-ROW on each basket (bounded by lines/order —
  * never a corpus self-join); the part-marginal joins are LEFT TO AQE
  * (the part dimension scales with the catalog, so a forced broadcast
  * is a 100-TB OOM — the 100x smoke measured the curve steepening to
  * 8x per 10x under the forced spelling). Skewed mega-baskets would
  * blow the in-row expansion quadratically — real deployments cap
  * basket size upstream; the harness's baskets are order-line-bounded
  * by construction.
  */
object Association {

  /** In-row i<j pair generation over a SORTED array: emits exactly
    * k(k−1)/2 `struct(part_a, part_b)` elements (part_a < part_b by the
    * sort), versus the explode×explode+filter spelling that materializes
    * all k² generator rows before filtering — measured ~25% off the
    * whole pair-mining query at sf0.1, and the saving grows with basket
    * skew (k² vs k²/2 per MEGA-basket).
    */
  def orderedPairs(sortedParts: Column): Column =
    // transform exposes the 0-based element index; slice is 1-based, so
    // i+2 selects the strictly-after elements (length over-asks and
    // clamps at the array end).
    flatten(transform(sortedParts, (x, i) =>
      transform(slice(sortedParts, i + lit(2), size(sortedParts)),
        y => struct(x.as("part_a"), y.as("part_b")))))

  private val dec = "decimal(38,0)"

  /** Shared scaffolding: distinct (order, part) rows → supported pairs
    * + per-part basket counts. One basket shuffle; the same frames feed
    * rules, cosine, and the recommender eval.
    */
  private def basketPairs(po: DataFrame, minSupport: Long)
      : (DataFrame, DataFrame) = {
    val baskets = po.groupBy(col("ok"))
      .agg(sort_array(collect_set(col("pk"))).as("parts"))
    val pairs = baskets
      .select(explode(orderedPairs(col("parts"))).as("p"))
      .select(col("p.part_a"), col("p.part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    val partCounts = po.groupBy(col("pk")).agg(count(lit(1)).as("n_ok"))
    (pairs, partCounts)
  }

  private def distinctPo(lineitem: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()

  /** Symmetrize pairs to (item, neighbor) and attach both marginals
    * (joins left to AQE — catalog-scaled dimension) plus the exact
    * decimal cos²·10^6.
    */
  private def symWithCos2(pairs: DataFrame, partCounts: DataFrame)
      : DataFrame =
    pairs
      .select(col("part_a").as("item"), col("part_b").as("neighbor"),
        col("support"))
      .union(pairs.select(col("part_b").as("item"),
        col("part_a").as("neighbor"), col("support")))
      .join(partCounts.withColumnRenamed("pk", "item")
        .withColumnRenamed("n_ok", "n_item"), Seq("item"))
      .join(partCounts.withColumnRenamed("pk", "neighbor")
        .withColumnRenamed("n_ok", "n_nbr"), Seq("neighbor"))
      .withColumn("cos2_micros", expr(
        s"""cast((cast(support as $dec) * cast(support as $dec) * 1000000)
           |  DIV (cast(n_item as $dec) * cast(n_nbr as $dec))
           |  as bigint)""".stripMargin))

  /** Directed rules A→B over distinct-(order, part) baskets.
    * confidence(A→B) = supp(AB)/supp(A); lift = conf/P(B). Top-`k` by
    * confidence (micros), ties broken on (antecedent, consequent).
    */
  def assocRules(lineitem: DataFrame, minSupport: Long = 3L,
      k: Int = 100): DataFrame = {
    val po = distinctPo(lineitem)
    val (pairs, partCounts) = basketPairs(po, minSupport)
    val nOrders = po.agg(countDistinct(col("ok")).as("n_orders"))
    // Each undirected pair yields BOTH directed rules; the union keeps
    // the pair frame (already tiny) as the only shuffled input.
    val directed = pairs
      .select(col("part_a").as("antecedent"), col("part_b").as("consequent"),
        col("support"))
      .union(pairs.select(col("part_b").as("antecedent"),
        col("part_a").as("consequent"), col("support")))
    directed
      .join(partCounts.withColumnRenamed("pk", "antecedent")
        .withColumnRenamed("n_ok", "n_a"), Seq("antecedent"))
      .join(partCounts.withColumnRenamed("pk", "consequent")
        .withColumnRenamed("n_ok", "n_b"), Seq("consequent"))
      .crossJoin(broadcast(nOrders))
      .select(
        col("antecedent"), col("consequent"), col("support"),
        col("n_a"), col("n_b"),
        expr("(support * 1000000L) DIV n_a").as("confidence_micros"),
        expr(
          s"""cast((cast(support as $dec) * cast(n_orders as $dec) * 1000000)
             |  DIV (cast(n_a as $dec) * cast(n_b as $dec))
             |  as bigint)""".stripMargin).as("lift_micros"))
      .orderBy(col("confidence_micros").desc, col("antecedent"),
        col("consequent"))
      .limit(k)
      .orderBy(col("confidence_micros").desc, col("antecedent"),
        col("consequent"))
  }

  /** DuckDB replay: same baskets, self-join pair spelling, HUGEINT
    * products, `//` division.
    */
  def assocRulesOracleSql(minSupport: Long = 3L, k: Int = 100): String =
    s"""WITH po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |            FROM lineitem),
       |pc AS (SELECT pk, CAST(count(*) AS BIGINT) AS n_ok FROM po GROUP BY 1),
       |n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM po),
       |pairs AS (SELECT a.pk AS part_a, b.pk AS part_b,
       |            CAST(count(*) AS BIGINT) AS support
       |          FROM po a JOIN po b ON a.ok = b.ok AND a.pk < b.pk
       |          GROUP BY 1, 2 HAVING count(*) >= $minSupport),
       |directed AS (
       |  SELECT part_a AS antecedent, part_b AS consequent, support FROM pairs
       |  UNION ALL
       |  SELECT part_b, part_a, support FROM pairs),
       |r AS (
       |  SELECT antecedent, consequent, support, ca.n_ok AS n_a,
       |    cb.n_ok AS n_b,
       |    CAST(support * 1000000 // ca.n_ok AS BIGINT) AS confidence_micros,
       |    CAST((CAST(support AS HUGEINT) * CAST(n_orders AS HUGEINT)
       |          * 1000000)
       |      // (CAST(ca.n_ok AS HUGEINT) * CAST(cb.n_ok AS HUGEINT))
       |      AS BIGINT) AS lift_micros
       |  FROM directed JOIN pc ca ON antecedent = ca.pk
       |                JOIN pc cb ON consequent = cb.pk, n)
       |SELECT * FROM (SELECT * FROM r
       |  ORDER BY confidence_micros DESC, antecedent, consequent LIMIT $k) t
       |ORDER BY confidence_micros DESC, antecedent, consequent""".stripMargin

  /** Per-item top-`k` basket-cosine neighbours:
    * cos(A,B) = supp(AB)/√(n_a·n_b), ranked by the exact decimal
    * cos²·10^6 (squaring keeps the ranking monotone in exact integers).
    * The per-item group-limit prunes before any sort of the full pair
    * frame (WindowGroupLimit pushes the rank filter into the shuffle).
    */
  def itemCosineTopK(lineitem: DataFrame, minSupport: Long = 3L,
      k: Int = 5): DataFrame = {
    val (pairs, partCounts) = basketPairs(distinctPo(lineitem), minSupport)
    val w = Window.partitionBy(col("item"))
      .orderBy(col("cos2_micros").desc, col("neighbor"))
    symWithCos2(pairs, partCounts)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("item"), col("rank"), col("neighbor"), col("support"),
        col("n_item"), col("n_nbr"), col("cos2_micros"))
      .orderBy(col("item"), col("rank"))
  }

  def itemCosineOracleSql(minSupport: Long = 3L, k: Int = 5): String =
    s"""WITH po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |            FROM lineitem),
       |pc AS (SELECT pk, CAST(count(*) AS BIGINT) AS n_ok FROM po GROUP BY 1),
       |pairs AS (SELECT a.pk AS part_a, b.pk AS part_b,
       |            CAST(count(*) AS BIGINT) AS support
       |          FROM po a JOIN po b ON a.ok = b.ok AND a.pk < b.pk
       |          GROUP BY 1, 2 HAVING count(*) >= $minSupport),
       |sym AS (
       |  SELECT part_a AS item, part_b AS neighbor, support FROM pairs
       |  UNION ALL
       |  SELECT part_b, part_a, support FROM pairs),
       |scored AS (
       |  SELECT item, neighbor, support, ci.n_ok AS n_item, cn.n_ok AS n_nbr,
       |    CAST((CAST(support AS HUGEINT) * CAST(support AS HUGEINT)
       |          * 1000000)
       |      // (CAST(ci.n_ok AS HUGEINT) * CAST(cn.n_ok AS HUGEINT))
       |      AS BIGINT) AS cos2_micros
       |  FROM sym JOIN pc ci ON item = ci.pk JOIN pc cn ON neighbor = cn.pk),
       |ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY item
       |      ORDER BY cos2_micros DESC, neighbor) AS INTEGER) AS rank
       |  FROM scored)
       |SELECT item, rank, neighbor, support, n_item, n_nbr, cos2_micros
       |FROM ranked WHERE rank <= $k
       |ORDER BY item, rank""".stripMargin

  /** Held-out evaluation of the basket-cosine recommender: the top-1
    * neighbour model fits on EVEN orders, and for every (odd-order,
    * item) pair with a model entry we score a hit iff the predicted
    * neighbour sits in the same held-out basket — leave-one-basket-out
    * hit-rate@1, the number a recommender ships or doesn't. The whole
    * path is exact integers (decimal cos² ranking, ppm hit-rate).
    *
    * Scale: the model is the train-side pair frame (|parts|-bounded —
    * catalog-scaled, so its joins are AQE's call); the hit probe is an
    * equi-join of the test item frame against itself on (order,
    * predicted) — one shuffle keyed by order.
    */
  def itemrecHitrate(lineitem: DataFrame, minSupport: Long = 2L): DataFrame = {
    val po = distinctPo(lineitem)
    val train = po.filter(pmod(col("ok"), lit(2L)) === 0L)
    val test = po.filter(pmod(col("ok"), lit(2L)) === 1L)
    val (pairs, partCounts) = basketPairs(train, minSupport)
    val model = symWithCos2(pairs, partCounts)
      .withColumn("rk", row_number().over(Window.partitionBy(col("item"))
        .orderBy(col("cos2_micros").desc, col("neighbor"))))
      .filter(col("rk") === 1)
      .select(col("item"), col("neighbor").as("predicted"))
    val probe = test
      .join(model, test("pk") === model("item"))
      .join(test.select(col("ok").as("ok2"), col("pk").as("pk2")),
        col("ok") === col("ok2") && col("predicted") === col("pk2"),
        "left")
      .select(col("ok"), col("pk"),
        col("pk2").isNotNull.cast("bigint").as("hit"))
    val modelSize = model.agg(count(lit(1)).as("n_model_items"))
    probe
      // coalesce + the n_preds guard: an empty probe frame must emit
      // (0, 0, NULL) identically on both engines — Spark's DIV returns
      // NULL on a zero divisor where DuckDB's `//` raises.
      .agg(count(lit(1)).as("n_preds"),
        coalesce(sum(col("hit")), lit(0L)).as("hits"))
      .crossJoin(broadcast(modelSize))
      .select(col("n_model_items"), col("n_preds"), col("hits"),
        when(col("n_preds") > 0L,
          expr("(hits * 1000000L) DIV n_preds")).as("hitrate_ppm"))
  }

  def itemrecHitrateOracleSql(minSupport: Long = 2L): String =
    s"""WITH po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |            FROM lineitem),
       |train AS (SELECT * FROM po WHERE ok % 2 = 0),
       |test AS (SELECT * FROM po WHERE ok % 2 = 1),
       |pc AS (SELECT pk, CAST(count(*) AS BIGINT) AS n_ok
       |       FROM train GROUP BY 1),
       |pairs AS (SELECT a.pk AS part_a, b.pk AS part_b,
       |            CAST(count(*) AS BIGINT) AS support
       |          FROM train a JOIN train b ON a.ok = b.ok AND a.pk < b.pk
       |          GROUP BY 1, 2 HAVING count(*) >= $minSupport),
       |sym AS (
       |  SELECT part_a AS item, part_b AS neighbor, support FROM pairs
       |  UNION ALL
       |  SELECT part_b, part_a, support FROM pairs),
       |model AS (
       |  SELECT item, neighbor AS predicted
       |  FROM (SELECT item, neighbor,
       |          row_number() OVER (PARTITION BY item ORDER BY
       |            (CAST(support AS HUGEINT) * CAST(support AS HUGEINT)
       |             * 1000000)
       |            // (CAST(ci.n_ok AS HUGEINT) * CAST(cn.n_ok AS HUGEINT))
       |              DESC,
       |            neighbor) AS rk
       |        FROM sym JOIN pc ci ON item = ci.pk
       |                 JOIN pc cn ON neighbor = cn.pk) m
       |  WHERE rk = 1),
       |probe AS (
       |  SELECT t.ok, t.pk,
       |    CASE WHEN EXISTS (SELECT 1 FROM test t2
       |                      WHERE t2.ok = t.ok AND t2.pk = m.predicted)
       |      THEN 1 ELSE 0 END AS hit
       |  FROM test t JOIN model m ON t.pk = m.item)
       |SELECT
       |  (SELECT CAST(count(*) AS BIGINT) FROM model) AS n_model_items,
       |  CAST(count(*) AS BIGINT) AS n_preds,
       |  CAST(coalesce(sum(hit), 0) AS BIGINT) AS hits,
       |  CASE WHEN count(*) > 0
       |    THEN CAST(coalesce(sum(hit), 0) * 1000000 // count(*) AS BIGINT)
       |  END AS hitrate_ppm
       |FROM probe""".stripMargin
}
