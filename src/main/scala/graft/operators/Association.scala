package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-basket association mining beyond raw pair counts (reference
  * surface: the co-purchase analytics family,
  * `api/src/application/queries.py` grouped-rollup shape): directed
  * association rules A→B with support / confidence / lift, and per-item
  * nearest neighbours by basket-cosine — the two outputs a
  * recommender-ish curation pipeline actually consumes.
  *
  * Exactness: confidence and lift are emitted as exact integer MICROS
  * (`(support·10^6) DIV n_a`, `(support·n_orders·10^6) DIV (n_a·n_b)`) —
  * integer division on positive longs truncates identically in Spark
  * (`DIV`) and DuckDB (`//`), so no float comparison grid is needed.
  * Cosine is ranked by cos²·10^6 (`supp²·10^6 DIV (n_a·n_b)`) — squaring
  * keeps the ranking monotone while staying in exact integers.
  *
  * Scale: baskets are one `collect_set` shuffle keyed by order; pair
  * expansion happens IN-ROW on each basket (bounded by lines/order, ~4
  * here — never a corpus self-join); the item-marginal join is a
  * broadcast (|parts| rows). At 100 TB the only corpus-scale pass is the
  * basket build; everything downstream is bounded by |parts|².  Skewed
  * mega-baskets would blow the in-row expansion quadratically — real
  * deployments cap basket size upstream; the harness's baskets are
  * order-line-bounded by construction.
  */
object Association {

  /** In-row i<j pair generation over a SORTED array: emits exactly
    * k(k−1)/2 `struct(part_a, part_b)` elements (part_a < part_b by the
    * sort), versus the explode×explode+filter spelling that materializes
    * all k² generator rows before filtering — measured ~25% off the
    * whole pair-mining query at sf0.1, and the saving grows with basket
    * skew (k² vs k²/2 per MEGA-basket).
    */
  def orderedPairs(sortedParts: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    // transform exposes the 0-based element index; slice is 1-based, so
    // i+2 selects the strictly-after elements (length over-asks and
    // clamps at the array end).
    flatten(transform(sortedParts, (x, i) =>
      transform(slice(sortedParts, i + lit(2), size(sortedParts)),
        y => struct(x.as("part_a"), y.as("part_b")))))

  /** Directed rules A→B over distinct-(order, part) baskets.
    * confidence(A→B) = supp(AB)/supp(A); lift = conf/P(B). Top-`k` by
    * confidence (micros), ties broken on (antecedent, consequent).
    */
  def assocRules(lineitem: DataFrame, minSupport: Long = 3L,
      k: Int = 100): DataFrame = {
    val baskets = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
    val pairs = baskets
      .select(explode(orderedPairs(col("parts"))).as("p"))
      .select(col("p.part_a"), col("p.part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    val partCounts = baskets
      .select(explode(col("parts")).as("pk"))
      .groupBy(col("pk"))
      .agg(count(lit(1)).as("n_ok"))
    val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
    // Each undirected pair yields BOTH directed rules; the union keeps
    // the pair frame (already tiny) as the only shuffled input.
    val directed = pairs
      .select(col("part_a").as("antecedent"), col("part_b").as("consequent"),
        col("support"))
      .union(pairs.select(col("part_b").as("antecedent"),
        col("part_a").as("consequent"), col("support")))
    directed
      // marginal joins LEFT TO AQE: the part dimension scales with the
      // catalog, so a forced broadcast is a 100-TB OOM (measured: the
      // forced spelling went 8x per 10x data at the 100x smoke; AQE
      // broadcasts while small and shuffles at scale)
      .join(partCounts.withColumnRenamed("pk", "antecedent")
        .withColumnRenamed("n_ok", "n_a"), Seq("antecedent"))
      .join(partCounts.withColumnRenamed("pk", "consequent")
        .withColumnRenamed("n_ok", "n_b"), Seq("consequent"))
      .crossJoin(broadcast(nOrders))
      .select(
        col("antecedent"), col("consequent"), col("support"),
        col("n_a"), col("n_b"),
        expr("(support * 1000000L) DIV n_a").as("confidence_micros"),
        expr("(support * n_orders * 1000000L) DIV (n_a * n_b)")
          .as("lift_micros"))
      .orderBy(col("confidence_micros").desc, col("antecedent"),
        col("consequent"))
      .limit(k)
      .orderBy(col("confidence_micros").desc, col("antecedent"),
        col("consequent"))
  }

  /** DuckDB replay: same baskets, self-join pair spelling, `//` division. */
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
       |    CAST(support * n_orders * 1000000 // (ca.n_ok * cb.n_ok) AS BIGINT)
       |      AS lift_micros
       |  FROM directed JOIN pc ca ON antecedent = ca.pk
       |                JOIN pc cb ON consequent = cb.pk, n)
       |SELECT * FROM (SELECT * FROM r
       |  ORDER BY confidence_micros DESC, antecedent, consequent LIMIT $k) t
       |ORDER BY confidence_micros DESC, antecedent, consequent""".stripMargin

  /** Per-item top-`k` basket-cosine neighbours:
    * cos(A,B) = supp(AB)/√(n_a·n_b), ranked by the exact integer
    * cos²·10^6. The per-item group-limit prunes before any sort of the
    * full pair frame (WindowGroupLimit pushes the rank filter into the
    * shuffle at plan level).
    */
  def itemCosineTopK(lineitem: DataFrame, minSupport: Long = 3L,
      k: Int = 5): DataFrame = {
    val baskets = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
    val pairs = baskets
      .select(explode(orderedPairs(col("parts"))).as("p"))
      .select(col("p.part_a"), col("p.part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    val partCounts = baskets
      .select(explode(col("parts")).as("pk"))
      .groupBy(col("pk"))
      .agg(count(lit(1)).as("n_ok"))
    // Symmetrize so each item sees all its neighbours, then group-limit.
    val sym = pairs
      .select(col("part_a").as("item"), col("part_b").as("neighbor"),
        col("support"))
      .union(pairs.select(col("part_b").as("item"), col("part_a").as("neighbor"),
        col("support")))
      // marginal joins left to AQE (catalog-scaled dimension, see
      // assocRules)
      .join(partCounts.withColumnRenamed("pk", "item")
        .withColumnRenamed("n_ok", "n_item"), Seq("item"))
      .join(partCounts.withColumnRenamed("pk", "neighbor")
        .withColumnRenamed("n_ok", "n_nbr"), Seq("neighbor"))
      .withColumn("cos2_micros",
        expr("(support * support * 1000000L) DIV (n_item * n_nbr)"))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("cos2_micros").desc, col("neighbor"))
    sym
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("item"), col("rank"), col("neighbor"), col("support"),
        col("n_item"), col("n_nbr"), col("cos2_micros"))
      .orderBy(col("item"), col("rank"))
  }

  /** Held-out evaluation of the basket-cosine recommender: the top-1
    * neighbour model fits on EVEN orders, and for every (odd-order,
    * item) pair with a model entry we score a hit iff the predicted
    * neighbour sits in the same held-out basket — leave-one-basket-out
    * hit-rate@1, the number a recommender ships or doesn't. The whole
    * path is exact integers (cos²·10^6 ranking, ppm hit-rate).
    *
    * Scale: model = the train-side pair frame (|parts|-bounded,
    * broadcast); the hit probe is an equi-join of the test item frame
    * against itself on (order, predicted) — one shuffle keyed by order.
    */
  def itemrecHitrate(lineitem: DataFrame, minSupport: Long = 2L): DataFrame = {
    val po = lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val train = po.filter(pmod(col("ok"), lit(2L)) === 0L)
    val test = po.filter(pmod(col("ok"), lit(2L)) === 1L)
    val baskets = train.groupBy(col("ok"))
      .agg(sort_array(collect_set(col("pk"))).as("parts"))
    val pairs = baskets
      .select(explode(orderedPairs(col("parts"))).as("p"))
      .select(col("p.part_a"), col("p.part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    val partCounts = train.groupBy(col("pk"))
      .agg(count(lit(1)).as("n_ok"))
    val model = pairs
      .select(col("part_a").as("item"), col("part_b").as("neighbor"),
        col("support"))
      .union(pairs.select(col("part_b").as("item"), col("part_a").as("neighbor"),
        col("support")))
      // marginal joins left to AQE (catalog-scaled dimension, see
      // assocRules)
      .join(partCounts.withColumnRenamed("pk", "item")
        .withColumnRenamed("n_ok", "n_item"), Seq("item"))
      .join(partCounts.withColumnRenamed("pk", "neighbor")
        .withColumnRenamed("n_ok", "n_nbr"), Seq("neighbor"))
      .withColumn("cos2_micros",
        expr("(support * support * 1000000L) DIV (n_item * n_nbr)"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("item"))
        .orderBy(col("cos2_micros").desc, col("neighbor"))))
      .filter(col("rk") === 1)
      .select(col("item"), col("neighbor").as("predicted"))
    val probe = test
      // model is |parts|-bounded — catalog-scaled, so AQE decides
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
       |            support * support * 1000000 // (ci.n_ok * cn.n_ok) DESC,
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
       |    CAST(support * support * 1000000 // (ci.n_ok * cn.n_ok) AS BIGINT)
       |      AS cos2_micros
       |  FROM sym JOIN pc ci ON item = ci.pk JOIN pc cn ON neighbor = cn.pk),
       |ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY item
       |      ORDER BY cos2_micros DESC, neighbor) AS INTEGER) AS rank
       |  FROM scored)
       |SELECT item, rank, neighbor, support, n_item, n_nbr, cos2_micros
       |FROM ranked WHERE rank <= $k
       |ORDER BY item, rank""".stripMargin
}
