package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact classifier-evaluation metrics — the measurement half of the
  * quality-model toolchain ([[DecisionStump]], `quality_logit`,
  * `nb_fit`): every metric here is a RATIONAL of integer counts, so all
  * of it lives on the exact micros lattice with no float and no
  * normal-approximation p-values.
  */
object ClassifierEval {

  private val d38 = org.apache.spark.sql.types.DecimalType(38, 0)

  /** Tie-corrected ROC-AUC of `value` as a score for the purchase label
    * (Hanley & McNeil 1982; AUC = P(score⁺ > score⁻) + ½P(=), the
    * Mann–Whitney identity). Average ranks are kept integral by working
    * with DOUBLED ranks: on the distinct-cents histogram ordered by v,
    * rank2(v) = 2·cum_before + n_v + 1, R1·2 = Σ p_v·rank2, and
    *
    *   AUC = (2·R1 − n₁·(n₁+1)) / (2·n₁·n₀)
    *
    * emitted as exact floor micros; the Gini coefficient 2·AUC−1 rides
    * along sign-split (it is negative for an anti-correlated score).
    *
    * Scale: the corpus folds to the distinct-cents histogram
    * (value-domain-bounded); one window pass over that frame, one 1-row
    * aggregate. Overflow: 2·R1 ≤ 2·P·(2N) — longs hold through ~10⁹ rows
    * per label; past that the rank products move to DECIMAL(38,0).
    */
  def rocAucValue(events: DataFrame): DataFrame = {
    val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
    aucFromScores(events
      .select(cents.as("v"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y")))
  }

  /** The Mann–Whitney doubled-rank AUC core over a (v: long score,
    * y: 0/1 long label) frame — shared by [[rocAucValue]],
    * [[classifierAuc]] and the per-head multi-class audit
    * ([[graft.operators.DomainClassifier.headAuc]] passes `group` so one
    * pass folds every head). Callers must bound v's domain (cents /
    * scale-6 fixed point), so the distinct-v histogram is a model frame,
    * not a corpus.
    */
  private[operators] def aucFromScores(
      scores: DataFrame, group: Seq[Column] = Seq.empty): DataFrame = {
    val hist = scores
      .groupBy(group :+ col("v"): _*)
      .agg(count(lit(1)).as("n"), sum(col("y")).as("p"))
    val byV = Window.partitionBy(group: _*).orderBy(col("v"))
    val ranked = hist
      .withColumn("cumb",
        coalesce(sum(col("n")).over(
          byV.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("rank2", lit(2L) * col("cumb") + col("n") + 1L)
    val aggs = Seq(
      sum(col("n")).as("n_all"),
      sum(col("p")).as("n_pos"),
      sum(col("p") * col("rank2")).as("r1x2"))
    (if (group.isEmpty) ranked.agg(aggs.head, aggs.tail: _*)
     else ranked.groupBy(group: _*).agg(aggs.head, aggs.tail: _*))
      .withColumn("n_neg", col("n_all") - col("n_pos"))
      .withColumn("u2", col("r1x2") - col("n_pos") * (col("n_pos") + 1L))
      // single-class corpora (n_pos·n_neg = 0) define both metrics as 0
      // by contract — same degenerate-input posture as mcnemar /
      // stumpConfusion / SNIPS, and identical in the oracle.
      .withColumn("auc_micros",
        expr("CASE WHEN n_pos * n_neg > 0" +
          " THEN u2 * 1000000 DIV (2 * n_pos * n_neg) ELSE 0 END"))
      .withColumn("gini_num", col("u2") - col("n_pos") * col("n_neg"))
      .withColumn("gini_micros", expr(
        "CASE WHEN n_pos * n_neg = 0 THEN 0" +
          " WHEN gini_num >= 0 THEN gini_num * 1000000 DIV (n_pos * n_neg)" +
          " ELSE -((-gini_num) * 1000000 DIV (n_pos * n_neg)) END"))
      .select(group ++ Seq(col("n_all"), col("n_pos"), col("n_neg"),
        col("auc_micros"), col("gini_micros")): _*)
  }

  /** Tie-corrected ROC-AUC of the TRAINED quality gate's σ̃ against its
    * weak-label teacher — the threshold-free ranking audit beside
    * [[QualityClassifier.scoreConfusion]] (one operating point) and
    * [[QualityClassifier.calibration]] (bin-wise reliability). σ̃ is
    * scale-6 fixed point, so the distinct-score histogram is bounded at
    * 10⁶+1 rows no matter the corpus — [[aucFromScores]]' model-frame
    * contract holds at any scale. Oracle: [[classifierAucOracleSql]]
    * chains the full training replay into the same doubled-rank fold.
    */
  def classifierAuc(documents: DataFrame): DataFrame =
    aucFromScores(QualityClassifier.scoreDocs(documents)
      .select(col("yhat").cast("long").as("v"), col("y").cast("long").as("y")))

  /** The doubled-rank SQL tail over a `hist(v, n, p[, group])` SELECT —
    * the oracle twin of [[aucFromScores]], spelled ONCE and shared by
    * [[rocAucValueOracleSql]], [[classifierAucOracleSql]] and
    * [[DomainClassifier.headAucOracleSql]] (which passes `group`, the
    * mirror of aucFromScores' group parameter).
    */
  private[operators] def aucOracleSql(
      prefix: String, histSelect: String,
      group: Option[String] = None): String = {
    val gSel = group.map(c => s"$c, ").getOrElse("")
    val part = group.map(c => s"PARTITION BY $c ").getOrElse("")
    val gBy = group.map(_ => " GROUP BY 1").getOrElse("")
    val gOut = group.map(c => s"CAST($c AS INT) AS $c, ").getOrElse("")
    val ord = group.map(c => s" ORDER BY $c").getOrElse("")
    s"""${prefix}hist AS (
$histSelect),
ranked AS (
  SELECT ${gSel}v, n, p,
    COALESCE(CAST(sum(n) OVER (${part}ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
      0) AS cumb
  FROM hist),
agg AS (
  SELECT ${gSel}CAST(sum(n) AS BIGINT) AS n_all,
    CAST(sum(p) AS BIGINT) AS n_pos,
    CAST(sum(p * (2 * cumb + n + 1)) AS BIGINT) AS r1x2
  FROM ranked$gBy),
fin AS (
  SELECT ${gSel}n_all, n_pos, n_all - n_pos AS n_neg,
    r1x2 - n_pos * (n_pos + 1) AS u2
  FROM agg)
SELECT ${gOut}n_all, n_pos, n_neg,
  CASE WHEN n_pos * n_neg > 0
    THEN u2 * 1000000 // (2 * n_pos * n_neg) ELSE 0 END
    AS auc_micros,
  CASE WHEN n_pos * n_neg = 0 THEN 0
    WHEN u2 - n_pos * n_neg >= 0
    THEN (u2 - n_pos * n_neg) * 1000000 // (n_pos * n_neg)
    ELSE -((-(u2 - n_pos * n_neg)) * 1000000 // (n_pos * n_neg)) END
    AS gini_micros
FROM fin$ord"""
  }

  def classifierAucOracleSql: String = aucOracleSql(
    s"WITH ${QualityClassifier.predCtes()},\n",
    """  SELECT CAST(yhat AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS p
  FROM qzf GROUP BY 1""")

  def rocAucValueOracleSql: String = aucOracleSql(
    "WITH ",
    """  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      AS BIGINT) AS p
  FROM events GROUP BY 1""")

  /** Confusion-matrix metrics of the [[DecisionStump.giniStump]] split
    * read as a leaf-majority classifier: each leaf predicts its majority
    * label (ties predict positive — spelled 2·p ≥ n on both sides), and
    * TP/FP/FN/TN follow arithmetically from the stump row's leaf counts
    * — no second corpus pass. Precision/recall/F1/accuracy are exact
    * micros (F1 = 2TP/(2TP+FP+FN) — rational, unlike the harmonic-mean
    * spelling); zero denominators emit 0 by the CASE contract.
    */
  def stumpConfusion(events: DataFrame): DataFrame = {
    DecisionStump.giniStump(events)
      .withColumn("left_pos", lit(2L) * col("pos_left") >= col("n_left"))
      .withColumn("right_pos", lit(2L) * col("pos_right") >= col("n_right"))
      .withColumn("tp",
        when(col("left_pos"), col("pos_left")).otherwise(0L) +
          when(col("right_pos"), col("pos_right")).otherwise(0L))
      .withColumn("fp",
        when(col("left_pos"), col("n_left") - col("pos_left")).otherwise(0L) +
          when(col("right_pos"), col("n_right") - col("pos_right"))
            .otherwise(0L))
      .withColumn("fn", col("n_pos") - col("tp"))
      .withColumn("tn", col("n") - col("tp") - col("fp") - col("fn"))
      .withColumn("precision_micros", expr(
        "CASE WHEN tp + fp > 0 THEN tp * 1000000 DIV (tp + fp) ELSE 0 END"))
      .withColumn("recall_micros", expr(
        "CASE WHEN tp + fn > 0 THEN tp * 1000000 DIV (tp + fn) ELSE 0 END"))
      .withColumn("f1_micros", expr(
        "CASE WHEN 2 * tp + fp + fn > 0" +
          " THEN 2 * tp * 1000000 DIV (2 * tp + fp + fn) ELSE 0 END"))
      .withColumn("accuracy_micros", expr("(tp + tn) * 1000000 DIV n"))
      .select(col("threshold_cents"), col("left_pos"), col("right_pos"),
        col("tp"), col("fp"), col("fn"), col("tn"),
        col("precision_micros"), col("recall_micros"), col("f1_micros"),
        col("accuracy_micros"))
  }

  def stumpConfusionOracleSql: String = {
    val stump = DecisionStump.giniStumpOracleSql
    s"""WITH stump AS ($stump),
       |flags AS (
       |  SELECT *, (2 * pos_left >= n_left) AS left_pos,
       |    (2 * pos_right >= n_right) AS right_pos
       |  FROM stump),
       |conf AS (
       |  SELECT threshold_cents, left_pos, right_pos, n, n_pos,
       |    (CASE WHEN left_pos THEN pos_left ELSE 0 END
       |     + CASE WHEN right_pos THEN pos_right ELSE 0 END) AS tp,
       |    (CASE WHEN left_pos THEN n_left - pos_left ELSE 0 END
       |     + CASE WHEN right_pos THEN n_right - pos_right ELSE 0 END) AS fp
       |  FROM flags),
       |conf2 AS (
       |  SELECT *, n_pos - tp AS fn, n - tp - fp - (n_pos - tp) AS tn
       |  FROM conf)
       |SELECT threshold_cents, left_pos, right_pos, tp, fp, fn, tn,
       |  CASE WHEN tp + fp > 0 THEN tp * 1000000 // (tp + fp)
       |    ELSE 0 END AS precision_micros,
       |  CASE WHEN tp + fn > 0 THEN tp * 1000000 // (tp + fn)
       |    ELSE 0 END AS recall_micros,
       |  CASE WHEN 2 * tp + fp + fn > 0
       |    THEN 2 * tp * 1000000 // (2 * tp + fp + fn)
       |    ELSE 0 END AS f1_micros,
       |  (tp + tn) * 1000000 // n AS accuracy_micros
       |FROM conf2""".stripMargin
  }

  /** McNemar's paired test (McNemar, Psychometrika 1947) on per-user
    * conversion in the first vs second half of the observation window
    * (split at the midpoint of the global [min, max] event time, an
    * exact epoch-micros DIV): the within-subject "did behavior change"
    * test, driven only by the discordant counts b = (yes, no) and
    * c = (no, yes):
    *
    *   χ² = (b − c)² / (b + c)
    *
    * emitted as exact micros (0 when b + c = 0, by contract).
    *
    * Scale: one per-user reduction (two conditional max flags), one
    * 4-counter aggregate.
    */
  def mcnemarConversion(events: DataFrame): DataFrame = {
    val bounds = events.agg(
      min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi"))
      .withColumn("mid", expr("(lo + hi) DIV 2"))
    val perUser = events
      .crossJoin(broadcast(bounds))
      .groupBy(col("user_id"))
      .agg(
        max(when(col("event_type") === "purchase" &&
          unix_micros(col("ts")) < col("mid"), 1L).otherwise(0L)).as("h1"),
        max(when(col("event_type") === "purchase" &&
          unix_micros(col("ts")) >= col("mid"), 1L).otherwise(0L)).as("h2"))
    perUser
      .agg(
        count(lit(1)).as("n_users"),
        sum(when(col("h1") === 1L && col("h2") === 1L, 1L).otherwise(0L))
          .as("n11"),
        sum(when(col("h1") === 1L && col("h2") === 0L, 1L).otherwise(0L))
          .as("n10"),
        sum(when(col("h1") === 0L && col("h2") === 1L, 1L).otherwise(0L))
          .as("n01"),
        sum(when(col("h1") === 0L && col("h2") === 0L, 1L).otherwise(0L))
          .as("n00"))
      .withColumn("mcnemar_micros", expr(
        "CASE WHEN n10 + n01 > 0" +
          " THEN (n10 - n01) * (n10 - n01) * 1000000 DIV (n10 + n01)" +
          " ELSE 0 END"))
  }

  def mcnemarConversionOracleSql: String =
    """WITH bounds AS (
      |  SELECT epoch_us(min(ts)) AS lo, epoch_us(max(ts)) AS hi,
      |    (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid
      |  FROM events),
      |pu AS (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'purchase'
      |        AND epoch_us(ts) < b.mid THEN 1 ELSE 0 END) AS h1,
      |    max(CASE WHEN event_type = 'purchase'
      |        AND epoch_us(ts) >= b.mid THEN 1 ELSE 0 END) AS h2
      |  FROM events, bounds b GROUP BY user_id),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_users,
      |    CAST(sum(CASE WHEN h1 = 1 AND h2 = 1 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n11,
      |    CAST(sum(CASE WHEN h1 = 1 AND h2 = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n10,
      |    CAST(sum(CASE WHEN h1 = 0 AND h2 = 1 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n01,
      |    CAST(sum(CASE WHEN h1 = 0 AND h2 = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n00
      |  FROM pu)
      |SELECT n_users, n11, n10, n01, n00,
      |  CASE WHEN n10 + n01 > 0
      |    THEN (n10 - n01) * (n10 - n01) * 1000000 // (n10 + n01)
      |    ELSE 0 END AS mcnemar_micros
      |FROM agg""".stripMargin

  /** Cohen's kappa (Cohen, Educ. Psychol. Meas. 1960) between the n-gram
    * language-ID heuristic ([[graft.functions.TextAnalysis.langId]]) and
    * the corpus's labeled `lang` — chance-corrected agreement, the right
    * readout when one class dominates (raw accuracy is inflated by the
    * majority class; kappa subtracts the marginal-product chance rate):
    *
    *   κ = (N·Σdiag − Σ_k row_k·col_k) / (N² − Σ_k row_k·col_k)
    *
    * an exact rational of counts, sign-split micros (κ < 0 = worse than
    * chance). Marginals and the diagonal come from the |langs|²-bounded
    * confusion frame.
    */
  def langidKappa(documents: DataFrame): DataFrame = {
    val cells = graft.functions.TextAnalysis.langId(documents)
      .groupBy(col("lang").as("actual"), col("lang_pred").as("predicted"))
      .agg(count(lit(1)).as("c"))
    val rows = cells.groupBy(col("actual")).agg(sum(col("c")).as("rk"))
    val cols = cells.groupBy(col("predicted")).agg(sum(col("c")).as("ck"))
    val s = rows
      .join(cols, rows("actual") === cols("predicted"), "full")
      .agg(sum(coalesce(col("rk"), lit(0L)) * coalesce(col("ck"), lit(0L)))
        .as("s"))
    val base = cells.agg(
      sum(col("c")).as("n_docs"),
      sum(when(col("actual") === col("predicted"), col("c")).otherwise(0L))
        .as("diag"))
    base.crossJoin(s)
      .withColumn("kappa_num",
        col("n_docs") * col("diag") - col("s"))
      .withColumn("kappa_den", col("n_docs") * col("n_docs") - col("s"))
      .withColumn("kappa_micros", expr(
        "CASE WHEN kappa_num >= 0" +
          " THEN kappa_num * 1000000 DIV kappa_den" +
          " ELSE -((-kappa_num) * 1000000 DIV kappa_den) END"))
      .select(col("n_docs"), col("diag"), col("s").as("chance_num"),
        col("kappa_micros"))
  }

  def langidKappaOracleSql: String =
    """WITH h AS (SELECT doc_id, lang,
      |  len(list_filter(string_split(text,' '), x -> x IN ('the','and','of'))) AS en,
      |  len(list_filter(string_split(text,' '), x -> x IN ('der','die','und'))) AS de,
      |  len(list_filter(string_split(text,' '), x -> x IN ('le','la','et'))) AS fr,
      |  len(list_filter(string_split(text,' '), x -> x IN ('el','los','y'))) AS es
      |FROM documents),
      |p AS (SELECT doc_id, lang,
      |  CASE WHEN en > 0 AND en >= de AND en >= fr AND en >= es THEN 'en'
      |       WHEN de > 0 AND de >= fr AND de >= es THEN 'de'
      |       WHEN fr > 0 AND fr >= es THEN 'fr'
      |       WHEN es > 0 THEN 'es' ELSE 'und' END AS lang_pred
      |FROM h),
      |cells AS (
      |  SELECT lang AS actual, lang_pred AS predicted,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM p GROUP BY 1, 2),
      |rows_m AS (SELECT actual AS k, CAST(sum(c) AS BIGINT) AS rk
      |  FROM cells GROUP BY 1),
      |cols_m AS (SELECT predicted AS k, CAST(sum(c) AS BIGINT) AS ck
      |  FROM cells GROUP BY 1),
      |s AS (SELECT CAST(sum(COALESCE(r.rk, 0) * COALESCE(c.ck, 0))
      |    AS BIGINT) AS s
      |  FROM rows_m r FULL JOIN cols_m c ON r.k = c.k),
      |base AS (SELECT CAST(sum(c) AS BIGINT) AS n_docs,
      |    CAST(sum(CASE WHEN actual = predicted THEN c ELSE 0 END)
      |      AS BIGINT) AS diag
      |  FROM cells)
      |SELECT n_docs, diag, s AS chance_num,
      |  CASE WHEN n_docs * diag - s >= 0
      |    THEN (n_docs * diag - s) * 1000000 // (n_docs * n_docs - s)
      |    ELSE -((-(n_docs * diag - s)) * 1000000 // (n_docs * n_docs - s))
      |    END AS kappa_micros
      |FROM base, s""".stripMargin
}
