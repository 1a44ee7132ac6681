package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Declarative data-quality constraint checking (the Deequ/dbt-test shape):
  * a suite of table invariants evaluated in ONE pass per table, emitted as
  * a relational report `(table_name, constraint, checked, violations,
  * pass)` — the gate a production pipeline runs before promoting a batch.
  *
  * Scale discipline: every per-table constraint is a counter inside a
  * single scalar aggregate over that table (violations are `sum(CASE)`),
  * so N constraints on a table cost one scan with map-side combine — not N
  * scans. The one cross-table constraint (referential integrity) is a
  * left join against the distinct key set with a null-probe counter, the
  * standard orphan check. The report itself is O(constraints) rows.
  */
object DataQuality {

  private case class Check(name: String, violations: org.apache.spark.sql.Column)

  /** One-scan constraint evaluation: `checks` become parallel counters in a
    * single aggregate; the result is unpivoted to report rows.
    */
  private def tableReport(table: String, df: DataFrame,
      checks: Seq[Check]): DataFrame = {
    val aggs = count(lit(1)).as("checked") +:
      checks.map(c => c.violations.as(c.name))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = checks.map(c =>
      s"'${c.name}', cast(`${c.name}` as bigint)").mkString(", ")
    wide.select(
      lit(table).as("table_name"),
      col("checked"),
      expr(s"stack(${checks.size}, $stacked) as (check_name, violations)"))
      .select(col("table_name"), col("check_name"), col("checked"),
        col("violations"), (col("violations") === 0L).as("pass"))
  }

  // coalesce(,0): sum over an EMPTY table is NULL, which would emit
  // (violations=NULL, pass=NULL) — an empty batch passes every counter
  // check with (0, true), like the count-distinct checks already do
  private def cnt(pred: org.apache.spark.sql.Column) =
    coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L))

  /** The harness suite: per-table invariants + lineitem->orders referential
    * integrity. Constraint names are stable identifiers (they key the
    * report and the oracle).
    */
  def report(orders: DataFrame, lineitem: DataFrame,
      customer: DataFrame, events: DataFrame, documents: DataFrame): DataFrame = {
    val ordersR = tableReport("orders", orders, Seq(
      Check("orderkey_not_null", cnt(col("o_orderkey").isNull)),
      Check("orderkey_unique",
        (count(lit(1)) - countDistinct(col("o_orderkey"))).cast("long")),
      Check("totalprice_positive", cnt(!(col("o_totalprice") > 0.0))),
      Check("orderdate_in_range", cnt(!col("o_orderdate").between(
        to_timestamp(lit("1992-01-01 00:00:00")),
        to_timestamp(lit("1998-12-31 23:59:59")))))))
    val lineitemR = tableReport("lineitem", lineitem, Seq(
      Check("quantity_in_1_50",
        cnt(!col("l_quantity").between(1.0, 50.0))),
      Check("discount_in_range",
        cnt(!col("l_discount").between(0.0, 0.1))),
      Check("price_positive", cnt(!(col("l_extendedprice") > 0.0)))))
    val customerR = tableReport("customer", customer, Seq(
      Check("custkey_unique",
        (count(lit(1)) - countDistinct(col("c_custkey"))).cast("long")),
      Check("mktsegment_not_empty",
        cnt(col("c_mktsegment").isNull || length(col("c_mktsegment")) === 0))))
    val eventsR = tableReport("events", events, Seq(
      Check("ts_not_null", cnt(col("ts").isNull)),
      Check("user_not_null", cnt(col("user_id").isNull)),
      Check("event_id_unique",
        (count(lit(1)) - countDistinct(col("event_id"))).cast("long"))))
    val documentsR = tableReport("documents", documents, Seq(
      Check("text_not_empty",
        cnt(col("text").isNull || length(col("text")) === 0)),
      Check("n_chars_consistent",
        cnt(col("n_chars") =!= length(col("text"))))))
    // Referential integrity: lineitem rows whose order does not exist —
    // a LEFT join against the distinct key set with a null-probe counter,
    // so `checked` and `violations` come out of ONE aggregate (an anti
    // join would need a second scan or a cross-join to recover `checked`).
    val fkR = lineitem.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")).distinct(),
        col("l_orderkey") === col("o_orderkey"), "left")
      .agg(count(lit(1)).as("checked"),
        cnt(col("o_orderkey").isNull).as("violations"))
      .select(
        lit("lineitem").as("table_name"),
        lit("orderkey_fk_orders").as("check_name"),
        col("checked"), col("violations"),
        (col("violations") === 0L).as("pass"))
    Seq(ordersR, lineitemR, customerR, eventsR, documentsR, fkR)
      .reduce(_.unionByName(_))
      .orderBy(col("table_name"), col("check_name"))
  }

  // ---- order-independent content fingerprints -----------------------------

  /** The NULL sentinel in canonical serializations. A genuine string cell
    * equal to this collides with NULL — accepted and documented (harness
    * strings never contain backslashes; a full escape scheme would buy
    * nothing here).
    */
  private[operators] val NullTok = "\\N"

  /** Canonical ASCII row serialization: every double goes through the
    * exact cents fixed point and every timestamp through epoch micros —
    * NEVER raw double/timestamp-to-string rendering, which differs across
    * engines (e-notation thresholds, fraction padding). Pipe-delimited;
    * each NULL cell serializes to the `\N` sentinel so a row with NULLs
    * still HASHES (a null-propagating concat would drop the whole row
    * from the checksum, blinding the anti-entropy comparison to every
    * other column of that row; concat_ws's null-SKIPPING is worse still —
    * (a,NULL,c) and (a,c,NULL) would collide).
    */
  private def ser(cols: Column*): Column =
    concat_ws("|", cols.map(c => coalesce(c.cast("string"), lit(NullTok))): _*)

  /** Epoch micros of a (NTZ) timestamp — the session is pinned UTC, so the
    * NTZ->instant cast is the identity wall-clock mapping DuckDB's
    * epoch_us applies to naive timestamps.
    */
  private def micros(c: Column): Column = unix_micros(c.cast("timestamp"))

  private def fingerprint(table: String, df: DataFrame, s: Column): DataFrame =
    df.select(graft.functions.GraftColumns.rollingHash(s).as("h"))
      .agg(
        count(lit(1)).as("n_rows"),
        // each row hash < 1e9+7; the sum is exact in DECIMAL(38,0) at any
        // row count, and the mod keeps the published checksum in int64.
        // coalesce(,0): the EMPTY batch/shard checksums to the additive
        // identity, so streaming/shard folds never see a null
        coalesce(sum(col("h").cast(DecimalType(38, 0))) % 1000000007L, lit(0L))
          .cast("long").as("checksum_mod"),
        min(col("h")).as("min_hash"),
        max(col("h")).as("max_hash"))
      .select(lit(table).as("table_name"), col("n_rows"),
        col("checksum_mod"), col("min_hash"), col("max_hash"))

  /** The canonical serialization per harness table (single source of
    * truth for batch fingerprints AND incremental maintenance).
    */
  private def canonicalSer(table: String): Column = {
    import graft.queries.Analytics.centsOf
    table match {
      case "orders" => ser(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), centsOf(col("o_totalprice")).cast("long"),
        micros(col("o_orderdate")), col("o_orderpriority"))
      case "lineitem" => ser(col("l_orderkey"),
        col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        centsOf(col("l_quantity")).cast("long"),
        centsOf(col("l_extendedprice")).cast("long"),
        centsOf(col("l_discount")).cast("long"),
        centsOf(col("l_tax")).cast("long"),
        col("l_returnflag"), col("l_linestatus"),
        micros(col("l_shipdate")))
      case "customer" => ser(col("c_custkey"), col("c_name"),
        col("c_nationkey"), centsOf(col("c_acctbal")).cast("long"),
        col("c_mktsegment"))
      case "events" => ser(col("event_id"),
        micros(col("ts")), col("user_id"), col("event_type"),
        centsOf(col("value")).cast("long"), col("props"))
      case "documents" => ser(col("doc_id"), col("lang"),
        col("source"), col("n_chars"), col("text"))
      case other => throw new IllegalArgumentException(
        s"no canonical serialization for table '$other' — known tables: " +
          "orders, lineitem, customer, events, documents")
    }
  }

  /** One table's (or one BATCH's) fingerprint row under its canonical
    * serialization — the incremental-maintenance entry point: because the
    * checksum folds by modular addition, a stream maintains the running
    * table checksum by fingerprinting each micro-batch and adding
    * (spec-verified in StreamingAggSpec).
    */
  def fingerprintTable(table: String, df: DataFrame): DataFrame =
    fingerprint(table, df, canonicalSer(table))

  /** Order-independent table content checksums — the anti-entropy /
    * cross-system reconciliation primitive: two systems compare
    * (n_rows, checksum) per table WITHOUT moving rows. The checksum is the
    * sum of per-row polynomial hashes mod p — commutative and associative,
    * so it is partitioning-invariant and MERGEABLE (shard checksums add:
    * validate 100 TB shard-by-shard, then fold). One scan per table with
    * map-side combine; the row hash is the registered native RollingHash
    * expression (codegen, scan-speed). min/max row hashes ride along as a
    * cheap first-divergence locator.
    */
  def tableFingerprints(orders: DataFrame, lineitem: DataFrame,
      customer: DataFrame, events: DataFrame, documents: DataFrame): DataFrame =
    Seq("orders" -> orders, "lineitem" -> lineitem, "customer" -> customer,
      "events" -> events, "documents" -> documents)
      .map { case (t, df) => fingerprintTable(t, df) }
      .reduce(_.unionByName(_))
      .orderBy(col("table_name"))

  /** Pearson chi-square test of independence between two categorical
    * columns (the drift/association audit: "is language distribution
    * independent of source?"). Per-cell observed counts, expected counts
    * under independence E = row_tot * col_tot / N, and the cell's chi2
    * contribution (O-E)²/E.
    *
    * Distributed shape: ONE scan into a map-side-combined (a, b) count —
    * the cell frame is bounded by |A|x|B| (category cardinalities), not
    * corpus size — then marginals as count-only windows over that tiny
    * frame and N as a 1-row broadcast. All doubles derive from exact
    * longs (argument-identical cross-engine); emitted rounded.
    */
  def chiSquareIndependence(
      df: DataFrame, colA: String, colB: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.groupBy(col(colA).as("a"), col(colB).as("b"))
      .agg(count(lit(1)).as("observed"))
    val withMarginals = cells
      .withColumn("row_tot", sum(col("observed")).over(Window.partitionBy(col("a"))))
      .withColumn("col_tot", sum(col("observed")).over(Window.partitionBy(col("b"))))
    val total = cells.agg(sum(col("observed")).as("n_total"))
    withMarginals
      .crossJoin(broadcast(total))
      .withColumn("expected_raw",
        col("row_tot").cast("double") * col("col_tot").cast("double") /
          col("n_total").cast("double"))
      .withColumn("contrib_raw",
        (col("observed").cast("double") - col("expected_raw")) *
          (col("observed").cast("double") - col("expected_raw")) /
          col("expected_raw"))
      .select(col("a"), col("b"), col("observed"), col("row_tot"),
        col("col_tot"),
        round(col("expected_raw"), 4).as("expected"),
        round(col("contrib_raw"), 4).as("chi2_contrib"))
      .orderBy(col("a"), col("b"))
  }

  /** Benford first-significant-digit audit (Newcomb 1881 / Benford 1938;
    * Nigrini's fraud-screen formulation) over a positive amount column:
    * observed digit counts vs the n·log10(1+1/d) expectation, with
    * per-digit chi-square contributions. Fabricated or unit-mixed
    * amounts bend this curve, which makes it a standard ingest screen.
    *
    * Engine-parity trick: the first digit comes from the DECIMAL STRING
    * of floor(x) (`substring(cast(floor() as bigint) as string), 1, 1)`)
    * — never from log10 arithmetic, whose boundary cells (x = 10^k)
    * round differently across engines. floor() of a double is exact in
    * both. One scan, 9-row report.
    */
  def benfordAudit(df: DataFrame, amount: String): DataFrame = {
    val digits = df
      .filter(col(amount).isNotNull && col(amount) >= lit(1.0))
      .select(substring(floor(col(amount)).cast("bigint").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("observed"))
    val total = digits.agg(sum(col("observed")).as("n_total"))
    digits
      .crossJoin(broadcast(total))
      .withColumn("expected_raw",
        col("n_total").cast("double") *
          log10(lit(1.0) + lit(1.0) / col("digit").cast("double")))
      .select(
        col("digit"), col("observed"), col("n_total"),
        round(col("expected_raw"), 4).as("expected"),
        round((col("observed").cast("double") - col("expected_raw")) *
          (col("observed").cast("double") - col("expected_raw")) /
          col("expected_raw"), 4).as("chi2_contrib"))
      .orderBy(col("digit"))
  }

  def benfordOracleSql(table: String, amount: String): String =
    s"""WITH d AS (
       |  SELECT CAST(substring(CAST(CAST(floor($amount) AS BIGINT)
       |      AS VARCHAR), 1, 1) AS INTEGER) AS digit
       |  FROM $table WHERE $amount IS NOT NULL AND $amount >= 1.0),
       |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS observed
       |      FROM d GROUP BY 1),
       |n AS (SELECT CAST(sum(observed) AS BIGINT) AS n_total FROM c),
       |e AS (SELECT digit, observed, n_total,
       |    CAST(n_total AS DOUBLE)
       |      * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS expected_raw
       |  FROM c, n)
       |SELECT digit, observed, n_total,
       |  round(expected_raw, 4) AS expected,
       |  round((CAST(observed AS DOUBLE) - expected_raw)
       |    * (CAST(observed AS DOUBLE) - expected_raw) / expected_raw, 4)
       |    AS chi2_contrib
       |FROM e ORDER BY digit""".stripMargin

  /** Pointwise mutual information cells between two categoricals —
    * the association-strength companion to [[chiSquareIndependence]]:
    * pmi = ln(N·c_ab/(c_a·c_b)), plus each cell's contribution
    * c_ab/N · pmi to the total MI. Same frame shape as the chi-square
    * audit (one scan to category-bounded cells, marginals as windows);
    * all logs take exact-integer-derived arguments.
    */
  def mutualInformation(
      df: DataFrame, colA: String, colB: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.groupBy(col(colA).as("a"), col(colB).as("b"))
      .agg(count(lit(1)).as("observed"))
    val withMarginals = cells
      .withColumn("row_tot", sum(col("observed")).over(Window.partitionBy(col("a"))))
      .withColumn("col_tot", sum(col("observed")).over(Window.partitionBy(col("b"))))
    val total = cells.agg(sum(col("observed")).as("n_total"))
    withMarginals
      .crossJoin(broadcast(total))
      .withColumn("pmi_raw",
        log(col("n_total").cast("double") * col("observed").cast("double") /
          (col("row_tot").cast("double") * col("col_tot").cast("double"))))
      .select(col("a"), col("b"), col("observed"), col("row_tot"),
        col("col_tot"),
        round(col("pmi_raw"), 6).as("pmi"),
        round(col("observed").cast("double") / col("n_total").cast("double") *
          col("pmi_raw"), 6).as("mi_contrib"))
      .orderBy(col("a"), col("b"))
  }

  def mutualInformationOracleSql(table: String, colA: String,
      colB: String): String =
    s"""WITH cells AS (
       |  SELECT $colA AS a, $colB AS b, CAST(count(*) AS BIGINT) AS observed
       |  FROM $table GROUP BY 1, 2),
       |m AS (SELECT a, b, observed,
       |    CAST(sum(observed) OVER (PARTITION BY a) AS BIGINT) AS row_tot,
       |    CAST(sum(observed) OVER (PARTITION BY b) AS BIGINT) AS col_tot
       |  FROM cells),
       |n AS (SELECT CAST(sum(observed) AS BIGINT) AS n_total FROM cells),
       |p AS (SELECT a, b, observed, row_tot, col_tot,
       |    ln(CAST(n_total AS DOUBLE) * CAST(observed AS DOUBLE)
       |       / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)))
       |      AS pmi_raw,
       |    n_total
       |  FROM m, n)
       |SELECT a, b, observed, row_tot, col_tot,
       |  round(pmi_raw, 6) AS pmi,
       |  round(CAST(observed AS DOUBLE) / CAST(n_total AS DOUBLE)
       |    * pmi_raw, 6) AS mi_contrib
       |FROM p ORDER BY a, b""".stripMargin

  /** GDPR/CCPA erasure-scope audit: given a deterministic "right to be
    * forgotten" cohort (custkey ≡ 0 mod `m`), count the rows each table
    * would lose — directly keyed (customer, orders, events via the
    * user_id = c_custkey identity) and transitively keyed (lineitem
    * through its order) — plus each table's total and the loss in ppm.
    * This is the blast-radius report a deletion job emits BEFORE it
    * mutates anything.
    *
    * Scale: the cohort predicate is pushed into each scan (no cohort
    * materialization); lineitem's transitive membership rides a
    * broadcast semi-join on the affected order keys. Output is 4 rows.
    */
  def deletionPropagation(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, events: DataFrame, m: Int = 97): DataFrame = {
    def isCohort(k: Column) = pmod(k, lit(m.toLong)) === 0L
    val custRow = customer.agg(
      count(lit(1)).as("total_rows"),
      sum(isCohort(col("c_custkey")).cast("bigint")).as("affected_rows"))
      .select(lit("customer").as("table_name"), col("affected_rows"),
        col("total_rows"))
    val ordRow = orders.agg(
      count(lit(1)).as("total_rows"),
      sum(isCohort(col("o_custkey")).cast("bigint")).as("affected_rows"))
      .select(lit("orders").as("table_name"), col("affected_rows"),
        col("total_rows"))
    val affOrders = orders.filter(isCohort(col("o_custkey")))
      .select(col("o_orderkey"))
    // semi-join strategy left to AQE: the cohort is a FIXED FRACTION of
    // the orders table (1/m of it), i.e. corpus-scaled — a forced
    // broadcast would OOM at warehouse scale (the same hazard the basket
    // queries' marginal joins had)
    val liAff = lineitem.join(affOrders,
        lineitem("l_orderkey") === affOrders("o_orderkey"), "left_semi")
      .agg(count(lit(1)).as("affected_rows"))
    val liRow = lineitem.agg(count(lit(1)).as("total_rows"))
      .crossJoin(liAff)
      .select(lit("lineitem").as("table_name"), col("affected_rows"),
        col("total_rows"))
    val evRow = events.agg(
      count(lit(1)).as("total_rows"),
      sum(isCohort(col("user_id")).cast("bigint")).as("affected_rows"))
      .select(lit("events").as("table_name"), col("affected_rows"),
        col("total_rows"))
    custRow.unionByName(ordRow).unionByName(liRow).unionByName(evRow)
      .select(col("table_name"), col("affected_rows"), col("total_rows"),
        expr("(affected_rows * 1000000L) DIV total_rows").as("loss_ppm"))
      .orderBy(col("table_name"))
  }

  def deletionPropagationOracleSql(m: Int = 97): String =
    s"""WITH rows AS (
       |  SELECT 'customer' AS table_name,
       |    CAST(sum(CASE WHEN c_custkey % $m = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS affected_rows,
       |    CAST(count(*) AS BIGINT) AS total_rows
       |  FROM customer
       |  UNION ALL
       |  SELECT 'orders',
       |    CAST(sum(CASE WHEN o_custkey % $m = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT),
       |    CAST(count(*) AS BIGINT)
       |  FROM orders
       |  UNION ALL
       |  SELECT 'lineitem',
       |    CAST((SELECT count(*) FROM lineitem
       |          WHERE l_orderkey IN (SELECT o_orderkey FROM orders
       |                               WHERE o_custkey % $m = 0)) AS BIGINT),
       |    CAST(count(*) AS BIGINT)
       |  FROM lineitem
       |  UNION ALL
       |  SELECT 'events',
       |    CAST(sum(CASE WHEN user_id % $m = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT),
       |    CAST(count(*) AS BIGINT)
       |  FROM events)
       |SELECT table_name, affected_rows, total_rows,
       |  CAST(affected_rows * 1000000 // total_rows AS BIGINT) AS loss_ppm
       |FROM rows ORDER BY table_name""".stripMargin

  /** Approximate functional-dependency discovery (Kivinen & Mannila,
    * TCS 1995 g₃ error; the per-pair primitive behind TANE-style
    * profilers): for each candidate dependency A → B, the minimum number
    * of rows to DELETE for the dependency to hold exactly —
    * n − Σ_A max_B count(A,B) — plus the lhs cardinality and the
    * violation rate in ppm. A schema-drift audit reads this beside
    * `column_stats`: a dependency that held yesterday and leaks today is
    * an upstream join or ingestion bug.
    *
    * Scale: each pair costs two shuffles over the (A,B) GROUP BY frame
    * (map-side combine; frame bounded by pair cardinality, not row
    * count) and a scalar agg. Pairs are independent — Spark runs the
    * union's branches concurrently.
    */
  def fdViolations(orders: DataFrame, lineitem: DataFrame,
      events: DataFrame, documents: DataFrame): DataFrame = {
    def fdOf(df: DataFrame, lhs: String, rhs: String,
        label: String): DataFrame =
      df.select(col(lhs).cast("string").as("a"),
          col(rhs).cast("string").as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
        .groupBy(col("a")).agg(sum(col("c")).as("na"), max(col("c")).as("mx"))
        .agg(count(lit(1)).as("n_lhs"), sum(col("na")).as("n_rows"),
          sum(col("mx")).as("kept"))
        .select(
          lit(label).as("dependency"),
          col("n_rows"), col("n_lhs"),
          (col("n_rows") - col("kept")).as("violations"),
          (col("n_rows") === col("kept")).as("holds"),
          expr("((n_rows - kept) * 1000000) DIV n_rows")
            .as("violation_ppm"))
    fdOf(orders, "o_orderkey", "o_orderstatus",
        "orders.o_orderkey->o_orderstatus")
      .unionByName(fdOf(orders, "o_custkey", "o_orderpriority",
        "orders.o_custkey->o_orderpriority"))
      .unionByName(fdOf(lineitem, "l_partkey", "l_suppkey",
        "lineitem.l_partkey->l_suppkey"))
      .unionByName(fdOf(events, "user_id", "event_type",
        "events.user_id->event_type"))
      .unionByName(fdOf(documents, "source", "lang",
        "documents.source->lang"))
      .orderBy(col("dependency"))
  }

  def fdViolationsOracleSql: String = {
    def one(table: String, lhs: String, rhs: String): String =
      s"""SELECT '$table.$lhs->$rhs' AS dependency,
         |  CAST(sum(na) AS BIGINT) AS n_rows,
         |  CAST(count(*) AS BIGINT) AS n_lhs,
         |  CAST(sum(na) - sum(mx) AS BIGINT) AS violations,
         |  sum(na) = sum(mx) AS holds,
         |  CAST((sum(na) - sum(mx)) * 1000000 // sum(na) AS BIGINT)
         |    AS violation_ppm
         |FROM (
         |  SELECT a, sum(c) AS na, max(c) AS mx FROM (
         |    SELECT CAST($lhs AS VARCHAR) AS a, CAST($rhs AS VARCHAR) AS b,
         |      count(*) AS c
         |    FROM $table GROUP BY 1, 2) g
         |  GROUP BY a) p""".stripMargin
    Seq(
      one("orders", "o_orderkey", "o_orderstatus"),
      one("orders", "o_custkey", "o_orderpriority"),
      one("lineitem", "l_partkey", "l_suppkey"),
      one("events", "user_id", "event_type"),
      one("documents", "source", "lang"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY dependency")
  }
}
