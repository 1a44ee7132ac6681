package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  private def cnt(pred: org.apache.spark.sql.Column) =
    sum(when(pred, 1L).otherwise(0L))

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
}
