package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** O14 — idempotent last-write-wins upsert semantics.
  *
  * The reference persists windows with `INSERT ... ON CONFLICT (window_start,
  * event_type) DO UPDATE SET` where every measure column is REPLACED by the
  * newest value, never accumulated
  * (`processor/src/infrastructure/queries/upsert_aggregation.sql:1-19`,
  * unique key `migrations/001_initial_schema.sql:13`). The relational meaning
  * over an append log is "latest row per key": `row_number() OVER
  * (PARTITION BY key ORDER BY version DESC) = 1`.
  *
  * At scale this is a single hash-partitioned shuffle on the key (Spark plans
  * a WindowExec over key-partitioned sort); no driver-side state. Applying it
  * twice is a no-op — the idempotence that makes at-least-once replay safe
  * (SURVEY.md §2.7 delivery contract).
  */
object Upsert {

  /** Keep only the newest row per key; `version` columns are compared in
    * descending priority order. Ties must be broken by the caller via an
    * extra unique version column for full determinism.
    */
  def lastWriteWins(df: DataFrame, keys: Seq[String], version: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(version.map(_.desc): _*)
    df.withColumn("__lww_rn", row_number().over(w))
      .filter(col("__lww_rn") === 1)
      .drop("__lww_rn")
  }
}
