package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-governance operators: the k-anonymity audit and a bounded
  * generalization ladder (Sweeney, IJUFKS 2002; Samarati, TKDE 2001) over
  * quasi-identifier (QI) combinations — the release gate a data pipeline
  * runs before publishing user-derived tables. Companion to the regex
  * PII redaction pass (`pii_redact`).
  *
  * Scale design: everything is hash aggregates over QI tuples — the audit
  * is one scan with map-side combine; the ladder is a per-LEVEL group
  * count joined back by QI key (broadcast when the violating-group frame
  * is small, which it is by definition — violators are the k<threshold
  * tail). No per-record state, no iteration beyond the FIXED number of
  * generalization levels.
  */
object Privacy {

  /** Balance generalized to a bucket at ladder level 0/1/2: $1000 bands,
    * $5000 bands, then fully suppressed. Stringly-typed so every level
    * lives in one column (the published schema of an anonymized release).
    */
  private def balBucket(level: Int): Column = level match {
    case 0 => concat(lit("b1k:"), floor(col("c_acctbal") / 1000.0).cast("long"))
    case 1 => concat(lit("b5k:"), floor(col("c_acctbal") / 5000.0).cast("long"))
    case _ => lit("*")
  }

  /** k-anonymity + l-diversity audit: for each QI combination
    * (nation, segment, $1000 balance band), the group size k, the
    * l-diversity of the sensitive attribute (distinct exact balances),
    * and the at-risk flag (k below threshold). One scan, one hash
    * aggregate; the report is QI-domain-bounded.
    */
  def kAnonymityAudit(customer: DataFrame, k: Int = 5): DataFrame =
    customer
      .groupBy(
        col("c_nationkey").as("nation"),
        col("c_mktsegment").as("segment"),
        balBucket(0).as("bal_bucket"))
      .agg(
        count(lit(1)).as("k"),
        countDistinct(col("c_acctbal")).as("l_distinct"))
      .withColumn("at_risk", col("k") < k)
      .orderBy(col("nation"), col("segment"), col("bal_bucket"))

  /** Full-domain generalization ladder: each record publishes the FINEST
    * balance bucket at which its (nation, segment, bucket) group reaches
    * size >= k; records still exposed at the coarsest level are
    * suppressed. Exactly the fixed-ladder variant of Samarati's
    * full-domain generalization: level 0 = $1000 bands, level 1 = $5000
    * bands, level 2 = suppressed bucket, and a group promotes as a WHOLE
    * (group size at level L decides for every record in it — promotion
    * is monotone because level-L groups nest inside level-L+1 groups).
    *
    * Emitted as the anonymized release's group table: final QI tuple,
    * group size, and the level it published at. The count of level-2
    * rows is the suppression cost of the release.
    *
    * Distributed shape: two QI-bounded count aggregates (level 0 and
    * level 1) joined onto the record frame by QI key — the joins are
    * broadcastable because the group-count frames are domain-bounded —
    * then one final aggregate over published tuples. No iteration:
    * the ladder depth is a compile-time constant.
    */
  def kAnonymize(customer: DataFrame, k: Int = 5): DataFrame = {
    val qi0 = Seq(col("c_nationkey").as("nation"),
      col("c_mktsegment").as("segment"))
    val recs = customer.select(
      (qi0 :+ balBucket(0).as("b0")) :+ balBucket(1).as("b1"): _*)
    val k0 = recs.groupBy(col("nation"), col("segment"), col("b0"))
      .agg(count(lit(1)).as("k0"))
    val k1 = recs.groupBy(col("nation"), col("segment"), col("b1"))
      .agg(count(lit(1)).as("k1"))
    recs
      .join(broadcast(k0), Seq("nation", "segment", "b0"))
      .join(broadcast(k1), Seq("nation", "segment", "b1"))
      .withColumn("level",
        when(col("k0") >= k, 0).when(col("k1") >= k, 1).otherwise(2))
      .withColumn("bal_bucket",
        when(col("level") === 0, col("b0"))
          .when(col("level") === 1, col("b1"))
          .otherwise(lit("*")))
      .groupBy(col("nation"), col("segment"), col("bal_bucket"), col("level"))
      .agg(count(lit(1)).as("group_size"))
      .orderBy(col("nation"), col("segment"), col("level"), col("bal_bucket"))
  }
}
