package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data layout for scale: bucketing and partitioned writes.
  *
  * At 100 TB the dominant costs are shuffles and full scans; both are layout
  * problems:
  *   - **Bucketing** pre-shuffles a table once at write time. Two tables
  *     bucketed by the same key into the same bucket count join and aggregate
  *     with NO exchange at read time (asserted in LayoutSpec) — the batch
  *     analogue of co-partitioned stream-stream joins.
  *   - **Partitioned writes** (hive-style key=value directories) give the
  *     reader partition pruning: a date-range query touches only matching
  *     directories (PartitionFilters in the scan, also asserted).
  */
object Layout {

  /** Write `df` as a bucketed+sorted managed table (pre-shuffled layout).
    * Drops any previous table AND its orphaned location first — Spark
    * refuses to create a managed table over a leftover directory.
    */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = new java.io.File(warehouse, table.toLowerCase)
    def rm(f: java.io.File): Unit = {
      val children = f.listFiles() // null for plain files
      if (children != null) children.foreach(rm)
      if (!f.delete()) throw new java.io.IOException(s"could not delete $f")
    }
    if (loc.exists()) rm(loc)
    df.write
      .mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table) // managed: lives under spark.sql.warehouse.dir
  }

  /** Shuffle-free equi-join of two tables bucketed on the join key with the
    * same bucket count.
    */
  def bucketedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Widen a narrow scan before CPU-heavy per-row work: a corpus that
    * arrives as fewer splits than cores serializes everything upstream of
    * the first shuffle on a handful of tasks. Bounded by the file-count
    * check, this is a LOCAL/small-corpus fix only — at cluster scale a
    * parquet corpus yields thousands of splits, the guard is false, and no
    * extra shuffle is ever added. Column pruning still applies: Catalyst
    * pushes projections below a round-robin repartition.
    *
    * Use SPARINGLY: the extra stage costs a fixed ~0.3-0.5 s of scheduling
    * and codegen latency at local scale, so it only pays where the
    * serialized per-partition work exceeds that (measured: the inverted-
    * index jaccard join and TF-IDF win ~0.5 s; every sub-second text query
    * LOST ~0.5 s when widened — do not blanket-apply).
    */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // inputFiles (cached file index), NOT df.rdd.getNumPartitions: forcing
    // the RDD conversion costs a full physical-planning pass per call —
    // measured slower than the skew it was fixing.
    if (df.inputFiles.length < target) df.repartition(target) else df
  }

  /** Z-order (Morton) key: interleave the low `bits` bits of two
    * non-negative ints — bit i of x lands at position 2i, bit i of y at
    * 2i+1. Sorting by this key gives MULTI-dimensional data skipping from a
    * ONE-dimensional sort: consecutive key ranges cover compact (x, y)
    * tiles, so parquet min/max stats stay tight on BOTH columns and a
    * filter on either one prunes row groups (a linear sort keeps stats
    * tight only on its leading column). Pure codegen'd bit arithmetic —
    * the same integer fold the DuckDB oracle replays.
    */
  def zorderKey(x: Column, y: Column, bits: Int = 10): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Hilbert key via the native [[graft.functions.HilbertXY2D]]
    * expression — the curve whose consecutive indices are always
    * Manhattan-adjacent cells, i.e. the Z-curve without diagonal jumps:
    * bucket bounding boxes stay tiles even across the curve's coarse
    * quadrant boundaries, where Morton buckets straddle.
    */
  def hilbertKey(x: Column, y: Column, bits: Int = 10): Column =
    graft.functions.GraftColumns.hilbertXY2D(x, y, bits)

  /** DuckDB replay of the Hilbert recurrence as unrolled CTE stages
    * (each stage consumes the previous once — linear inlining), over the
    * same (user_id, event_id) mod-1024 grid as the z-order audit.
    */
  def hilbertOracleSql(bits: Int = 10): String = {
    val n = 1L << bits
    val stages = (0 until bits).map { r =>
      val s = n >> (r + 1)
      s"""h${r + 1} AS (SELECT ox, oy,
  CASE WHEN (y // $s) % 2 = 0 THEN
    CASE WHEN (x // $s) % 2 = 1 THEN ${n - 1} - y ELSE y END
  ELSE x END AS x,
  CASE WHEN (y // $s) % 2 = 0 THEN
    CASE WHEN (x // $s) % 2 = 1 THEN ${n - 1} - x ELSE x END
  ELSE y END AS y,
  d + $s * $s * xor(3 * ((x // $s) % 2), (y // $s) % 2) AS d
  FROM h$r)"""
    }.mkString(",\n")
    s"""WITH b AS (
  SELECT user_id % $n AS ox, event_id % $n AS oy FROM events),
h0 AS (SELECT ox, oy, ox AS x, oy AS y, CAST(0 AS BIGINT) AS d FROM b),
$stages
SELECT d // 4096 AS hbucket, count(*) AS n,
  min(ox) AS min_x, max(ox) AS max_x,
  min(oy) AS min_y, max(oy) AS max_y
FROM h$bits GROUP BY 1 ORDER BY 1"""
  }

  /** Write `df` clustered by the z-order of (xCol, yCol): range-partition
    * on the interleaved key, sort within partitions, one file per range.
    * With `numFiles` files over a 2·bits-wide key, each file covers one
    * (2^bits / sqrt(numFiles))-square tile of the (x, y) domain — the
    * layout Delta's OPTIMIZE ZORDER BY produces, built from plain Spark
    * primitives. At cluster scale `numFiles` scales with the data; the
    * per-file tile just shrinks.
    */
  def writeZOrdered(
      df: DataFrame, dir: String, xCol: String, yCol: String,
      bits: Int = 10, numFiles: Int = 16): Unit =
    df.withColumn("zkey", zorderKey(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .drop("zkey") // clustering is physical now; don't leak the helper column
      .write.mode("overwrite").parquet(dir)

  /** Write events partitioned by event date (directory per day): readers
    * filtering on `event_date` scan only matching directories.
    */
  def writePartitionedByDay(events: DataFrame, dir: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .write
      .mode("overwrite")
      .partitionBy("event_date")
      .parquet(dir)

  def readDay(spark: SparkSession, dir: String, day: String): DataFrame =
    spark.read.parquet(dir).filter(col("event_date") === lit(day))

  /** Zone-map skip audit: QUANTIFIES what sorted layout buys a range
    * scan. Rows are tiled into fixed-size zones under two orderings —
    * the natural key order and a value-sorted order — and each zone
    * keeps parquet-style min/max stats on the predicate column; a zone
    * whose [min, max] misses the predicate band is SKIPPED without
    * reading. The report (per ordering: zones, skipped, skip ppm, rows
    * actually scanned vs rows matching) is the measured version of the
    * claim behind `writeZOrdered`/`hilbert_locality`: clustering exists
    * so that zone maps prune.
    *
    * Exactness: everything is integer counts over exact cents.
    *
    * Scale: each ordering is one ranged rank ([[DistributedRank]] — no
    * single-task sort) + a zone-level aggregate; zones =
    * rows/zoneRows, i.e. the frame the stats live on is 1000× smaller
    * than the data, exactly like real row-group metadata. Caller
    * releases via DistributedRank.release.
    */
  def zonemapSkipAudit(lineitem: DataFrame, zoneRows: Int = 1000,
      loCents: Long = 10000000L, hiCents: Long = 10500000L): DataFrame = {
    val cents = graft.queries.Analytics.centsOf(col("l_extendedprice"))
      .cast("long")
    val base = lineitem.select(cents.as("v"), col("l_orderkey"),
      col("l_linenumber"))
    def audit(label: String, sortCols: Seq[Column]): DataFrame = {
      val ranked = DistributedRank.withGlobalRank(base, sortCols, "r")
        .withColumn("z", expr(s"(r - 1) DIV $zoneRows"))
      ranked.groupBy(col("z"))
        .agg(count(lit(1)).as("zn"), min(col("v")).as("zmin"),
          max(col("v")).as("zmax"),
          sum(when(col("v").between(loCents, hiCents), 1L)
            .otherwise(0L)).as("zsel"))
        .agg(
          count(lit(1)).as("n_zones"),
          sum(when(col("zmax") < loCents || col("zmin") > hiCents, 1L)
            .otherwise(0L)).as("skipped_zones"),
          sum(when(col("zmax") < loCents || col("zmin") > hiCents, 0L)
            .otherwise(col("zn"))).as("rows_scanned"),
          sum(col("zsel")).as("rows_matching"))
        .select(lit(label).as("ordering"), col("n_zones"),
          col("skipped_zones"),
          expr("(skipped_zones * 1000000) DIV n_zones").as("skip_ppm"),
          col("rows_scanned"), col("rows_matching"))
    }
    audit("natural", Seq(col("l_orderkey"), col("l_linenumber")))
      .unionByName(audit("value_sorted",
        Seq(col("v"), col("l_orderkey"), col("l_linenumber"))))
      .orderBy(col("ordering"))
  }

  def zonemapOracleSql(zoneRows: Int = 1000,
      loCents: Long = 10000000L, hiCents: Long = 10500000L): String = {
    def block(label: String, order: String): String =
      s"""SELECT '$label' AS ordering,
         |  CAST(count(*) AS BIGINT) AS n_zones,
         |  CAST(sum(CASE WHEN zmax < $loCents OR zmin > $hiCents
         |    THEN 1 ELSE 0 END) AS BIGINT) AS skipped_zones,
         |  CAST(sum(CASE WHEN zmax < $loCents OR zmin > $hiCents
         |    THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
         |    AS skip_ppm,
         |  CAST(sum(CASE WHEN zmax < $loCents OR zmin > $hiCents
         |    THEN 0 ELSE zn END) AS BIGINT) AS rows_scanned,
         |  CAST(sum(zsel) AS BIGINT) AS rows_matching
         |FROM (
         |  SELECT z, count(*) AS zn, min(v) AS zmin, max(v) AS zmax,
         |    sum(CASE WHEN v BETWEEN $loCents AND $hiCents
         |      THEN 1 ELSE 0 END) AS zsel
         |  FROM (
         |    SELECT v,
         |      (row_number() OVER (ORDER BY $order) - 1) // $zoneRows
         |        AS z
         |    FROM base) r
         |  GROUP BY z) zs""".stripMargin
    s"""WITH base AS (
       |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
       |    AS BIGINT) AS v, l_orderkey, l_linenumber
       |  FROM lineitem)
       |${block("natural", "l_orderkey, l_linenumber")}
       |UNION ALL
       |${block("value_sorted", "v, l_orderkey, l_linenumber")}
       |ORDER BY ordering""".stripMargin
  }

  /** Exact range-partitioner plan: the k−1 split values that divide the
    * order-total axis into k partitions of (±1 row) equal size — what
    * `repartitionByRange`/Spark's `RangePartitioner` ESTIMATES by
    * reservoir sampling, computed exactly. The practical uses: writing
    * range-bucketed output whose file sizes are provably balanced, and
    * auditing how badly a sampled partitioner would have skewed (compare
    * file row counts against these exact targets). Boundary i sits at
    * global rank ⌊i·n/k⌋ of the total order (cents, o_orderkey) — the
    * key tie-break makes the split deterministic even on heavily
    * duplicated values, and bucket sizes are exact rank differences, so
    * the whole plan is integers.
    *
    * Scale: one [[DistributedRank]] pass (ranged partitioning + prefix
    * offsets, no single-task sort), one broadcast k-row frame, one
    * equi-join on the target ranks. Caller releases the rank pins via
    * DistributedRank.release.
    */
  def rangePartitionPlan(orders: DataFrame, k: Int = 16): DataFrame = {
    val cents = (col("o_totalprice").cast("decimal(18,2)") * 100)
      .cast("bigint")
    val base = orders.select(cents.as("cents"), col("o_orderkey"))
    val ranked = DistributedRank.withGlobalRank(
      base, Seq(col("cents"), col("o_orderkey")), "r")
    val n = base.agg(count(lit(1)).as("n"))
    val targets = n
      .select(col("n"), explode(expr(s"sequence(1, $k)")).as("bucket"))
      .select(col("bucket"),
        expr(s"(bucket * n) DIV $k").as("target_rank"),
        expr(s"(bucket * n) DIV $k - ((bucket - 1) * n) DIV $k")
          .as("rows"))
    ranked
      .join(broadcast(targets), col("r") === col("target_rank"))
      .select(
        col("bucket").cast("bigint").as("bucket"),
        col("target_rank"), col("rows"),
        col("cents").as("hi_cents"),
        col("o_orderkey").as("hi_orderkey"))
      .orderBy(col("bucket"))
  }

  def rangePartitionPlanOracleSql(k: Int = 16): String =
    s"""WITH base AS (
       |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
       |    AS cents, o_orderkey
       |  FROM orders),
       |ranked AS (
       |  SELECT *, row_number() OVER (ORDER BY cents, o_orderkey) AS r,
       |    count(*) OVER () AS n
       |  FROM base),
       |targets AS (
       |  SELECT bucket, (bucket * n) // $k AS target_rank,
       |    (bucket * n) // $k - ((bucket - 1) * n) // $k AS rows
       |  FROM (SELECT unnest(range(1, ${k + 1})) AS bucket),
       |    (SELECT CAST(count(*) AS BIGINT) AS n FROM base))
       |SELECT CAST(t.bucket AS BIGINT) AS bucket,
       |  CAST(t.target_rank AS BIGINT) AS target_rank,
       |  CAST(t.rows AS BIGINT) AS rows,
       |  rk.cents AS hi_cents, rk.o_orderkey AS hi_orderkey
       |FROM targets t JOIN ranked rk ON rk.r = t.target_rank
       |ORDER BY bucket""".stripMargin
}
