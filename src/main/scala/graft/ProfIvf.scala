package graft
import org.apache.spark.sql.SparkSession
object ProfIvf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val emb = time("load+count") { val e = Tables.embeddings(spark, dir); e.count(); e }
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.sql.functions._
    val withFeatures = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .withColumn("features", array_to_vector(col("embedding")))
    val train = time("coalesce+persist+count") { val t = withFeatures.select(col("features")).coalesce(8).persist(); t.count(); t }
    val model = time("kmeans fit") {
      new org.apache.spark.ml.clustering.KMeans().setK(16).setSeed(42L)
        .setFeaturesCol("features").setPredictionCol("cell").setMaxIter(5).fit(train)
    }
    time("full ivfTopK cold-cache") {
      graft.operators.Similarity.ivfTopK(Tables.embeddings(spark, dir), seed = 43L).collect()
    }
    time("full ivfTopK warm-cache") {
      graft.operators.Similarity.ivfTopK(Tables.embeddings(spark, dir), seed = 43L).collect()
    }
    spark.stop()
  }
}
