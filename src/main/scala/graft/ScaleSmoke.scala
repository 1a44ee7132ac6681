package graft

import graft.gen.EventGen
import graft.operators.{HourlyAggregation, Sessionize, Upsert}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc scale smoke: run the core operators on generator-synthesized
  * frames 10x and 100x the sf0.1 event count and report wall times, to
  * check the cost curves stay ~linear (SCALING.md evidence).
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s   (rows=$n)")
    }

    for (n <- Seq(1000000L, 10000000L)) {
      println(s"--- events n=$n (userPool scaled ${n / 1000}) ---")
      val ev = EventGen.batch(spark, n, userPool = (n / 1000).toInt).cache()
      ev.count() // materialize once
      time("hourly_agg")(HourlyAggregation(ev).count())
      time("sessionize_stats")(Sessionize.sessionStats(ev).count())
      time("o14_last_write_wins")(
        Upsert.lastWriteWins(ev, Seq("user_id", "event_type"),
          Seq(col("ts"), col("event_id"))).count())
      time("funnel_conversion")(graft.queries.Analytics.funnel(ev).count())
      time("errors_near_purchases")(
        graft.operators.RangeJoin.errorsNearPurchases(ev).count())
      ev.unpersist()
    }
    spark.stop()
  }
}
