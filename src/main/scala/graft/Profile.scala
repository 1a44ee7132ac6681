package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Optimization-round tooling (not part of the driver contract): run
  * named registry queries once each under a listener and print, per
  * query, wall seconds split into construction (the registry closure,
  * which for iterative operators runs jobs itself) vs action
  * (`toRdd.count()`), plus job/stage/task counts, summed executor task
  * time, and shuffle bytes. Separates "fixed per-job overhead dominated"
  * from "task-time dominated" — guide §1 (measure first) applied to a
  * 376-query suite where the Spark UI is disabled.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTimeMs = new AtomicLong
    val shufR = new AtomicLong
    val shufW = new AtomicLong
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(): Unit }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        taskTimeMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
        shufR.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        shufW.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // warmup identical to Bench
    val loaders: Seq[(SparkSession, String) => org.apache.spark.sql.DataFrame] =
      Seq(Tables.events, Tables.lineitem, Tables.orders, Tables.customer,
        Tables.supplier, Tables.part, Tables.nation, Tables.region,
        Tables.documents, Tables.embeddings)
    for (load <- loaders)
      try load(spark, sfDir).count()
      catch { case _: Throwable => }

    println(f"${"query"}%-32s ${"build_s"}%8s ${"act_s"}%8s jobs stages tasks tasktime_s shufMB")
    for (name <- names; fn = SparkEntry.queries(name)) {
      // run twice; report the second (warm) run like the bench's min-of-3
      for (round <- 0 to 1) {
        jobs.set(0); stages.set(0); tasks.set(0)
        taskTimeMs.set(0); shufR.set(0); shufW.set(0)
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.toRdd.count()
        val t2 = System.nanoTime()
        Thread.sleep(300) // let queued listener events drain
        if (round == 1)
          println(f"$name%-32s ${(t1 - t0) / 1e9}%8.2f ${(t2 - t1) / 1e9}%8.2f ${jobs.get}%4d ${stages.get}%6d ${tasks.get}%5d ${taskTimeMs.get / 1e3}%10.2f ${(shufR.get + shufW.get) / 1e6}%6.1f")
        graft.operators.DistributedRank.release(spark)
        graft.operators.Mixture.releaseDistMatched(spark)
      }
    }
    spark.stop()
  }
}
