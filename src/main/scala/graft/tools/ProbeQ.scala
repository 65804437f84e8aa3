package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd, SparkListenerStageCompleted}

/** TEMPORARY measurement probe: run named registry queries once (after
  * one warmup) with a job listener printing per-job wall time, stage
  * task counts, and the query's total. Not part of the library.
  *
  * Usage: runMain graft.tools.ProbeQ <q1,q2,...>
  */
object ProbeQ {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    @volatile var tasks = 0L
    @volatile var verbose = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, js.time)
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        tasks += sc.stageInfo.numTasks
        val si = sc.stageInfo
        val dt = (for {a <- si.completionTime; b <- si.submissionTime}
          yield (a - b) / 1000.0).getOrElse(-1.0)
        if (verbose && dt > 0.3) {
          println(f"  STAGE ${si.stageId}%4d $dt%7.3fs tasks=${si.numTasks} ${si.name.take(120)}")
          si.details.split('\n').filter(_.contains("graft"))
            .take(4).foreach(l => println(s"    at $l"))
        }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val t0 = starts.getOrDefault(je.jobId, je.time)
        if (verbose)
          println(f"JOB ${je.jobId}%4d ${(je.time - t0) / 1000.0}%7.3fs")
      }
    })

    val qmap = (graft.Queries.all ++ graft.Queries.benchOnly)
      .map(q => q.name -> q.run).toMap
    for (n <- names) {
      // warmup
      qmap(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      Thread.sleep(200)
      val j0 = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      tasks = 0L
      verbose = true
      val t0 = System.nanoTime()
      qmap(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      verbose = false
      Thread.sleep(200)
      println(f"QUERY $n total=$dt%.2fs tasks=$tasks")
    }
    spark.stop()
  }
}
