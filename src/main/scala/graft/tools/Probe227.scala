package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}

/** TEMPORARY measurement probe for q227 (not part of the library;
  * deleted before round close). Replicates the q227 body with a job
  * listener so per-batch cost decomposes into Spark jobs.
  */
object Probe227 {
  def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    java.nio.file.Files.walk(src).forEach { p =>
      val to = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(to)
      else java.nio.file.Files.copy(p, to,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  def main(args: Array[String]): Unit = {
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

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        starts.put(js.jobId, (js.time, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, desc) = starts.getOrDefault(je.jobId, (je.time, "?"))
        println(f"JOB ${je.jobId}%4d ${(je.time - t0) / 1000.0}%7.3fs  $desc")
      }
    })

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // pristine base index (corpus doc_id < 400)
    val pristine = java.nio.file.Files
      .createTempDirectory("probe227_base_").toString
    var t0 = System.nanoTime()
    graft.dedup.DedupIndex.write(
      docs.filter(col("doc_id") < 400), "doc_id", "text", pristine,
      graft.dedup.DedupIndex.Params(
        shingleSize = 1, numHashes = 64, bands = 16, seed = 42L))
    println(f"PHASE pristine-build ${(System.nanoTime() - t0) / 1e9}%.2fs")

    // staged blocks: 4 files of 25 docs each (doc_id 400..499)
    val stagedRoot = java.nio.file.Files.createTempDirectory("probe227_in_")
    val t1700 = 1700000000000L
    for (i <- 0 until 4) {
      val tmp = java.nio.file.Files.createTempDirectory("probe227_blk_")
      docs.filter(col("doc_id") >= 400 + i * 25 && col("doc_id") < 400 + (i + 1) * 25)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val it = java.nio.file.Files.list(tmp).iterator()
      var part: java.nio.file.Path = null
      while (it.hasNext) { val p = it.next(); if (p.toString.endsWith(".parquet")) part = p }
      val dst = stagedRoot.resolve(f"block$i%04d.parquet")
      java.nio.file.Files.copy(part, dst)
      dst.toFile.setLastModified(t1700 + i * 1000)
    }
    val staged = stagedRoot.toString

    for (round <- 1 to 2) {
      val base = java.nio.file.Files.createTempDirectory("probe227_run_").toString
      val indexPath = s"$base/index"
      t0 = System.nanoTime()
      copyTree(java.nio.file.Paths.get(pristine), java.nio.file.Paths.get(indexPath))
      println(f"PHASE copyTree ${(System.nanoTime() - t0) / 1e9}%.2fs")
      t0 = System.nanoTime()
      val conf8 = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", 8)
      val stream = spark.readStream
        .schema(spark.read.parquet(staged).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
      val gate = graft.streaming.Streaming.dedupIngestSink(
        stream, indexPath, s"$base/survivors", s"$base/ckpt",
        "doc_id", "text", threshold = 0.9)
      gate.awaitTermination()
      spark.conf.set("spark.sql.shuffle.partitions", conf8)
      println(f"PHASE round$round stream ${(System.nanoTime() - t0) / 1e9}%.2fs")
      t0 = System.nanoTime()
      val n = spark.read.parquet(s"$base/survivors").count()
      println(f"PHASE round$round readback ${(System.nanoTime() - t0) / 1e9}%.2fs n=$n")
    }
    spark.stop()
  }
}
