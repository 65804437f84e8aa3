package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TEMPORARY: phase-level bisect of the DedupIndex.dedupAgainst path
  * (q62b shape). Deleted before round close.
  */
object Probe62 {
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val path = java.nio.file.Files
      .createTempDirectory("probe62_idx_").toString
    time("index-write") {
      graft.dedup.DedupIndex.write(
        docs.filter(col("doc_id") >= 400), "doc_id", "text", path,
        graft.dedup.DedupIndex.Params(
          shingleSize = 1, numHashes = 64, bands = 16, seed = 42L))
    }
    val idx = graft.dedup.DedupIndex.read(spark, path)
    val batch = docs.filter(col("doc_id") < 400)

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val key = graft.text.TextStats.fingerprintMd5(col("text"))
      val batchKeys = time("batchKeys-count") {
        val bk = batch.select(key.as("__key")).distinct()
        bk.write.format("noop").mode("overwrite").save(); bk
      }
      val matchedKeys = time("matchedKeys-count") {
        val mk = idx.exact.join(broadcast(batchKeys), Seq("__key"), "left_semi")
          .select(col("__key")).distinct()
        mk.write.format("noop").mode("overwrite").save(); mk
      }
      time("exact-noop") {
        batch.withColumn("__key", key)
          .join(broadcast(matchedKeys), Seq("__key"), "left_anti")
          .drop("__key")
          .write.format("noop").mode("overwrite").save()
      }
      time("near-verified-checkpoint") {
        graft.dedup.DedupIndex.nearDuplicatesAgainst(
          batch, idx, "doc_id", "text", threshold = 0.9)
      }
      time("full-dedupAgainst-noop") {
        graft.dedup.DedupIndex.dedupAgainst(
          batch, idx, "doc_id", "text", threshold = 0.9)
          .write.format("noop").mode("overwrite").save()
      }
      // inlined nearDuplicatesAgainst bisect
      locally {
        val p = idx.params
        val threshold = 0.9
        val spread = batch.repartition(
          spark.sessionState.conf.numShufflePartitions, col("doc_id"))
        val batchSets = spread
          .select(col("doc_id"), graft.dedup.Dedup.shingles(col("text"), p.shingleSize).as("__shingles"))
          .filter(size(col("__shingles")) > 0)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        time("  batchSets-fill") {
          batchSets.write.format("noop").mode("overwrite").save()
        }
        val signed = batchSets.withColumnRenamed("doc_id", "__bid")
          .select(col("__bid"), col("__shingles"))
          .withColumn("__sig",
            graft.dedup.Dedup.minhashSignature(col("__shingles"), p.numHashes, p.seed))
        val batchBuckets = graft.dedup.Dedup
          .lshBuckets(signed, "__bid", "__sig", p.bands, p.rowsPerBand)
          .groupBy(col("band"), col("bucket"))
          .agg(graft.functions.CappedCollectList
            .cappedCollectList(col("__bid"), 100000).as("__bids"))
          .filter(col("__bids").isNotNull)
        time("  batchBuckets-noop") {
          batchBuckets.write.format("noop").mode("overwrite").save()
        }
        val pairs = broadcast(batchBuckets)
          .join(idx.buckets, Seq("band", "bucket"))
          .select(explode(col("__bids")).as("batch_id"), col("ids"))
          .select(col("batch_id"), explode(col("ids")).as("corpus_id"))
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        time("  pairs-fill") {
          pairs.write.format("noop").mode("overwrite").save()
        }
        println("  pairs count " + pairs.count())
        val ba = batchSets.select(col("doc_id").as("batch_id"), col("__shingles").as("__sa"))
        val caCand = idx.sets
          .join(broadcast(pairs.select(col("corpus_id")).distinct()),
            Seq("corpus_id"), "left_semi")
          .select(col("corpus_id"), col("__shingles").as("__sb"))
        time("  caCand-noop") {
          caCand.write.format("noop").mode("overwrite").save()
        }
        val verified = pairs.join(ba, "batch_id").join(caCand, "corpus_id")
          .filter(least(size(col("__sa")), size(col("__sb"))).cast("double") >=
            lit(threshold) * greatest(size(col("__sa")), size(col("__sb"))))
          .withColumn("jaccard",
            graft.functions.JaccardDistinct.jaccardDistinct(col("__sa"), col("__sb")))
          .filter(col("jaccard") >= threshold)
          .select(col("batch_id"), col("corpus_id"), col("jaccard"))
        time("  verified-noop") {
          verified.write.format("noop").mode("overwrite").save()
        }
        time("  verified-checkpoint") { verified.localCheckpoint(true) }
        batchSets.unpersist(); pairs.unpersist()
      }
    }
    spark.stop()
  }
}
