package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Executable evidence for the 100 TB design claims: bucketed tables
  * co-locate joins (no shuffle on either side), partitioned layouts
  * prune at the scan, and broadcast keeps dimension joins exchange-free
  * on the fact side. These run on miniature data — the *plans* are the
  * assertion, and plans are scale-invariant.
  */
class ScaleTechniquesSpec extends SparkSpec {
  import sqlImplicits._

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // force AQE to finalize
    df.queryExecution.executedPlan.toString
  }

  test("bucketed tables join without a shuffle on either side") {
    // tables land in the default warehouse dir (gitignored spark-warehouse/);
    // a fresh catalog won't know leftover tables from prior JVMs, so clear
    // the physical locations too
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    val warehouse = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("b_orders", "b_customer").foreach { t =>
      val dir = new java.io.File(warehouse, t)
      if (dir.exists()) {
        Files.walk(dir.toPath).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.delete(p))
      }
    }
    (1L to 1000L).map(i => (i, i % 100, i * 1.5)).toDF("o_id", "cust", "price")
      .write.bucketBy(8, "cust").sortBy("cust").saveAsTable("b_orders")
    (0L until 100L).map(i => (i, s"c$i")).toDF("cust", "name")
      .write.bucketBy(8, "cust").sortBy("cust").saveAsTable("b_customer")

    val joined = spark.table("b_orders")
      .join(spark.table("b_customer").hint("merge"), "cust")
    val plan = executed(joined)
    plan should include("SortMergeJoin")
    // co-located: neither side shuffles (bucket layout satisfies the
    // join's distribution requirement)
    plan should not include "Exchange hashpartitioning"
    joined.count() shouldBe 1000L
  }

  test("partitioned parquet prunes partitions at the scan") {
    val dir = Files.createTempDirectory("part").toString
    (1L to 300L).map(i => (i, s"t${i % 3}", i * 1.0)).toDF("id", "day", "v")
      .write.partitionBy("day").mode("overwrite").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("day") === "t1")
    val plan = pruned.queryExecution.executedPlan.toString
    plan should include("PartitionFilters: [isnotnull(day")
    pruned.count() shouldBe 100L
    // only the t1 partition directory is read
    pruned.select(countDistinct(col("day"))).collect().head.getLong(0) shouldBe 1L
  }

  test("broadcast dimension join leaves the fact side exchange-free") {
    val fact = (1L to 1000L).map(i => (i, i % 25)).toDF("id", "nation")
    val dim = (0L until 25L).map(i => (i, s"n$i")).toDF("nation", "name")
    val joined = fact.join(broadcast(dim), "nation")
    val plan = executed(joined)
    plan should include("BroadcastHashJoin")
    plan should not include "Exchange hashpartitioning"
    joined.count() shouldBe 1000L
  }

  test("simhash near-dup plan has zero joins (fingerprints ride the bucket structs)") {
    val df = Seq((1L, 5L), (2L, 6L), (3L, 0xF0F0L)).toDF("doc_id", "fp")
    val plan = graft.dedup.Dedup
      .simhashNearDuplicatesFromFingerprints(df, "doc_id", "fp", 3, 4)
      .queryExecution.executedPlan.toString
    plan should not include "Join"
    plan should not include "CartesianProduct"
    plan should include("ObjectHashAggregate") // capped bucket collection
  }

  test("embedding near-dup plan joins only by id, never a bucket self-join product") {
    val rng = new scala.util.Random(3)
    val df = (0L until 50L).map(i => (i, Seq.fill(8)(rng.nextFloat())))
      .toDF("vec_id", "embedding")
    val plan = graft.sim.Similarity
      .embeddingNearDuplicates(df, "vec_id", "embedding", threshold = 0.9)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    plan should include("ObjectHashAggregate") // capped bucket collection
    // the only joins re-attach vectors by equality on id
    plan should not include "Window"
  }

  test("ivf top-k final stage is a partial+final aggregate, not a window sort") {
    val rng = new scala.util.Random(7)
    val data = (0L until 60L).map(i => (i, Seq.fill(8)(rng.nextFloat())))
    val df = data.toDF("vec_id", "embedding")
    val index = graft.sim.Similarity.buildIvf(df, "vec_id", "embedding", nCells = 4)
    val queries = Seq((0L, data.head._2.toArray))
    val plan = graft.sim.Similarity.ivfTopK(index, queries, k = 5, nProbe = 4)
      .queryExecution.executedPlan.toString
    plan should include("Aggregate")
    plan should not include "Window"
  }

  test("filters on engine queries reach the parquet scan") {
    // representative pushdown check on the corpus tables
    val li = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val plan = li.filter(col("l_shipdate") <= lit("1995-01-01").cast("timestamp"))
      .select(col("l_orderkey"))
      .queryExecution.executedPlan.toString
    plan should include("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate")
    plan should include("ReadSchema: struct<l_orderkey:bigint,l_shipdate:timestamp_ntz>")
  }

  test("sequence packing windows are bucket-partitioned, never global") {
    val df = (0L until 300L).map(i => (i, 1L + i % 7)).toDF("id", "n")
    val plan = executed(graft.operators.Packing.packSequences(
      df, "id", "id", "n", seqLen = 64, bucketWidth = 32))
    // every window spec in the plan must carry the bucket partition key;
    // a naive global prefix sum would plan windowspecdefinition(id ASC...)
    // with no partition column — one task for the whole corpus
    val specs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    specs should not be empty
    specs.foreach(_ should include("__b"))
    // and the bucket-offset table joins as a broadcast, not a shuffle
    plan should include("BroadcastHashJoin")
  }

  test("hash split is map-only: no exchange anywhere in the plan") {
    val df = (0L until 100L).map(Tuple1(_)).toDF("id")
    val plan = executed(graft.operators.Splits.withSplit(
      df, "id", Seq("a" -> 0.5, "b" -> 0.5), salt = "s"))
    plan should not include "Exchange"
  }

  test("semantic dedup pairs by a cluster equi-join, never an all-pairs product") {
    // semDeDup materializes eagerly (checkpoint), so its final plan is
    // just a checkpoint scan — capture EVERY plan it executes instead
    val plans = new scala.collection.mutable.ArrayBuffer[String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          ns: Long): Unit = plans.synchronized {
        plans += qe.executedPlan.toString
      }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val rng = new scala.util.Random(5)
      val df = (0L until 60L)
        .map(i => (i, Seq.fill(8)(rng.nextGaussian().toFloat)))
        .toDF("id", "v")
      graft.sim.SemDeDup.semDeDup(df, "id", "v", k = 3, iters = 1, tau = 0.9)
        .collect()
      // listener callbacks are async; wait until the count stabilizes,
      // with a hard deadline so dropped listener events cannot hang us
      val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
      var last = -1
      var stable = 0
      while (stable < 3 && System.nanoTime < deadline) {
        Thread.sleep(200)
        val now = plans.synchronized(plans.size)
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      if (stable < 3)
        fail("listener plan count did not stabilize within the deadline")
      plans.synchronized {
        plans should not be empty
        plans.foreach { p =>
          p should not include "CartesianProduct"
          p should not include "BroadcastNestedLoopJoin"
        }
      }
    } finally spark.listenerManager.unregister(listener)
  }

  test("grouped quantiles window the histogram, not the rows") {
    val df = (0L until 1000L).map(i => ("g" + i % 3, i % 19)).toDF("g", "v")
    val q = graft.sketch.Quantiles.grouped(df, Seq("g"), "v", Seq(0.5, 0.9))
    val plan = executed(q)
    // the cumulative window must sit ABOVE the (group, value) count
    // aggregate — windowing raw rows would buffer values per group
    val winAt = plan.indexOf("Window")
    val aggAt = plan.lastIndexOf("HashAggregate")
    winAt should be >= 0
    aggAt should be > winAt // later in text = deeper in the tree
    plan should not include "CartesianProduct"
  }
}
