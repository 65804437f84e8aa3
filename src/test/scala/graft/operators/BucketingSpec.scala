package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import sqlImplicits._

  private lazy val dir =
    java.nio.file.Files.createTempDirectory("graft_bkt_spec_").toString

  private lazy val tables: (String, String) = {
    val facts = (1 to 5000).map(i => ((i % 97).toLong, i.toLong)).toDF("k", "v")
    val dims = (0L until 97L).map(k => (k, s"d$k")).toDF("k", "name")
    Bucketing.writeBucketed(facts, "bkt_facts_spec", s"$dir/facts", Seq("k"), 8,
      sortCols = Seq("k"))
    Bucketing.writeBucketed(dims, "bkt_dims_spec", s"$dir/dims", Seq("k"), 8,
      sortCols = Seq("k"))
    ("bkt_facts_spec", "bkt_dims_spec")
  }

  private def withNoBroadcast[A](body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, old)
  }

  test("co-bucketed join plans NO Exchange on either side") {
    val (f, d) = tables
    withNoBroadcast {
      val j = Bucketing.bucketedJoin(spark, f, d, Seq("k"))
      j.collect() // settle AQE to the final plan
      val plan = j.queryExecution.executedPlan.toString
      plan should not include "Exchange"
      plan should include("SortMergeJoin")
    }
  }

  test("bucketed join result equals the plain shuffled join") {
    val (f, d) = tables
    val bucketed = withNoBroadcast {
      Bucketing.bucketedJoin(spark, f, d, Seq("k"))
        .orderBy($"v").collect()
    }
    val facts = (1 to 5000).map(i => ((i % 97).toLong, i.toLong)).toDF("k", "v")
    val dims = (0L until 97L).map(k => (k, s"d$k")).toDF("k", "name")
    val plain = facts.join(dims, "k").orderBy($"v").collect()
    bucketed shouldBe plain
  }

  test("equality filter on the bucket key prunes buckets at the scan") {
    val (f, _) = tables
    // DisableUnnecessaryBucketedScan turns bucketed reading off for a
    // bare filter (nothing downstream needs the partitioning); force it
    // on to exercise the pruning path the layout buys.
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val q = spark.table(f).filter($"k" === 5L)
      val scan = q.queryExecution.executedPlan.toString
      scan should include("SelectedBucketsCount: 1 out of 8")
      q.select(sum($"v")).as[Long].head() shouldBe
        (1 to 5000).filter(_ % 97 == 5).map(_.toLong).sum
    } finally spark.conf.set(key, old)
  }

  test("mismatched bucket counts still answer correctly (with a shuffle)") {
    val other = (0L until 97L).map(k => (k, k * 2)).toDF("k", "w")
    Bucketing.writeBucketed(other, "bkt_other_spec", s"$dir/other", Seq("k"), 4)
    val (f, _) = tables
    val j = withNoBroadcast {
      Bucketing.bucketedJoin(spark, f, "bkt_other_spec", Seq("k"))
    }
    j.count() shouldBe 5000
  }

  test("invalid arguments fail loudly") {
    val df = Seq((1L, 2L)).toDF("k", "v")
    an[IllegalArgumentException] should be thrownBy
      Bucketing.writeBucketed(df, "t", s"$dir/x", Seq.empty, 4)
    an[IllegalArgumentException] should be thrownBy
      Bucketing.writeBucketed(df, "t", s"$dir/y", Seq("k"), 0)
  }
}
