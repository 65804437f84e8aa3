package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BatchingSpec extends SparkSpec {
  import sqlImplicits._

  private def docs(rows: (Long, Long)*) = rows.toDF("id", "len")

  test("rows land in the tightest bucket; batches never mix buckets") {
    val df = docs((1L to 100L).map(i => i -> (i * 7 % 500)): _*)
    val got = Batching.lengthBucketedBatches(
      df, "id", "len", Seq(100L, 250L, 500L), batchSize = 8)
    val rows = got.collect()
    rows.foreach { r =>
      val len = r.getLong(1); val b = r.getLong(2)
      b should be >= len
      Seq(100L, 250L, 500L).filter(_ >= len).min shouldBe b
    }
    // batch key is (bucket, batch_idx); positions 0..size-1, size <= 8
    rows.groupBy(r => (r.getLong(2), r.getLong(3))).values.foreach { batch =>
      batch.length should be <= 8
      batch.map(_.getLong(4)).sorted shouldBe (0L until batch.length).toArray
    }
  }

  test("ranks are gap-free per bucket and only the last batch is partial") {
    val df = docs((1L to 30L).map(i => i -> 50L): _*) // one bucket
    val got = Batching.lengthBucketedBatches(
      df, "id", "len", Seq(100L), batchSize = 8).collect()
    val byBatch = got.groupBy(_.getLong(3)).map { case (b, xs) =>
      b -> xs.length
    }
    byBatch shouldBe Map(0L -> 8, 1L -> 8, 2L -> 8, 3L -> 6)
  }

  test("deterministic under partitioning and input order") {
    val rows = (1L to 120L).map(i => i -> (i % 300))
    val base = Batching.lengthBucketedBatches(
      docs(rows: _*), "id", "len", Seq(100L, 300L), 16).collect().toSet
    val again = Batching.lengthBucketedBatches(
      docs(scala.util.Random.shuffle(rows): _*).repartition(9),
      "id", "len", Seq(100L, 300L), 16).collect().toSet
    again shouldBe base
  }

  test("length past the last bound raises") {
    val ex = intercept[Exception] {
      Batching.lengthBucketedBatches(
        docs(1L -> 50L, 2L -> 5000L), "id", "len", Seq(100L), 4).collect()
    }
    ex.getMessage should include("exceeds the last bucket bound")
  }

  test("NULL and negative lengths raise") {
    val df = Seq((1L, Some(10L)), (2L, None)).toDF("id", "len")
    val ex = intercept[Exception] {
      Batching.lengthBucketedBatches(df, "id", "len", Seq(100L), 4).collect()
    }
    ex.getMessage should include("NULL or negative len")
  }

  test("unsorted or duplicate boundaries rejected") {
    an[IllegalArgumentException] should be thrownBy
      Batching.lengthBucketedBatches(docs(1L -> 1L), "id", "len",
        Seq(200L, 100L), 4)
    an[IllegalArgumentException] should be thrownBy
      Batching.lengthBucketedBatches(docs(1L -> 1L), "id", "len",
        Seq(100L, 100L), 4)
  }
}
