package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import sqlImplicits._

  private def pack(rows: Seq[(Long, Long)], seqLen: Long, bucketWidth: Long = 4) =
    Packing.packSequences(
      rows.toDF("id", "n"), "id", "id", "n", seqLen, bucketWidth)
      .orderBy("seq_id", "id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("hand-computed layout: docs pack contiguously and split at boundaries") {
    // stream: doc0 [0,3), doc1 [3,10), doc2 [10,12); seqLen 4
    // seq0 = doc0[0..3) + doc1 slice [3,4); seq1 = doc1 [4,8);
    // seq2 = doc1 [8,10) + doc2 [10,12)
    val got = pack(Seq((0L, 3L), (1L, 7L), (2L, 2L)), seqLen = 4)
    got shouldBe Seq(
      (0L, 0L, 0L, 0L, 3L),
      (0L, 1L, 3L, 0L, 1L),
      (1L, 1L, 0L, 1L, 4L),
      (2L, 1L, 0L, 5L, 2L),
      (2L, 2L, 2L, 0L, 2L))
  }

  test("slices of each doc cover it exactly; sequences are full") {
    val docs = (0L until 200L).map(i => (i, 1L + (i * 37) % 13))
    val total = docs.map(_._2).sum
    val got = pack(docs, seqLen = 16, bucketWidth = 7)
    // per-doc slices sum to its length
    got.groupBy(_._2).foreach { case (id, slices) =>
      slices.map(_._5).sum shouldBe docs.find(_._1 == id).get._2
      // doc_off of consecutive slices is contiguous
      val sorted = slices.sortBy(_._4)
      sorted.zip(sorted.map(_._5).scanLeft(0L)(_ + _)).foreach {
        case ((_, _, _, off, _), expect) => off shouldBe expect
      }
    }
    // every sequence except the last carries exactly seqLen units
    val bySeq = got.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
    val last = bySeq.keys.max
    bySeq.foreach { case (s, n) =>
      if (s != last) n shouldBe 16L else n shouldBe (total - 16L * last)
    }
  }

  test("zero-length docs are dropped, results unchanged") {
    val a = pack(Seq((0L, 3L), (1L, 0L), (2L, 5L)), seqLen = 4)
    val b = pack(Seq((0L, 3L), (2L, 5L)), seqLen = 4)
    a shouldBe b
    a.map(_._2).toSet should not contain 1L
  }

  test("bucket width does not change the layout") {
    val docs = (0L until 100L).map(i => (i * 3, 1L + i % 9)) // sparse keys
    val a = pack(docs, seqLen = 32, bucketWidth = 1)
    val b = pack(docs, seqLen = 32, bucketWidth = 1000000)
    val c = pack(docs, seqLen = 32, bucketWidth = 17)
    a shouldBe b
    a shouldBe c
  }

  test("layout-independent under repartitioning") {
    val docs = (0L until 500L).map(i => (i, 1L + i % 21))
    val df = docs.toDF("id", "n")
    val a = Packing.packSequences(df, "id", "id", "n", 64, 32)
      .orderBy("seq_id", "id").collect().map(_.toSeq)
    val b = Packing.packSequences(df.repartition(13), "id", "id", "n", 64, 32)
      .orderBy("seq_id", "id").collect().map(_.toSeq)
    a shouldBe b
  }

  test("negative counts fail loudly") {
    val ex = intercept[Exception] {
      pack(Seq((0L, 3L), (1L, -2L)), seqLen = 4)
    }
    ex.getMessage should include("negative")
  }

  test("null counts fail loudly instead of silently vanishing") {
    val df = Seq((0L, java.lang.Long.valueOf(3L)), (1L, null: java.lang.Long))
      .toDF("id", "n")
    val ex = intercept[Exception] {
      Packing.packSequences(df, "id", "id", "n", 4, 4).collect()
    }
    ex.getMessage should include("null or negative")
  }

  test("over-sparse order keys trip the maxBuckets guard, not the driver") {
    // bucketWidth=1 on 100 distinct keys -> 100 occupied buckets
    val df = (0L until 100L).map(i => (i, 2L)).toDF("id", "n")
    val ex = intercept[IllegalArgumentException] {
      Packing.packSequences(df, "id", "id", "n",
        seqLen = 4, bucketWidth = 1, maxBuckets = 10)
    }
    ex.getMessage should include("maxBuckets")
    ex.getMessage should include("bucketWidth")
    // same data under the cap works and the cap does not change layout
    val a = Packing.packSequences(df, "id", "id", "n",
      seqLen = 4, bucketWidth = 1, maxBuckets = 100)
      .orderBy("seq_id", "id").collect().map(_.toSeq)
    val b = Packing.packSequences(df, "id", "id", "n",
      seqLen = 4, bucketWidth = 64)
      .orderBy("seq_id", "id").collect().map(_.toSeq)
    a shouldBe b
  }
}
