package graft.sim

import graft.SparkSpec

class KMeansSpec extends SparkSpec {
  import sqlImplicits._

  // two tight, well-separated blobs around (0,0) and (10,10); ids 0 and
  // 50 (the two smallest per blob... 0 in blob A, 50 in blob B) seed init
  private def blobs = {
    val a = (0 until 50).map(i =>
      (i.toLong, Array(0.0f + i * 0.001f, 0.0f - i * 0.001f)))
    val b = (50 until 100).map(i =>
      (i.toLong, Array(10.0f + i * 0.001f, 10.0f - i * 0.001f)))
    (a ++ b).toDF("id", "v")
  }

  test("separates two obvious blobs") {
    val got = KMeans.kmeans(blobs, "id", "v", k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // init picks ids 0 and 1 (both blob A), but one Lloyd round pulls a
    // centroid to blob B's mass... with both seeds in blob A, the
    // nearer seed keeps A and the farther seed captures B after round 1
    val aClusters = (0L until 50L).map(got).toSet
    val bClusters = (50L until 100L).map(got).toSet
    aClusters.size shouldBe 1
    bClusters.size shouldBe 1
    aClusters should not be bClusters
  }

  test("fit matches hand arithmetic for one round") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(3.0f, 0.0f)),
      (2L, Array(1.2f, 0.0f))
    ).toDF("id", "v")
    // init: c0=(1,0), c1=(3,0); assignment: {0,2}→c0, {1}→c1
    val cents = KMeans.fit(df, "id", "v", k = 2, iters = 1)
    val scale = math.pow(2.0, 20)
    def q(x: Float): Long = math.floor(x.toDouble * scale).toLong
    cents(0)(0) shouldBe ((q(1.0f) + q(1.2f)).toDouble / scale) / 2.0
    cents(1)(0) shouldBe (q(3.0f).toDouble / scale) / 1.0
    cents(0)(1) shouldBe 0.0
  }

  test("centroids are bit-identical under different partitionings") {
    val base = blobs
    val c1 = KMeans.fit(base.repartition(1), "id", "v", k = 2, iters = 3)
    val c2 = KMeans.fit(base.repartition(17), "id", "v", k = 2, iters = 3)
    c1.map(_.toSeq) shouldBe c2.map(_.toSeq) // exact, not approximate
  }

  test("empty clusters keep their previous centroid") {
    // ids 0,1: identical points seed two centroids; ties go to the
    // lower index, so cluster 1 receives nothing and must stay put
    val df = Seq(
      (0L, Array(5.0f, 5.0f)),
      (1L, Array(5.0f, 5.0f)),
      (2L, Array(5.1f, 5.0f))
    ).toDF("id", "v")
    val cents = KMeans.fit(df, "id", "v", k = 2, iters = 2)
    cents(1).toSeq shouldBe Seq(5.0, 5.0)
  }

  test("assignment tie-breaks toward the lower centroid index") {
    val df = Seq((0L, Array(0.0f))).toDF("id", "v")
    val got = KMeans.assign(df, "id", "v",
      Seq(Array(1.0), Array(-1.0))) // equidistant
      .collect().head
    got.getInt(1) shouldBe 0
  }

  test("rejects bad parameters and too-few rows") {
    val df = Seq((0L, Array(1.0f))).toDF("id", "v")
    intercept[IllegalArgumentException] {
      KMeans.fit(df, "id", "v", k = 2, iters = 1)
    }
    intercept[IllegalArgumentException] {
      KMeans.fit(df, "id", "v", k = 0, iters = 1)
    }
  }
}
