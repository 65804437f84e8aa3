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

  test("native distance fold matches the HOF witness bit-for-bit") {
    import org.apache.spark.sql.functions.col
    val rng = new scala.util.Random(43)
    val cents = Seq.fill(5)(Array.fill(16)(rng.nextDouble() * 20 - 10))
    val vecs = (0 until 60).map(i =>
      (i.toLong, Array.fill(16)((rng.nextDouble() * 20 - 10).toFloat)))
    val df = vecs.toDF("id", "v")
    val got = df.select(
      graft.functions.L2DistancesFold.l2Distances(col("v"), cents).as("n"),
      KMeans.distancesHof(col("v"), cents).as("h"))
      .collect()
    got.foreach { r =>
      val n = r.getSeq[Double](0).map(java.lang.Double.doubleToRawLongBits)
      val h = r.getSeq[Double](1).map(java.lang.Double.doubleToRawLongBits)
      n shouldBe h
    }
  }

  test("native distance fold runs under forced codegen") {
    import org.apache.spark.sql.functions.col
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq((0L, Array(1.0f, 2.0f)), (1L, Array(-1.0f, 0.5f)))
        .toDF("id", "v")
      val got = df.select(graft.functions.L2DistancesFold
        .l2Distances(col("v"), Seq(Array(0.0, 0.0), Array(1.0, 2.0))).as("d"))
        .orderBy(col("id") * 0 + 1) // keep input order irrelevant; collect both
        .collect().map(_.getSeq[Double](0))
      got should contain (Seq(5.0, 0.0))
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("dimension mismatch and null elements yield a null result") {
    import org.apache.spark.sql.functions.col
    val df = Seq((0L, Array(1.0f, 2.0f, 3.0f))).toDF("id", "v")
    df.select(graft.functions.L2DistancesFold
      .l2Distances(col("v"), Seq(Array(0.0, 0.0))).as("d"))
      .collect().head.isNullAt(0) shouldBe true
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
