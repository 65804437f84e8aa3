package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import sqlImplicits._

  test("salted join equals the plain join row-for-row under skew") {
    // 90% of left rows share one hot key
    val left = (1L to 1000L).map(i =>
      (i, if (i <= 900) "hot" else s"k${i % 17}")).toDF("id", "key")
    val right = (Seq("hot") ++ (0 until 17).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"dim$i") }.toDF("key", "attr")
    val plain = left.join(right, Seq("key"))
      .select("key", "id", "attr").collect().toSet
    val salted = SkewJoin.saltedJoin(left, right, "key", "id", nSalts = 8)
      .select("key", "id", "attr").collect().toSet
    salted shouldBe plain
    salted.size shouldBe 1000
  }

  test("duplicate right rows per key multiply exactly as a plain join") {
    val left = Seq((1L, "a"), (2L, "a")).toDF("id", "key")
    val right = Seq(("a", "x"), ("a", "y")).toDF("key", "attr")
    val plain = left.join(right, Seq("key")).collect()
    val salted = SkewJoin.saltedJoin(left, right, "key", "id", 4).collect()
    salted.length shouldBe plain.length // 2 x 2 = 4, not 4 x nSalts
  }

  test("the salt actually spreads the hot key across sub-keys") {
    val left = (1L to 400L).map(i => (i, "hot")).toDF("id", "key")
    val counts = left
      .withColumn("salt", pmod(xxhash64(col("id")), lit(8L)))
      .groupBy("salt").count().collect().map(_.getLong(1))
    counts.length shouldBe 8 // every salt bucket hit
    counts.max.toDouble / counts.min should be < 3.0 // roughly even
  }

  test("nSalts = 1 degenerates to the plain join") {
    val left = Seq((1L, "a"), (2L, "b")).toDF("id", "key")
    val right = Seq(("a", "x"), ("b", "y")).toDF("key", "attr")
    SkewJoin.saltedJoin(left, right, "key", "id", 1)
      .collect().toSet shouldBe left.join(right, Seq("key")).collect().toSet
  }
}
