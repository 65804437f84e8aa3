package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuotaSpec extends SparkSpec {
  import sqlImplicits._

  private def corpus = (0L until 1000L)
    .map(i => (i, if (i % 10 < 6) "en" else if (i % 10 < 9) "de" else "zh"))
    .toDF("id", "lang")
  // composition: en 600, de 300, zh 100

  test("apportion: exact largest-remainder, sums to totalN") {
    // 100 over weights 1:1:1 → 34/33/33 with the extra going to the
    // lexicographically smallest stratum at equal remainders
    Quota.apportion(Seq("b" -> 1L, "a" -> 1L, "c" -> 1L), 100L)
      .toMap shouldBe Map("a" -> 34L, "b" -> 33L, "c" -> 33L)
    // classic Hamilton case: floor shares 46/31/21 leave 2 extras for
    // the two largest remainders
    val got = Quota.apportion(Seq("x" -> 467L, "y" -> 319L, "z" -> 214L), 100L)
    got.map(_._2).sum shouldBe 100L
    got.toMap shouldBe Map("x" -> 47L, "y" -> 32L, "z" -> 21L)
    // pure function: no data involved, stable across calls
    Quota.apportion(Seq("x" -> 467L, "y" -> 319L, "z" -> 214L), 100L) shouldBe got
  }

  test("apportion rejects bad inputs") {
    an[IllegalArgumentException] should be thrownBy
      Quota.apportion(Seq.empty, 10L)
    an[IllegalArgumentException] should be thrownBy
      Quota.apportion(Seq("a" -> 0L), 10L)
    an[IllegalArgumentException] should be thrownBy
      Quota.apportion(Seq("a" -> 1L, "a" -> 2L), 10L)
    an[IllegalArgumentException] should be thrownBy
      Quota.apportion(Seq("a" -> 1L), -1L)
  }

  test("quotaSample hits the target composition exactly when available") {
    val got = Quota.quotaSample(corpus, "lang", "id",
      Seq("en" -> 5L, "de" -> 3L, "zh" -> 2L), totalN = 200L, salt = "v1")
    val byLang = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang shouldBe Map("en" -> 100L, "de" -> 60L, "zh" -> 40L)
    got.count() shouldBe 200L
  }

  test("short stratum yields everything it has; no silent redistribution") {
    // zh has 100 rows; ask for 150 of it
    val targets = Seq("en" -> 1L, "zh" -> 3L)
    val got = Quota.quotaSample(corpus, "lang", "id", targets, 200L)
    val byLang = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang("zh") shouldBe 100L // capped at available
    byLang("en") shouldBe 50L  // its own quota, NOT inflated by zh's shortfall
    val report = Quota.allocationReport(corpus, "lang", targets, 200L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    report("zh") shouldBe ((100L, 150L, 100L))
    report("en") shouldBe ((600L, 50L, 50L))
  }

  test("target stratum absent from data reports available = 0") {
    val report = Quota.allocationReport(corpus, "lang",
      Seq("en" -> 1L, "xx" -> 1L), 10L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    report("xx") shouldBe ((0L, 5L, 0L))
  }

  test("non-target strata never appear in the sample") {
    val got = Quota.quotaSample(corpus, "lang", "id", Seq("de" -> 1L), 50L)
    got.select("lang").distinct().collect().map(_.getString(0)).toSeq shouldBe Seq("de")
  }

  test("membership is deterministic and layout-independent") {
    val targets = Seq("en" -> 2L, "de" -> 1L)
    val a = Quota.quotaSample(corpus, "lang", "id", targets, 90L, salt = "s")
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Quota.quotaSample(corpus.repartition(17), "lang", "id", targets, 90L, salt = "s")
      .select("id").collect().map(_.getLong(0)).toSet
    a shouldBe b
    a.size shouldBe 90
  }

  test("selection matches the window-rank replay (oracle form)") {
    val targets = Seq("en" -> 5L, "de" -> 3L, "zh" -> 2L)
    val got = Quota.quotaSample(corpus, "lang", "id", targets, 100L, salt = "v1")
      .select("id").collect().map(_.getLong(0)).toSet
    val quota = Quota.apportion(targets, 100L).toMap
    val expected = corpus
      .withColumn("bk", Splits.bucketOf(col("id"), "v1", 1 << 20))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col("bk"), col("id"))))
      .collect()
      .filter(r => quota.get(r.getString(1)).exists(q => r.getInt(3) <= q))
      .map(_.getLong(0)).toSet
    got shouldBe expected
  }

  test("quotaSample raises on NULL ids") {
    val df = Seq((Some(1L), "en"), (None, "en"))
      .toDF("id", "lang")
    val ex = intercept[Exception] {
      Quota.quotaSample(df, "lang", "id", Seq("en" -> 1L), 1L).collect()
    }
    ex.getMessage should include("NULL")
  }
}
