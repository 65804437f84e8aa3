package graft.sketch

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

class FrequentItemsSpec extends SparkSpec {
  import sqlImplicits._

  // scalatest+scalacheck bridge isn't on the classpath; sample directly
  private def forAll[A, B](ga: Gen[A], gb: Gen[B], n: Int = 12)(
      body: (A, B) => Unit): Unit =
    Iterator.continually(Gen.zip(ga, gb).sample).flatten.take(n)
      .foreach { case (a, b) => body(a, b) }

  test("frequentItems equals the exact groupBy-having answer") {
    // zipf-ish: item i appears 200/i times
    val rows = (1 to 40).flatMap(i => Seq.fill(200 / i)(s"item$i"))
    val df = scala.util.Random.shuffle(rows).toDF("item").repartition(7)
    val expected = df.groupBy("item").count().filter(col("count") >= 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = FrequentItems.frequentItems(df, "item", threshold = 20L,
      capacity = 200)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe expected
    expected.size should be >= 5 // the test exercises a non-trivial answer
  }

  test("summary completeness: every item above total/capacity is present") {
    forAll(Gen.listOfN(500, Gen.choose(1, 30)), Gen.choose(10, 40)) {
      (items: List[Int], capacity: Int) =>
        val df = items.map(i => s"i$i").toDF("item").repartition(5)
        val s = FrequentItems.summarize(df, "item", capacity)
        s.total shouldBe items.size.toLong
        val exact = items.groupBy(identity).view.mapValues(_.size).toMap
        val mustHave = exact.collect {
          case (i, c) if c > items.size / capacity => s"i$i"
        }.toSet
        (mustHave -- s.counts.keySet) shouldBe empty
        // counts never underestimate, and error bounds the overshoot
        s.counts.foreach { case (item, (c, e)) =>
          val truth = exact.getOrElse(item.drop(1).toInt, 0)
          c should be >= truth.toLong
          (c - e) should be <= truth.toLong
        }
    }
  }

  test("null items are ignored") {
    val df = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("item")
    val s = FrequentItems.summarize(df, "item", 10)
    s.total shouldBe 3L
    s.counts.keySet shouldBe Set("a", "b")
  }

  test("frequentItems refuses thresholds the capacity cannot guarantee") {
    val df = (1 to 1000).map(i => s"i${i % 50}").toDF("item")
    val e = intercept[IllegalArgumentException] {
      FrequentItems.frequentItems(df, "item", threshold = 5L, capacity = 10)
    }
    e.getMessage should include("capacity")
  }

  test("empty candidate set returns an empty typed result") {
    val df = (1 to 100).map(i => s"i$i").toDF("item") // all singletons
    val got = FrequentItems.frequentItems(df, "item", threshold = 50L,
      capacity = 120)
    got.columns.toSeq shouldBe Seq("item", "count")
    got.count() shouldBe 0L
  }

  test("eviction inherits the evicted count as the error bound") {
    val s = FrequentItems.summarize(
      (Seq.fill(5)("a") ++ Seq.fill(4)("b") ++ Seq("c", "d")).toDF("item")
        .coalesce(1),
      "item", capacity = 2)
    // capacity 2 over a,b,c,d: a and the last arrival survive with
    // inflated counts; whatever is reported never underestimates
    s.counts.foreach { case (_, (c, e)) => c should be >= 1L }
    s.total shouldBe 11L
  }
}
