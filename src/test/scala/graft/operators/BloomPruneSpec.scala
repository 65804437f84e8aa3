package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomPruneSpec extends SparkSpec {
  import sqlImplicits._

  private def fact = (1L to 2000L).map(i => (i, s"f$i")).toDF("k", "payload")
  private def dim = (1L to 2000L by 100L).map(i => (i, s"d$i")).toDF("dk", "dim")

  test("prunedJoin equals the plain inner join") {
    val expected = fact.join(dim, col("k") === col("dk"))
      .select(col("k"), col("dim"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = BloomPrune.prunedJoin(fact, "k", dim, "dk", expectedItems = 20L)
      .select(col("k"), col("dim"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    got shouldBe expected
    got.size shouldBe 20
  }

  test("an undersized bloom (high FP rate) still yields the exact join") {
    // expectedItems = 1 for 20 keys → saturated filter, many FPs; the
    // join must still remove every one of them
    val expected = fact.join(dim, col("k") === col("dk"))
      .select(col("k")).collect().map(_.getLong(0)).toSet
    val got = BloomPrune.prunedJoin(fact, "k", dim, "dk", expectedItems = 1L)
      .select(col("k")).collect().map(_.getLong(0)).toSet
    got shouldBe expected
  }

  test("probableMatches never drops a true match and prunes most others") {
    val bloom = BloomPrune.keyBloom(dim, "dk", expectedItems = 20L, fpp = 0.01)
    val kept = BloomPrune.probableMatches(fact, "k", bloom)
      .select(col("k")).collect().map(_.getLong(0)).toSet
    val dimKeys = dim.select(col("dk")).collect().map(_.getLong(0)).toSet
    (dimKeys -- kept) shouldBe empty // no false negatives, ever
    // fpp 0.01 over 1980 non-members: expect ~20 FPs, allow wide margin
    kept.size should be < 300
  }

  test("null fact keys never change the exact inner-join result") {
    val factN = Seq((Some(1L), "a"), (None, "b")).toDF("k", "payload")
    val d = Seq((1L, "d1")).toDF("dk", "dim")
    BloomPrune.prunedJoin(factN, "k", d, "dk", expectedItems = 1L)
      .select(col("payload")).collect().map(_.getString(0)).toSeq shouldBe Seq("a")
  }

  test("numBitsFor tracks fpp and clamps to the cap") {
    BloomPrune.numBitsFor(1000L, 0.03) should be > 5000L
    BloomPrune.numBitsFor(1000L, 0.001) should be >
      BloomPrune.numBitsFor(1000L, 0.1)
    BloomPrune.numBitsFor(Long.MaxValue / 4, 0.001) shouldBe (1L << 27)
  }

  test("the probe compiles into the scan stage, not a post-join filter") {
    // a LocalRelation would be constant-folded whole (ConvertToLocalRelation);
    // a file scan shows where the probe actually runs at scale
    val dir = java.nio.file.Files.createTempDirectory("bloomprune").toString
    fact.write.mode("overwrite").parquet(dir)
    val factFile = spark.read.parquet(dir)
    val bloom = BloomPrune.keyBloom(dim, "dk", expectedItems = 20L)
    val pruned = BloomPrune.probableMatches(factFile, "k", bloom)
    val plan = pruned.queryExecution.executedPlan.toString
    plan should include("might_contain")
    // the filter sits directly over the file scan — before any exchange
    plan.indexOf("might_contain") should be < plan.indexOf("FileScan")
    pruned.count() shouldBe BloomPrune.probableMatches(fact, "k", bloom).count()
  }
}
