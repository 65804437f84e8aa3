package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plan-shape pins for the q201 ORC roundtrip: the partition filter
  * must prune directories (not scan-and-discard) and the row filter
  * must reach the ORC reader as a pushed filter.
  */
class OrcScanSpec extends SparkSpec {
  import spark.implicits._

  test("partition filter prunes; row predicate is pushed to ORC") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orcspec_").toString
    Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 3L, 30.0), ("b", 4L, 40.0))
      .toDF("p", "id", "v")
      .repartition(col("p"))
      .write.partitionBy("p").mode("overwrite").orc(dir)

    val q = spark.read.orc(dir).filter(col("p") === "a" && col("id") > 1L)
    val plan = q.queryExecution.executedPlan.toString

    plan should include("PartitionFilters")
    plan should include regex "PartitionFilters: \\[[^\\]]*p[^\\]]*\\]"
    plan should include regex "PushedFilters: \\[[^\\]]*GreaterThan\\(id,1\\)"
    // pruning is real: only the p=a directory's rows survive the scan
    q.collect().map(_.getLong(0)) shouldBe Array(2L)
  }

  test("roundtrip preserves values and the partition column type is readable") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orcspec2_").toString
    val in = Seq(("x", 1L, 1.5), ("y", 2L, 2.5)).toDF("p", "id", "v")
    in.repartition(col("p")).write.partitionBy("p").mode("overwrite").orc(dir)
    val back = spark.read.orc(dir).select("p", "id", "v")
      .orderBy("id").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    back shouldBe Array(("x", 1L, 1.5), ("y", 2L, 2.5))
  }
}
