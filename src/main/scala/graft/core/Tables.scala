package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-generated test corpus
  * (`/root/testdata/sf*`; see TESTDATA.md). All `SparkEntry.queries`
  * read through here so the scan path is uniform: plain parquet scans
  * that Catalyst can push filters/projections into.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
