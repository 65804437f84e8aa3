package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the driver-generated test corpus
  * (`/root/testdata/sf*`; see TESTDATA.md). All `SparkEntry.queries`
  * read through here so the scan path is uniform: plain parquet scans
  * that Catalyst can push filters/projections into.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Columns written by the corpus generator as parquet
    * TIMESTAMP(NANOS), which Spark 4 rejects by default
    * (PARQUET_TYPE_ILLEGAL). With `nanosAsLong` they surface as
    * LongType nanos; we rebuild a real timestamp with integer
    * `div` (a double round-trip would lose precision above 2^53 ns).
    */
  private val NanoTsColumns = Map("events" -> Seq("ts"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Runtime-settable legacy conf; set defensively here as well as in
    // the session builders so every entry point reads `events`.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    NanoTsColumns.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      if (d.schema.fieldNames.contains(c) && d.schema(c).dataType == LongType)
        d.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      else d
    }
  }
}
