package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loader for the driver-generated test corpus
  * (`/root/testdata/sf*`; see TESTDATA.md). All `SparkEntry.queries`
  * read through here so the scan path is uniform: plain parquet scans
  * that Catalyst can push filters/projections into.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Event-time columns whose parquet physical type has varied across
    * corpus generations; normalize every variant to session-local
    * TIMESTAMP so downstream `unix_micros`/watermark code sees one type:
    *   - TIMESTAMP(NANOS): Spark 4 rejects it by default
    *     (PARQUET_TYPE_ILLEGAL); with `nanosAsLong` it surfaces as
    *     LongType nanos and we rebuild via integer `div` (a double
    *     round-trip would lose precision above 2^53 ns);
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
    *     TIMESTAMP_NTZ, which `unix_micros` and event-time watermarks
    *     reject — cast to TIMESTAMP (sessions run with UTC timezone, so
    *     the wall-clock values are unchanged, matching the oracle's
    *     naive read of the same parquet).
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
      else if (d.schema.fieldNames.contains(c) &&
          d.schema(c).dataType == TimestampNTZType)
        d.withColumn(c, col(c).cast(TimestampType))
      else d
    }
  }
}
