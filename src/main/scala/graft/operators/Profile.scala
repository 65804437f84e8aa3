package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass, schema-driven column profiler — the data-quality summary
  * a 100 TB ingest gate runs before anything else touches a drop
  * (Deequ-style completeness/cardinality/range checks, re-expressed as
  * a single Spark aggregate). North-star extension (SURVEY §2.11).
  *
  * Every column's metrics are computed in ONE aggregate over one scan:
  * per column — row count, null count, exact distinct count, and
  * type-directed min/max (numerics and timestamps through `double`;
  * strings natively; other types count-only). The N `countDistinct`s
  * plan as one Expand(N)×HashAggregate — the standard exact-multi-
  * distinct cost; at scales where exact cardinality is not worth N×
  * the shuffle, profile the drop with [[graft.sketch.Hll]] per column
  * instead and keep this for the bounded columns.
  *
  * Output is long-format — one row per column — so downstream checks
  * (`n_nulls = 0`, `n_distinct = n_rows`, range assertions) are plain
  * filters, and profiles of successive drops diff row-wise.
  * Non-applicable min/max slots hold `''` / null-double sentinels, not
  * engine-dependent NULL renderings.
  */
object Profile {

  def profile(df: DataFrame): DataFrame = {
    require(df.schema.nonEmpty, "profile of a zero-column frame")
    val metrics: Seq[Column] = df.schema.fields.toSeq.map { f =>
      val c = col(f.name)
      val numExpr: Column = f.dataType match {
        case _: NumericType => c.cast("double")
        case TimestampType | TimestampNTZType =>
          unix_micros(c.cast("timestamp")).cast("double")
        case DateType => datediff(c, lit("1970-01-01")).cast("double")
        case BooleanType => c.cast("int").cast("double")
        case _ => lit(null).cast("double")
      }
      val strExpr: Column = f.dataType match {
        case StringType => c
        case _ => lit(null).cast("string")
      }
      struct(
        lit(f.name).as("column_name"),
        lit(f.dataType.simpleString).as("dtype"),
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(c)).as("n_nulls"),
        countDistinct(c).as("n_distinct"),
        min(numExpr).as("min_num"),
        max(numExpr).as("max_num"),
        coalesce(min(strExpr), lit("")).as("min_str"),
        coalesce(max(strExpr), lit("")).as("max_str"))
    }
    df.agg(metrics.head.as("m0"),
        metrics.tail.zipWithIndex.map { case (m, i) => m.as(s"m${i + 1}") }: _*)
      .select(explode(array(
        metrics.indices.map(i => col(s"m$i")): _*)).as("m"))
      .select(col("m.*"))
  }
}
