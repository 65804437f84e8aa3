package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build: collapse a change
  * stream into validity intervals — one row per (key, status run) with
  * `valid_from` / `valid_to` / `is_current`. The warehouse-standard
  * companion to the as-of join ([[AsOf]]): SCD2 BUILDS the versioned
  * dimension that as-of then probes. North-star extension (SURVEY
  * §2.11); the reference has no temporal operators.
  *
  * Semantics: rows are ordered per key by `(tsCol, tieCols…)` (the
  * caller supplies tie-breaks to make the order total — determinism
  * contract as in [[Enumerate]]); a new interval starts whenever the
  * tracked attribute differs from the previous row's (or at the first
  * row); `valid_to` is the NEXT interval's start (null = still
  * current). Consecutive identical values collapse into one interval —
  * re-observing an unchanged attribute extends, never splits.
  *
  * Scale shape: two window passes over the SAME `partitionBy(keys)`
  * partitioning — Catalyst plans one exchange, both sorts local. State
  * per key is nothing (pure windows, no driver path); skewed keys cost
  * what their row count costs, exactly like any per-key window.
  */
object Scd {

  /** Validity intervals of `attrCol` per `keyCols`:
    * `(keys…, status, valid_from, valid_to, is_current)` where
    * `valid_from`/`valid_to` carry `tsCol`'s type and `valid_to` is
    * null on each key's current interval.
    */
  def scd2(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      attrCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    val ord: Seq[Column] = col(tsCol) +: tieCols.map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    val changes = df
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      // null-safe inequality: a null→value or value→null attribute
      // transition is a real change, not a silent merge
      .filter(not(col(attrCol) <=> col("__prev")))
      .select((keyCols.map(col) :+ col(tsCol).as("valid_from") :+
        col(attrCol).as("status")) ++ tieCols.map(col): _*)
    val w2 = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("valid_from") +: tieCols.map(col): _*)
    changes
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols.map(col) :+ col("status") :+ col("valid_from") :+
        col("valid_to") :+ col("is_current")): _*)
  }
}
