package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the ingest gate that turns "is
  * this batch safe to publish?" into a small audit table instead of a
  * hope. [[Profile]] describes a table (what IS the null rate?); this
  * operator judges it against caller-declared contracts (the null rate
  * MUST be zero), the write-audit-publish step every scheduled 100 TB
  * pipeline runs between "computed" and "committed".
  *
  * Check vocabulary:
  *   - [[Checks.Complete]]: no NULLs in a column;
  *   - [[Checks.Satisfies]]: arbitrary row predicate holds everywhere
  *     (NULL predicate results count as violations — an unknown is not
  *     a pass);
  *   - [[Checks.Unique]]: no duplicate key tuples (NULLs group as
  *     values, as in GROUP BY);
  *   - [[Checks.RowCountBetween]]: guard against the two classic
  *     upstream failures, an empty/truncated batch and a blown-up one;
  *   - [[Checks.ReferencedIn]]: referential integrity — every non-NULL
  *     key exists in a dimension.
  *
  * Output: one row per check — `(check_idx, check, violations, total,
  * passed)`. Rows come out grouped by check KIND (row-level checks
  * share one scan and plan together), not in declaration order —
  * `check_idx` carries each check's declared position, so join results
  * back to declarations by index, never by row position.
  * `violations`/`total` make the row actionable
  * (0.01% bad vs 40% bad are different incidents); `passed` is the
  * machine gate (`assertAll` raises on the first false).
  *
  * Scale shape: every row-level check (Complete/Satisfies/RowCount)
  * folds into ONE shared scan — a single hash-aggregate row of
  * conditional counts, map-side combined, no shuffle of data rows.
  * Each Unique adds one distinct-key-sized aggregate; each
  * ReferencedIn adds one anti-join (broadcast when the dimension is
  * small) reduced to a count. The audit table itself is
  * #checks-sized.
  */
object Checks {

  sealed trait Check { def name: String }

  /** Column has no NULLs. */
  final case class Complete(col: String) extends Check {
    def name = s"complete($col)"
  }

  /** `pred` holds on every row; NULL results are violations. */
  final case class Satisfies(label: String, pred: Column) extends Check {
    def name = s"satisfies($label)"
  }

  /** No two rows share a `cols` tuple (NULLs compare as values). */
  final case class Unique(cols: Seq[String]) extends Check {
    require(cols.nonEmpty, "Unique needs at least one column")
    def name = s"unique(${cols.mkString(",")})"
  }

  /** `lo <= count(*) <= hi`. `violations` is the distance to the
    * nearest bound (how wrong the batch size is, not just that it is).
    */
  final case class RowCountBetween(lo: Long, hi: Long) extends Check {
    require(lo >= 0 && hi >= lo, s"need 0 <= lo <= hi, got [$lo, $hi]")
    def name = s"row_count_between($lo,$hi)"
  }

  /** Every non-NULL `col` value appears in `dim.dimCol` (NULL foreign
    * keys are [[Complete]]'s job, not a referential violation).
    */
  final case class ReferencedIn(col: String, dim: DataFrame, dimCol: String)
      extends Check {
    def name = s"referenced_in($col)"
  }

  /** The audit table: `(check_idx, check, violations, total, passed)`,
    * one row per declared check. `check_idx` is the check's POSITION in
    * the declared list — rows come out grouped by check kind (the
    * shared-scan checks plan together), so match results back to
    * declarations by `check_idx`, never by row position.
    */
  def runChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "runChecks needs at least one check")
    val spark = df.sparkSession
    val indexed = checks.zipWithIndex

    // One shared-scan aggregate row for all row-level checks + count.
    val rowLevel: Seq[(Check, Int, Column)] = indexed.collect {
      case (c @ Complete(colName), i) =>
        // coalesce: an EMPTY batch has zero violations, not NULL ones
        (c, i,
          coalesce(sum(when(col(colName).isNull, 1L).otherwise(0L)), lit(0L)))
      case (c @ Satisfies(_, pred), i) =>
        (c, i,
          coalesce(sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)),
            lit(0L)))
    }
    val aggCols = count(lit(1)).as("__n") +:
      rowLevel.map { case (_, i, e) => e.as(s"__v$i") }
    val base = df.agg(aggCols.head, aggCols.tail: _*)

    def row(check: Check, idx: Int, violations: Column): Column =
      struct(lit(idx.toLong).as("check_idx"),
        lit(check.name).as("check"),
        violations.cast("long").as("violations"),
        col("__n").as("total"),
        (violations === 0L).as("passed"))

    val rowLevelRows: Seq[Column] = rowLevel.map {
      case (c, i, _) => row(c, i, col(s"__v$i"))
    }
    val countRows: Seq[Column] = indexed.collect {
      case (c @ RowCountBetween(lo, hi), i) =>
        val dist = when(col("__n") < lo, lit(lo) - col("__n"))
          .when(col("__n") > hi, col("__n") - lit(hi))
          .otherwise(lit(0L))
        struct(lit(i.toLong).as("check_idx"),
          lit(c.name).as("check"),
          dist.cast("long").as("violations"),
          col("__n").as("total"),
          (dist === 0L).as("passed"))
    }
    val scanRows = rowLevelRows ++ countRows
    val fromScan =
      if (scanRows.isEmpty) Seq.empty
      else Seq(base.select(explode(array(scanRows: _*)).as("__r"))
        .select(col("__r.*")))

    // Unique: duplicate rows = total keyed rows − distinct keys, from a
    // distinct-key-sized aggregate.
    val uniqueFrames = indexed.collect { case (c @ Unique(cols), i) =>
      df.groupBy(cols.map(col).toIndexedSeq: _*)
        .agg(count(lit(1)).as("__c"))
        .agg(coalesce(sum(col("__c")), lit(0L)).as("__tot"),
          count(lit(1)).as("__keys"))
        .select(lit(i.toLong).as("check_idx"),
          lit(c.name).as("check"),
          (col("__tot") - col("__keys")).as("violations"),
          col("__tot").as("total"),
          (col("__tot") === col("__keys")).as("passed"))
    }

    // ReferencedIn: orphan keys via anti-join, reduced to one count.
    val refFrames = indexed.collect {
      case (c @ ReferencedIn(colName, dim, dimCol), i) =>
        val nRow = df.agg(count(lit(1)).as("__n"))
        val orphans = df.filter(col(colName).isNotNull)
          .join(dim.select(col(dimCol).as("__dk")).distinct(),
            col(colName) === col("__dk"), "left_anti")
          .agg(count(lit(1)).as("__orphans"))
        // 1×1 attach through the zero-key broadcast hash join — a bare
        // crossJoin would plan the BNLJ PlanGuardSpec forbids.
        graft.core.Scalars.withScalars(orphans, nRow)
          .select(lit(i.toLong).as("check_idx"),
            lit(c.name).as("check"),
            col("__orphans").as("violations"),
            col("__n").as("total"),
            (col("__orphans") === 0L).as("passed"))
    }

    (fromScan ++ uniqueFrames ++ refFrames).reduce(_ unionByName _)
  }

  /** Run the gate: raises with every failing check's name and counts if
    * any check fails; returns the audit table (already materialized —
    * the caller pays the scan exactly once) when all pass.
    */
  def assertAll(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val audit = runChecks(df, checks)
    val rows = audit.collect() // #checks rows, by construction
    val failed = rows.filter(!_.getAs[Boolean]("passed"))
    if (failed.nonEmpty)
      throw new IllegalStateException(
        "data-quality gate failed: " + failed.map(r =>
          s"${r.getAs[String]("check")} (${r.getAs[Long]("violations")}" +
            s"/${r.getAs[Long]("total")})").mkString("; "))
    df.sparkSession.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(rows: _*)), audit.schema)
  }
}
