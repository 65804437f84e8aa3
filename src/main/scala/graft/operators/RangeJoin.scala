package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DateType, NumericType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.graftbridge.ExpressionBridge

/** Binned range joins — the standard scale shape for interval predicates.
  *
  * Spark plans a bare `p BETWEEN lo AND hi` join condition as a broadcast
  * nested loop (or a cartesian product when neither side is broadcastable):
  * O(|L|·|R|) comparisons, which is the canonical 100 TB job killer. The
  * fix is to discretize the domain into fixed-width bins so the interval
  * predicate becomes an equi-join on the bin id plus a cheap residual
  * filter:
  *
  *   - each interval `[lo, hi]` is replicated to every bin it overlaps
  *     (`explode(sequence(bin(lo), bin(hi)))`);
  *   - each point `p` maps to exactly one bin, so an inner equi-join on
  *     the bin id meets every interval that could contain it;
  *   - the exact predicate then prunes the false candidates inside the
  *     same stage (no extra shuffle).
  *
  * The join thereby becomes a plain shuffle/broadcast *hash* join that
  * Catalyst and AQE size, reorder and skew-split like any other equi-join.
  * Pick `binWidth` near the typical interval length: width ≫ interval
  * wastes residual-filter work (many false candidates per bin); width ≪
  * interval replicates each interval across many bins (bounded by
  * `maxBinsPerInterval`, which fails fast instead of silently exploding
  * the build side).
  *
  * Reference context: the reference delegates all relational work to its
  * host engine and has no interval operator; this is part of the §2.11
  * beyond-reference surface (training pipelines constantly join events
  * to validity windows — sessions, campaigns, maintenance intervals).
  */
object RangeJoin {

  /** Exact floor division in long arithmetic (no double rounding):
    * `a - pmod(a, b)` is exactly divisible by `b`, so integral division
    * equals mathematical floor for negative values too.
    */
  private def floorDiv(a: Column, b: Long): Column =
    ExpressionBridge.column(IntegralDivide(
      ExpressionBridge.expression(a - pmod(a, lit(b))),
      ExpressionBridge.expression(lit(b))))

  /** The long domain a column type bins in. All columns of one range
    * join must land in the SAME domain: a date binned in days against a
    * timestamp binned in seconds would silently drop true matches (the
    * bins would never line up), so the domain is resolved once across
    * every participating column by [[commonDomain]] and threaded through
    * [[binnable]].
    */
  private sealed trait BinDomain
  private case object Seconds extends BinDomain
  private case object Days extends BinDomain
  private case object Numeric extends BinDomain

  private def domainOf(dt: DataType): BinDomain = dt match {
    case TimestampType | TimestampNTZType => Seconds
    case DateType                         => Days
    case _: NumericType                   => Numeric
    case other => throw new IllegalArgumentException(
      s"rangeJoin: cannot bin a column of type ${other.sql}; " +
        "expected timestamp, date or numeric")
  }

  /** One domain for all range-join columns. Dates promote to seconds
    * when mixed with timestamps (exactly representable: days × 86400);
    * mixing time with numeric types has no meaningful common axis and
    * fails fast rather than dropping matches.
    */
  private def commonDomain(types: Seq[DataType]): BinDomain = {
    val ds = types.map(domainOf).distinct
    ds match {
      case Seq(d) => d
      case _ if ds.toSet == Set[BinDomain](Seconds, Days) => Seconds
      case _ => throw new IllegalArgumentException(
        "rangeJoin: point and interval-bound columns must share one " +
          s"binnable domain; got types ${types.map(_.sql).mkString(", ")}")
    }
  }

  /** Monotone map of an orderable column onto longs for binning, in the
    * join's resolved common domain. The bin key never leaves this
    * operator, so it only needs per-engine monotonicity, not
    * cross-engine portability: timestamps bin at second granularity
    * (micros would overflow nothing but makes binWidth awkward), dates
    * at day granularity — or seconds when joined against timestamps —
    * numerics truncate.
    */
  private def binnable(df: DataFrame, colName: String,
      domain: BinDomain): Column = {
    val epochDays = datediff(col(colName), to_date(lit("1970-01-01")))
      .cast("long")
    (df.schema(colName).dataType, domain) match {
      case (TimestampType, Seconds) => col(colName).cast("long")
      // NTZ has no direct long cast; the session-tz reinterpretation is
      // monotone, which is all a bin key needs
      case (TimestampNTZType, Seconds) =>
        col(colName).cast(TimestampType).cast("long")
      case (DateType, Seconds) => epochDays * lit(86400L)
      case (DateType, Days)    => epochDays
      case (_, Numeric)        => col(colName).cast("long")
      case (dt, d) => throw new IllegalStateException(
        s"rangeJoin: ${dt.sql} cannot bin in domain $d") // unreachable
    }
  }

  /** `assert_true` evaluates to NULL on success; keeping it inside a
    * `filter(isNull)` stops column pruning from optimizing the guard
    * away while never dropping a row.
    */
  private def guarded(df: DataFrame, cond: Column, msg: Column): DataFrame =
    df.filter(assert_true(cond, msg).isNull)

  /** Join points to the intervals containing them:
    * `points.pointCol BETWEEN intervals.loCol AND intervals.hiCol`
    * (both bounds inclusive), optionally further constrained by
    * `equiKeys` columns present on both sides. Inner join; each
    * qualifying (point, interval) pair appears exactly once — a point
    * lives in one bin, so the bin equi-join cannot duplicate pairs.
    *
    * Non-key column names must be disjoint between the two inputs.
    * Null points or bounds never match (SQL comparison semantics), and
    * empty intervals (`hi < lo`) are dropped up front — Spark's
    * `sequence(a, b)` would otherwise count *down* and fabricate bins.
    */
  def pointIntervalJoin(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long,
      equiKeys: Seq[String] = Nil,
      maxBinsPerInterval: Long = 1L << 16): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(maxBinsPerInterval >= 1, "maxBinsPerInterval must be >= 1")
    val domain = commonDomain(Seq(
      points.schema(pointCol).dataType,
      intervals.schema(loCol).dataType,
      intervals.schema(hiCol).dataType))

    val loBin = floorDiv(binnable(intervals, loCol, domain), binWidth)
    val hiBin = floorDiv(binnable(intervals, hiCol, domain), binWidth)
    val span = hiBin - loBin + lit(1L)

    val expanded = guarded(
      intervals.filter(col(loCol) <= col(hiCol)),
      span <= maxBinsPerInterval,
      concat(lit(s"rangeJoin: interval spans more than $maxBinsPerInterval " +
        s"bins of width $binWidth (span="), span,
        lit("); raise binWidth or maxBinsPerInterval")))
      .withColumn("__bin", explode(sequence(loBin, hiBin)))

    points.withColumn("__bin",
        floorDiv(binnable(points, pointCol, domain), binWidth))
      .join(expanded, Seq("__bin") ++ equiKeys)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Join two interval tables on overlap — set semantics:
    * `a.[aLo,aHi] ∩ b.[bLo,bHi] ≠ ∅` (inclusive ends), optionally also
    * on `equiKeys`. Inner join. For non-empty intervals this equals the
    * SQL predicate `aLo <= bHi AND bLo <= aHi`; empty intervals
    * (`hi < lo`) denote the empty set and match nothing, even where the
    * bare predicate would accept them.
    *
    * Both sides explode to their overlapped bins; a pair of overlapping
    * intervals then co-occurs in *every* shared bin, which would
    * duplicate it. Instead of a `distinct()` (an extra full shuffle of
    * the result), each pair is emitted only from the first bin both
    * intervals inhabit — `bin == greatest(bin(aLo), bin(bLo))` — which
    * is always a shared bin when they overlap, so exactly one copy
    * survives with no dedup pass.
    */
  def intervalOverlapJoin(
      a: DataFrame, aLoCol: String, aHiCol: String,
      b: DataFrame, bLoCol: String, bHiCol: String,
      binWidth: Long,
      equiKeys: Seq[String] = Nil,
      maxBinsPerInterval: Long = 1L << 16): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(maxBinsPerInterval >= 1, "maxBinsPerInterval must be >= 1")
    val domain = commonDomain(Seq(
      a.schema(aLoCol).dataType, a.schema(aHiCol).dataType,
      b.schema(bLoCol).dataType, b.schema(bHiCol).dataType))

    def expand(df: DataFrame, loCol: String, hiCol: String,
        binCol: String, loBinCol: String): DataFrame = {
      val loBin = floorDiv(binnable(df, loCol, domain), binWidth)
      val hiBin = floorDiv(binnable(df, hiCol, domain), binWidth)
      val span = hiBin - loBin + lit(1L)
      guarded(
        df.filter(col(loCol) <= col(hiCol)),
        span <= maxBinsPerInterval,
        concat(lit(s"rangeJoin: interval spans more than $maxBinsPerInterval " +
          s"bins of width $binWidth (span="), span,
          lit("); raise binWidth or maxBinsPerInterval")))
        .withColumn(loBinCol, loBin)
        .withColumn(binCol, explode(sequence(loBin, hiBin)))
    }

    expand(a, aLoCol, aHiCol, "__bin", "__lo_bin_a")
      .join(expand(b, bLoCol, bHiCol, "__bin", "__lo_bin_b"),
        Seq("__bin") ++ equiKeys)
      .filter(col(aLoCol) <= col(bHiCol) && col(bLoCol) <= col(aHiCol))
      .filter(col("__bin") === greatest(col("__lo_bin_a"), col("__lo_bin_b")))
      .drop("__bin", "__lo_bin_a", "__lo_bin_b")
  }
}
