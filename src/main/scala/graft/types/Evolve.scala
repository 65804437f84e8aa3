package graft.types

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-evolution union — read N generations of a table as one
  * DataFrame. A long-lived corpus is never one schema: the crawler
  * added a field in March, an int column outgrew 32 bits in June, a
  * float column became double when someone noticed the precision loss.
  * At 100 TB you cannot rewrite history to the newest schema before
  * every read; the read path must reconcile generations on the fly.
  * North-star extension (SURVEY §2.11); the generic-table complement of
  * [[SchemaCompat]] (which checks a DataFrame against the reference's
  * TF feature specs, not two table generations against each other).
  *
  * Reconciliation rules are the lossless ("safe") promotions and
  * nothing more — the Iceberg/Parquet evolution contract:
  *   - integer family widens: byte → short → int → long;
  *   - float → double;
  *   - decimal(p,s) → decimal(p',s) with p' ≥ p (scale never changes —
  *     rescaling rounds, which is not evolution but arithmetic);
  *   - a column missing from a generation reads as NULL there (and the
  *     reconciled column is nullable);
  *   - arrays/structs/maps reconcile element-wise, recursively.
  * Anything else (long ↔ double, string ↔ int, scale changes…) is a
  * LOSSY rewrite someone must own explicitly — it raises with the
  * column path and both types, never silently casts.
  *
  * Scale shape: pure metadata work on the driver (schemas, not data)
  * plus one map-only cast/null-fill projection per input — no shuffle,
  * no UDF; the union is a plan-level concatenation and every cast is
  * codegen'd. Parquet filter/column pushdown survives: the projection
  * sits above each scan, and Catalyst pushes prunable columns through
  * it.
  */
object Evolve {

  private def intRank(dt: DataType): Option[Int] = dt match {
    case ByteType => Some(0)
    case ShortType => Some(1)
    case IntegerType => Some(2)
    case LongType => Some(3)
    case _ => None
  }

  private def ofIntRank(r: Int): DataType =
    Seq(ByteType, ShortType, IntegerType, LongType)(r)

  /** Widened common type of `a` and `b`, or None when no safe promotion
    * exists. Symmetric; identity on equal types.
    */
  def widen(a: DataType, b: DataType, path: String = ""): Option[DataType] =
    (a, b) match {
      case (x, y) if x == y => Some(x)
      case (x, y) if intRank(x).isDefined && intRank(y).isDefined =>
        Some(ofIntRank(intRank(x).get max intRank(y).get))
      case (FloatType, DoubleType) | (DoubleType, FloatType) =>
        Some(DoubleType)
      case (x: DecimalType, y: DecimalType) if x.scale == y.scale =>
        Some(DecimalType((x.precision max y.precision) min 38, x.scale))
      case (ArrayType(xe, xn), ArrayType(ye, yn)) =>
        widen(xe, ye, s"$path[]").map(ArrayType(_, xn || yn))
      case (MapType(xk, xv, xn), MapType(yk, yv, yn)) if xk == yk =>
        widen(xv, yv, s"$path{}").map(MapType(xk, _, xn || yn))
      case (x: StructType, y: StructType) =>
        Some(widenStruct(x, y, path))
      case _ => None
    }

  /** Reconciled struct: union of fields in first-appearance order,
    * widened types, a field missing on either side becomes nullable.
    * Raises on any unpromotable field.
    */
  def widenStruct(a: StructType, b: StructType, path: String = ""): StructType = {
    val bByName = b.fields.map(f => f.name -> f).toMap
    val fromA = a.fields.map { fa =>
      bByName.get(fa.name) match {
        case None => fa.copy(nullable = true)
        case Some(fb) =>
          val p = if (path.isEmpty) fa.name else s"$path.${fa.name}"
          val dt = widen(fa.dataType, fb.dataType, p).getOrElse(
            throw new IllegalArgumentException(
              s"no safe promotion for column $p: " +
                s"${fa.dataType.simpleString} vs ${fb.dataType.simpleString}" +
                " — a lossy change needs an explicit rewrite, not evolution"))
          StructField(fa.name, dt, fa.nullable || fb.nullable)
      }
    }
    val aNames = a.fieldNames.toSet
    val fromB = b.fields.filterNot(f => aNames(f.name))
      .map(_.copy(nullable = true))
    StructType(fromA ++ fromB)
  }

  /** All generations as one DataFrame under the reconciled schema:
    * every input is cast/null-filled to the common schema (map-only),
    * then unioned. Column order is first-appearance across `dfs`.
    */
  def unionByNameWidened(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionByNameWidened needs at least one input")
    val target = dfs.map(_.schema).reduce(widenStruct(_, _, ""))
    dfs.map { df =>
      val have = df.schema.fieldNames.toSet
      df.select(target.fields.toSeq.map { f =>
        if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }: _*)
    }.reduce(_.unionByName(_))
  }
}
