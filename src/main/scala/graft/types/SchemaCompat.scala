package graft.types

import org.apache.spark.sql.types._

/** Spark `StructType` ↔ feature-spec compatibility walk, a pure-Scala port
  * of `ml_hadoop_experiment/tensorflow/dataframe_to_tf_helper.py:15-163`.
  * Semantics are pinned by the reference's 22-case truth table
  * (`tests/tensorflow/test_dataframe_to_tf_helper.py:11-114`), ported in
  * `SchemaCompatSpec`.
  */
object SchemaCompat {

  /** Exact Spark type per feature dtype (`dataframe_to_tf_helper.py:15-23`). */
  def exactSparkType(dtype: FeatureDType): DataType = dtype match {
    case FeatureDType.Int32 => IntegerType
    case FeatureDType.Int64 => LongType
    case FeatureDType.Float32 => FloatType
    case FeatureDType.Float64 => DoubleType
    case FeatureDType.TfString => StringType
  }

  /** Widening conversions (`dataframe_to_tf_helper.py:26-34`): int widens
    * to int64, float to float64; double→float32 is rejected.
    */
  def canConvert(from: DataType, to: FeatureDType): Boolean = from match {
    case IntegerType => to == FeatureDType.Int32 || to == FeatureDType.Int64
    case LongType => to == FeatureDType.Int64
    case FloatType => to == FeatureDType.Float32 || to == FeatureDType.Float64
    case DoubleType => to == FeatureDType.Float64
    case StringType => to == FeatureDType.TfString
    case _ => false
  }

  /** Exact DataType for a spec (`dataframe_to_tf_helper.py:37-59`): one
    * non-null `ArrayType` level per shape dimension; VarLen is a rank-1
    * array.
    */
  def exactDataTypeFor(spec: FeatureSpec): DataType = spec match {
    case FixedLenFeature(shape, dtype, _) =>
      shape.foldLeft(exactSparkType(dtype))((t, _) => ArrayType(t, containsNull = false))
    case VarLenFeature(dtype) =>
      ArrayType(exactSparkType(dtype), containsNull = false)
  }

  /** Exact StructField: nullable iff the spec has a default
    * (`dataframe_to_tf_helper.py:62-65`).
    */
  def exactStructFieldFor(name: String, spec: FeatureSpec): StructField = {
    val nullable = spec match {
      case f: FixedLenFeature => f.defaultValue.isDefined
      case _: VarLenFeature => false
    }
    StructField(name, exactDataTypeFor(spec), nullable)
  }

  /** Datatype compatibility (`dataframe_to_tf_helper.py:73-112`): exact
    * match, or rank walk + widening. A rank-1 array is also accepted for
    * a higher-rank FixedLen spec (flattened tensor); VarLen accepts
    * scalars and rank-1 arrays of convertible element type.
    */
  def isDataTypeCompatible(spec: FeatureSpec, datatype: DataType): Boolean = spec match {
    case f: FixedLenFeature =>
      if (datatype == exactDataTypeFor(f)) true
      else {
        var dfRank = 0
        var t = datatype
        while (t.isInstanceOf[ArrayType]) {
          t = t.asInstanceOf[ArrayType].elementType
          dfRank += 1
        }
        if (dfRank == f.shape.length || (dfRank == 1 && f.shape.length > 1))
          canConvert(t, f.dtype)
        else false
      }
    case v: VarLenFeature =>
      if (datatype == exactDataTypeFor(v)) true
      else if (canConvert(datatype, v.dtype)) true
      else datatype match {
        case ArrayType(elem, _) => canConvert(elem, v.dtype)
        case _ => false
      }
  }

  /** StructField compatibility (`dataframe_to_tf_helper.py:115-134`):
    * matching name, compatible type, and — FixedLen only — a nullable
    * column requires a spec default.
    */
  def isStructFieldCompatible(
      field: StructField,
      name: String,
      spec: FeatureSpec): Boolean =
    field.name == name &&
      isDataTypeCompatible(spec, field.dataType) &&
      (spec match {
        case f: FixedLenFeature => !(field.nullable && f.defaultValue.isEmpty)
        case _: VarLenFeature => true
      })

  /** Whole-schema compatibility (`dataframe_to_tf_helper.py:137-163`). */
  def isSchemaCompatible(schema: StructType, specs: FeatureSpec.Specs): Boolean =
    specs.forall { case (name, spec) =>
      schema.fields.find(_.name == name) match {
        case Some(field) => isStructFieldCompatible(field, name, spec)
        case None => false
      }
    }
}
