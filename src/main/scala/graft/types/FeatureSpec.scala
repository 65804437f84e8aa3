package graft.types

/** Model-facing feature schema — the engine's second schema system next to
  * Spark's `StructType`, mirroring the reference's
  * `Dict[str, Union[tf.io.FixedLenFeature, tf.io.VarLenFeature]]`
  * (`ml_hadoop_experiment/tensorflow/tfrecords.py:22`).
  *
  * A [[FixedLenFeature]] with a `defaultValue` marks the corresponding
  * column nullable; without one, nulls are a schema error
  * (`dataframe_to_tf_helper.py:62-65,126-133`).
  */
sealed trait FeatureDType {
  def isInteger: Boolean = this == FeatureDType.Int32 || this == FeatureDType.Int64
  def isFloating: Boolean = this == FeatureDType.Float32 || this == FeatureDType.Float64
  def isString: Boolean = this == FeatureDType.TfString
}

object FeatureDType {
  case object Int32 extends FeatureDType
  case object Int64 extends FeatureDType
  case object Float32 extends FeatureDType
  case object Float64 extends FeatureDType
  case object TfString extends FeatureDType
}

sealed trait FeatureSpec extends Serializable {
  def dtype: FeatureDType
}

/** Fixed-shape feature. `shape = Nil` is a scalar; `Seq(n)` a vector; etc.
  * `defaultValue` is a scalar or list used when the column is null/empty.
  */
final case class FixedLenFeature(
    shape: Seq[Int],
    dtype: FeatureDType,
    defaultValue: Option[Any] = None) extends FeatureSpec

/** Variable-length (ragged) feature; parsed as a sparse tensor. */
final case class VarLenFeature(dtype: FeatureDType) extends FeatureSpec

object FeatureSpec {
  type Specs = Map[String, FeatureSpec]
}
