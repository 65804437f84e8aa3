package graft.records

import graft.types._

/** Row-batch → named tensors, the columnar↔tensor bridge
  * (`ml_hadoop_experiment/tensorflow/pandas_to_tensors.py:14-123`): from a
  * feature spec, compile one converter per feature; running them over a
  * batch yields a `Map[String, Tensor]` ready to feed a model runtime.
  *
  * Scalar FixedLen features produce dense vectors with
  * null→default/`error` semantics; VarLen features produce the sparse
  * triple under the reference's naming convention `k/shape`, `k/indices`,
  * `k/values` (`serving_input_receiver_fn_makers.py:42-64`).
  */
object RowsToTensors {

  sealed trait Tensor
  final case class DenseVector(values: IndexedSeq[Any]) extends Tensor
  final case class SparseShape(nRows: Long, maxLen: Long) extends Tensor
  final case class SparseIndices(indices: Seq[(Long, Long)]) extends Tensor
  final case class SparseValues(values: Seq[Any]) extends Tensor

  private type Converter = (String, IndexedSeq[Any]) => Seq[(String, Tensor)]

  private def castTo(dtype: FeatureDType, v: Any): Any = (dtype, v) match {
    case (FeatureDType.Int32, n: Number) => n.intValue()
    case (FeatureDType.Int64, n: Number) => n.longValue()
    case (FeatureDType.Float32, n: Number) => n.floatValue()
    case (FeatureDType.Float64, n: Number) => n.doubleValue()
    case (FeatureDType.TfString, s) => s.toString
    case (_, other) => throw new IllegalArgumentException(
      s"cannot cast $other to $dtype")
  }

  private def defaultMatchesDtype(default: Any, dtype: FeatureDType): Boolean = default match {
    case _: Int | _: Long => dtype.isInteger
    case _: Float | _: Double => dtype.isFloating
    case _: String => dtype.isString
    case _ => false
  }

  /** Scalar converter (reference `_make_feature_list_scalar`,
    * `pandas_to_tensors.py:14-44`): default-value/dtype mismatch fails at
    * compile time; nulls become the default, or an error without one.
    */
  private def scalarConverter(spec: FixedLenFeature): Converter = {
    spec.defaultValue.foreach { d =>
      if (!defaultMatchesDtype(d, spec.dtype))
        throw new IllegalArgumentException(
          s"default_value $d of type ${d.getClass.getSimpleName} incompatible " +
            s"with feature of type ${spec.dtype}")
    }
    (key, column) => {
      val values = spec.defaultValue match {
        case Some(d) => column.map(v => castTo(spec.dtype, if (v == null) d else v))
        case None =>
          if (column.exists(_ == null))
            throw new IllegalArgumentException(
              s"For key $key some inputs are null in the dataframe, and no " +
                "default value was provided")
          column.map(castTo(spec.dtype, _))
      }
      Seq(key -> DenseVector(values))
    }
  }

  /** VarLen converter (reference `_make_feature_list_varlen`,
    * `pandas_to_tensors.py:47-63`): nulls become empty rows; emits the
    * `k/shape`, `k/indices`, `k/values` triple.
    */
  private def varlenConverter(spec: VarLenFeature): Converter =
    (key, column) => {
      val lists: Seq[collection.Seq[Any]] = column.map {
        case null => Nil
        case s: collection.Seq[_] => s.map(castTo(spec.dtype, _))
        case a: Array[_] => a.toSeq.map(castTo(spec.dtype, _))
        case other => throw new IllegalArgumentException(
          s"VarLen feature $key expects array values, got $other")
      }
      val (indices, values, shape) = RaggedToCoo.createSparseStacked(lists)
      Seq(
        s"$key/shape" -> SparseShape(shape._1, shape._2),
        s"$key/indices" -> SparseIndices(indices),
        s"$key/values" -> SparseValues(values))
    }

  /** Placeholder layout per feature (reference U15
    * `featurespec_to_input_placeholders`,
    * `serving_input_receiver_fn_makers.py:8-68`): the tensor names and
    * shapes a serving layer must expose. FixedLen scalars are one dense
    * placeholder with a dynamic batch dim; VarLen features are the
    * `k/shape`, `k/indices`, `k/values` sparse triple. `/` in feature
    * names and non-scalar FixedLen shapes are rejected, as in the
    * reference (`:27-28`, `:38-41`). `-1` marks a dynamic dimension.
    */
  def placeholderLayout(specs: FeatureSpec.Specs): Map[String, Seq[Int]] =
    specs.toSeq.flatMap { case (name, spec) =>
      require(!name.contains('/'), s"feature name $name must not contain '/'")
      spec match {
        case f: FixedLenFeature =>
          require(f.shape.isEmpty || f.shape == Seq(1),
            s"FixedLenFeature of non-scalar shape not supported (got ${f.shape} for $name)")
          Seq(name -> Seq(-1))
        case _: VarLenFeature =>
          Seq(
            s"$name/shape" -> Seq(2),
            s"$name/indices" -> Seq(-1, 2),
            s"$name/values" -> Seq(-1))
      }
    }.toMap

  /** Compile the converter set (reference `generate_create_tensor_fn`,
    * `pandas_to_tensors.py:66-123`). Non-scalar FixedLen shapes are
    * unsupported, as in the reference.
    */
  def compile(specs: FeatureSpec.Specs): Seq[IndexedSeq[Any]] => Map[String, Tensor] = {
    val converters: Seq[(String, Converter)] = specs.toSeq.map {
      case (key, v: VarLenFeature) => key -> varlenConverter(v)
      case (key, f: FixedLenFeature) =>
        if (f.shape.isEmpty || f.shape == Seq(1)) key -> scalarConverter(f)
        else throw new UnsupportedOperationException(
          s"spec for FixedLenFeature of non-scalar shape not supported " +
            s"(got ${f.shape} for key $key)")
    }
    val keys = specs.keys.toIndexedSeq

    (columns: Seq[IndexedSeq[Any]]) => {
      require(columns.size == keys.size,
        s"expected ${keys.size} columns (one per spec), got ${columns.size}")
      val batchSize = if (columns.isEmpty) 0 else columns.head.size
      val tensors = converters.zipWithIndex.flatMap { case ((key, conv), i) =>
        conv(key, columns(i))
      }
      // size sanity asserts (reference `pandas_to_tensors.py:108-121`)
      tensors.foreach {
        case (k, DenseVector(vs)) if !k.contains('/') =>
          require(vs.size == batchSize, s"tensor $k has ${vs.size} rows, expected $batchSize")
        case (k, SparseShape(n, _)) if k.endsWith("/shape") =>
          require(n == batchSize, s"sparse $k has $n rows, expected $batchSize")
        case _ =>
      }
      tensors.toMap
    }
  }
}
