package graft.inference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{DataType, FloatType}

import graft.records.TfRecords
import graft.types.FeatureSpec

/** The TF-helper-shaped scoring operators
  * (`ml_hadoop_experiment/tensorflow/dataframe_prediction_helper.py` and
  * `tensorflow/predictor.py`), abstracted over a pure-Scala model
  * surface: the engine has no tensor runtime in-process, so "model" is a
  * [[FeedFetchModel]] (named feeds → named fetches, the U4 Predictor
  * abstraction) or a serialized-record scorer. All of them delegate to
  * [[Inference.withInferenceColumn]], inheriting the compute-once,
  * batching, and broadcast-artifact machinery.
  */
object TfShaped {

  /** Named-feed/fetch batch model (reference `Predictor`,
    * `predictor.py:56-113`): validates the feed dictionary before
    * scoring, like `Predictor.predict`'s missing-key check.
    */
  trait FeedFetchModel extends Serializable {
    def feeds: Seq[String]
    def fetches: Seq[String]
    protected def run(inputs: Map[String, IndexedSeq[Any]]): Map[String, IndexedSeq[Any]]
    final def predict(inputs: Map[String, IndexedSeq[Any]]): Map[String, IndexedSeq[Any]] = {
      val missing = feeds.toSet -- inputs.keySet
      if (missing.nonEmpty)
        throw new NoSuchElementException(
          s"Missing keys in inputs: $missing (inputs = ${inputs.keySet})")
      run(inputs)
    }
  }

  /** Default fetch postprocessing (reference
    * `lambda x: pd.Series(x["score"][:, 0])`,
    * `dataframe_prediction_helper.py:109`).
    */
  def firstOfFetch(name: String): Map[String, IndexedSeq[Any]] => Seq[Any] =
    out => out(name).map {
      case s: collection.Seq[_] => s.head
      case v => v
    }

  /** Positive-class extraction from a "scores" matrix fetch (reference
    * `_default_extract_fn`, `dataframe_prediction_helper.py:55-72`).
    */
  def positiveClassOfFetch(name: String = "scores"): Map[String, IndexedSeq[Any]] => Seq[Any] =
    out => out(name).map { case s: collection.Seq[_] => s(1) }

  /** U3: graph scoring with named feed columns. Every feed tensor must
    * have a matching DataFrame column (validated up front, reference
    * `dataframe_prediction_helper.py:126-129`).
    */
  def withGraphInferenceColumn(
      df: DataFrame,
      model: ArtifactHandle[FeedFetchModel],
      feeds: Seq[String],
      outputCol: String = "prediction",
      outputType: DataType = FloatType,
      postprocess: Map[String, IndexedSeq[Any]] => Seq[Any] = firstOfFetch("score"),
      batchSize: Int = 1024): DataFrame = {
    for (f <- feeds)
      if (!df.columns.contains(f))
        throw new IllegalArgumentException(
          s"$f not found in columns ${df.columns.toSeq}")
    Inference.withInferenceColumn[FeedFetchModel](
      df, model, feeds,
      (m, cols, _) => postprocess(m.predict(feeds.zip(cols).toMap)),
      outputType, batchSize, outputCol)
  }

  /** U2: score a BinaryType column of serialized Examples (the
    * Estimator/SavedModel shape, `dataframe_prediction_helper.py:153-186`):
    * the model consumes raw serialized records under `feedTensorKey`.
    */
  def withSerializedRecordInference(
      df: DataFrame,
      model: ArtifactHandle[FeedFetchModel],
      recordsCol: String,
      outputCol: String = "prediction",
      feedTensorKey: String = "inputs",
      postprocess: Map[String, IndexedSeq[Any]] => Seq[Any] = positiveClassOfFetch(),
      outputType: DataType = FloatType,
      batchSize: Int = 1024): DataFrame =
    Inference.withInferenceColumn[FeedFetchModel](
      df, model, Seq(recordsCol),
      (m, cols, _) => postprocess(m.predict(Map(feedTensorKey -> cols.head))),
      outputType, batchSize, outputCol)

  /** U8: local dict-rows predictor (reference `predict_with_tfr`,
    * `dataframe_prediction_helper.py:259-282`): encode each row against
    * the specs, feed the serialized records to the model, postprocess.
    */
  def predictWithRecords(
      specs: FeatureSpec.Specs,
      model: FeedFetchModel,
      feedTensorKey: String = "inputs",
      postprocess: Map[String, IndexedSeq[Any]] => Seq[Any] = positiveClassOfFetch()):
      Seq[Map[String, Any]] => Seq[Any] =
    rows => {
      val serialized = rows.map(TfRecords.toExample(_, specs)).toIndexedSeq
      postprocess(model.predict(Map(feedTensorKey -> serialized)))
    }
}
