package graft.inference

import java.io.FileOutputStream
import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.records.{ExampleCodec, Feature, TfRecordIO, TfRecords}
import graft.types._
import graft.types.FeatureDType._

/** Toy feed/fetch models — top-level so they serialize without capturing
  * the spec class.
  */
object TfShapedSpecModels {

  /** score = feature1 + 2*feature2, under fetch "score" (graph shape). */
  final case class AddModel() extends TfShaped.FeedFetchModel {
    val feeds = Seq("feature1", "feature2")
    val fetches = Seq("score")
    protected def run(inputs: Map[String, IndexedSeq[Any]]): Map[String, IndexedSeq[Any]] = {
      val f1 = inputs("feature1").map(_.asInstanceOf[Double])
      val f2 = inputs("feature2").map(_.asInstanceOf[Double])
      Map("score" -> f1.zip(f2).map { case (a, b) => Seq(a + 2 * b) })
    }
  }

  /** Decodes serialized Examples, emits a 2-class proba matrix under
    * "scores" (Estimator shape).
    */
  final case class RecordModel(specs: FeatureSpec.Specs) extends TfShaped.FeedFetchModel {
    val feeds = Seq("inputs")
    val fetches = Seq("scores")
    protected def run(inputs: Map[String, IndexedSeq[Any]]): Map[String, IndexedSeq[Any]] = {
      val scores = inputs("inputs").map { bytes =>
        val parsed = ExampleCodec.parseWithSpecs(bytes.asInstanceOf[Array[Byte]], specs)
        val x = parsed("x").asInstanceOf[Seq[Any]].head.asInstanceOf[Long].toDouble
        val p1 = 1.0 / (1.0 + math.exp(-x / 10.0))
        Seq(1.0 - p1, p1)
      }
      Map("scores" -> scores)
    }
  }
}

/** TF-shaped scoring wrappers (U2/U3/U4/U8) over the pure-Scala
  * FeedFetchModel surface, plus the SequenceExample codec (S5).
  */
class TfShapedSpec extends SparkSpec {
  import sqlImplicits._
  import TfShapedSpecModels._

  test("graph inference validates feeds and scores through the fetch map") {
    val df = Seq((1.0, 10.0), (2.0, 20.0)).toDF("feature1", "feature2")
    val model = Artifacts.broadcast(spark, AddModel(): TfShaped.FeedFetchModel)
    val out = TfShaped.withGraphInferenceColumn(
      df, model, Seq("feature1", "feature2"), outputType = DoubleType)
    out.select("prediction").collect().map(_.getDouble(0)).toSeq shouldBe
      Seq(21.0, 42.0)
  }

  test("graph inference rejects feeds without a matching column") {
    val df = Seq((1.0, 2.0)).toDF("feature1", "other")
    val model = Artifacts.broadcast(spark, AddModel(): TfShaped.FeedFetchModel)
    val e = intercept[IllegalArgumentException] {
      TfShaped.withGraphInferenceColumn(df, model, Seq("feature1", "feature2"))
    }
    e.getMessage should include("feature2 not found in columns")
  }

  test("FeedFetchModel.predict rejects missing feed keys") {
    val e = intercept[NoSuchElementException] {
      AddModel().predict(Map("feature1" -> IndexedSeq(1.0)))
    }
    e.getMessage should include("feature2")
  }

  test("serialized-record scoring with positive-class extraction") {
    val specs: FeatureSpec.Specs = Map("x" -> FixedLenFeature(Seq(1), Int64))
    val records = Seq(5L, -5L, 0L).map(x =>
      TfRecords.toExample(Map("x" -> Seq(x)), specs))
    val df = records.map(Tuple1(_)).toDF("record")
    val model = Artifacts.broadcast(
      spark, RecordModel(specs): TfShaped.FeedFetchModel)
    val out = TfShaped.withSerializedRecordInference(
      df, model, "record", outputType = DoubleType)
    val got = out.select("prediction").collect().map(_.getDouble(0)).toSeq
    got(0) shouldBe 1.0 / (1.0 + math.exp(-0.5)) +- 1e-12
    got(2) shouldBe 0.5 +- 1e-12
  }

  test("local dict-rows predictor (predict_with_tfr shape)") {
    val specs: FeatureSpec.Specs = Map("x" -> FixedLenFeature(Seq(1), Int64))
    val predict = TfShaped.predictWithRecords(specs, RecordModel(specs))
    val got = predict(Seq(Map("x" -> Seq(10L)), Map("x" -> Seq(-10L))))
      .map(_.asInstanceOf[Double])
    got(0) shouldBe 1.0 / (1.0 + math.exp(-1.0)) +- 1e-12
    got(1) shouldBe 1.0 / (1.0 + math.exp(1.0)) +- 1e-12
  }

  // --- SequenceExample (S5) ---

  test("SequenceExample round-trip through a TFRecord file") {
    val contextSpecs: FeatureSpec.Specs = Map(
      "id" -> FixedLenFeature(Seq(1), Int64),
      "title" -> FixedLenFeature(Seq(1), TfString))
    val sequenceSpecs: FeatureSpec.Specs = Map(
      "steps" -> VarLenFeature(Int64),
      "names" -> VarLenFeature(TfString))

    val bytes = TfRecords.toSequenceExample(
      Map("id" -> Seq(7L), "title" -> Seq("doc")),
      Map(
        "steps" -> Seq(Seq(1L, 2L), Seq(3L)),
        "names" -> Seq(Seq("a"), Seq("b", "c"))),
      contextSpecs, sequenceSpecs)

    val file = Files.createTempFile("seq", ".tfrecord").toFile
    val w = new TfRecordIO.Writer(new FileOutputStream(file), gzip = true)
    w.write(bytes)
    w.close()

    val parsed = TfRecords.readParsedSequenceTfr(
      Seq(file.getAbsolutePath), contextSpecs, sequenceSpecs,
      spark.sparkContext.hadoopConfiguration).toSeq
    parsed.size shouldBe 1
    val (ctx, seqs) = parsed.head
    ctx("id") shouldBe Seq(7L)
    ctx("title") shouldBe Seq("doc")
    seqs("steps") shouldBe Seq(Seq(1L, 2L), Seq(3L))
    seqs("names") shouldBe Seq(Seq("a"), Seq("b", "c"))
  }

  test("SequenceExample codec round-trips feature maps directly") {
    val context = Map("c" -> (Feature.Int64List(Seq(1L, 2L)): Feature))
    val lists = Map("s" -> Seq[Feature](
      Feature.FloatList(Seq(0.5f)), Feature.bytes(Seq("x", "y"))))
    val (gotCtx, gotLists) = ExampleCodec.decodeSequence(
      ExampleCodec.encodeSequence(context, lists))
    gotCtx shouldBe context
    gotLists shouldBe lists
  }
}
