package graft.records

import java.io.{FileInputStream, FileOutputStream}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.types._
import graft.types.FeatureDType._

/** Port of the reference's golden protobuf vectors and round-trip tests
  * (`tests/tensorflow/protobuf_examples.py:9-146`,
  * `tests/tensorflow/test_tfrecords.py:16-53`): the five null/default
  * scenarios, strict shape validation, and encode→file→parse fidelity.
  */
class ExampleCodecSpec extends AnyFunSuite with Matchers {

  private val specs: FeatureSpec.Specs = Map(
    "feature1" -> FixedLenFeature(Seq(1), Float32),
    "feature2" -> FixedLenFeature(Seq(1), Int64),
    "feature3" -> FixedLenFeature(Seq(1), TfString),
    "feature4" -> FixedLenFeature(Seq(2), Int64),
    "feature5" -> VarLenFeature(Int64))

  private val specsWithDefaults: FeatureSpec.Specs = Map(
    "feature1" -> FixedLenFeature(Seq(1), Float32, Some(1.0f)),
    "feature2" -> FixedLenFeature(Seq(1), Int64, Some(1L)),
    "feature3" -> FixedLenFeature(Seq(1), TfString, Some("a")),
    "feature4" -> FixedLenFeature(Seq(2), Int64, Some(Seq(1L, 1L))),
    "feature5" -> VarLenFeature(Int64))

  // golden: list-valued samples (`feature_mappings`)
  test("to_tf_proto golden: list values") {
    val sample = Map[String, Any](
      "feature1" -> Seq(0.01), "feature2" -> Seq(1), "feature3" -> Seq("value"),
      "feature4" -> Seq(0, 1), "feature5" -> Seq(1, 1, 2))
    TfRecords.toFeatures(sample, specs) shouldBe Map(
      "feature1" -> Feature.FloatList(Seq(0.01f)),
      "feature2" -> Feature.Int64List(Seq(1L)),
      "feature3" -> Feature.bytes(Seq("value")),
      "feature4" -> Feature.Int64List(Seq(0L, 1L)),
      "feature5" -> Feature.Int64List(Seq(1L, 1L, 2L)))
  }

  // golden: scalar samples promoted to singleton lists (`feature_mappings_without_lists`)
  test("to_tf_proto golden: scalar values auto-promoted") {
    val sample = Map[String, Any](
      "feature1" -> 0.01, "feature2" -> 1, "feature3" -> "value",
      "feature4" -> Seq(0, 1), "feature5" -> Seq(0, 1))
    TfRecords.toFeatures(sample, specs) shouldBe Map(
      "feature1" -> Feature.FloatList(Seq(0.01f)),
      "feature2" -> Feature.Int64List(Seq(1L)),
      "feature3" -> Feature.bytes(Seq("value")),
      "feature4" -> Feature.Int64List(Seq(0L, 1L)),
      "feature5" -> Feature.Int64List(Seq(0L, 1L)))
  }

  // golden: nulls without defaults become type-derived zeros; VarLen omitted
  // (`feature_mappings_null_without_defaults`)
  test("to_tf_proto golden: nulls without defaults") {
    val sample = Map[String, Any](
      "feature1" -> null, "feature2" -> null, "feature3" -> null,
      "feature4" -> null, "feature5" -> null)
    TfRecords.toFeatures(sample, specs) shouldBe Map(
      "feature1" -> Feature.FloatList(Seq(0.0f)),
      "feature2" -> Feature.Int64List(Seq(0L)),
      "feature3" -> Feature.bytes(Seq("")),
      "feature4" -> Feature.Int64List(Seq(0L, 0L)))
  }

  // golden: empty lists behave like nulls for FixedLen; VarLen stays
  // present-and-empty (`feature_mappings_empty_without_defaults`)
  test("to_tf_proto golden: empty lists without defaults") {
    val sample = Map[String, Any](
      "feature1" -> Nil, "feature2" -> Nil, "feature3" -> Nil,
      "feature4" -> Nil, "feature5" -> Nil)
    TfRecords.toFeatures(sample, specs) shouldBe Map(
      "feature1" -> Feature.FloatList(Seq(0.0f)),
      "feature2" -> Feature.Int64List(Seq(0L)),
      "feature3" -> Feature.bytes(Seq("")),
      "feature4" -> Feature.Int64List(Seq(0L, 0L)),
      "feature5" -> Feature.Int64List(Nil))
  }

  // golden: nulls with defaults are omitted entirely; the reader restores
  // them (`feature_mappings_null_with_defaults`)
  test("to_tf_proto golden: nulls with defaults are omitted, reader restores") {
    val sample = Map[String, Any](
      "feature1" -> null, "feature2" -> null, "feature3" -> null,
      "feature4" -> null, "feature5" -> null)
    TfRecords.toFeatures(sample, specsWithDefaults) shouldBe Map.empty

    val parsed = ExampleCodec.parseWithSpecs(
      TfRecords.toExample(sample, specsWithDefaults), specsWithDefaults)
    parsed("feature1") shouldBe Seq(1.0f)
    parsed("feature2") shouldBe Seq(1L)
    parsed("feature3") shouldBe Seq("a")
    parsed("feature4") shouldBe Seq(1L, 1L)
    parsed("feature5") shouldBe Seq.empty
  }

  // `feature_mappings_with_inconsistent_size`
  test("to_tf_proto rejects values inconsistent with the spec shape") {
    an[IllegalArgumentException] should be thrownBy {
      TfRecords.toExample(Map("feature4" -> Seq(1, 2, 3)), specsWithDefaults)
    }
  }

  test("to_tf_proto rejects dtype-mismatched values") {
    an[IllegalArgumentException] should be thrownBy {
      TfRecords.toExample(Map("feature2" -> Seq("not-an-int")), specs)
    }
    an[IllegalArgumentException] should be thrownBy {
      TfRecords.toExample(Map("feature3" -> Seq(12)), specs)
    }
  }

  // byte-level golden: {"a": Int64List([1])} hand-assembled from the wire format
  test("encode produces the exact protobuf wire bytes") {
    val bytes = ExampleCodec.encode(Map("a" -> Feature.Int64List(Seq(1L))))
    val expected = Array[Int](
      0x0a, 0x0c, // Example.features, len 12
      0x0a, 0x0a, // Features.feature entry, len 10
      0x0a, 0x01, 0x61, // key "a"
      0x12, 0x05, // value (Feature), len 5
      0x1a, 0x03, // Feature.int64_list, len 3
      0x0a, 0x01, 0x01 // Int64List.value packed [1]
    ).map(_.toByte)
    bytes shouldBe expected
  }

  test("encode/decode round-trip across all value kinds") {
    val features = Map(
      "floats" -> Feature.FloatList(Seq(0.01f, -3.5f, 1e10f)),
      "ints" -> Feature.Int64List(Seq(-1L, 0L, Long.MaxValue, Long.MinValue)),
      "strs" -> Feature.bytes(Seq("", "value", "ünïcödé")),
      "empty_ints" -> Feature.Int64List(Nil))
    ExampleCodec.decode(ExampleCodec.encode(features)) shouldBe features
  }

  // `test_to_tf_proto` round-trip through a TFRecord file, all five scenarios
  test("TFRecord file round-trip restores every scenario's read values") {
    val samples: Seq[(Map[String, Any], FeatureSpec.Specs, Map[String, Seq[Any]])] = Seq(
      (Map("feature1" -> Seq(0.01), "feature2" -> Seq(1), "feature3" -> Seq("value"),
        "feature4" -> Seq(0, 1), "feature5" -> Seq(1, 1, 2)),
        specs,
        Map("feature1" -> Seq(0.01f), "feature2" -> Seq(1L), "feature3" -> Seq("value"),
          "feature4" -> Seq(0L, 1L), "feature5" -> Seq(1L, 1L, 2L))),
      (Map("feature1" -> null, "feature2" -> null, "feature3" -> null,
        "feature4" -> null, "feature5" -> null),
        specs,
        Map("feature1" -> Seq(0.0f), "feature2" -> Seq(0L), "feature3" -> Seq(""),
          "feature4" -> Seq(0L, 0L), "feature5" -> Seq.empty)),
      (Map("feature1" -> null, "feature2" -> null, "feature3" -> null,
        "feature4" -> null, "feature5" -> null),
        specsWithDefaults,
        Map("feature1" -> Seq(1.0f), "feature2" -> Seq(1L), "feature3" -> Seq("a"),
          "feature4" -> Seq(1L, 1L), "feature5" -> Seq.empty)))

    for ((sample, sp, expected) <- samples) {
      val file = Files.createTempFile("golden", ".tfrecord").toFile
      val writer = new TfRecordIO.Writer(new FileOutputStream(file), gzip = true)
      writer.write(TfRecords.toExample(sample, sp))
      writer.close()
      val reader = new TfRecordIO.Reader(new FileInputStream(file), gzip = true)
      val records = reader.toSeq
      records.size shouldBe 1
      ExampleCodec.parseWithSpecs(records.head, sp) shouldBe expected
    }
  }

  test("TFRecord reader detects corruption") {
    val file = Files.createTempFile("corrupt", ".tfrecord").toFile
    val writer = new TfRecordIO.Writer(new FileOutputStream(file), gzip = false)
    writer.write(Array[Byte](1, 2, 3))
    writer.close()
    val bytes = Files.readAllBytes(file.toPath)
    bytes(13) = (bytes(13) ^ 0xff).toByte // flip a data byte
    Files.write(file.toPath, bytes)
    an[Exception] should be thrownBy {
      new TfRecordIO.Reader(new FileInputStream(file), gzip = false).toSeq
    }
  }
}
