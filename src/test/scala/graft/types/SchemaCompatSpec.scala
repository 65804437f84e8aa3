package graft.types

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import FeatureDType._

/** Verbatim port of the reference's 22-case datatype truth table and
  * 5-case structfield table
  * (`tests/tensorflow/test_dataframe_to_tf_helper.py:11-114`).
  */
class SchemaCompatSpec extends AnyFunSuite with Matchers {

  private def arr(t: DataType) = ArrayType(t, containsNull = false)

  private val datatypeCases: Seq[(DataType, FeatureSpec, Boolean)] = Seq(
    // integer -> integer scalar conversions
    (LongType, FixedLenFeature(Nil, Int64), true),
    (LongType, FixedLenFeature(Nil, Int32), false),
    (IntegerType, FixedLenFeature(Nil, Int64), true),
    (IntegerType, FixedLenFeature(Nil, Int32), true),
    // floating point -> floating point scalar conversions
    (DoubleType, FixedLenFeature(Nil, Float32), false),
    (FloatType, FixedLenFeature(Nil, Float32), true),
    (DoubleType, FixedLenFeature(Nil, Float64), true),
    (FloatType, FixedLenFeature(Nil, Float64), true),
    // scalar column -> tensor conversions
    (LongType, FixedLenFeature(Seq(1), Int64), false),
    (LongType, FixedLenFeature(Seq(2), Int64), false),
    (LongType, FixedLenFeature(Seq(2, 2), Int64), false),
    // array column -> tensor conversions
    (arr(LongType), FixedLenFeature(Seq(1), Int64), true),
    (arr(LongType), FixedLenFeature(Seq(2), Int64), true),
    (arr(IntegerType), FixedLenFeature(Seq(2), Int64), true),
    (arr(IntegerType), FixedLenFeature(Seq(2, 2), Int64), true),
    (arr(arr(LongType)), FixedLenFeature(Seq(2), Int64), false),
    (arr(arr(LongType)), FixedLenFeature(Seq(2, 2), Int64), true),
    // conversion to VarLenFeature
    (IntegerType, VarLenFeature(Int64), true),
    (arr(IntegerType), VarLenFeature(Int64), true))

  for (((dt, spec, expected), i) <- datatypeCases.zipWithIndex)
    test(s"datatype compatibility case $i: $dt vs $spec -> $expected") {
      SchemaCompat.isDataTypeCompatible(spec, dt) shouldBe expected
    }

  private val structfieldCases: Seq[(StructField, String, FeatureSpec, Boolean)] = Seq(
    // different name
    (StructField("tata", LongType), "toto", FixedLenFeature(Nil, Int64), false),
    // incompatible data type
    (StructField("toto", LongType), "toto", FixedLenFeature(Nil, Int32), false),
    // incompatible nullability
    (StructField("toto", LongType, nullable = true), "toto", FixedLenFeature(Nil, Int64), false),
    // OK
    (StructField("toto", LongType, nullable = false), "toto", FixedLenFeature(Nil, Int64), true),
    (StructField("toto", LongType, nullable = true), "toto",
      FixedLenFeature(Nil, Int64, Some(1L)), true))

  for (((field, name, spec, expected), i) <- structfieldCases.zipWithIndex)
    test(s"structfield compatibility case $i -> $expected") {
      SchemaCompat.isStructFieldCompatible(field, name, spec) shouldBe expected
    }

  test("exact datatype builds one array level per shape dim") {
    SchemaCompat.exactDataTypeFor(FixedLenFeature(Nil, Float32)) shouldBe FloatType
    SchemaCompat.exactDataTypeFor(FixedLenFeature(Seq(3), Int64)) shouldBe arr(LongType)
    SchemaCompat.exactDataTypeFor(FixedLenFeature(Seq(2, 2), Int64)) shouldBe arr(arr(LongType))
    SchemaCompat.exactDataTypeFor(VarLenFeature(TfString)) shouldBe arr(StringType)
  }

  test("exact structfield nullability follows the default value") {
    SchemaCompat.exactStructFieldFor("f", FixedLenFeature(Nil, Int64)).nullable shouldBe false
    SchemaCompat.exactStructFieldFor("f", FixedLenFeature(Nil, Int64, Some(0L))).nullable shouldBe true
  }

  test("whole-schema compatibility") {
    val schema = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", arr(IntegerType), nullable = false)))
    val good: FeatureSpec.Specs =
      Map("a" -> FixedLenFeature(Nil, Int64), "b" -> VarLenFeature(Int64))
    val missing: FeatureSpec.Specs = good + ("c" -> VarLenFeature(Int64))
    SchemaCompat.isSchemaCompatible(schema, good) shouldBe true
    SchemaCompat.isSchemaCompatible(schema, missing) shouldBe false
  }
}
