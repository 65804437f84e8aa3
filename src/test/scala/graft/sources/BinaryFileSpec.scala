package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The q202 binaryFile on-ramp: source-level glob triage and
  * bit-exact content roundtrip for opaque (multimodal) blobs.
  */
class BinaryFileSpec extends SparkSpec {

  test("pathGlobFilter excludes non-matching files at the source") {
    val dir = java.nio.file.Files.createTempDirectory("graft_binspec_")
    java.nio.file.Files.write(dir.resolve("a.bin"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(dir.resolve("b.bin"), Array[Byte](4, 5))
    java.nio.file.Files.write(dir.resolve("decoy.json"), "{}".getBytes)
    val got = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .load(dir.toString)
    got.count() shouldBe 2L
    got.select(sum(col("length"))).head().getLong(0) shouldBe 5L
  }

  test("content is the exact bytes, usable by binary expressions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_binspec2_")
    val payload = Array.tabulate[Byte](256)(i => i.toByte) // full byte range
    java.nio.file.Files.write(dir.resolve("blob.bin"), payload)
    val row = spark.read.format("binaryFile").load(dir.toString)
      .select(col("length"), col("content"), md5(col("content")).as("m"))
      .head()
    row.getLong(0) shouldBe 256L
    row.getAs[Array[Byte]](1) shouldBe payload
    val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
    row.getString(2) shouldBe md.map("%02x".format(_)).mkString
  }
}
