package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** DSv2 TFRecord format: write→read round-trip through
  * `format("tfrecord")`, commit-message manifests, codec option,
  * nullable-absent semantics, and schema validation.
  */
class TfRecordDataSourceSpec extends SparkSpec {
  import sqlImplicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("vals", ArrayType(LongType, containsNull = false), nullable = true),
    StructField("score", DoubleType, nullable = false)))

  test("write/read round-trip through format(\"tfrecord\")") {
    val dir = Files.createTempDirectory("dsv2").toString + "/out"
    val df = (1L to 50L).map(i => (i, s"n$i", Seq(i, i + 1), i * 0.5))
      .toDF("id", "name", "vals", "score")
      .repartition(3)
    df.write.format("tfrecord").mode("overwrite").save(dir)

    // manifest + success markers written by commit
    Files.exists(Paths.get(dir, "_SUCCESS")) shouldBe true
    val manifest = new String(Files.readAllBytes(Paths.get(dir, "_manifest")), "UTF-8")
    manifest.linesIterator.size shouldBe 3
    manifest.linesIterator.map(_.split("\t")(1).toLong).sum shouldBe 50L

    val back = spark.read.format("tfrecord").schema(schema).load(dir)
    back.count() shouldBe 50L
    val r = back.filter(col("id") === 7L).collect().head
    r.getString(r.fieldIndex("name")) shouldBe "n7"
    r.getSeq[Long](r.fieldIndex("vals")) shouldBe Seq(7L, 8L)
    r.getDouble(r.fieldIndex("score")) shouldBe 3.5
  }

  test("sequenceExample mode round-trips context + sequence + ragged columns") {
    val dir = Files.createTempDirectory("dsv2").toString + "/seq"
    val seqSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("title", StringType, nullable = false),
      StructField("steps", ArrayType(LongType, containsNull = false), nullable = false),
      StructField("ragged",
        ArrayType(ArrayType(StringType, containsNull = false), containsNull = false),
        nullable = false)))
    val df = (1L to 30L).map { i =>
      (i, s"t$i", Seq(i, i * 2, i * 3),
        Seq(Seq(s"a$i"), Seq(s"b$i", s"c$i"), Seq.empty[String]))
    }.toDF("id", "title", "steps", "ragged").repartition(3)
    df.write.format("tfrecord").option("recordType", "sequenceExample")
      .mode("overwrite").save(dir)

    val back = spark.read.format("tfrecord").schema(seqSchema)
      .option("recordType", "sequenceExample").load(dir)
    back.count() shouldBe 30L
    val r = back.filter(col("id") === 7L).collect().head
    r.getString(r.fieldIndex("title")) shouldBe "t7"
    r.getSeq[Long](r.fieldIndex("steps")) shouldBe Seq(7L, 14L, 21L)
    r.getSeq[collection.Seq[String]](r.fieldIndex("ragged")).map(_.toSeq) shouldBe
      Seq(Seq("a7"), Seq("b7", "c7"), Seq.empty)
  }

  test("sequenceExample read distinguishes absent lists from empty ones") {
    val dir = Files.createTempDirectory("dsv2").toString + "/seqabsent"
    // write only (id, steps); read back with an extra non-nullable list
    Seq((1L, Seq(1L, 2L)))
      .toDF("id", "steps")
      .write.format("tfrecord").option("recordType", "sequenceExample")
      .mode("overwrite").save(dir)
    val withMissing = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("steps", ArrayType(LongType, containsNull = false), nullable = false),
      StructField("missing", ArrayType(LongType, containsNull = false), nullable = false)))
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.format("tfrecord").schema(withMissing)
        .option("recordType", "sequenceExample").load(dir).collect()
    }
    ex.getMessage should include("absent")
    // nullable missing list reads as null
    val nullable = StructType(withMissing.fields.map {
      case f if f.name == "missing" => f.copy(nullable = true)
      case f => f
    })
    val r = spark.read.format("tfrecord").schema(nullable)
      .option("recordType", "sequenceExample").load(dir).collect().head
    r.isNullAt(r.fieldIndex("missing")) shouldBe true
    // an explicitly-written EMPTY list reads back empty, not null/error
    val dir2 = Files.createTempDirectory("dsv2").toString + "/seqempty"
    Seq((1L, Seq.empty[Long]))
      .toDF("id", "steps")
      .write.format("tfrecord").option("recordType", "sequenceExample")
      .mode("overwrite").save(dir2)
    val r2 = spark.read.format("tfrecord")
      .schema(StructType(withMissing.fields.filter(_.name != "missing")))
      .option("recordType", "sequenceExample").load(dir2).collect().head
    r2.getSeq[Long](r2.fieldIndex("steps")) shouldBe Seq.empty
  }

  test("sequenceExample records interop with the driver-local sequence reader") {
    // The DSv2 writer and the driver-local readParsedSequenceTfr must agree
    // on the wire format (both sides of reference tfrecords.py:60-72).
    val dir = Files.createTempDirectory("dsv2").toString + "/seqinterop"
    Seq((5L, Seq("x", "y", "z")))
      .toDF("id", "toks")
      .write.format("tfrecord").option("recordType", "sequenceExample")
      .mode("overwrite").save(dir)
    val files = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(p => p.substring(p.lastIndexOf('/') + 1).startsWith("part-"))
    val parsed = graft.records.TfRecords.readParsedSequenceTfr(
      files.toSeq,
      Map("id" -> graft.types.FixedLenFeature(Nil, graft.types.FeatureDType.Int64)),
      Map("toks" -> graft.types.VarLenFeature(graft.types.FeatureDType.TfString)),
      spark.sparkContext.hadoopConfiguration).toSeq
    parsed.size shouldBe 1
    parsed.head._1("id") shouldBe Seq(5L)
    parsed.head._2("toks") shouldBe Seq(Seq("x"), Seq("y"), Seq("z"))
  }

  test("scan reads only manifest-listed files, ignoring orphan parts") {
    val dir = Files.createTempDirectory("dsv2").toString + "/orphan"
    (1L to 20L).map(i => (i, s"n$i", Seq(i), 1.0))
      .toDF("id", "name", "vals", "score")
      .write.format("tfrecord").mode("overwrite").save(dir)
    // Simulate a speculative-attempt orphan that escaped abort cleanup: a
    // valid TFRecord part file present in the directory but absent from
    // the commit-time _manifest. It must not be ingested (would duplicate
    // rows under routine task retry at scale).
    val orphan = Paths.get(dir, "part-99999-orphan")
    val src = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(p => p.substring(p.lastIndexOf('/') + 1).startsWith("part-")).head
    Files.copy(Paths.get(src), orphan)
    spark.read.format("tfrecord").schema(schema).load(dir).count() shouldBe 20L
  }

  test("truncated record file fails the read instead of silently shortening") {
    val dir = Files.createTempDirectory("dsv2").toString + "/torn"
    (1L to 10L).map(i => (i, s"n$i", Seq(i), 1.0))
      .toDF("id", "name", "vals", "score")
      .coalesce(1)
      .write.format("tfrecord").option("codec", "none").mode("overwrite").save(dir)
    val part = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(p => p.substring(p.lastIndexOf('/') + 1).startsWith("part-")).head
    val bytes = Files.readAllBytes(Paths.get(part))
    Files.write(Paths.get(part), java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 7))
    // Drop Hadoop LocalFileSystem's checksum sidecar so the read reaches
    // the TFRecord framing layer (the torn-record path under test) instead
    // of failing at the FS checksum first.
    val partName = part.substring(part.lastIndexOf('/') + 1)
    Files.deleteIfExists(Paths.get(dir, s".$partName.crc"))
    val ex = intercept[Exception] {
      spark.read.format("tfrecord").option("codec", "none")
        .schema(schema).load(dir).count()
    }
    val messages = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" ").toLowerCase
    messages should include("truncated")
  }

  test("uncompressed codec option round-trips") {
    val dir = Files.createTempDirectory("dsv2").toString + "/raw"
    Seq((1L, "a", Seq(1L), 0.1)).toDF("id", "name", "vals", "score")
      .write.format("tfrecord").option("codec", "none").mode("overwrite").save(dir)
    val back = spark.read.format("tfrecord").option("codec", "none")
      .schema(schema).load(dir)
    back.collect().head.getLong(0) shouldBe 1L
  }

  test("absent features read as null for nullable columns") {
    val dir = Files.createTempDirectory("dsv2").toString + "/partial"
    // write with a narrower schema: no name column at all
    Seq((1L, Seq(9L), 1.0)).toDF("id", "vals", "score")
      .write.format("tfrecord").mode("overwrite").save(dir)
    val back = spark.read.format("tfrecord").schema(schema).load(dir)
    val r = back.collect().head
    r.isNullAt(r.fieldIndex("name")) shouldBe true
    r.getSeq[Long](r.fieldIndex("vals")) shouldBe Seq(9L)
  }

  test("overwrite mode truncates previous data instead of accumulating") {
    val dir = Files.createTempDirectory("dsv2").toString + "/ovw"
    val df = Seq((1L, "a", Seq(1L), 0.5)).toDF("id", "name", "vals", "score")
    df.write.format("tfrecord").mode("overwrite").save(dir)
    df.write.format("tfrecord").mode("overwrite").save(dir)
    spark.read.format("tfrecord").schema(schema).load(dir).count() shouldBe 1L
  }

  test("append mode accumulates") {
    val dir = Files.createTempDirectory("dsv2").toString + "/app"
    val df = Seq((1L, "a", Seq(1L), 0.5)).toDF("id", "name", "vals", "score")
    df.write.format("tfrecord").mode("overwrite").save(dir)
    df.write.format("tfrecord").mode("append").save(dir)
    spark.read.format("tfrecord").schema(schema).load(dir).count() shouldBe 2L
  }

  test("read without a schema is rejected") {
    an[Exception] should be thrownBy {
      spark.read.format("tfrecord").load("/tmp/nonexistent").collect()
    }
  }

  test("read plan shows one partition per file") {
    val dir = Files.createTempDirectory("dsv2").toString + "/parts"
    (1L to 20L).map(i => (i, "x", Seq(i), 0.0))
      .toDF("id", "name", "vals", "score")
      .repartition(4).write.format("tfrecord").mode("overwrite").save(dir)
    val back = spark.read.format("tfrecord").schema(schema).load(dir)
    back.rdd.getNumPartitions shouldBe 4
  }
}
