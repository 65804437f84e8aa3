package graft.eval

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files

import graft.SparkSpec
import graft.records.TfRecordIO

/** Port of `tests/tensorflow/test_events.py:27-60`: events with values
  * become (step, name, value) rows; events whose summaries carry no
  * serialized simple_value (including 0.0 — proto3 default elision) are
  * dropped; events without a summary yield nothing.
  */
class EventsSpec extends SparkSpec {

  // minimal Event proto writer (inverse of Events.parseEvent)
  private def varint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write((v & 0x7f).toInt)
  }
  private def lenDelim(out: ByteArrayOutputStream, field: Int, payload: Array[Byte]): Unit = {
    varint(out, (field << 3) | 2); varint(out, payload.length.toLong); out.write(payload)
  }
  private def encodeEvent(step: Long, tag: String, value: Option[Float]): Array[Byte] = {
    val v = new ByteArrayOutputStream()
    lenDelim(v, 1, tag.getBytes("UTF-8"))
    value.foreach { f =>
      varint(v, (2 << 3) | 5)
      val bb = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putFloat(f)
      v.write(bb.array())
    }
    val summary = new ByteArrayOutputStream()
    lenDelim(summary, 1, v.toByteArray)
    val event = new ByteArrayOutputStream()
    varint(event, (2 << 3) | 0); varint(event, step)
    lenDelim(event, 5, summary.toByteArray)
    event.toByteArray
  }

  private def writeEventFile(dir: String, events: Seq[Array[Byte]]): Unit = {
    val w = new TfRecordIO.Writer(
      new FileOutputStream(s"$dir/events.out.tfevents.123.host"), gzip = false)
    events.foreach(w.write)
    w.close()
  }

  test("event file parses into the tidy metrics table") {
    val dir = Files.createTempDirectory("events").toString
    writeEventFile(dir, Seq(
      encodeEvent(42, "metric0", Some(32.4f)),
      encodeEvent(44, "metric0", Some(33.8f)),
      encodeEvent(44, "metric1", Some(23.3f)),
      encodeEvent(48, "metric0", None), // no value -> dropped
      encodeEvent(48, "metric2", None)))
    val df = Events.getAllMetrics(spark, dir, requireHdfs = false)
    df.schema.fieldNames.toSeq shouldBe Seq("step", "name", "value")
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    rows.length shouldBe 3
    rows(0)._1 shouldBe 42L
    rows(0)._2 shouldBe "metric0"
    rows(0)._3 shouldBe 32.4 +- 1e-5
    rows(2) match { case (s, n, v) => (s, n) shouldBe ((44L, "metric1")); v shouldBe 23.3 +- 1e-5 }
  }

  test("events without a summary yield an empty table") {
    val dir = Files.createTempDirectory("events").toString
    // event with step only, no summary field
    val out = new ByteArrayOutputStream()
    varint(out, (2 << 3) | 0); varint(out, 7L)
    writeEventFile(dir, Seq(out.toByteArray))
    Events.getAllMetrics(spark, dir, requireHdfs = false).count() shouldBe 0L
  }

  test("hdfs guard and event-file discovery") {
    an[IllegalArgumentException] should be thrownBy {
      Events.metrics("/local/path", spark.sparkContext.hadoopConfiguration)
    }
    Events.isEventFile("/m/events.out.tfevents.1.h") shouldBe true
    Events.isEventFile("/m/checkpoint") shouldBe false
    val empty = Files.createTempDirectory("noevents").toString
    a[NoSuchElementException] should be thrownBy {
      Events.metrics(empty, spark.sparkContext.hadoopConfiguration,
        requireHdfs = false).toSeq
    }
  }
}
