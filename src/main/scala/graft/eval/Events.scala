package graft.eval

import java.net.URI

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Paths
import graft.records.TfRecordIO

/** TF event-log source (reference
  * `ml_hadoop_experiment/tensorflow/events.py:11-35`): find the
  * `events.out*` file under a model path, iterate its records (event
  * files are uncompressed TFRecords of `Event` protos), and emit a tidy
  * long-format metrics table (step, name, value).
  *
  * The proto surface parsed here is the public
  * tensorflow/core/util/event.proto subset:
  *   Event { double wall_time = 1; int64 step = 2; Summary summary = 5 }
  *   Summary { repeated Value value = 1 }
  *   Summary.Value { string tag = 1; float simple_value = 2 }
  * Values without a serialized simple_value are dropped — proto3 does not
  * serialize 0.0, so "no value" and 0.0 are the same wire state (the
  * reference's `if value.simple_value:` filter has identical behavior).
  */
object Events {

  final case class MetricRow(step: Long, name: String, value: Double)

  def isEventFile(filename: String): Boolean =
    filename.substring(filename.lastIndexOf('/') + 1).startsWith("events.out")

  /** Iterate (step, tag, simple_value) triples from the model dir's event
    * file. `requireHdfs` mirrors the reference's full-HDFS-path guard.
    */
  def metrics(
      modelPath: String,
      hadoopConf: org.apache.hadoop.conf.Configuration,
      requireHdfs: Boolean = true): Iterator[MetricRow] = {
    if (requireHdfs && !Paths.checkFullHdfsPath(modelPath))
      throw new IllegalArgumentException(s"$modelPath is not a full hdfs path")
    val fs = FileSystem.get(new URI(modelPath), hadoopConf)
    val eventFile = fs.listStatus(new HPath(modelPath))
      .map(_.getPath.toString)
      .find(isEventFile)
      .getOrElse(throw new NoSuchElementException(
        s"no events.out* file under $modelPath"))
    val reader = new TfRecordIO.Reader(fs.open(new HPath(eventFile)), gzip = false)
    reader.flatMap(parseEvent)
  }

  /** Tidy metrics table: `DataFrame(step LONG, name STRING, value DOUBLE)`
    * (reference `get_all_metrics`). Event files are driver-readable by
    * construction (kilobytes of scalars); the DataFrame exists so metrics
    * join/aggregate with everything else.
    */
  def getAllMetrics(
      spark: SparkSession,
      modelPath: String,
      requireHdfs: Boolean = true): DataFrame = {
    val rows = metrics(
      modelPath, spark.sparkContext.hadoopConfiguration, requireHdfs).toSeq
    import spark.implicits._
    rows.toDF("step", "name", "value")
  }

  // ---- minimal Event proto parsing ----

  private def readVarint(bytes: Array[Byte], pos0: Int): (Long, Int) = {
    var pos = pos0
    var shift = 0
    var result = 0L
    while (true) {
      val b = bytes(pos) & 0xff
      pos += 1
      result |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) return (result, pos)
      shift += 7
    }
    (result, pos)
  }

  private def skipField(bytes: Array[Byte], pos: Int, wireType: Int): Int = wireType match {
    case 0 => readVarint(bytes, pos)._2
    case 1 => pos + 8
    case 2 => val (len, p) = readVarint(bytes, pos); p + len.toInt
    case 5 => pos + 4
    case other => throw new IllegalArgumentException(s"wire type $other")
  }

  private[eval] def parseEvent(bytes: Array[Byte]): Seq[MetricRow] = {
    var pos = 0
    var step = 0L
    var summaryRange: Option[(Int, Int)] = None
    while (pos < bytes.length) {
      val (tag, p1) = readVarint(bytes, pos)
      val field = (tag >> 3).toInt
      val wire = (tag & 7).toInt
      field match {
        case 2 if wire == 0 =>
          val (v, p2) = readVarint(bytes, p1); step = v; pos = p2
        case 5 if wire == 2 =>
          val (len, p2) = readVarint(bytes, p1)
          summaryRange = Some((p2, p2 + len.toInt))
          pos = p2 + len.toInt
        case _ => pos = skipField(bytes, p1, wire)
      }
    }
    summaryRange match {
      case None => Nil
      case Some((start, end)) => parseSummary(bytes, start, end, step)
    }
  }

  private def parseSummary(bytes: Array[Byte], start: Int, end: Int, step: Long): Seq[MetricRow] = {
    val out = Seq.newBuilder[MetricRow]
    var pos = start
    while (pos < end) {
      val (tag, p1) = readVarint(bytes, pos)
      if ((tag >> 3).toInt == 1 && (tag & 7) == 2) {
        val (len, p2) = readVarint(bytes, p1)
        out ++= parseValue(bytes, p2, p2 + len.toInt, step)
        pos = p2 + len.toInt
      } else pos = skipField(bytes, p1, (tag & 7).toInt)
    }
    out.result()
  }

  private def parseValue(bytes: Array[Byte], start: Int, end: Int, step: Long): Option[MetricRow] = {
    var pos = start
    var tagName: Option[String] = None
    var simpleValue: Option[Float] = None
    while (pos < end) {
      val (tag, p1) = readVarint(bytes, pos)
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) =>
          val (len, p2) = readVarint(bytes, p1)
          tagName = Some(new String(bytes, p2, len.toInt, "UTF-8"))
          pos = p2 + len.toInt
        case (2, 5) =>
          simpleValue = Some(java.nio.ByteBuffer.wrap(bytes, p1, 4)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getFloat)
          pos = p1 + 4
        case (_, w) => pos = skipField(bytes, p1, w)
      }
    }
    for (n <- tagName; v <- simpleValue) yield MetricRow(step, n, v.toDouble)
  }
}
