package graft.records

import java.net.URI

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.rand
import org.apache.spark.sql.types.StructType
import org.apache.spark.storage.StorageLevel

import graft.core.Paths
import graft.types._

/** Row ↔ `tf.train.Example` conversion and TFRecord sinks/sources,
  * re-expressing `ml_hadoop_experiment/tensorflow/tfrecords.py:104-268`.
  *
  * Null/default encode semantics (pinned by
  * `tests/tensorflow/protobuf_examples.py:9-146`):
  *   - an empty list is treated as null for FixedLen specs;
  *   - null + spec default → the feature is *omitted* from the record
  *     (the same spec fills the default back at read time);
  *   - null + no default → a type-derived zero/"" filling the shape;
  *   - VarLen: null → omitted; empty list → present and empty;
  *   - FixedLen values must match the declared shape, else error.
  *
  * 100 TB notes: the export pipeline is one global shuffle
  * (`orderBy(rand)`) + one write pass, with DISK_ONLY persistence between
  * them so the shuffle isn't recomputed by the write job; per-partition
  * writers stream records (no buffering of the partition) and return
  * (path, count) manifests collected driver-side — counts are
  * vocabulary-sized metadata, not data.
  */
object TfRecords {

  // ---- row → Example (reference `to_tf_proto`, tfrecords.py:184-207) ----

  private def typeDefault(spec: FixedLenFeature): Seq[Any] = {
    val value: Any =
      if (spec.dtype.isInteger) 0L
      else if (spec.dtype.isFloating) 0.0f
      else if (spec.dtype.isString) ""
      else throw new IllegalArgumentException(s"No default value for type ${spec.dtype}")
    Seq.fill(spec.shape.headOption.getOrElse(1))(value)
  }

  private def asList(value: Any): Seq[Any] = value match {
    case s: collection.Seq[_] => s.toSeq
    case a: Array[Byte] => Seq(a)
    case a: Array[_] => a.toSeq
    case v => Seq(v)
  }

  /** Reference `_preprocess_feature_value` (tfrecords.py:135-159).
    * Returns None when the feature must be omitted from the record.
    */
  private[records] def preprocessValue(value: Any, spec: FeatureSpec): Option[Seq[Any]] = {
    val v0 = spec match {
      case f: FixedLenFeature =>
        val emptied = value match {
          case s: collection.Seq[_] if s.isEmpty => null
          case a: Array[_] if a.isEmpty && !value.isInstanceOf[Array[Byte]] => null
          case other => other
        }
        if (emptied == null) {
          if (f.defaultValue.isDefined) null // omit; reader restores default
          else typeDefault(f)
        } else emptied
      case _: VarLenFeature => value
    }
    Option(v0).map(asList)
  }

  /** Reference `_value_to_feature` (tfrecords.py:162-181): strict per-value
    * dtype validation.
    */
  private[records] def valueToFeature(values: Seq[Any], spec: FeatureSpec): Feature =
    if (spec.dtype.isInteger) {
      Feature.Int64List(values.map {
        case i: Int => i.toLong
        case l: Long => l
        case other => throw new IllegalArgumentException(
          s"$other in $values is not integer as required by $spec")
      })
    } else if (spec.dtype.isFloating) {
      Feature.FloatList(values.map {
        case f: Float => f
        case d: Double => d.toFloat
        case i: Int => i.toFloat
        case l: Long => l.toFloat
        case other => throw new IllegalArgumentException(
          s"$other in $values is not a number as required by $spec")
      })
    } else {
      Feature.BytesList(values.map {
        case s: String => s.getBytes("UTF-8")
        case b: Array[Byte] => b
        case other => throw new IllegalArgumentException(
          s"$other in $values is not str or bytes as required by $spec")
      })
    }

  /** Build the Example feature map for one record (reference `to_tf_proto`). */
  def toFeatures(x: Map[String, Any], specs: FeatureSpec.Specs): Map[String, Feature] =
    specs.flatMap { case (name, spec) =>
      preprocessValue(x.getOrElse(name, null), spec) match {
        case None => None
        case Some(values) =>
          spec match {
            case f: FixedLenFeature =>
              val expected = f.shape.headOption.getOrElse(1)
              if (values.length != expected)
                throw new IllegalArgumentException(
                  s"value $values does not correspond to expected shape in spec $spec")
            case _ =>
          }
          Some(name -> valueToFeature(values, spec))
      }
    }

  /** Serialize one record. */
  def toExample(x: Map[String, Any], specs: FeatureSpec.Specs): Array[Byte] =
    ExampleCodec.encode(toFeatures(x, specs))

  /** Serialize a Row against the specs (columns not in the schema are
    * treated as absent).
    */
  def rowToExample(row: Row, specs: FeatureSpec.Specs): Array[Byte] = {
    val schema = row.schema
    val m = specs.keys.flatMap { name =>
      if (schema != null && schema.fieldNames.contains(name))
        Some(name -> row.get(schema.fieldIndex(name)))
      else None
    }.toMap
    toExample(m, specs)
  }

  /** Spec-driven column pruning (reference P1 `filtered_columns`,
    * `dataframe_prediction_helper.py:285-286`): the DataFrame columns
    * that appear in the feature spec, in DataFrame order. Catalyst would
    * prune through the write anyway; the explicit select keeps the
    * export plan self-documenting.
    */
  def filteredColumns(df: DataFrame, specs: FeatureSpec.Specs): Seq[org.apache.spark.sql.Column] =
    df.columns.filter(specs.contains).map(df(_)).toSeq

  // ---- sinks (reference S1/S2, tfrecords.py:210-236) ----

  /** Write one partition's serialized examples to `part-NNNNN` (gzip by
    * default), returning the (path, record count) manifest entry.
    */
  def writeExamplePartition(
      records: Iterator[Array[Byte]],
      index: Int,
      exportPath: String,
      hadoopConf: org.apache.hadoop.conf.Configuration,
      gzip: Boolean = true): Seq[(String, Long)] = {
    val remotePath = f"$exportPath/part-$index%05d"
    val fs = FileSystem.get(new URI(exportPath), hadoopConf)
    val out = fs.create(new HPath(remotePath), true)
    var count = 0L
    val writer = new TfRecordIO.Writer(out, gzip)
    try records.foreach { r => writer.write(r); count += 1 }
    finally writer.close()
    Seq((remotePath, count))
  }

  /** Distributed sink: every partition writes its own part file; the
    * driver collects the (path, count) manifest (reference
    * `write_example_rdd`). `requireHdfs` keeps the reference's
    * full-HDFS-path guard for production writes; disable it for local
    * filesystems.
    */
  def writeExamples(
      df: DataFrame,
      specs: FeatureSpec.Specs,
      exportPath: String,
      gzip: Boolean = true,
      requireHdfs: Boolean = true): Seq[(String, Long)] = {
    if (requireHdfs && !Paths.checkFullHdfsPath(exportPath))
      throw new IllegalArgumentException(s"$exportPath is not a full hdfs path")
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val specsB = specs
    df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      val serialized = rows.map(r => rowToExample(r, specsB))
      writeExamplePartition(serialized, idx, exportPath, confSer.value, gzip).iterator
    }.collect().toSeq
  }

  // ---- export pipeline (reference S3 `df_to_tf_record`, tfrecords.py:239-268) ----

  /** Project spec columns, globally shuffle rows (`orderBy(rand(seed))` —
    * training data should not be read in source order), persist DISK_ONLY
    * so the shuffle feeds the write exactly once, write gzip TFRecords,
    * and list the produced files (skipping `_SUCCESS`-style entries).
    * Optionally emits vocabulary files for `vocabColumns` first.
    */
  def dfToTfRecord(
      df: DataFrame,
      specs: FeatureSpec.Specs,
      baseDir: String,
      vocabColumns: Seq[String] = Nil,
      threshold: Int = 0,
      seed: Option[Long] = None,
      requireHdfs: Boolean = true): Seq[String] = {
    val tfRecordDir = s"$baseDir/tf_records"
    if (vocabColumns.nonEmpty)
      graft.vocab.Vocabulary.genVocabFiles(
        df, vocabColumns, s"$baseDir/col_cardinalities", threshold)

    val shuffled = df.select(filteredColumns(df, specs): _*)
      .orderBy(seed.map(rand).getOrElse(rand()))
      .persist(StorageLevel.DISK_ONLY)
    try {
      writeExamples(shuffled, specs, tfRecordDir, gzip = true, requireHdfs)
      val fs = FileSystem.get(
        new URI(tfRecordDir), df.sparkSession.sparkContext.hadoopConfiguration)
      fs.listStatus(new HPath(tfRecordDir))
        .map(_.getPath.toString)
        .filterNot(p => p.substring(p.lastIndexOf('/') + 1).startsWith("_"))
        .sorted
        .toSeq
    } finally shuffled.unpersist()
  }

  // ---- sources (reference S4/S5, tfrecords.py:52-72) ----

  /** Driver-local serialized-record iterator over a list of files. */
  def readSerialized(
      files: Seq[String],
      hadoopConf: org.apache.hadoop.conf.Configuration,
      gzip: Boolean = true): Iterator[Array[Byte]] =
    files.iterator.flatMap { f =>
      val fs = FileSystem.get(new URI(f), hadoopConf)
      new TfRecordIO.Reader(fs.open(new HPath(f)), gzip)
    }

  /** Driver-local parsed reader (reference `read_parsed_tfr`): each record
    * parsed against the spec, absent FixedLen features restored from
    * defaults.
    */
  def readParsedTfr(
      files: Seq[String],
      specs: FeatureSpec.Specs,
      hadoopConf: org.apache.hadoop.conf.Configuration,
      gzip: Boolean = true): Iterator[Map[String, Any]] =
    readSerialized(files, hadoopConf, gzip).map(ExampleCodec.parseWithSpecs(_, specs))

  /** Driver-local SequenceExample reader (reference
    * `read_parsed_sequence_tfr`, tfrecords.py:60-72): each record parsed
    * into (context values, per-key sequence of feature values).
    */
  def readParsedSequenceTfr(
      files: Seq[String],
      contextSpecs: FeatureSpec.Specs,
      sequenceSpecs: FeatureSpec.Specs,
      hadoopConf: org.apache.hadoop.conf.Configuration,
      gzip: Boolean = true): Iterator[(Map[String, Any], Map[String, Seq[Any]])] =
    readSerialized(files, hadoopConf, gzip).map { bytes =>
      val (context, lists) = ExampleCodec.decodeSequence(bytes)
      val ctx: Map[String, Any] = contextSpecs.map { case (name, spec) =>
        val value: Any = context.get(name) match {
          case Some(f) => ExampleCodec.featureValues(f, spec.dtype)
          case None => spec match {
            case FixedLenFeature(_, _, Some(d)) =>
              d match { case s: Seq[_] => s; case v => Seq(v) }
            case _: VarLenFeature => Seq.empty
            case FixedLenFeature(_, _, None) =>
              throw new IllegalArgumentException(
                s"context feature $name absent and spec has no default")
          }
        }
        name -> value
      }
      val seqs = sequenceSpecs.map { case (name, spec) =>
        name -> lists.getOrElse(name, Nil)
          .map(f => ExampleCodec.featureValues(f, spec.dtype): Any)
      }
      (ctx, seqs)
    }

  /** Serialize one (context, featureLists) record against specs. */
  def toSequenceExample(
      context: Map[String, Any],
      featureLists: Map[String, Seq[Any]],
      contextSpecs: FeatureSpec.Specs,
      sequenceSpecs: FeatureSpec.Specs): Array[Byte] = {
    val ctx = toFeatures(context, contextSpecs)
    val lists = sequenceSpecs.flatMap { case (name, spec) =>
      featureLists.get(name).map { steps =>
        name -> steps.map(step => valueToFeature(asList(step), spec))
      }
    }
    ExampleCodec.encodeSequence(ctx, lists)
  }

  /** Distributed TFRecord source: one task per file (gzip TFRecords are not
    * splittable), schema derived from the specs
    * ([[SchemaCompat.exactStructFieldFor]]). Scalar FixedLen specs surface
    * as scalar columns, everything else as arrays.
    */
  def readExamplesDf(
      spark: SparkSession,
      path: String,
      specs: FeatureSpec.Specs,
      gzip: Boolean = true): DataFrame = {
    val names = specs.keys.toSeq.sorted
    val fields = names.map(n => SchemaCompat.exactStructFieldFor(n, specs(n)))
    val schema = StructType(fields)
    val specsB = specs
    val rows = spark.sparkContext.binaryFiles(path).flatMap { case (_, pds) =>
      val in = pds.open()
      new TfRecordIO.Reader(in, gzip).map { bytes =>
        val parsed = ExampleCodec.parseWithSpecs(bytes, specsB)
        Row.fromSeq(names.map { n =>
          val values = parsed(n).asInstanceOf[Seq[Any]]
          specsB(n) match {
            case FixedLenFeature(shape, _, _) if shape.isEmpty => values.head
            case _ => values
          }
        })
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
