package graft.ml

import org.apache.spark.ml.{Estimator, Model, Transformer}
import org.apache.spark.ml.param.{Param, ParamMap, Params}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}

import graft.operators.{FeatureHash, Splits, TargetEncode}
import graft.text.Confusables

/** Spark MLlib `Pipeline` interop — graft's featurization operators as
  * `org.apache.spark.ml` stages, so a team whose training workflow is
  * `Pipeline(stages = …).fit(df)` can slot them in unchanged (the
  * BASELINE north-star names "MLlib pipeline or DataFrame-based
  * feature engineering"; the library is DataFrame-native, and this
  * adapter closes the pipeline half). Each stage delegates to the
  * operator it wraps — same plans, same determinism contracts, nothing
  * reimplemented:
  *
  *   - [[HashFeaturizer]] ← [[FeatureHash.hashCross]] (Transformer);
  *   - [[TargetEncoder]] / [[TargetEncoderModel]] ←
  *     [[TargetEncode.encodingTable]] (Estimator/Model: fitting
  *     materializes the category table, transform joins it — the
  *     train/serve split the operator's own docs prescribe);
  *   - [[SkeletonNormalizer]] ← [[Confusables.skeleton]] (Transformer);
  *   - [[DeterministicSplitter]] ← [[Splits.withSplit]] (Transformer —
  *     a pure key hash, so "splitting" is a column, not a randomSplit).
  *
  * Persistence (`MLWritable`) is deliberately not implemented: the
  * model state is a category-domain-sized DataFrame whose storage
  * belongs to the caller's table format, not to MLlib's metadata
  * folder — write `model.table` like any other table and rebuild the
  * stage from it.
  */
object Stages {

  private def strParam(p: Params, name: String, doc: String) =
    new Param[String](p, name, doc)

  /** Transformer: hashed cross of `inputCols` → `outputCol` bucket in
    * `[0, dim)` ([[FeatureHash.hashCross]]'s replayable Karp-Rabin
    * contract).
    */
  class HashFeaturizer(override val uid: String) extends Transformer {
    def this() = this(Identifiable.randomUID("graftHashFeaturizer"))

    final val inputCols =
      strParam(this, "inputCols", "comma-separated input columns")
    final val outputCol = strParam(this, "outputCol", "output column")
    final val dim = new Param[Int](this, "dim", "bucket count")
    final val salt = strParam(this, "salt", "hash salt")
    setDefault(outputCol -> "hashed", dim -> (1 << 20), salt -> "")

    def setInputCols(v: Seq[String]): this.type =
      set(inputCols, v.mkString(","))
    def setOutputCol(v: String): this.type = set(outputCol, v)
    def setDim(v: Int): this.type = set(dim, v)
    def setSalt(v: String): this.type = set(salt, v)

    override def transform(ds: Dataset[_]): DataFrame =
      FeatureHash.withHashedCross(ds.toDF(),
        $(inputCols).split(",").toSeq, $(outputCol), $(dim), $(salt))

    override def transformSchema(schema: StructType): StructType =
      schema.add($(outputCol), LongType, nullable = false)

    override def copy(extra: ParamMap): HashFeaturizer = defaultCopy(extra)
  }

  /** Model: per-category smoothed means fitted by [[TargetEncoder]];
    * transform left-joins them (unseen categories get the stored
    * global prior `default`).
    */
  class TargetEncoderModel(
      override val uid: String,
      val table: DataFrame,
      val catCol: String,
      val outputCol: String,
      val default: Double) extends Model[TargetEncoderModel] {

    override def transform(ds: Dataset[_]): DataFrame = {
      val enc = table.select(col(catCol),
        col("enc").as("__enc"))
      ds.toDF().join(enc, Seq(catCol), "left_outer")
        .withColumn(outputCol, coalesce(col("__enc"), lit(default)))
        .drop("__enc")
    }

    override def transformSchema(schema: StructType): StructType =
      schema.add(outputCol, DoubleType, nullable = false)

    override def copy(extra: ParamMap): TargetEncoderModel =
      new TargetEncoderModel(uid, table, catCol, outputCol, default)
  }

  /** Estimator: fit materializes [[TargetEncode.encodingTable]] plus
    * the global-prior fallback for categories unseen at fit time.
    */
  class TargetEncoder(override val uid: String)
      extends Estimator[TargetEncoderModel] {
    def this() = this(Identifiable.randomUID("graftTargetEncoder"))

    final val catCol = strParam(this, "catCol", "categorical column")
    final val targetCol = strParam(this, "targetCol", "target column")
    final val outputCol = strParam(this, "outputCol", "output column")
    final val prior = new Param[Long](this, "prior", "smoothing weight k")
    setDefault(outputCol -> "enc", prior -> 20L)

    def setCatCol(v: String): this.type = set(catCol, v)
    def setTargetCol(v: String): this.type = set(targetCol, v)
    def setOutputCol(v: String): this.type = set(outputCol, v)
    def setPrior(v: Long): this.type = set(prior, v)

    override def fit(ds: Dataset[_]): TargetEncoderModel = {
      val df = ds.toDF()
      val table = TargetEncode.encodingTable(
        df, $(catCol), $(targetCol), $(prior))
        .localCheckpoint(true) // model state: category-sized, computed once
      // unseen-category fallback: the global mean (one tiny agg)
      val g = df.agg(
        (sum(col($(targetCol)).cast("decimal(30,2)")) /
          count(lit(1))).cast("double")).head.getDouble(0)
      new TargetEncoderModel(uid, table, $(catCol), $(outputCol), g)
    }

    override def transformSchema(schema: StructType): StructType =
      schema.add($(outputCol), DoubleType, nullable = false)

    override def copy(extra: ParamMap): TargetEncoder = defaultCopy(extra)
  }

  /** Transformer: the hashing trick all the way to an MLlib
    * `ml.linalg.Vector` — each input column hashes to a bucket
    * ([[FeatureHash.hashFeature]]) carrying its ±1 sign
    * ([[FeatureHash.hashSign]]); colliding buckets sum. The output is
    * what `LogisticRegression`/`LinearSVC` train on directly, which
    * makes the whole featurize→train path one `Pipeline` (proved in
    * StagesSpec by training an actual LR to >0.9 accuracy on hashed
    * features).
    *
    * The bucket/sign arithmetic stays codegen'd column algebra; only
    * the final `SparseVector` assembly is a UDF — the `VectorUDT`
    * boundary is MLlib's own object layer, the same place the
    * inference family already accepts black-box functions.
    */
  class HashVectorizer(override val uid: String) extends Transformer {
    def this() = this(Identifiable.randomUID("graftHashVectorizer"))

    final val inputCols =
      strParam(this, "inputCols", "comma-separated input columns")
    final val outputCol = strParam(this, "outputCol", "output column")
    final val dim = new Param[Int](this, "dim", "vector dimension")
    final val salt = strParam(this, "salt", "hash salt")
    setDefault(outputCol -> "features", dim -> (1 << 18), salt -> "")

    def setInputCols(v: Seq[String]): this.type =
      set(inputCols, v.mkString(","))
    def setOutputCol(v: String): this.type = set(outputCol, v)
    def setDim(v: Int): this.type = set(dim, v)
    def setSalt(v: String): this.type = set(salt, v)

    override def transform(ds: Dataset[_]): DataFrame = {
      val d = $(dim)
      val cols = $(inputCols).split(",").toSeq
      val pairs = array(cols.map { c =>
        struct(
          FeatureHash.hashFeature(col(c), d, $(salt)).as("i"),
          FeatureHash.hashSign(col(c), $(salt)).cast("double").as("v"))
      }: _*)
      val assemble = udf { (ps: Seq[org.apache.spark.sql.Row]) =>
        val m = scala.collection.mutable.Map.empty[Int, Double]
        ps.foreach { r =>
          val i = r.getLong(0).toInt
          m(i) = m.getOrElse(i, 0.0) + r.getDouble(1)
        }
        org.apache.spark.ml.linalg.Vectors.sparse(
          d, m.toSeq.sortBy(_._1))
      }
      ds.toDF().withColumn($(outputCol), assemble(pairs))
    }

    override def transformSchema(schema: StructType): StructType =
      schema.add($(outputCol),
        org.apache.spark.ml.linalg.SQLDataTypes.VectorType)

    override def copy(extra: ParamMap): HashVectorizer = defaultCopy(extra)
  }

  /** Transformer: confusable skeleton of `inputCol` → `outputCol`. */
  class SkeletonNormalizer(override val uid: String) extends Transformer {
    def this() = this(Identifiable.randomUID("graftSkeleton"))

    final val inputCol = strParam(this, "inputCol", "text column")
    final val outputCol = strParam(this, "outputCol", "output column")
    setDefault(outputCol -> "skeleton")

    def setInputCol(v: String): this.type = set(inputCol, v)
    def setOutputCol(v: String): this.type = set(outputCol, v)

    override def transform(ds: Dataset[_]): DataFrame =
      ds.toDF().withColumn($(outputCol),
        Confusables.skeleton(col($(inputCol))))

    override def transformSchema(schema: StructType): StructType =
      schema.add($(outputCol), StringType)

    override def copy(extra: ParamMap): SkeletonNormalizer =
      defaultCopy(extra)
  }

  /** Transformer: deterministic split column from the row's key —
    * reproducible across runs/layouts, unlike `randomSplit`.
    */
  class DeterministicSplitter(override val uid: String) extends Transformer {
    def this() = this(Identifiable.randomUID("graftSplitter"))

    final val keyCol = strParam(this, "keyCol", "unique key column")
    final val salt = strParam(this, "salt", "assignment salt")
    final val outputCol = strParam(this, "outputCol", "split column")
    final val weights = strParam(this, "weights",
      "name:weight pairs, comma-separated (weights sum to 1)")
    setDefault(outputCol -> "split", salt -> "",
      weights -> "train:0.98,valid:0.01,test:0.01")

    def setKeyCol(v: String): this.type = set(keyCol, v)
    def setSalt(v: String): this.type = set(salt, v)
    def setOutputCol(v: String): this.type = set(outputCol, v)
    def setWeights(v: Seq[(String, Double)]): this.type =
      set(weights, v.map { case (n, w) => s"$n:$w" }.mkString(","))

    override def transform(ds: Dataset[_]): DataFrame = {
      val parsed = $(weights).split(",").toSeq.map { s =>
        val Array(n, w) = s.split(":"); n -> w.toDouble
      }
      Splits.withSplit(ds.toDF(), $(keyCol), parsed, $(salt),
        outCol = $(outputCol))
    }

    override def transformSchema(schema: StructType): StructType =
      schema.add($(outputCol), StringType, nullable = false)

    override def copy(extra: ParamMap): DeterministicSplitter =
      defaultCopy(extra)
  }
}
