package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** SQL registration for the engine's native expressions, via both
  * mechanisms Spark offers:
  *
  *   - builder-time: `SparkSession.builder().withExtensions(new
  *     GraftExtensions)` (or config
  *     `spark.sql.extensions=graft.functions.GraftExtensions`);
  *   - live session: `GraftFunctions.register(spark)`.
  *
  * After either, `SELECT simhash64(hashes) FROM ...` works in SQL.
  */
object GraftFunctions {

  /** Parameter expressions of the literal-configured natives (window
    * sizes, hash counts) must be integer literals — they become Scala
    * constructor arguments, not runtime columns.
    */
  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def longLit(e: Expression, fn: String, arg: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private val functions: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("simhash64", classOf[SimHash64], exprs => SimHash64(exprs.head)),
    ("jaccard_distinct", classOf[JaccardDistinct],
      exprs => JaccardDistinct(exprs(0), exprs(1))),
    ("cosine_fold", classOf[CosineFold], exprs => CosineFold(exprs(0), exprs(1))),
    ("kr_hash", classOf[KrHash], exprs => KrHash(exprs.head)),
    ("nfc_normalize", classOf[NfcNormalize], exprs => NfcNormalize(exprs.head)),
    ("ilog2_q20", classOf[ILog2Q20], exprs => ILog2Q20(exprs.head)),
    ("minhash_fold", classOf[MinHashFold], exprs => MinHashFold(exprs(0),
      intLit(exprs(1), "minhash_fold", "numHashes"),
      longLit(exprs(2), "minhash_fold", "seed"))),
    ("ngram_repetition", classOf[NgramRepetition], exprs => NgramRepetition(
      exprs(0), intLit(exprs(1), "ngram_repetition", "n"))),
    ("winnowing_fingerprints", classOf[WinnowingFingerprints],
      exprs => WinnowingFingerprints(exprs(0),
        intLit(exprs(1), "winnowing_fingerprints", "k"),
        intLit(exprs(2), "winnowing_fingerprints", "window"))),
    ("winnowing_fingerprint_keys", classOf[WinnowingFingerprintKeys],
      exprs => WinnowingFingerprintKeys(exprs(0),
        intLit(exprs(1), "winnowing_fingerprint_keys", "k"),
        intLit(exprs(2), "winnowing_fingerprint_keys", "window"))),
    ("multi_pattern_count", classOf[MultiPatternCount],
      exprs => MultiPatternCount(exprs(0),
        exprs.drop(1).map(e =>
          stringLit(e, "multi_pattern_count", "pattern")).toIndexedSeq)))

  private def stringLit(e: Expression, fn: String, arg: String): String =
    e match {
      case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a string literal, got $other")
    }

  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }

  private[functions] def injections: Seq[
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    functions.map { case (name, cls, builder) =>
      (FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), builder)
    }
}

/** `spark.sql.extensions`-compatible injector: native SQL functions plus
  * the as-of-join planner strategy, so
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` is the
  * complete deployment switch (live sessions can still use
  * `GraftFunctions.register` + `AsOfJoinPlan.register`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    GraftFunctions.injections.foreach(extensions.injectFunction)
    extensions.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    extensions.injectOptimizerRule(_ => graft.plans.Top1WindowToAggregate)
  }
}
