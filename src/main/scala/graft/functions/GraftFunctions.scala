package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

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

  private val functions: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("simhash64", classOf[SimHash64], exprs => SimHash64(exprs.head)),
    ("jaccard_distinct", classOf[JaccardDistinct],
      exprs => JaccardDistinct(exprs(0), exprs(1))),
    ("cosine_fold", classOf[CosineFold], exprs => CosineFold(exprs(0), exprs(1))))

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
