package graft.eval

/** Evaluator sizing arithmetic, a direct port of
  * `ml_hadoop_experiment/tensorflow/evaluator_conf_helper.py:12-44`;
  * golden pairs in `tests/tensorflow/test_evaluator_conf_helper.py:16-19`.
  */
final case class EvalParams(
    throttleSecs: Int,
    saveCheckpointsSteps: Int,
    evaluationBatchSize: Int,
    steps: Int)

object EvalConfig {

  /** Size the evaluation batch so evaluators keep pace with workers:
    * `eval_batch = (checkpoint_steps / nb_workers) * nb_evaluators`,
    * capped at `maxEvalBatchSize` by splitting into steps.
    */
  def getEvalParams(
      nbWorkers: Int,
      nbEvaluators: Int,
      nbExamplesBeforeEval: Int,
      maxEvalBatchSize: Int = 100000): EvalParams = {
    for ((name, v) <- Seq(
        "nb_examples_before_eval" -> nbExamplesBeforeEval,
        "nb_workers" -> nbWorkers,
        "nb_evaluators" -> nbEvaluators,
        "max_eval_batch_size" -> maxEvalBatchSize))
      require(v > 0, s"$name can't be <= 0. Got $v")

    val saveCheckpointsSteps = nbExamplesBeforeEval
    var evaluationBatchSize = saveCheckpointsSteps.toDouble / nbWorkers * nbEvaluators
    var steps = 1
    if (evaluationBatchSize > maxEvalBatchSize) {
      steps = math.ceil(evaluationBatchSize / maxEvalBatchSize).toInt
      evaluationBatchSize = evaluationBatchSize / steps
    }
    EvalParams(
      throttleSecs = 5,
      saveCheckpointsSteps = saveCheckpointsSteps,
      evaluationBatchSize = evaluationBatchSize.toInt,
      steps = steps)
  }
}
