package graft.inference

import java.nio.file.{Files, Paths}
import java.util.UUID
import java.util.concurrent.{ArrayBlockingQueue, Executors, Future => JFuture, TimeUnit, TimeoutException}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{DataType, FloatType}

/** Model-scoring column operators — the reference's reason to exist
  * ("add a prediction column to a DataFrame").
  *
  * Re-expresses `ml_hadoop_experiment/pytorch/spark_inference.py:57-241`,
  * `tensorflow/dataframe_prediction_helper.py:189-256` and
  * `sklearn/spark_inference.py:10-55` Spark-first: instead of a pandas UDF
  * behind an Arrow boundary wrapped in `explode(array(udf))` to defeat
  * SPARK-17728 recomputation, scoring is a `mapPartitions` over rows.
  * That gives the compute-once contract by construction (the column is
  * materialized exactly once per row), deletes the JVM↔Python worker
  * boundary entirely, and streams with bounded memory: rows are pulled
  * through `grouped(batchSize)` so at most one batch per task is resident.
  *
  * 100 TB design notes:
  *   - model artifacts are broadcast refs loaded once per executor
  *     ([[ArtifactCache]]), never per task;
  *   - the scoring pass is map-only — no shuffle, no driver involvement;
  *   - `mapPartitions` is an analysis barrier for Catalyst, so callers
  *     should `select` the columns they need downstream *before* scoring
  *     (the reference has the same property across its UDF boundary);
  *   - batchSize bounds peak memory per task; raise it for small rows to
  *     amortize model-call overhead (the reference defaults to 1 and
  *     tells callers to raise it — we keep the same default).
  */
object Inference {

  /** Batch inference function: (artifacts, one column-vector per input
    * column in declaration order, device) => one output per row.
    * The device string is "cpu" or "cuda:N" as in the reference.
    */
  type InferenceFn[A] = (A, Seq[IndexedSeq[Any]], String) => Seq[Any]

  /** Row-level preprocessing: (artifacts, one value per input column,
    * device) => preprocessed feature tuple (reference `preprocessing_fn`).
    */
  type PreprocessFn[A] = (A, Seq[Any], String) => Seq[Any]

  /** GPU configuration for a scoring operator. `none` scores on CPU.
    * With `nGpus > 0`, each executor JVM claims a device through
    * [[GpuAllocator]] (file-lock JSON protocol) unless `fixedDevice`
    * pins one (the reference tests' mocked `get_cuda_device`).
    *
    * The lock/allocation file names are minted once at construction —
    * driver-side, like the reference's per-query uuid files
    * (`pytorch/spark_inference.py:232-234`) — so every worker JVM on a
    * machine shares one allocation map and tasks spread across GPUs;
    * a per-call name would give each JVM its own file and put everyone
    * on device 0.
    */
  final case class GpuConf(
      nGpus: Int = 0,
      fixedDevice: Option[Int] = None,
      lockFile: String = s"/tmp/lockfile_${UUID.randomUUID()}",
      allocationFile: String = s"/tmp/allocation_cuda_${UUID.randomUUID()}") extends Serializable {
    private[inference] def device(): String =
      if (nGpus <= 0) "cpu"
      else fixedDevice match {
        case Some(d) => s"cuda:$d"
        case None =>
          val d = GpuAllocator.getCudaDevice(
            nGpus, Paths.get(lockFile), Paths.get(allocationFile))
          s"cuda:$d"
      }
  }
  object GpuConf { val none: GpuConf = GpuConf() }

  /** Generic inference column (reference U1/U5: `with_inference` /
    * `with_inference_column`). Appends `outputCol` of `outputType` computed
    * by `inferenceFn` over `inputCols`, batched at `batchSize`.
    */
  def withInferenceColumn[A](
      df: DataFrame,
      artifacts: ArtifactHandle[A],
      inputCols: Seq[String],
      inferenceFn: InferenceFn[A],
      outputType: DataType,
      batchSize: Int = 1,
      outputCol: String = "prediction",
      numThreads: Int = 8,
      gpus: GpuConf = GpuConf.none): DataFrame = {
    require(inputCols.nonEmpty, "at least one input column is required")
    val schema = df.schema
    val idx = inputCols.map(schema.fieldIndex)
    val outSchema = schema.add(outputCol, outputType, nullable = true)
    df.mapPartitions { rows =>
      ThreadPinning.pinOnce(numThreads)
      val device = gpus.device()
      val a = artifacts.get
      rows.grouped(batchSize).flatMap { batch =>
        val cols: Seq[IndexedSeq[Any]] =
          idx.map(i => batch.iterator.map(_.get(i)).toIndexedSeq)
        val out = inferenceFn(a, cols, device)
        require(out.size == batch.size,
          s"inference fn returned ${out.size} results for a batch of ${batch.size} rows")
        batch.iterator.zip(out.iterator).map { case (r, p) => Row.fromSeq(r.toSeq :+ p) }
      }
    }(Encoders.row(outSchema))
  }

  /** Inference with parallel per-row preprocessing (reference U6:
    * `with_inference_column_and_preprocessing`). Preprocessing runs on a
    * bounded worker pool ahead of the scoring loop — the `mapPartitions`
    * analogue of the reference's DataLoader(num_workers, prefetch_factor=2,
    * timeout) — and each batch's scoring is retried on transient
    * RuntimeExceptions.
    *
    * Divergence from the reference, documented: its `_with_retry` compares
    * against a hardcoded `n_try > 3` so `max_retry` only bounds the loop
    * (`pytorch/spark_inference.py:176-186`); here `maxRetry` is the actual
    * number of attempts.
    */
  def withInferenceColumnAndPreprocessing[A](
      df: DataFrame,
      artifacts: ArtifactHandle[A],
      inputCols: Seq[String],
      preprocessing: PreprocessFn[A],
      inferenceFn: InferenceFn[A],
      outputType: DataType,
      batchSize: Int = 1,
      outputCol: String = "prediction",
      numThreads: Int = 8,
      numWorkersPreprocessing: Int = 8,
      preprocessingTimeout: java.time.Duration = java.time.Duration.ofSeconds(60),
      maxRetry: Int = 3,
      gpus: GpuConf = GpuConf.none): DataFrame = {
    require(inputCols.nonEmpty, "at least one input column is required")
    val schema = df.schema
    val idx = inputCols.map(schema.fieldIndex)
    val outSchema = schema.add(outputCol, outputType, nullable = true)
    df.mapPartitions { rows =>
      ThreadPinning.pinOnce(numThreads)
      val device = gpus.device()
      val a = artifacts.get
      val features = rows.map(r => idx.map(r.get).toIndexedSeq)
      val pre = parallelMap(features, numWorkersPreprocessing,
        prefetch = math.max(2 * batchSize, 2), preprocessingTimeout)(
        f => (f, preprocessing(a, f, device).toIndexedSeq))
      pre.grouped(batchSize).flatMap { batch =>
        val out = Retry.withRetry(maxRetry) {
          val width = batch.head._2.size
          val cols: Seq[IndexedSeq[Any]] =
            (0 until width).map(i => batch.map(_._2(i)).toIndexedSeq)
          inferenceFn(a, cols, device)
        }
        require(out.size == batch.size,
          s"inference fn returned ${out.size} results for a batch of ${batch.size} rows")
        batch.iterator.zip(out.iterator).map { case ((raw, _), p) =>
          Row.fromSeq(raw :+ p)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** All-columns probability scoring (reference U7, the sklearn shape:
    * `sklearn/spark_inference.py:10-55`): the model sees every column of
    * the DataFrame; `postprocessing` extracts the relevant scores.
    */
  def withPredictProbaColumn[A](
      df: DataFrame,
      model: ArtifactHandle[A],
      predictProba: (A, Seq[String], Seq[IndexedSeq[Any]]) => Seq[Array[Double]],
      outputCol: String = "prediction",
      outputType: DataType = FloatType,
      postprocessing: Seq[Array[Double]] => Seq[Any] = Extractors.positiveClassFloat,
      batchSize: Int = 1024): DataFrame = {
    require(df != null, "Missing or invalid dataframe.")
    require(model != null && predictProba != null, "Missing or invalid model.")
    val columns = df.columns.toSeq
    withInferenceColumn[A](
      df, model, columns,
      (a, cols, _) => postprocessing(predictProba(a, columns, cols)),
      outputType, batchSize, outputCol)
  }

  /** Ceil-division positional batch slicing (reference U12:
    * `split_in_batches`, `common/spark_inference.py:130-143`). Column
    * vectors in, per-batch column vectors out; the last batch is short.
    */
  def splitInBatches[T](
      columns: Seq[IndexedSeq[T]],
      batchSize: Int): Iterator[Seq[IndexedSeq[T]]] = {
    require(batchSize > 0, "batchSize must be positive")
    val nRows = if (columns.isEmpty) 0 else columns.head.size
    val nBatches = math.ceil(nRows.toDouble / batchSize).toInt
    Iterator.tabulate(nBatches) { i =>
      val start = i * batchSize
      val stop = math.min((i + 1) * batchSize, nRows)
      columns.map(_.slice(start, stop))
    }
  }

  /** Ordered parallel map with bounded prefetch: up to `prefetch` elements
    * are in flight on `workers` threads; results are yielded in input
    * order; a result not ready within `timeout` fails the task (Spark's
    * task retry then covers transient stalls, like the reference's
    * DataLoader timeout).
    */
  private[inference] def parallelMap[T, U](
      it: Iterator[T],
      workers: Int,
      prefetch: Int,
      timeout: java.time.Duration)(f: T => U): Iterator[U] = {
    if (workers <= 1) it.map(f)
    else new Iterator[U] {
      // Daemon threads + a task-completion hook: if the consumer stops
      // early (limit/take/downstream exception) the iterator is never
      // drained and hasNext's shutdown() never runs — without these the
      // pool would leak non-daemon threads in a long-lived executor JVM.
      private val pool = Executors.newFixedThreadPool(workers, (r: Runnable) => {
        val t = new Thread(r, "graft-preprocess")
        t.setDaemon(true)
        t
      })
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
      private val inFlight = new ArrayBlockingQueue[JFuture[U]](math.max(prefetch, 1))
      private def fill(): Unit =
        while (inFlight.remainingCapacity() > 0 && it.hasNext) {
          val t = it.next()
          inFlight.put(pool.submit(() => f(t)))
        }
      fill()
      def hasNext: Boolean = {
        val more = !inFlight.isEmpty
        if (!more) pool.shutdown()
        more
      }
      def next(): U = {
        val fut = inFlight.take()
        val r =
          try fut.get(timeout.toMillis, TimeUnit.MILLISECONDS)
          catch {
            case e: TimeoutException =>
              pool.shutdownNow()
              throw new RuntimeException(
                s"preprocessing timed out after ${timeout.toSeconds}s", e)
          }
        fill()
        r
      }
    }
  }
}

/** Postprocessing extractors (reference U9,
  * `tensorflow/dataframe_prediction_helper.py:38-72`): pick the
  * positive-class probability `scores[:, 1]` out of a per-class matrix.
  */
object Extractors {
  val positiveClass: Seq[Array[Double]] => Seq[Any] = _.map(_(1))
  val positiveClassFloat: Seq[Array[Double]] => Seq[Any] = _.map(s => s(1).toFloat)
  val negativeClass: Seq[Array[Double]] => Seq[Any] = _.map(_(0))
  val negativeClassFloat: Seq[Array[Double]] => Seq[Any] = _.map(s => s(0).toFloat)
}

/** Retry-on-transient-failure (reference `_with_retry`,
  * `pytorch/spark_inference.py:176-186`), with `maxRetry` actually bounding
  * the attempts (the reference's bound is hardcoded to 3 — divergence
  * documented at the call site).
  */
object Retry {
  def withRetry[T](maxRetry: Int, onError: Throwable => Unit = _ => ())(f: => T): T = {
    var attempt = 1
    while (true) {
      try return f
      catch {
        case e: RuntimeException =>
          onError(e)
          if (attempt >= maxRetry) throw e
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Once-per-executor thread-pool pinning (reference
  * `pytorch/spark_inference.py:216-219` / TF `:220-226`: "must be called
  * only once"). The engine has no tensor runtime in-process; the
  * configured width is recorded once per JVM and exposed for model
  * runtimes wired in through the `configure` hook.
  */
object ThreadPinning {
  private val pinned = new AtomicInteger(-1)
  def pinOnce(numThreads: Int, configure: Int => Unit = n =>
      System.setProperty("graft.inference.numThreads", n.toString)): Unit =
    if (pinned.compareAndSet(-1, numThreads)) configure(numThreads)
  def current: Int = pinned.get()
  def reset(): Unit = pinned.set(-1)
}
