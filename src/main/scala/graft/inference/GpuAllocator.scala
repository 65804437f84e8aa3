package graft.inference

import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, StandardOpenOption}
import java.util.concurrent.atomic.AtomicReference

/** Task→GPU dispatch via an exclusive file lock and a JSON allocation map,
  * re-expressing `ml_hadoop_experiment/common/spark_inference.py:56-127`.
  *
  * Protocol: the allocation file holds `{"<gpu>": [pid, ...], ...}`. Under
  * the lock, dead pids are pruned (liveness via `ProcessHandle`, the JVM
  * analogue of the reference's psutil intersection), and the calling pid
  * either reuses its existing allocation or takes the least-loaded GPU.
  * The result is memoized per JVM because executors are reused (the
  * reference memoizes in the `CUDA_DEVICE` env var).
  *
  * Documented divergence from the reference: `_allocate_cuda_device` tests
  * `if cuda_device:` which is falsy for device 0, so a pid already on GPU 0
  * is never "found" and gets reallocated (`common/spark_inference.py:82`).
  * We return the existing allocation for every device including 0.
  *
  * On a real cluster prefer Spark's native scheduler-level GPU resources
  * (`TaskContext.resources()("gpu")`); this operator-level allocator covers
  * deployments where executors share unmanaged GPUs.
  */
object GpuAllocator {

  private val cached = new AtomicReference[Option[Int]](None)

  /** Pure allocation step (reference `_allocate_cuda_device`).
    *
    * @return (device, pruned allocation map including the caller's pid)
    */
  def allocate(
      nGpus: Int,
      allocationMap: Map[Int, Set[Long]],
      allPids: Set[Long],
      pid: Long): (Int, Map[Int, Set[Long]]) = {
    val pruned: Map[Int, Set[Long]] =
      (0 until nGpus).map { cuda =>
        cuda -> allocationMap.getOrElse(cuda, Set.empty).intersect(allPids)
      }.toMap
    val existing = (0 until nGpus).find(c => allocationMap.getOrElse(c, Set.empty).contains(pid))
    existing match {
      case Some(cuda) => (cuda, pruned)
      case None =>
        // least-loaded wins, ties by device index (the reference's stable
        // sort over a dict built in range order)
        val cuda = (0 until nGpus).minBy(c => (pruned(c).size, c))
        (cuda, pruned.updated(cuda, pruned(cuda) + pid))
    }
  }

  /** Allocate (or reuse) a GPU for this process. Memoized per JVM. */
  def getCudaDevice(
      nGpus: Int,
      lockFile: Path,
      allocationFile: Path,
      pid: Long = ProcessHandle.current.pid,
      livePids: () => Set[Long] = defaultLivePids): Int =
    cached.get() match {
      case Some(d) => d
      case None =>
        // FileChannel.lock throws OverlappingFileLockException (rather than
        // blocking) for same-JVM contention, so two executor task threads
        // racing here before memoization would fail spuriously. Serialize
        // JVM-local callers first; the file lock then only arbitrates
        // across worker JVMs.
        jvmLock.synchronized {
          cached.get() match {
            case Some(d) => d
            case None =>
              val d = withFileLock(lockFile) {
                allocateInFile(nGpus, allocationFile, pid, livePids)
              }
              cached.set(Some(d))
              d
          }
        }
    }

  private val jvmLock = new Object

  /** Cluster-aware entry point: prefer the GPU Spark's scheduler already
    * assigned to this task (`TaskContext.resources()("gpu")`, populated
    * when the cluster runs with `spark.{executor,task}.resource.gpu.*`),
    * and fall back to the file-lock protocol only on deployments where
    * executors share unmanaged GPUs. Scheduler-assigned addresses need no
    * lock, no allocation file, and no pid pruning — the scheduler already
    * guarantees exclusivity — so this path is a pure read.
    *
    * `taskResources` is injectable for tests; the default reads the live
    * TaskContext (empty map on the driver or outside a task).
    */
  def getCudaDeviceSparkAware(
      nGpus: Int,
      lockFile: Path,
      allocationFile: Path,
      taskResources: () => Map[String, Seq[String]] = currentTaskResources): Int =
    taskResources().get("gpu").flatMap(_.headOption) match {
      case Some(addr) =>
        // The scheduler granted a SPECIFIC device — honoring the grant
        // is the whole point, so a UUID/MIG-style address we cannot map
        // to a CUDA index must fail loudly rather than silently running
        // the file protocol and landing on a device owned by another
        // application.
        addr.toIntOption.getOrElse(throw new IllegalArgumentException(
          s"scheduler-assigned GPU address '$addr' is not a numeric device index; " +
            "emit indices from the GPU discovery script, or use getCudaDevice " +
            "directly for unmanaged deployments"))
      case None => getCudaDevice(nGpus, lockFile, allocationFile)
    }

  private def currentTaskResources(): Map[String, Seq[String]] =
    Option(org.apache.spark.TaskContext.get())
      .map(_.resources().map { case (k, v) => k -> v.addresses.toSeq })
      .getOrElse(Map.empty)

  /** Test hook mirroring the reference tests' env-var cleanup. */
  def resetCachedDevice(): Unit = cached.set(None)

  private[inference] def allocateInFile(
      nGpus: Int,
      allocationFile: Path,
      pid: Long,
      livePids: () => Set[Long]): Int =
    if (!Files.exists(allocationFile)) {
      val initial = (0 until nGpus).map(c => c -> (if (c == 0) Set(pid) else Set.empty[Long])).toMap
      Files.writeString(allocationFile, renderJson(initial))
      0
    } else {
      val current = parseJson(Files.readString(allocationFile))
      val (device, updated) = allocate(nGpus, current, livePids(), pid)
      Files.writeString(allocationFile, renderJson(updated))
      device
    }

  private def withFileLock[T](lockFile: Path)(body: => T): T = {
    val channel = FileChannel.open(
      lockFile, StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    try {
      val lock = channel.lock()
      try body finally lock.release()
    } finally channel.close()
  }

  private def defaultLivePids(): Set[Long] = {
    import scala.jdk.StreamConverters._
    ProcessHandle.allProcesses().toScala(Iterator).map(_.pid).toSet
  }

  /** The allocation file's JSON is exactly `{"<int>": [<long>, ...], ...}`;
    * a purpose-built codec keeps the engine dependency-free.
    */
  private[inference] def renderJson(m: Map[Int, Set[Long]]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, pids) => s""""$k": [${pids.toSeq.sorted.mkString(", ")}]""" }
      .mkString("{", ", ", "}")

  private[inference] def parseJson(s: String): Map[Int, Set[Long]] = {
    val entry = """"(\d+)"\s*:\s*\[([^\]]*)\]""".r
    entry.findAllMatchIn(s).map { m =>
      val pids = m.group(2).split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSet
      m.group(1).toInt -> pids
    }.toMap
  }
}
