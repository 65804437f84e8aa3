package graft.inference

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Port of `tests/common/test_spark_inference_common.py:14-79`: allocation
  * truth table, dead-pid pruning, first-allocation bootstrap, per-process
  * memoization. Pure JVM — no Spark session needed.
  */
class GpuAllocatorSpec extends AnyFunSuite with Matchers {

  private def tmpDir(): Path = Files.createTempDirectory("gpu-alloc")

  // reference parametrized cases (`test_get_cuda_device_with_existing_allocations`)
  private val cases = Seq(
    (Map(0 -> Set(2L)), 1L, 1),
    (Map(1 -> Set(2L)), 2L, 1),
    (Map(0 -> Set(2L), 2 -> Set(1L)), 3L, 1),
    (Map(0 -> Set(2L), 1 -> Set(3L), 2 -> Set(1L)), 4L, 0),
    (Map(0 -> Set(1L, 2L), 1 -> Set(3L), 2 -> Set(4L, 5L)), 6L, 1))

  for (((allocMap, pid, expected), i) <- cases.zipWithIndex)
    test(s"allocate with existing allocations, case $i -> device $expected") {
      val allPids = allocMap.values.flatten.toSet
      val (device, _) = GpuAllocator.allocate(3, allocMap, allPids, pid)
      device shouldBe expected
    }

  test("allocate reuses allocation of a previous pid after pruning dead pids") {
    // reference `test_get_cuda_device_reuse_allocation_of_previous_pid`:
    // pid 2 on device 1 is dead -> device 1 is least loaded for pid 4
    val (device, updated) = GpuAllocator.allocate(
      3, Map(0 -> Set(1L), 1 -> Set(2L), 2 -> Set(3L)), Set(1L, 3L), 4L)
    device shouldBe 1
    updated(1) shouldBe Set(4L)
  }

  test("pid already allocated keeps its device, including device 0") {
    // divergence from the reference's `if cuda_device:` falsy-zero quirk:
    // a pid on device 0 is found, not reallocated
    val (device, _) = GpuAllocator.allocate(
      2, Map(0 -> Set(7L), 1 -> Set.empty[Long]), Set(7L), 7L)
    device shouldBe 0
  }

  test("first allocation bootstraps the file with device 0") {
    // reference `test_get_cuda_device_without_allocation`
    val dir = tmpDir()
    GpuAllocator.resetCachedDevice()
    val device = GpuAllocator.getCudaDevice(
      3, dir.resolve("lock"), dir.resolve("allocation"),
      pid = 42L, livePids = () => Set(42L))
    device shouldBe 0
    GpuAllocator.parseJson(Files.readString(dir.resolve("allocation"))) shouldBe
      Map(0 -> Set(42L), 1 -> Set.empty, 2 -> Set.empty)
    GpuAllocator.resetCachedDevice()
  }

  test("device is memoized per process") {
    // reference `test_get_cuda_device_caches_cuda_device`
    val dir = tmpDir()
    GpuAllocator.resetCachedDevice()
    val first = GpuAllocator.getCudaDevice(
      1, dir.resolve("lock"), dir.resolve("allocation"),
      pid = 1L, livePids = () => Set(1L))
    // second call with a *different* file must return the cached device
    // without touching the new file
    val second = GpuAllocator.getCudaDevice(
      1, dir.resolve("lock2"), dir.resolve("allocation2"),
      pid = 1L, livePids = () => Set(1L))
    first shouldBe second
    Files.exists(dir.resolve("allocation2")) shouldBe false
    GpuAllocator.resetCachedDevice()
  }

  test("json round-trip of the allocation map") {
    val m = Map(0 -> Set(1L, 2L), 1 -> Set.empty[Long], 2 -> Set(99L))
    GpuAllocator.parseJson(GpuAllocator.renderJson(m)) shouldBe m
  }

  test("spark-aware path uses scheduler-assigned GPU and skips the file protocol") {
    val dir = tmpDir()
    GpuAllocator.resetCachedDevice()
    val device = GpuAllocator.getCudaDeviceSparkAware(
      4, dir.resolve("lock"), dir.resolve("allocation"),
      taskResources = () => Map("gpu" -> Seq("2", "3")))
    device shouldBe 2
    // pure read: no lock/allocation files created
    Files.exists(dir.resolve("allocation")) shouldBe false
    Files.exists(dir.resolve("lock")) shouldBe false
    GpuAllocator.resetCachedDevice()
  }

  test("spark-aware path rejects non-index GPU addresses instead of stealing a device") {
    val dir = tmpDir()
    GpuAllocator.resetCachedDevice()
    val ex = intercept[IllegalArgumentException] {
      GpuAllocator.getCudaDeviceSparkAware(
        4, dir.resolve("lock"), dir.resolve("allocation"),
        taskResources = () => Map("gpu" -> Seq("GPU-8f6e1a")))
    }
    ex.getMessage should include("not a numeric device index")
    // the scheduler's grant is never bypassed via the file protocol
    Files.exists(dir.resolve("allocation")) shouldBe false
    GpuAllocator.resetCachedDevice()
  }

  test("spark-aware path falls back to the file protocol without scheduled GPUs") {
    val dir = tmpDir()
    GpuAllocator.resetCachedDevice()
    val device = GpuAllocator.getCudaDeviceSparkAware(
      2, dir.resolve("lock"), dir.resolve("allocation"),
      taskResources = () => Map.empty)
    device shouldBe 0
    Files.exists(dir.resolve("allocation")) shouldBe true
    GpuAllocator.resetCachedDevice()
  }
}
