package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Cdc

class CdcStreamSpec extends SparkSpec {
  import sqlImplicits._

  private def state0 =
    Cdc.initState(Seq(("k1", 10L), ("k2", 20L)).toDF("k", "v"))

  test("mergeVersioned ignores stale changes whatever batch they ride in") {
    val b1 = Seq(("k1", 9L, "U", 99L)).toDF("k", "seq", "op", "v")
    val b2 = Seq(("k1", 5L, "U", 55L)).toDF("k", "seq", "op", "v") // stale
    val s1 = Cdc.mergeVersioned(state0, b1, Seq("k"), "seq", "op")
    val s2 = Cdc.mergeVersioned(s1, b2, Seq("k"), "seq", "op")
    Cdc.currentView(s2).orderBy($"k").as[(String, Long)].collect()
      .toSeq shouldBe Seq(("k1", 99L), ("k2", 20L))
  }

  test("merge is commutative over batch boundaries") {
    val a = Seq(("k2", 3L, "U", 33L)).toDF("k", "seq", "op", "v")
    val b = Seq(("k2", 7L, "D", 0L)).toDF("k", "seq", "op", "v")
    val ab = Cdc.mergeVersioned(
      Cdc.mergeVersioned(state0, a, Seq("k"), "seq", "op"),
      b, Seq("k"), "seq", "op")
    val ba = Cdc.mergeVersioned(
      Cdc.mergeVersioned(state0, b, Seq("k"), "seq", "op"),
      a, Seq("k"), "seq", "op")
    Cdc.currentView(ab).orderBy($"k").collect().toSeq shouldBe
      Cdc.currentView(ba).orderBy($"k").collect().toSeq
    // and the delete won: only k1 remains visible
    Cdc.currentView(ab).select($"k").as[String].collect().toSeq shouldBe
      Seq("k1")
  }

  test("a delete tombstones: an older update cannot resurrect the key") {
    val del = Seq(("k1", 8L, "D", 0L)).toDF("k", "seq", "op", "v")
    val stale = Seq(("k1", 4L, "U", 44L)).toDF("k", "seq", "op", "v")
    val s = Cdc.mergeVersioned(
      Cdc.mergeVersioned(state0, del, Seq("k"), "seq", "op"),
      stale, Seq("k"), "seq", "op")
    Cdc.currentView(s).filter($"k" === "k1").count() shouldBe 0L
  }

  test("replaying a batch is a no-op (foreachBatch at-least-once)") {
    val b = Seq(("k1", 9L, "U", 99L), ("k3", 11L, "I", 30L))
      .toDF("k", "seq", "op", "v")
    val once = Cdc.mergeVersioned(state0, b, Seq("k"), "seq", "op")
    val twice = Cdc.mergeVersioned(once, b, Seq("k"), "seq", "op")
    twice.orderBy($"k").collect().toSeq shouldBe
      once.orderBy($"k").collect().toSeq
  }

  test("sink maintains the snapshot across micro-batches end to end") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Long, String, Long)]
    val statePath = Files.createTempDirectory("cdc_state_").toString
    val ckpt = Files.createTempDirectory("cdc_ckpt_").toString
    val initial = Seq(("k1", 10L), ("k2", 20L)).toDF("k", "v")

    def runBatch(rows: (String, Long, String, Long)*): Unit = {
      input.addData(rows: _*)
      val q = Streaming.changelogSnapshotSink(
        input.toDF.toDF("k", "seq", "op", "v"),
        Seq("k"), "seq", "op", statePath, ckpt, Some(initial))
      q.awaitTermination()
    }

    runBatch(("k2", 2L, "U", 22L), ("k3", 3L, "I", 30L))
    runBatch(("k1", 5L, "D", 0L), ("k2", 1L, "U", 999L)) // stale k2 update

    val view = Cdc.currentView(
      spark.read.parquet(s"$statePath/state"))
    view.orderBy($"k").as[(String, Long)].collect().toSeq shouldBe Seq(
      ("k2", 22L), // seq-1 update lost to the seq-2 one already applied
      ("k3", 30L))
  }

  test("tombstone purge honors the horizon exactly") {
    val del = Seq(("k1", 8L, "D", 0L), ("k2", 25L, "D", 0L))
      .toDF("k", "seq", "op", "v")
    val s = Cdc.mergeVersioned(state0, del, Seq("k"), "seq", "op")
    // horizon 10: k1's tombstone (seq 8) is purgeable, k2's (25) is not
    val purged = Cdc.purgeTombstones(s, horizonSeq = 10L)
    purged.filter($"k" === "k1").count() shouldBe 0L
    purged.filter($"k" === "k2").count() shouldBe 1L
    // and the surviving tombstone still blocks a stale resurrection
    val stale = Seq(("k2", 20L, "U", 999L)).toDF("k", "seq", "op", "v")
    Cdc.currentView(Cdc.mergeVersioned(purged, stale, Seq("k"), "seq", "op"))
      .filter($"k" === "k2").count() shouldBe 0L
  }

  test("startup recovery restores a fully-written tmp after a crash swap") {
    implicit val sc = spark.sqlContext
    val statePath = Files.createTempDirectory("cdc_rec_").toString
    // simulate the crash window: no `state`, one complete tmp
    Cdc.initState(Seq(("k9", 90L)).toDF("k", "v"))
      .write.parquet(s"$statePath/state_tmp_7")
    val input = MemoryStream[(String, Long, String, Long)]
    input.addData(("k9", 100L, "U", 91L))
    val q = Streaming.changelogSnapshotSink(
      input.toDF.toDF("k", "seq", "op", "v"),
      Seq("k"), "seq", "op", statePath,
      Files.createTempDirectory("cdc_rec_ckpt_").toString)
    q.awaitTermination()
    Cdc.currentView(spark.read.parquet(s"$statePath/state"))
      .as[(String, Long)].collect().toSeq shouldBe Seq(("k9", 91L))
  }
}
