package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import sqlImplicits._

  private def snapshot = Seq(
    ("k1", "alpha", 10L),
    ("k2", "beta", 20L),
    ("k3", "gamma", 30L)).toDF("k", "name", "v")

  // (k, seq, op, name, v)
  private def changes = Seq(
    ("k2", 1L, "U", "beta-1", 21L),
    ("k2", 2L, "U", "beta-2", 22L), // supersedes seq 1
    ("k3", 5L, "D", null.asInstanceOf[String], 0L),
    ("k4", 7L, "I", "delta", 40L)).toDF("k", "seq", "op", "name", "v")

  test("last write wins, deletes remove, inserts add, untouched pass") {
    val out = Cdc.applyChangelog(snapshot, changes, Seq("k"), "seq", "op")
      .orderBy($"k").as[(String, String, Long)].collect()
    out.toSeq shouldBe Seq(
      ("k1", "alpha", 10L),
      ("k2", "beta-2", 22L),
      ("k4", "delta", 40L))
  }

  test("a delete superseded by a later upsert keeps the key") {
    val ch = Seq(
      ("k1", 1L, "D", null.asInstanceOf[String], 0L),
      ("k1", 2L, "U", "alpha-2", 11L)).toDF("k", "seq", "op", "name", "v")
    val out = Cdc.applyChangelog(snapshot, ch, Seq("k"), "seq", "op")
      .orderBy($"k").as[(String, String, Long)].collect()
    out.toSeq shouldBe Seq(
      ("k1", "alpha-2", 11L), ("k2", "beta", 20L), ("k3", "gamma", 30L))
  }

  test("deleting an absent key is a no-op") {
    val ch = Seq(("kX", 1L, "D", null.asInstanceOf[String], 0L))
      .toDF("k", "seq", "op", "name", "v")
    Cdc.applyChangelog(snapshot, ch, Seq("k"), "seq", "op")
      .count() shouldBe 3L
  }

  test("replaying the same changelog is idempotent") {
    val once = Cdc.applyChangelog(snapshot, changes, Seq("k"), "seq", "op")
    val twice = Cdc.applyChangelog(once, changes, Seq("k"), "seq", "op")
    twice.orderBy($"k").collect().toSeq shouldBe
      once.orderBy($"k").collect().toSeq
  }

  test("an ambiguous seq tie within a key raises") {
    val ch = Seq(
      ("k1", 1L, "U", "a", 1L),
      ("k1", 1L, "U", "b", 2L)).toDF("k", "seq", "op", "name", "v")
    val e = intercept[Exception] {
      Cdc.applyChangelog(snapshot, ch, Seq("k"), "seq", "op").collect()
    }
    e.getMessage should include("ambiguous changelog seq")
  }

  test("tie columns disambiguate an equal seq deterministically") {
    val ch = Seq(
      ("k1", 1L, 1L, "U", "a", 1L),
      ("k1", 1L, 2L, "U", "b", 2L)).toDF("k", "seq", "tie", "op", "name", "v")
    val out = Cdc.applyChangelog(
      snapshot, ch, Seq("k"), "seq", "op", Seq("tie"))
      .filter($"k" === "k1").as[(String, String, Long)].collect()
    out.toSeq shouldBe Seq(("k1", "b", 2L))
  }

  test("an unknown (or null) op raises") {
    val ch = Seq(("k1", 1L, "X", "a", 1L)).toDF("k", "seq", "op", "name", "v")
    val e = intercept[Exception] {
      Cdc.applyChangelog(snapshot, ch, Seq("k"), "seq", "op").collect()
    }
    e.getMessage should include("unknown changelog op")
    val chNull = Seq(("k1", 1L, null.asInstanceOf[String], "a", 1L))
      .toDF("k", "seq", "op", "name", "v")
    intercept[Exception] {
      Cdc.applyChangelog(snapshot, chNull, Seq("k"), "seq", "op").collect()
    }.getMessage should include("unknown changelog op")
  }

  test("payload schema drift is refused up front") {
    val bad = changes.withColumnRenamed("v", "value")
    intercept[IllegalArgumentException] {
      Cdc.applyChangelog(snapshot, bad, Seq("k"), "seq", "op")
    }
  }

  test("changelog collapse keeps the map-side WindowGroupLimit heap") {
    val plan = Cdc.applyChangelog(snapshot, changes, Seq("k"), "seq", "op")
      .queryExecution.executedPlan.toString
    plan should include("WindowGroupLimit")
  }

  test("result is partitioning-independent") {
    val a = Cdc.applyChangelog(
      snapshot.repartition(7), changes.repartition(3), Seq("k"), "seq", "op")
      .orderBy($"k").collect().toSeq
    val b = Cdc.applyChangelog(
      snapshot.repartition(1), changes.repartition(13), Seq("k"), "seq", "op")
      .orderBy($"k").collect().toSeq
    a shouldBe b
  }
}
