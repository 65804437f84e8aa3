package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.KrHash

class NegativeSamplingSpec extends SparkSpec {
  import sqlImplicits._

  private def items(rows: (Long, String)*) = rows.toDF("id", "lab")

  test("every anchor gets exactly k negatives, never itself") {
    val df = items((1L to 50L).map(i => i -> s"l${i % 5}"): _*)
    val got = NegativeSampling.ringNegatives(df, "id", "lab", k = 3)
      .collect()
    got.length shouldBe 150
    got.groupBy(_.getLong(0)).values.foreach { negs =>
      negs.map(_.getInt(1)).sorted shouldBe Array(1, 2, 3)
    }
    all(got.map(r => r.getLong(0) != r.getLong(2))) shouldBe true
  }

  test("matches the local ring replay exactly") {
    val rows = (1L to 30L).map(i => i -> s"l${i % 4}")
    val got = NegativeSampling.ringNegatives(
      items(rows: _*), "id", "lab", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    // local replay
    val byHash = rows.sortBy { case (id, _) =>
      (KrHash.hash(s"neg$id".getBytes("UTF-8")), id)
    }
    val n = rows.size.toLong
    val pos = byHash.zipWithIndex.map { case ((id, _), p) => id -> p.toLong }.toMap
    val atPos = byHash.zipWithIndex.map { case ((id, l), p) => p.toLong -> (id, l) }.toMap
    val lab = rows.toMap
    for (j <- 1 to 2) {
      val o = 1L + java.lang.Math.floorMod(
        KrHash.hash(s"neg#$j".getBytes("UTF-8")), n - 1L)
      rows.foreach { case (id, l) =>
        val (nid, nl) = atPos((pos(id) + o) % n)
        got((id, j)) shouldBe (nid, nl == l)
      }
    }
  }

  test("same_label flags false negatives instead of dropping rows") {
    // all same label: every negative must be flagged, none dropped
    val df = items((1L to 10L).map(_ -> "same"): _*)
    val got = NegativeSampling.ringNegatives(df, "id", "lab", k = 2).collect()
    got.length shouldBe 20
    all(got.map(_.getBoolean(3))) shouldBe true
  }

  test("deterministic across partitioning and input order") {
    val rows = (1L to 80L).map(i => i -> s"l${i % 7}")
    val base = NegativeSampling.ringNegatives(
      items(rows: _*), "id", "lab", k = 2).collect().toSet
    val again = NegativeSampling.ringNegatives(
      items(scala.util.Random.shuffle(rows): _*).repartition(11),
      "id", "lab", k = 2).collect().toSet
    again shouldBe base
  }

  test("different salts rotate differently") {
    val df = items((1L to 40L).map(i => i -> "x"): _*)
    val a = NegativeSampling.ringNegatives(df, "id", "lab", 1, "saltA")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b = NegativeSampling.ringNegatives(df, "id", "lab", 1, "saltB")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    a should not be b
  }

  test("fewer than 2 rows raises") {
    val ex = intercept[IllegalArgumentException] {
      NegativeSampling.ringNegatives(items(1L -> "a"), "id", "lab", 1)
    }
    ex.getMessage should include("at least 2 rows")
  }
}
