package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.KrHash

class InterleaveSpec extends SparkSpec {
  import sqlImplicits._

  private def rows(n: Int, srcOf: Int => String) =
    (1 to n).map(i => (i.toLong, srcOf(i))).toDF("id", "src")

  test("positions are a gap-free permutation 0..n-1") {
    val df = rows(60, i => if (i % 3 == 0) "a" else "b")
    val pos = Interleave.stridedOrder(
      df, "src", "id", Map("a" -> 1L, "b" -> 2L))
      .select("position").collect().map(_.getLong(0)).sorted
    pos shouldBe (0L until 60L).toArray
  }

  test("any prefix holds each source near its weight share") {
    // 3:1 mix, 40 rows each — prefix of n should hold ~n·3/4 of a
    val df = rows(200, i => if (i <= 150) "a" else "b")
    val got = Interleave.stridedOrder(
      df, "src", "id", Map("a" -> 3L, "b" -> 1L))
      .orderBy("position").select("src").collect().map(_.getString(0))
    for (n <- Seq(20, 40, 80, 160)) {
      val aCount = got.take(n).count(_ == "a")
      // stride scheduling is off by at most one tick per source
      math.abs(aCount - n * 3.0 / 4.0) should be <= 2.0
    }
  }

  test("matches a local stride-schedule replay exactly") {
    val data = (1 to 30).map(i => (i.toLong, if (i % 2 == 0) "x" else "y"))
    val weights = Map("x" -> 2L, "y" -> 1L)
    val got = Interleave.stridedOrder(
      data.toDF("id", "src"), "src", "id", weights)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // local replay
    val totalW = weights.values.sum
    val stride = weights.map { case (s, w) => s -> totalW * (1L << 20) / w }
    val ranked = data.groupBy(_._2).flatMap { case (s, xs) =>
      xs.sortBy { case (id, _) =>
        (KrHash.hash(s"mix$id".getBytes("UTF-8")), id)
      }.zipWithIndex.map { case ((id, src), r) =>
        (id, src, r.toLong, (r + 1L) * stride(src))
      }
    }.toSeq
    val positioned = ranked.sortBy { case (_, src, r, v) => (v, src, r) }
      .zipWithIndex
    positioned.foreach { case ((id, _, r, v), p) =>
      got(id) shouldBe ((r, v, p.toLong))
    }
  }

  test("deterministic under partitioning and input order") {
    val data = (1 to 120).map(i => (i.toLong, s"s${i % 4}"))
    val w = Map("s0" -> 1L, "s1" -> 2L, "s2" -> 3L, "s3" -> 4L)
    val base = Interleave.stridedOrder(
      data.toDF("id", "src"), "src", "id", w).collect().toSet
    val again = Interleave.stridedOrder(
      scala.util.Random.shuffle(data).toDF("id", "src").repartition(13),
      "src", "id", w).collect().toSet
    again shouldBe base
  }

  test("a source without a weight raises instead of starving silently") {
    val df = rows(10, i => if (i % 2 == 0) "a" else "mystery")
    val ex = intercept[IllegalArgumentException] {
      Interleave.stridedOrder(df, "src", "id", Map("a" -> 1L))
    }
    ex.getMessage should include("no weight")
  }

  test("non-positive weights are rejected") {
    an[IllegalArgumentException] should be thrownBy
      Interleave.stridedOrder(rows(4, _ => "a"), "src", "id",
        Map("a" -> 0L))
  }
}
