package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import sqlImplicits._

  test("matches a driver-side fixed-point reference on a hand-sized pair") {
    val a = Seq("x x y", "x z").toDF("text")      // x:3 y:1 z:1, N_a=5
    val b = Seq("x y y y", "y w").toDF("text")    // x:1 y:4 w:1, N_b=6
    val got = Drift.tokenKlContributions(a, b, "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

    val cntA = Map("x" -> 3L, "y" -> 1L, "z" -> 1L, "w" -> 0L)
    val cntB = Map("x" -> 1L, "y" -> 4L, "w" -> 1L, "z" -> 0L)
    val (na, nb, v) = (5L, 6L, 4L)
    def s(n: Long, total: Long) =
      math.max(((n + 1L) * (1L << 20)) / (total + v), 1L)
    val expect = cntA.keys.map { t =>
      val sa = s(cntA(t), na); val sb = s(cntB(t), nb)
      t -> (cntA(t), cntB(t),
        sa * (Dsir.ilog2Q20(sa) - Dsir.ilog2Q20(sb)))
    }.toMap
    got shouldBe expect
  }

  test("identical corpora have zero drift everywhere") {
    val a = Seq("p q r", "p p").toDF("text")
    val out = Drift.tokenKlContributions(a, a, "text").collect()
    out.length shouldBe 3
    out.foreach(_.getLong(3) shouldBe 0L)
  }

  test("a token over-represented in A contributes positive, in B negative") {
    val a = Seq("common common onlya").toDF("text")
    val b = Seq("common common onlyb").toDF("text")
    val byTok = Drift.tokenKlContributions(a, b, "text")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(byTok("onlya") > 0L)
    assert(byTok("onlyb") < 0L)
    byTok("common") shouldBe 0L // same count, same totals
  }

  test("partition-layout independent (exact integer equality)") {
    val rng = new scala.util.Random(3)
    val words = Vector("a", "b", "c", "d", "e", "f")
    def doc() = Seq.fill(8)(words(rng.nextInt(words.size))).mkString(" ")
    val a = Seq.fill(50)(doc()).toDF("text")
    val b = Seq.fill(50)(doc()).toDF("text")
    val r1 = Drift.tokenKlContributions(a.repartition(13), b.repartition(3), "text")
      .collect().map(_.toSeq).toSet
    val r2 = Drift.tokenKlContributions(a.repartition(1), b.repartition(7), "text")
      .collect().map(_.toSeq).toSet
    r1 shouldBe r2
  }

  test("empty corpora fail loudly") {
    val a = Seq("x").toDF("text")
    val empty = Seq.empty[String].toDF("text")
    intercept[IllegalArgumentException] {
      Drift.tokenKlContributions(a, empty, "text")
    }.getMessage should include("empty corpus")
  }

  test("NULL texts contribute nothing") {
    val a = Seq(Option("x y"), None).toDF("text")
    val b = Seq(Option("x"), Option("y")).toDF("text")
    val out = Drift.tokenKlContributions(a, b, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out shouldBe Map("x" -> 1L, "y" -> 1L)
  }
}
