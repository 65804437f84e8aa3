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

  // ---- psiContributions ----

  private def bins(vs: Long*) = vs.toDF("bin")

  test("jsd: matches a driver-side fixed-point reference and is symmetric") {
    val a = Seq("x x y", "x z").toDF("text")
    val b = Seq("x y y y", "y w").toDF("text")
    def table(l: org.apache.spark.sql.DataFrame,
        r: org.apache.spark.sql.DataFrame) =
      Drift.tokenJsdContributions(l, r, "text")
        .collect().map(x => x.getString(0) -> x.getLong(3)).toMap

    val got = table(a, b)
    val cntA = Map("x" -> 3L, "y" -> 1L, "z" -> 1L, "w" -> 0L)
    val cntB = Map("x" -> 1L, "y" -> 4L, "w" -> 1L, "z" -> 0L)
    val (na, nb, v) = (5L, 6L, 4L)
    def s(n: Long, total: Long) =
      math.max(((n + 1L) * (1L << 20)) / (total + v), 1L)
    val expect = cntA.keys.map { t =>
      val sa = s(cntA(t), na); val sb = s(cntB(t), nb)
      val sm = (sa + sb) / 2L
      t -> (sa * (Dsir.ilog2Q20(sa) - Dsir.ilog2Q20(sm)) +
        sb * (Dsir.ilog2Q20(sb) - Dsir.ilog2Q20(sm)))
    }.toMap
    got shouldBe expect
    // symmetric: swapping corpora gives the identical table
    table(b, a) shouldBe got
  }

  test("jsd: identical corpora contribute exactly zero") {
    val c = Seq("alpha beta beta", "gamma alpha").toDF("text")
    Drift.tokenJsdContributions(c, c, "text")
      .collect().map(_.getLong(3)).toSet shouldBe Set(0L)
  }

  test("psi: identical distributions give zero contributions") {
    val a = bins(1L, 1L, 2L, 3L)
    Drift.psiContributions(a, a, "bin")
      .select(sum($"contrib_q40")).head().getLong(0) shouldBe 0L
  }

  test("psi: every contribution is non-negative and shifted bins rank highest") {
    val a = bins((Seq.fill(90)(1L) ++ Seq.fill(10)(2L)): _*)
    val b = bins((Seq.fill(10)(1L) ++ Seq.fill(90)(2L)): _*)
    val rows = Drift.psiContributions(a, b, "bin")
      .orderBy($"contrib_q40".desc).collect()
    all(rows.map(_.getLong(3))) should be >= 0L
    // both bins moved by the same mass; union-only bins absent
    rows.map(_.getLong(0)).toSet shouldBe Set(1L, 2L)
    rows.head.getLong(3) should be > 0L
  }

  test("psi: contribution matches the hand Q20 arithmetic") {
    // A = [1,1,1], B = [1,2]: union bins {1,2}, na=3, nb=2, v=2
    // sa(1) = (3+1)*2^20 div 5, sb(1) = (1+1)*2^20 div 4, etc.
    val a = bins(1L, 1L, 1L)
    val b = bins(1L, 2L)
    val out = Drift.psiContributions(a, b, "bin")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val q = 1L << 20
    def l(s: Long) = Dsir.ilog2Q20(s)
    val sa1 = (4 * q) / 5; val sb1 = (2 * q) / 4
    val sa2 = math.max(q / 5, 1); val sb2 = (2 * q) / 4
    out(1L) shouldBe (sa1 - sb1) * (l(sa1) - l(sb1))
    out(2L) shouldBe (sa2 - sb2) * (l(sa2) - l(sb2))
  }

  test("psi: an empty side fails loudly") {
    intercept[IllegalArgumentException] {
      Drift.psiContributions(bins(1L), bins(), "bin")
    }.getMessage should include("empty side")
  }

  test("psi: NULL bins raise rather than silently dropping mass") {
    val a = Seq(Option(1L), None).toDF("bin")
    val e = intercept[Exception] {
      Drift.psiContributions(a, bins(1L), "bin").collect()
    }
    e.getMessage should include("NULL")
  }
}
