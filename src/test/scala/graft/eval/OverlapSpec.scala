package graft.eval

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OverlapSpec extends SparkSpec {
  import sqlImplicits._

  private def toks(s: String) = s.split(" ").toSeq

  test("golden: clipping caps repeated candidate n-grams (BLEU's example)") {
    // Papineni et al.'s degenerate candidate: "the the the the the the the"
    // vs a reference containing "the" twice → unigram precision 2/7.
    val df = Seq((1L, toks("the the the the the the the"),
      toks("the cat is on the mat"))).toDF("id", "cand", "ref")
    val out = Overlap.ngramPrecision(df, Seq("id"), $"cand", $"ref", Seq(1))
      .collect().head
    out.getAs[Long]("clipped") shouldBe 2L
    out.getAs[Long]("cand_ngrams") shouldBe 7L
    out.getAs[Double]("clip_precision") shouldBe 2.0 / 7.0
  }

  test("golden: bigram counts on a known pair") {
    val df = Seq((1L, toks("a b c d"), toks("b c d e"))).toDF("id", "cand", "ref")
    val out = Overlap.ngramPrecision(df, Seq("id"), $"cand", $"ref", Seq(1, 2))
      .orderBy($"n").collect()
    // unigrams: cand {a,b,c,d}, ref {b,c,d,e} → clipped 3/4
    out(0).getAs[Long]("clipped") shouldBe 3L
    out(0).getAs[Long]("cand_ngrams") shouldBe 4L
    // bigrams: cand {ab,bc,cd}, ref {bc,cd,de} → clipped 2/3
    out(1).getAs[Long]("clipped") shouldBe 2L
    out(1).getAs[Long]("cand_ngrams") shouldBe 3L
    out(1).getAs[Long]("ref_ngrams") shouldBe 3L
  }

  test("identical sequences score 1.0; disjoint score 0.0") {
    val df = Seq(
      (1L, toks("x y z"), toks("x y z")),
      (2L, toks("x y z"), toks("p q r"))).toDF("id", "cand", "ref")
    val out = Overlap.ngramPrecision(df, Seq("id"), $"cand", $"ref", Seq(1, 2))
      .orderBy($"id", $"n").collect()
    out.filter(_.getAs[Long]("id") == 1L)
      .map(_.getAs[Double]("clip_precision")) shouldBe Array(1.0, 1.0)
    out.filter(_.getAs[Long]("id") == 2L)
      .map(_.getAs[Double]("clip_precision")) shouldBe Array(0.0, 0.0)
  }

  test("candidate shorter than n yields NULL precision when ref has grams") {
    val df = Seq((1L, toks("x"), toks("a b c"))).toDF("id", "cand", "ref")
    val out = Overlap.ngramPrecision(df, Seq("id"), $"cand", $"ref", Seq(2))
      .collect().head
    out.getAs[Long]("cand_ngrams") shouldBe 0L
    out.getAs[Long]("ref_ngrams") shouldBe 2L
    out.isNullAt(out.fieldIndex("clip_precision")) shouldBe true
  }

  test("layout-independent") {
    val rnd = new scala.util.Random(23)
    val words = (1 to 12).map(i => s"w$i")
    val df = (1L to 60L).map { id =>
      def seq() = (1 to 20).map(_ => words(rnd.nextInt(words.length)))
      (id, seq(), seq())
    }.toDF("id", "cand", "ref")
    val a = Overlap.ngramPrecision(df, Seq("id"), $"cand", $"ref", Seq(1, 2, 3))
      .orderBy($"id", $"n").collect()
    val b = Overlap.ngramPrecision(df.repartition(9), Seq("id"), $"cand", $"ref",
      Seq(1, 2, 3)).orderBy($"id", $"n").collect()
    a shouldBe b
  }

  test("invalid arguments fail loudly") {
    val df = Seq((1L, toks("a"), toks("a"))).toDF("id", "cand", "ref")
    an[IllegalArgumentException] should be thrownBy
      Overlap.ngramPrecision(df, Seq("id"), $"cand", $"ref", Seq.empty)
    an[IllegalArgumentException] should be thrownBy
      Overlap.ngrams($"cand", 0)
  }
}
