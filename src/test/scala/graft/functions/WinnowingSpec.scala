package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WinnowingSpec extends SparkSpec {
  import sqlImplicits._

  /** Naive reference: hash every k-gram directly, scan every window. */
  private def reference(s: String, k: Int, w: Int): Seq[Long] = {
    val bytes = s.getBytes("UTF-8")
    val P = (1L << 31) - 1
    val n = bytes.length - k + 1
    if (n <= 0) return Seq.empty
    val hs = (0 until n).map { i =>
      (i until i + k).foldLeft(0L)((h, j) => (h * 257 + (bytes(j) & 0xFF)) % P)
    }
    if (n <= w) return Seq(hs.min)
    val selected = (0 to n - w).map { start =>
      // rightmost minimum in the window
      val win = hs.slice(start, start + w)
      val m = win.min
      start + win.lastIndexOf(m)
    }
    selected.distinct.map(hs)
  }

  test("expression matches the naive reference on random strings") {
    val rng = new Random(7)
    val texts = (0 until 60).map { _ =>
      (0 until rng.nextInt(120)).map(_ => ('a' + rng.nextInt(4)).toChar).mkString
    } :+ "" :+ "ab" :+ "aaaaaaaaaaaa"
    texts.foreach { t =>
      WinnowingFingerprints.winnow(t.getBytes("UTF-8"), 5, 4).toSeq shouldBe
        reference(t, 5, 4)
    }
  }

  test("shared long substrings guarantee a shared fingerprint") {
    val rng = new Random(13)
    def rand(n: Int) = (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val k = 5
    val w = 4
    val common = rand(k + w - 1) // minimum guaranteed-match length
    (0 until 20).foreach { _ =>
      val a = rand(30) + common + rand(30)
      val b = rand(25) + common + rand(35)
      val fa = WinnowingFingerprints.winnow(a.getBytes, k, w).toSet
      val fb = WinnowingFingerprints.winnow(b.getBytes, k, w).toSet
      fa.intersect(fb) should not be empty
    }
  }

  test("unrelated documents share few fingerprints; short inputs degrade cleanly") {
    val a = WinnowingFingerprints.winnow(("x" * 3).getBytes, 5, 4)
    a shouldBe empty // shorter than k
    val single = WinnowingFingerprints.winnow("abcdef".getBytes, 5, 4)
    single.length shouldBe 1 // fewer grams than one window: the global min
  }

  test("runs as a column under forced codegen") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq("the quick brown fox jumps over the lazy dog", "tiny", "")
        .toDF("text")
      val got = df.select(
        graft.text.TextStats.winnowingFingerprints(col("text")).as("fp"))
        .collect().map(_.getSeq[Long](0))
      got(0) shouldBe reference("the quick brown fox jumps over the lazy dog", 5, 4)
      got(2) shouldBe empty
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }
}
