package graft.text

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PhoneticSpec extends SparkSpec {
  import sqlImplicits._

  test("classic soundex vectors") {
    val vecs = Seq(
      "Robert" -> "R163", "Rupert" -> "R163", "Ashcraft" -> "A261",
      "Ashcroft" -> "A261", "Tymczak" -> "T522", "Pfister" -> "P236",
      "Honeyman" -> "H555", "Wright" -> "W623", "Euler" -> "E460",
      "Gauss" -> "G200", "Hilbert" -> "H416", "Knuth" -> "K530",
      "Lloyd" -> "L300", "Lukasiewicz" -> "L222")
    val got = vecs.map(_._1).toDF("n")
      .select($"n", Phonetic.soundex($"n").as("s"))
      .as[(String, String)].collect().toMap
    vecs.foreach { case (n, want) => (n, got(n)) shouldBe ((n, want)) }
  }

  test("conforms to Spark's native soundex on a 1000-name random sweep") {
    val rnd = new Random(42)
    val names = (1 to 1000).map { _ =>
      val len = 1 + rnd.nextInt(12)
      (1 to len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }
    val diff = names.toDF("n")
      .select($"n", Phonetic.soundex($"n").as("mine"),
        soundex($"n").as("native"))
      .filter($"mine" =!= $"native")
      .collect()
    withClue(diff.take(10).mkString(", ")) { diff.length shouldBe 0 }
  }

  test("similar-sounding misspellings share a code") {
    val df = Seq("Smith", "Smyth", "Jones").toDF("n")
      .select(Phonetic.soundex($"n")).as[String].collect()
    df(0) shouldBe df(1) // Smith / Smyth
    df(0) should not be df(2) // Jones differs
  }

  test("a name with no letters raises") {
    intercept[Exception] {
      Seq("12345").toDF("n").select(Phonetic.soundex($"n")).collect()
    }.getMessage should include("no letters")
  }

  test("matchPairs finds typo variants within blocks only") {
    val recs = Seq(
      (1L, "golden lamp"), (2L, "goldn lamp"), // 1-char deletion
      (3L, "silver spoon"), (4L, "silver spoan"), // vowel typo
      (5L, "totally different thing")).toDF("id", "name")
    val pairs = Phonetic.matchPairs(recs, "id", "name", maxDistance = 2)
      .select($"id_a", $"id_b", $"dist").as[(Long, Long, Int)]
      .collect().toSet
    pairs should contain((1L, 2L, 1))
    pairs should contain((3L, 4L, 1))
    pairs.map(p => (p._1, p._2)) should not contain ((1L, 5L))
  }

  test("blocking bounds the candidate set (no all-pairs path)") {
    val plan = Phonetic.matchPairs(
      Seq((1L, "a b")).toDF("id", "name"), "id", "name")
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }
}
