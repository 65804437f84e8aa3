package graft.functions

import graft.SparkSpec
import graft.text.Chunking
import org.apache.spark.sql.functions._

class SentenceChunksSpec extends SparkSpec {
  import sqlImplicits._

  private def chunksOf(text: String, maxChars: Int): Seq[(Long, Long, String)] =
    Chunking.chunkBySentences(
      Seq((1L, text)).toDF("id", "text"), "id", "text", maxChars)
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getString(4))).toSeq

  test("greedy packing at sentence boundaries") {
    // sentences: "One." " Two." " Three." — 4/5/7 chars incl. leading space
    chunksOf("One. Two. Three.", 10) shouldBe Seq(
      (0L, 9L, "One. Two."),
      (10L, 6L, "Three."))
  }

  test("a chunk never splits a sentence; oversized sentences surface whole") {
    val got = chunksOf("Short. This sentence is far too long to fit. End.", 12)
    got shouldBe Seq(
      (0L, 6L, "Short."),
      (7L, 37L, "This sentence is far too long to fit."),
      (45L, 4L, "End."))
    got(1)._2 should be > 12L // oversized, visible, untruncated
  }

  test("abbreviation dots without a following space do not split") {
    chunksOf("See e.g.the spec. Done.", 50) shouldBe Seq(
      (0L, 23L, "See e.g.the spec. Done."))
    chunksOf("See e.g.the spec. Done.", 18) shouldBe Seq(
      (0L, 17L, "See e.g.the spec."),
      (18L, 5L, "Done."))
  }

  test("punctuation runs end at their last character") {
    chunksOf("What?! Yes.", 7) shouldBe Seq(
      (0L, 6L, "What?!"),
      (7L, 4L, "Yes."))
  }

  test("unterminated trailing fragment is a sentence") {
    chunksOf("Done. trailing fragment", 10) shouldBe Seq(
      (0L, 5L, "Done."),
      (6L, 17L, "trailing fragment"))
  }

  test("empty and all-space documents yield no chunks") {
    chunksOf("", 10) shouldBe Seq.empty
    chunksOf("   ", 10) shouldBe Seq.empty
    // two dot-sentences pack into one chunk; surrounding spaces trimmed
    // only at the chunk OPEN (interior spaces stay)
    chunksOf(" .  . ", 10) shouldBe Seq((1L, 4L, ".  ."))
    chunksOf(" .  . ", 1) shouldBe Seq((1L, 1L, "."), (4L, 1L, "."))
  }

  test("every non-space character lands in exactly one chunk, in order") {
    val text = "Alpha beta. Gamma! Delta? Epsilon zeta eta theta. Tail bit"
    for (m <- Seq(5, 12, 30, 200)) {
      val got = chunksOf(text, m)
      // in order, non-overlapping
      got.sliding(2).foreach {
        case Seq((s1, l1, _), (s2, _, _)) => s2 should be >= (s1 + l1)
        case _ =>
      }
      // coverage: a non-space position is inside exactly one span
      val covered = got.flatMap { case (s, l, _) => s until (s + l) }.toSet
      text.zipWithIndex.foreach { case (c, i) =>
        if (c != ' ') covered should contain(i.toLong)
      }
      // slices match the emitted text
      got.foreach { case (s, l, t) =>
        t shouldBe text.substring(s.toInt, (s + l).toInt)
      }
    }
  }

  test("forced codegen and interpreted paths agree") {
    val texts = Seq("One. Two! Three? Four", "x", "", "A.. B.", "  lead. ok.")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val viaDf = Chunking.chunkBySentences(df, "id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(4))).toSet
    val direct = texts.zipWithIndex.flatMap { case (t, i) =>
      val arr = SentenceChunks.spans(t, 8)
      (0 until arr.numElements()).map { k =>
        val row = arr.getStruct(k, 2)
        (i.toLong, k.toLong,
          t.substring(row.getInt(0), row.getInt(0) + row.getInt(1)))
      }
    }.toSet
    viaDf shouldBe direct
  }
}
