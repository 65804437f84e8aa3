package graft.text

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import sqlImplicits._

  private def chunks(s: String, size: Int, overlap: Int) =
    Chunking.chunk(Seq((1L, s)).toDF("id", "text"), "id", "text", size, overlap)
      .orderBy("chunk_id")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))

  test("overlapping chunks cover the text with shared borders") {
    chunks("abcdefghij", size = 4, overlap = 2) shouldBe Seq(
      (0L, 0L, "abcd"), (1L, 2L, "cdef"), (2L, 4L, "efgh"), (3L, 6L, "ghij"))
  }

  test("no redundant tail: a chunk fully inside its predecessor is not emitted") {
    // len 10, size 8, overlap 4 -> step 4; starts 0 and 4 only (a start
    // at 8 would add chars 8..10, already covered by the chunk at 4)
    chunks("abcdefghij", size = 8, overlap = 4) shouldBe Seq(
      (0L, 0L, "abcdefgh"), (1L, 4L, "efghij"))
  }

  test("short documents yield exactly one whole-document chunk") {
    chunks("abc", size = 10, overlap = 3) shouldBe Seq((0L, 0L, "abc"))
  }

  test("zero overlap partitions the text") {
    chunks("abcdefg", size = 3, overlap = 0) shouldBe Seq(
      (0L, 0L, "abc"), (1L, 3L, "def"), (2L, 6L, "g"))
  }

  test("every character is covered; consecutive chunks overlap exactly") {
    val s = (1 to 97).map(i => ('a' + i % 26).toChar).mkString
    val got = chunks(s, size = 16, overlap = 5)
    // reassembling from chunk starts reproduces the document
    val rebuilt = new StringBuilder
    got.foreach { case (_, start, text) =>
      rebuilt.length should be >= start.toInt // no gaps
      rebuilt.setLength(start.toInt)
      rebuilt.append(text)
    }
    rebuilt.toString shouldBe s
    got.sliding(2).foreach {
      case Array((_, s1, t1), (_, s2, _)) =>
        (s1 + t1.length) should be >= (s2 + 5) // >= overlap shared chars
      case _ =>
    }
  }

  test("empty documents yield no chunks") {
    chunks("", size = 4, overlap = 1) shouldBe empty
  }

  test("invalid parameters rejected") {
    an[IllegalArgumentException] should be thrownBy chunks("x", 0, 0)
    an[IllegalArgumentException] should be thrownBy chunks("x", 4, 4)
    an[IllegalArgumentException] should be thrownBy chunks("x", 4, -1)
  }
}
