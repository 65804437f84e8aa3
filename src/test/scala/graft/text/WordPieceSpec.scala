package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.WordPieceTokenize

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq(
    "key", "a", "agg", "the", "s", "##can", "##low", "##mall",
    "tab", "##le", "val", "##ue", "or", "ord", "##der", "##er",
    "st", "##re")

  private def toks(text: String, v: Seq[String] = vocab): Seq[String] =
    Seq(text).toDF("t")
      .select(WordPieceTokenize.wordPieceTokenize(col("t"), v).as("p"))
      .head().getSeq[String](0)

  test("per-word greedy longest-match with continuation prefix") {
    toks("scan") shouldBe Seq("s", "##can")
    toks("slow") shouldBe Seq("s", "##low")
    toks("table") shouldBe Seq("tab", "##le")
    toks("key agg") shouldBe Seq("key", "agg")
  }

  test("greedy prefers the longest initial piece") {
    // 'ord' (3) wins over 'or' (2); remainder 'er' continues
    toks("order") shouldBe Seq("ord", "##er")
  }

  test("all-or-nothing: a partially coverable word is ONE unk") {
    // 'st' + '##re' match but 'am' has no continuation piece —
    // WordPiece discards the partial pieces, unlike flat maximal munch
    toks("stream") shouldBe Seq("[UNK]")
    toks("st stream the") shouldBe Seq("st", "[UNK]", "the")
  }

  test("uncovered words are unk; whitespace runs are boundaries") {
    toks("  key   zzz \t value ") shouldBe
      Seq("key", "[UNK]", "val", "##ue")
    toks("") shouldBe Seq.empty
    toks("   ") shouldBe Seq.empty
  }

  test("a continuation piece never starts a word") {
    // 'can' exists only as '##can': word-initial lookup must miss it
    toks("can") shouldBe Seq("[UNK]")
  }

  test("custom unk and prefix") {
    val got = Seq("scan zzz").toDF("t")
      .select(WordPieceTokenize.wordPieceTokenize(
        col("t"), Seq("s", "++can"), "<?>", "++").as("p"))
      .head().getSeq[String](0)
    got shouldBe Seq("s", "++can", "<?>")
  }

  test("null text yields null, not a crash") {
    val got = Seq(Option.empty[String]).toDF("t")
      .select(WordPieceTokenize.wordPieceTokenize(col("t"), vocab).as("p"))
      .head()
    got.isNullAt(0) shouldBe true
  }

  test("segmentDistinctWords joins counts and explodes pieces") {
    val corpus = Seq((1L, "scan scan table"), (2L, "scan zzz")).toDF("id", "text")
    val got = WordPiece.segmentDistinctWords(corpus, "text", vocab)
      .orderBy("word", "piece_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    got shouldBe Array(
      ("scan", 3L, 0L, "s"), ("scan", 3L, 1L, "##can"),
      ("table", 1L, 0L, "tab"), ("table", 1L, 1L, "##le"),
      ("zzz", 1L, 0L, "[UNK]"))
  }

  test("fertility counts words, pieces and unks per document") {
    val df = Seq((1L, "scan table zzz"), (2L, ""), (3L, "order")).toDF("id", "text")
    val got = WordPiece.fertility(df, "id", "text", vocab)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got shouldBe Array((1L, 3L, 5L, 1L), (2L, 0L, 0L, 0L), (3L, 1L, 2L, 0L))
  }

  test("segmentation is layout-independent and codegen-stable") {
    val data = (0L until 64L).map(i => (i, s"scan table order item$i"))
    val one = data.toDF("id", "text").coalesce(1)
    val many = data.toDF("id", "text").repartition(7)
    val f = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("id"), WordPieceTokenize.wordPieceTokenize(
        col("text"), vocab).as("p"))
        .orderBy("id").collect().map(r => r.getSeq[String](1)).toSeq
    f(one) shouldBe f(many)
  }
}
