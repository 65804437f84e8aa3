package graft.vocab

import java.nio.file.Files

import graft.SparkSpec

/** Port of `tests/tensorflow/test_vocabulary.py:15-124`: the
  * value-count truth tables (scalar, null-skipping + threshold, array
  * flattening), merged-key aggregation, and the `.voc` writer contract
  * (one file per requested key, empty-string modalities dropped).
  */
class VocabularySpec extends SparkSpec {
  import sqlImplicits._

  // case 1: scalars, threshold 1 (trivial -> no filter)
  test("vocab values over scalar columns, trivial threshold") {
    val df = Seq(
      (1, 10, Some(20)),
      (1, 13, Some(25)),
      (3, 10, Some(20)),
      (33, 100, Some(20))).toDF("feature1", "feature2", "feature3")
    val got = Vocabulary.vocabValues(
      df, Seq("feature1", "feature2", "feature3").map(c => c -> Seq(c)).toMap, 1)
    got("feature1").toSet shouldBe Set("1", "3", "33")
    got("feature2").toSet shouldBe Set("10", "13", "100")
    got("feature3").toSet shouldBe Set("20", "25")
  }

  // case 2: nulls skipped, threshold 2 filters singletons
  test("vocab values skip nulls and apply the count threshold") {
    val df = Seq(
      (1, 10, None: Option[Int]),
      (1, 13, None),
      (3, 11, Some(20)),
      (33, 100, Some(20))).toDF("feature1", "feature2", "feature3")
    val got = Vocabulary.vocabValues(
      df, Seq("feature1", "feature2", "feature3").map(c => c -> Seq(c)).toMap, 2)
    got.keySet shouldBe Set("feature1", "feature3")
    got("feature1").toSet shouldBe Set("1")
    got("feature3").toSet shouldBe Set("20")
  }

  // case 3: array columns contribute elements, not lists
  test("vocab values flatten array columns") {
    val df = Seq(
      Seq(1), Seq(2, 4), Seq(10, 100), Seq(10, 200)).toDF("my_feature")
    val got = Vocabulary.vocabValues(df, Map("my_feature" -> Seq("my_feature")), 1)
    got("my_feature").toSet shouldBe Set("1", "2", "4", "10", "100", "200")
  }

  // merged keys (`test_get_vocab_values_merged`)
  test("columns merged into shared vocabulary keys") {
    val df = Seq(
      (1, 10, 20),
      (1, 13, 25),
      (3, 10, 20),
      (33, 100, 20)).toDF("feature1", "feature2", "feature3")
    val got = Vocabulary.vocabValues(
      df,
      Map(
        "my_key" -> Seq("feature1", "feature2"),
        "my_key_2" -> Seq("feature2", "feature3")),
      1)
    got("my_key").toSet shouldBe Set("1", "3", "10", "13", "33", "100")
    got("my_key_2").toSet shouldBe Set("10", "13", "20", "25", "100")
  }

  test("merged keys accumulate counts across columns for the threshold") {
    // value 10 appears once in each of two columns feeding the same key:
    // merged count 2 survives threshold 2, like the reference's
    // ((key, value), 1) reduceByKey over the merged stream
    val df = Seq((10, 10), (11, 12)).toDF("a", "b")
    val got = Vocabulary.vocabValues(df, Map("k" -> Seq("a", "b")), 2)
    got.getOrElse("k", Nil).toSet shouldBe Set("10")
  }

  test("threshold at most 1 adds no filter node to the plan") {
    val df = Seq(1, 2).toDF("c")
    val trivial = Vocabulary.vocabCounts(df, Map("c" -> Seq("c")), 1)
      .queryExecution.optimizedPlan.toString
    val filtered = Vocabulary.vocabCounts(df, Map("c" -> Seq("c")), 2)
      .queryExecution.optimizedPlan.toString
    filtered should include("count#")
    trivial should not include "(count#"
  }

  // `test_write_vocab_files`: one file per requested key, newline-joined,
  // empty strings dropped, missing keys -> empty file
  test("voc files: one per key, newline-joined, empty modalities dropped") {
    val dir = Files.createTempDirectory("voc").toString
    val df = Seq(1).toDF("unused")
    val files = Vocabulary.writeVocabFiles(
      df,
      Map(
        "feature1" -> Seq("1", "3", "33"),
        "feature2" -> Seq("10", "13", "100"),
        "feature3" -> Seq("20", "25")),
      dir,
      Seq("feature1", "feature2", "feature3", "userid"))
    files.map(f => f.substring(f.lastIndexOf('/') + 1)).toSet shouldBe
      Set("feature1.voc", "feature2.voc", "feature3.voc", "userid.voc")
    def read(name: String) =
      new String(Files.readAllBytes(java.nio.file.Paths.get(dir, name)), "UTF-8")
    read("feature1.voc") shouldBe "1\n3\n33"
    read("feature3.voc") shouldBe "20\n25"
    read("userid.voc") shouldBe ""
  }

  test("voc files drop empty-string modalities") {
    val dir = Files.createTempDirectory("voc").toString
    val df = Seq(1).toDF("unused")
    Vocabulary.writeVocabFiles(
      df, Map("country" -> Seq("FR", "US", "")), dir, Seq("country"))
    val content = new String(
      Files.readAllBytes(java.nio.file.Paths.get(dir, "country.voc")), "UTF-8")
    content shouldBe "FR\nUS"
  }

  test("end-to-end genVocabFiles over a DataFrame") {
    val dir = Files.createTempDirectory("voc").toString
    val df = Seq(("a", 1), ("a", 2), ("b", 1)).toDF("word", "n")
    val files = Vocabulary.genVocabFiles(df, Seq("word"), dir, 2)
    files.size shouldBe 1
    val content = new String(
      Files.readAllBytes(java.nio.file.Paths.get(dir, "word.voc")), "UTF-8")
    content shouldBe "a"
  }
}
