package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {
  import sqlImplicits._

  private val trainDf = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs"),
    (3L, "the quick brown fox likes the lazy dog")
  ).toDF("doc_id", "text")

  private val testDf = Seq(
    (100L, "a quick brown fox jumps high"),
    (101L, "completely unrelated benchmark answer text"),
    (102L, "pack my box with five dozen liquor jugs exactly")
  ).toDF("doc_id", "text")

  test("overlapPairs counts distinct shared n-grams per train/test pair") {
    val got = Decontaminate.overlapPairs(
      trainDf, "doc_id", testDf, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // test 100 "quick brown fox" with train 1 and 3; "brown fox jumps"
    // with train 1 only. test 102 shares all 6 trigrams of train 2.
    got shouldBe Set((1L, 100L, 2L), (3L, 100L, 1L), (2L, 102L, 6L))
  }

  test("a repeated gram inside one document counts once") {
    val tr = Seq((1L, "a b a b a b")).toDF("doc_id", "text") // "a b a" x2
    val te = Seq((9L, "x a b a y")).toDF("doc_id", "text")
    val got = Decontaminate.overlapPairs(tr, "doc_id", te, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // shared distinct trigrams: "a b a" (and not twice)
    got shouldBe Set((1L, 9L, 1L))
  }

  test("hot grams above maxTrainDocFreq are dropped before the join") {
    // "the lazy dog" appears in train docs 1 and 3 -> df=2; cap at 1
    val te = Seq((50L, "beware the lazy dog today")).toDF("doc_id", "text")
    val capped = Decontaminate.overlapPairs(
      trainDf, "doc_id", te, "doc_id", "text", n = 3, maxTrainDocFreq = 1)
      .collect()
    capped shouldBe empty
    val uncapped = Decontaminate.overlapPairs(
      trainDf, "doc_id", te, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    uncapped shouldBe Set((1L, 50L, 1L), (3L, 50L, 1L))
  }

  test("contaminatedIds flags test docs sharing any rare gram") {
    val got = Decontaminate.contaminatedIds(
      trainDf, "doc_id", testDf, "doc_id", "text", n = 3)
      .collect().map(_.getLong(0)).toSet
    got shouldBe Set(100L, 102L)
    // minShared=3 keeps only the heavy overlap
    val strict = Decontaminate.contaminatedIds(
      trainDf, "doc_id", testDf, "doc_id", "text", n = 3, minShared = 3L)
      .collect().map(_.getLong(0)).toSet
    strict shouldBe Set(102L)
  }

  test("overlapPairs matches a brute-force reference on random corpora") {
    val words = Seq("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val rng = new scala.util.Random(29)
    def doc(): String =
      Seq.fill(4 + rng.nextInt(8))(words(rng.nextInt(words.size))).mkString(" ")
    for (_ <- 1 to 3) {
      val train = (0L until 12L).map(i => (i, doc()))
      val test = (100L until 108L).map(i => (i, doc()))
      val n = 2
      val got = Decontaminate.overlapPairs(
        train.toDF("doc_id", "text"), "doc_id",
        test.toDF("doc_id", "text"), "doc_id",
        "text", n, maxTrainDocFreq = 4)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

      def grams(s: String): Set[String] =
        s.split(" ").sliding(n).filter(_.size == n).map(_.mkString(" ")).toSet
      val trainGrams = train.map { case (id, t) => id -> grams(t) }
      val df = trainGrams.flatMap(_._2).groupBy(identity).view
        .mapValues(_.size).toMap
      val rare = df.filter(_._2 <= 4).keySet
      val expect = (for {
        (trId, tg) <- trainGrams
        (teId, te) <- test.map { case (id, t) => id -> grams(t) }
        shared = tg.intersect(te).intersect(rare)
        if shared.nonEmpty
      } yield (trId, teId) -> shared.size.toLong).toMap
      got shouldBe expect
    }
  }

  test("explode happens on distinct grams (no per-occurrence rows)") {
    val tr = Seq((1L, "a b a b a b a b")).toDF("doc_id", "text")
    Decontaminate.docNgrams(tr, "doc_id", "text", 2).count() shouldBe 2L
  }

  test("dropContaminatedTrain removes exactly the leaking train docs") {
    val got = Decontaminate.dropContaminatedTrain(
      trainDf, "doc_id", testDf, "doc_id", "text", n = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // train 1 and 3 share "quick brown fox" with test 100; train 2
    // shares its trigrams with test 102 — nothing survives here...
    got shouldBe Set.empty[Long]
    // ...but with n = 4 train 3 survives ("the quick brown fox" ≠
    // "a quick brown fox"); train 1 still leaks via "quick brown fox
    // jumps" and train 2 is contained in test 102
    val got4 = Decontaminate.dropContaminatedTrain(
      trainDf, "doc_id", testDf, "doc_id", "text", n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    got4 shouldBe Set(3L)
  }

  test("bloom path equals the exact no-bloom semi-join on random corpora") {
    val rng = new scala.util.Random(11)
    val words = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    def doc() = Seq.fill(8 + rng.nextInt(8))(words(rng.nextInt(words.size)))
      .mkString(" ")
    val train = (0L until 60L).map(i => (i, doc())).toDF("doc_id", "text")
    val test = (100L until 110L).map(i => (i, doc())).toDF("doc_id", "text")
    val viaBloom = Decontaminate.dropContaminatedTrain(
      train, "doc_id", test, "doc_id", "text", n = 3, maxTrainDocFreq = 20L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // exact reference: train docs sharing >= 1 train-rare gram with test
    val tr = Decontaminate.docNgrams(train, "doc_id", "text", 3)
    val rare = tr.groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 20L).select("gram")
    val teGrams = Decontaminate.docNgrams(test, "doc_id", "text", 3)
      .select("gram").distinct()
    val leaking = tr.join(rare, Seq("gram")).join(teGrams, Seq("gram"), "left_semi")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    viaBloom shouldBe ((0L until 60L).toSet -- leaking)
  }

  test("dropContaminatedTrain honors the train-side doc-frequency cap") {
    // "x y z" is in every train doc (df = 3 > cap 2) and in the eval
    // set — capped away, so nothing is removed
    val tr = Seq((1L, "x y z a"), (2L, "x y z b"), (3L, "x y z c"))
      .toDF("doc_id", "text")
    val te = Seq((9L, "x y z q")).toDF("doc_id", "text")
    Decontaminate.dropContaminatedTrain(
      tr, "doc_id", te, "doc_id", "text", n = 3, maxTrainDocFreq = 2L)
      .count() shouldBe 3L
  }
}
