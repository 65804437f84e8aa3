package graft.dedup

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import sqlImplicits._

  test("exact dedup keeps the smallest id per normalized text") {
    val df = Seq(
      (1L, "Hello World"),
      (2L, "hello   world"), // same after normalization
      (3L, "hello world"),
      (4L, "something else")).toDF("doc_id", "text")
    val got = Dedup.exactDedup(df, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    got shouldBe Seq(1L, 4L)
  }

  test("exact dedup without normalization distinguishes case variants") {
    val df = Seq((1L, "Hello"), (2L, "hello")).toDF("doc_id", "text")
    Dedup.exactDedup(df, "text", "doc_id", normalizeText = false).count() shouldBe 2
  }

  test("min_by exact dedup equals the windowed form and plans as an aggregate") {
    val rng = new Random(5)
    val rows = (1L to 200L).map { i =>
      (i, s"text ${rng.nextInt(40)}", s"s${i % 3}")
    }
    val df = rows.toDF("doc_id", "text", "source").repartition(6)
    val viaAgg = Dedup.exactDedup(df, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    val viaWindow = Dedup.exactDedupWindowed(df, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    viaAgg.toSeq shouldBe viaWindow.toSeq
    val plan = Dedup.exactDedup(df, "text", "doc_id")
      .queryExecution.executedPlan.toString
    plan should not include "Window"
  }

  test("word shingles") {
    val df = Seq("a b c d", "x y", "tiny").toDF("text")
    val got = df.select(Dedup.shingles(col("text"), 3)).collect().map(_.getSeq[String](0))
    got(0) shouldBe Seq("a b c", "b c d")
    got(1) shouldBe Seq.empty // shorter than n
    got(2) shouldBe Seq.empty
  }

  test("identical shingle sets produce identical minhash signatures") {
    val df = Seq("a b c d e", "a b c d e").toDF("text")
    val sigs = df
      .select(Dedup.minhashSignature(Dedup.shingles(col("text"), 2), 32).as("sig"))
      .collect().map(_.getSeq[Long](0))
    sigs(0) shouldBe sigs(1)
  }

  test("minhash signature agreement tracks jaccard similarity") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val similar = (1 to 38).map(i => s"w$i").mkString(" ") + " x1 x2"
    val different = (100 to 140).map(i => s"w$i").mkString(" ")
    val df = Seq(base, similar, different).toDF("text")
    val sigs = df
      .select(Dedup.minhashSignature(Dedup.shingles(col("text"), 2), 64).as("sig"))
      .collect().map(_.getSeq[Long](0))
    def agreement(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.size
    agreement(sigs(0), sigs(1)) should be > 0.5
    agreement(sigs(0), sigs(2)) should be < 0.2
  }

  test("minhash-lsh finds planted near-duplicates and skips unrelated docs") {
    val rng = new Random(7)
    def randomDoc() = (1 to 60).map(_ => s"tok${rng.nextInt(5000)}").mkString(" ")
    val longDoc = (1 to 60).map(i => s"stable$i").mkString(" ")
    val nearDup = (1 to 60).map(i => if (i == 30) "CHANGED" else s"stable$i").mkString(" ")
    val docs =
      (1L to 20L).map(i => (i, randomDoc())) ++
        Seq((1001L, longDoc), (1002L, nearDup), (1003L, longDoc))
    val df = docs.toDF("doc_id", "text")
    val pairs = Dedup.nearDuplicates(df, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    pairSet should contain((1001L, 1002L))
    pairSet should contain((1001L, 1003L))
    pairSet should contain((1002L, 1003L))
    // exact duplicate pair has jaccard 1.0
    pairs.find(p => p._1 == 1001L && p._2 == 1003L).get._3 shouldBe 1.0
    // no random doc should pair with the planted cluster
    pairs.map(p => Set(p._1, p._2)).foreach { s =>
      s.forall(_ >= 1001L) shouldBe true
    }
  }

  test("nearDuplicatesPlanned equals nearDuplicates at the planner's " +
    "derived banding") {
    val rng = new Random(13)
    def randomDoc() = (1 to 40).map(_ => s"tok${rng.nextInt(300)}").mkString(" ")
    val docs = (1L to 40L).map(i => (i, randomDoc())) ++
      Seq((900L, "planted stable text here"), (901L, "planted stable text here"))
    val df = docs.toDF("doc_id", "text")
    val (plannedBands, _) =
      LshPlan.planRecallBounded(64, 0.9)
    plannedBands shouldBe 16
    def collectPairs(p: org.apache.spark.sql.DataFrame) =
      p.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val planned = collectPairs(Dedup.nearDuplicatesPlanned(
      df, "doc_id", "text", threshold = 0.9, shingleSize = 1))
    val tuned = collectPairs(Dedup.nearDuplicates(
      df, "doc_id", "text", shingleSize = 1, numHashes = 64,
      bands = plannedBands, threshold = 0.9))
    planned shouldBe tuned
    planned.map(p => (p._1, p._2)) should contain((900L, 901L))
  }

  test("jaccard column expression") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    df.select(Dedup.jaccard(col("x"), col("y"))).collect().head.getDouble(0) shouldBe 0.5
    val empty = Seq((Seq.empty[String], Seq.empty[String])).toDF("x", "y")
    empty.select(Dedup.jaccard(col("x"), col("y"))).collect().head.getDouble(0) shouldBe 1.0
  }

  test("set-based near-dup over winnowing fingerprints finds shared-passage docs") {
    val rng = new Random(31)
    def rand(n: Int) = (1 to n).map(_ => s"w${rng.nextInt(50000)}").mkString(" ")
    val passage = (1 to 60).map(i => s"common$i").mkString(" ")
    // two docs sharing a long passage, unrelated tails; pure-noise others
    val docs = Seq(
      (1L, passage + " " + rand(10)),
      (2L, rand(10) + " " + passage)) ++
      (10L to 20L).map(i => (i, rand(70)))
    val df = docs.toDF("doc_id", "text")
      .withColumn("fps", graft.text.TextStats.winnowingFingerprints(col("text")))
    val pairs = Dedup.nearDuplicatesBySets(
      df, "doc_id", "fps", numHashes = 64, bands = 32, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((1L, 2L))
    pairs.foreach { case (a, b) => Set(a, b) shouldBe Set(1L, 2L) }
  }

  test("jaccard_distinct handles long arrays identically to the composed form") {
    val df = Seq(
      (Seq(Some(1L), Some(2L), Some(3L)), Seq(Some(2L), Some(3L), Some(4L))),
      (Seq.empty[Option[Long]], Seq.empty[Option[Long]]),
      // null slots count as one distinct element, like the builtins
      (Seq(Some(1L), None), Seq[Option[Long]](None)),
      (Seq(Some(7L)), Seq(Some(7L)))).toDF("x", "y")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val got = df.select(
        graft.functions.JaccardDistinct.jaccardDistinct(col("x"), col("y")).as("native"),
        Dedup.jaccard(col("x"), col("y")).as("composed")).collect()
      got.foreach { r => r.getDouble(0) shouldBe r.getDouble(1) }
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("native jaccard_distinct is bit-identical to the composed form (incl. forced codegen)") {
    val rng = new Random(23)
    val rows = (1 to 200).map { _ =>
      def arr() = Seq.fill(rng.nextInt(30))(s"t${rng.nextInt(40)}").distinct
      (arr(), arr())
    } ++ Seq(
      (Seq.empty[String], Seq.empty[String]), // empty/empty -> 1.0
      (Seq("a"), Seq.empty[String]),          // one side empty -> 0.0
      (Seq("a", "b"), Seq("a", "b")))         // identical -> 1.0
    val df = rows.toDF("x", "y").repartition(4)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val got = df.select(
        graft.functions.JaccardDistinct.jaccardDistinct(col("x"), col("y")).as("native"),
        Dedup.jaccard(col("x"), col("y")).as("composed")).collect()
      got.foreach { r => r.getDouble(0) shouldBe r.getDouble(1) }
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("simhash: identical texts collide, near texts are close, unrelated far") {
    val base = (1 to 50).map(i => s"word$i").mkString(" ")
    val near = (1 to 50).map(i => if (i == 25) "flip" else s"word$i").mkString(" ")
    val far = (100 to 150).map(i => s"other$i").mkString(" ")
    val df = Seq((1L, base), (2L, base), (3L, near), (4L, far)).toDF("id", "text")
    val fps = Dedup.withSimhash(df, "text", "fp")
      .orderBy("id").collect().map(_.getAs[Long]("fp"))
    fps(0) shouldBe fps(1)
    java.lang.Long.bitCount(fps(0) ^ fps(2)) should be < 16
    java.lang.Long.bitCount(fps(0) ^ fps(3)) should be > 16
  }

  test("simhash near-duplicate pipeline finds the planted pair") {
    val base = (1 to 80).map(i => s"word$i").mkString(" ")
    val near = (1 to 80).map(i => if (i == 40) "flip" else s"word$i").mkString(" ")
    val rng = new Random(11)
    val noise = (1L to 10L).map(i =>
      (i, (1 to 80).map(_ => s"n${rng.nextInt(100000)}").mkString(" ")))
    val df = (noise ++ Seq((100L, base), (101L, near))).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDuplicates(df, "doc_id", "text", maxDistance = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs should contain((100L, 101L))
  }

  test("native minhash fold is bit-identical to the composed form") {
    val df = Seq(
      (1 to 40).map(i => s"w$i").mkString(" "),
      "short text",
      "x").toDF("text")
    val rows = df.select(
      Dedup.minhashSignature(Dedup.shingles(col("text"), 2), 64).as("native"),
      Dedup.minhashSignatureComposed(Dedup.shingles(col("text"), 2), 64).as("composed"))
      .collect()
    rows.foreach { r =>
      r.getSeq[Long](0) shouldBe r.getSeq[Long](1)
    }
  }

  test("native simhash64 expression equals the composed SQL-lambda form") {
    val texts = Seq(
      (1 to 50).map(i => s"word$i").mkString(" "),
      "single",
      "a b c a b c")
    val df = texts.toDF("text")
      .withColumn("__hashes",
        transform(split(graft.text.TextStats.normalize(col("text")), " "),
          t => xxhash64(t)))
    val rows = df.select(
      graft.functions.functions.simhash64(col("__hashes")).as("native"),
      Dedup.simhashFromHashes("__hashes").as("composed")).collect()
    rows.foreach { r => r.getLong(0) shouldBe r.getLong(1) }
  }

  test("simhash64 is callable from SQL after registration") {
    graft.functions.GraftFunctions.register(spark)
    Seq(Seq(5L, 6L)).toDF("hashes").createOrReplaceTempView("hashes_t")
    val viaSql = spark.sql("SELECT simhash64(hashes) FROM hashes_t")
      .collect().head.getLong(0)
    val viaDsl = Seq(Seq(5L, 6L)).toDF("hashes")
      .select(graft.functions.functions.simhash64(col("hashes")))
      .collect().head.getLong(0)
    viaSql shouldBe viaDsl
  }

  test("native expressions compile under forced codegen (no interpreted fallback)") {
    // With fallback enabled Spark silently reverts to interpreted eval when
    // Janino rejects generated code — which once hid a bad FQCN in
    // MinHashFold's doGenCode. Forcing fallback off makes compile failures
    // fail the query, pinning the codegen path itself.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = (1 to 100).map(i => Seq(i.toLong, (i * 7).toLong)).toDF("hashes")
      val rows = df.select(
        graft.functions.MinHashFold.minhashFold(col("hashes"), 16).as("sig"),
        graft.functions.functions.simhash64(col("hashes")).as("sh"))
        .collect()
      rows.length shouldBe 100
      rows.head.getSeq[Long](0).length shouldBe 16
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("materialize=false keeps the plan lazy with no hidden caching") {
    val df = Seq((1L, "same text here now"), (2L, "same text here now"))
      .toDF("doc_id", "text")
    // Leftover blocks from earlier tests may be reclaimed concurrently by
    // the ContextCleaner, so total counts are racy: assert instead that
    // this call *adds* no persistent RDDs (cleaner only ever removes).
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val pairs = Dedup.nearDuplicates(df, "doc_id", "text",
      shingleSize = 1, threshold = 0.9, materialize = false)
    (spark.sparkContext.getPersistentRDDs.keySet -- before) shouldBe empty
    pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe Seq((1L, 2L))
    (spark.sparkContext.getPersistentRDDs.keySet -- before) shouldBe empty
  }

  test("candidatePairs drops oversized buckets before pairing (bounded memory)") {
    // one hot bucket with 50 members (> maxBucketSize) and one normal
    // bucket: only the normal bucket's pair may come out, and the hot
    // bucket never materializes past cap+1 elements in the aggregation
    // buffer (CappedCollectList evaluates it to null).
    val hot = (1L to 50L).map(id => (0, 111L, id))
    val normal = Seq((0, 222L, 100L), (0, 222L, 101L))
    val buckets = (hot ++ normal).toDF("band", "bucket", "doc_id").repartition(5)
    val pairs = Dedup.candidatePairs(buckets, "doc_id", maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs shouldBe Set((100L, 101L))
  }

  test("simhash near-dup from precomputed fingerprints (single-sided bucket shape)") {
    // fingerprints two bit-flips apart share 2 of 4 chunks → candidates;
    // a far fingerprint shares none.
    val near1 = 0x0F0F0F0F0F0F0F0FL
    val near2 = near1 ^ 3L // flips two low bits, chunk 0 only
    val far = 0xF0F0A5A5C3C3E7E7L
    val df = Seq((1L, near1), (2L, near2), (3L, far)).toDF("doc_id", "fp")
    val pairs = Dedup.simhashNearDuplicatesFromFingerprints(
      df, "doc_id", "fp", maxDistance = 3, chunks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    pairs.toSeq shouldBe Seq((1L, 2L, 2))
  }

  test("simhash near-dup drops degenerate buckets via maxBucketSize") {
    // 40 identical fingerprints share every chunk; with the cap below 40
    // they generate no pairs, while a small distinct cluster still does.
    val degenerate = (1L to 40L).map(i => (i, 0x1234567890ABCDEFL))
    val planted = Seq((100L, 0x7777L), (101L, 0x7777L ^ 1L))
    val df = (degenerate ++ planted).toDF("doc_id", "fp")
    val pairs = Dedup.simhashNearDuplicatesFromFingerprints(
      df, "doc_id", "fp", maxDistance = 3, chunks = 4, maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs shouldBe Set((100L, 101L))
  }

  test("hamming distance expression") {
    val df = Seq((5L, 6L)).toDF("a", "b") // 101 ^ 110 = 011
    df.select(Dedup.hammingDistance(col("a"), col("b"))).collect().head.getInt(0) shouldBe 2
  }

  test("edit-distance near-dup finds typo-level copies and reports exact edits") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq(
      (1L, base),
      (2L, base.replace("quick", "quikc")), // 2 edits (transposition = 2 subs)
      (3L, "a completely different document about spark physical plans"))
      .toDF("doc_id", "text")
    val pairs = Dedup.editDistanceNearDuplicates(
      df, "doc_id", "text", maxEdits = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    pairs.toSeq shouldBe Seq((1L, 2L, 2))
  }

  test("edit-distance verify kills fingerprint candidates past the bound") {
    // same token multiset → identical SimHash (hamming 0, a candidate),
    // but the reordering costs many character edits
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "zeta epsilon delta gamma beta alpha"))
      .toDF("doc_id", "text")
    Dedup.editDistanceNearDuplicates(df, "doc_id", "text", maxEdits = 3)
      .count() shouldBe 0L
    // generous bound: the same pair passes, proving it WAS a candidate
    Dedup.editDistanceNearDuplicates(df, "doc_id", "text", maxEdits = 40)
      .count() shouldBe 1L
  }

  test("edit-distance near-dup requires a pigeonhole-complete band config") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy {
      Dedup.editDistanceNearDuplicates(
        df, "doc_id", "text", maxEdits = 3, maxDistance = 8, chunks = 8)
    }
  }

  test("dedupToWeights: one representative per cluster, weight = size") {
    // cluster {1,2,3} (identical text), cluster {10,11} (identical),
    // singletons 20 and 21
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the lazy dog"),
      (10L, "pack my box with five dozen liquor jugs today"),
      (11L, "pack my box with five dozen liquor jugs today"),
      (20L, "how vexingly quick daft zebras jump around here"),
      (21L, "completely unrelated sentence about data engines"))
      .toDF("doc_id", "text")
    val got = Dedup.dedupToWeights(df, "doc_id", "text",
        shingleSize = 3, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 3L, 10L -> 2L, 20L -> 1L, 21L -> 1L)
    // weights conserve the corpus mass
    got.values.sum shouldBe 7L
  }

  test("dedupToWeights: caller id column literally named 'id' works") {
    // the components table also carries an "id" column — the join must
    // stay unambiguous (aliased internally), not AnalysisException
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (9L, "completely unrelated sentence about data engines"))
      .toDF("id", "text")
    val got = Dedup.dedupToWeights(df, "id", "text",
        shingleSize = 3, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 2L, 9L -> 1L)
  }
}
