package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property-style invariants for the round-9 operators — randomized
  * inputs, one Spark action per property (assertions via aggregates
  * over the whole sample, not per-row actions).
  */
class Round9PropertiesSpec extends SparkSpec {
  import sqlImplicits._

  private val rng = new scala.util.Random(97)
  private val vocab = Vector("kappa", "tau", "omega", "sigma", "phi",
    "chi", "psi", "rho", "xi", "nu")
  private def doc(n: Int): String =
    Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ")

  test("containment: extended copies score exactly 1.0; all values in (0, 1]") {
    // base docs + a strict superset twin (id + 1000) for each
    val base = (0L until 25L).map(i => (i, doc(6 + rng.nextInt(6))))
    val twins = base.map { case (i, t) => (i + 1000L, t + " " + doc(8)) }
    val pairs = graft.dedup.Dedup.containmentNearDuplicates(
      (base ++ twins).toDF("doc_id", "text"), "doc_id", "text",
      shingleSize = 3, threshold = 0.01, maxDocFreq = 1000L)
    val bad = pairs.filter(col("containment") <= 0.0 ||
      col("containment") > 1.0).count()
    bad shouldBe 0L
    // every (i, i+1000) twin pair present at containment 1.0 — the
    // base doc's shingles are a subset of its twin's
    val perfect = pairs
      .filter(col("id_b") === col("id_a") + 1000L &&
        col("containment") === 1.0)
      .count()
    perfect shouldBe base.size.toLong
  }

  test("encoding: injected artifacts are counted exactly; clean text is clean") {
    val rows = (0L until 60L).map { i =>
      val clean = doc(5 + rng.nextInt(10))
      val nMoji = rng.nextInt(3)
      val nRepl = rng.nextInt(3)
      val corrupted = clean +
        ("Ã©" * nMoji) + ("�" * nRepl)
      (i, corrupted, nMoji.toLong, nRepl.toLong)
    }
    val got = graft.text.Encoding.withEncodingQuality(
      rows.toDF("id", "text", "want_moji", "want_repl"), "text")
    got.filter(col("n_mojibake") =!= col("want_moji") ||
      col("n_replacement") =!= col("want_repl") ||
      (col("enc_clean") =!= (col("want_moji") === 0L &&
        col("want_repl") === 0L))).count() shouldBe 0L
  }

  test("shard manifest is invariant under any input order or partitioning") {
    val df = (0L until 400L).map(i => (i, doc(4))).toDF("id", "text")
    val m1 = Sharding.shardManifest(df, "id", 8).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1).toSeq
    val m2 = Sharding.shardManifest(
      df.repartition(13, col("text")).orderBy(desc("id")), "id", 8)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1).toSeq
    m2 shouldBe m1
  }

  test("z-value is a bijection on the masked domain") {
    val pts = for { a <- 0 until 32; b <- 0 until 32 } yield (a.toLong, b.toLong)
    val z = ZOrder.withZValue(pts.toDF("a", "b"), "a", "b", bits = 5)
    val agg = z.agg(
      countDistinct(col("zvalue")).as("d"),
      max(col("zvalue")).as("mx"),
      min(col("zvalue")).as("mn")).head
    agg.getLong(0) shouldBe 1024L // all distinct
    agg.getLong(1) should be < 1024L // < 4^5
    agg.getLong(2) shouldBe 0L
  }

  test("corpus diff conserves totals: group deltas sum to corpus delta") {
    val oldDf = (0L until 200L)
      .map(i => (s"s${rng.nextInt(7)}", doc(3 + rng.nextInt(5))))
      .toDF("source", "text")
    val newDf = (0L until 230L)
      .map(i => (s"s${rng.nextInt(9)}", doc(3 + rng.nextInt(5))))
      .toDF("source", "text")
    val d = graft.text.CorpusDiff.diff(oldDf, newDf, "source", "text")
      .agg(sum("docs_delta").as("dd"), sum("docs_old").as("o"),
        sum("docs_new").as("n")).head
    d.getLong(0) shouldBe (230L - 200L)
    d.getLong(1) shouldBe 200L
    d.getLong(2) shouldBe 230L
  }
}
