package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property-style invariants for the later round-9 operators
  * (q119–q131) — randomized inputs, assertions via aggregates.
  */
class Round9cPropertiesSpec extends SparkSpec {
  import sqlImplicits._

  private val rng = new scala.util.Random(131)

  test("rrf: fusing k lists equals summing the k single-list fusions") {
    val lists = (1 to 3).map { l =>
      (1 to 60).map { i =>
        (s"q${i % 4}", s"d${rng.nextInt(25)}", rng.nextInt(40) + 1)
      }.distinct.toDF("q", "d", "r")
    }
    val together = graft.eval.Fusion.rrfFuse(lists, "q", "d", "r")
      .select(col("query"), col("item"), col("rrf_q"))
    val apart = lists.map(l =>
        graft.eval.Fusion.rrfFuse(Seq(l), "q", "d", "r")
          .select(col("query"), col("item"), col("rrf_q")))
      .reduce(_ unionByName _)
      .groupBy(col("query"), col("item"))
      .agg(sum(col("rrf_q")).as("rrf_q"))
    together.except(apart).count() shouldBe 0L
    apart.except(together).count() shouldBe 0L
  }

  test("pagerank: every rank >= base share; total mass never exceeds |V|·scale") {
    val edges = (1 to 300).map(_ =>
      (s"v${rng.nextInt(40)}", s"v${rng.nextInt(40)}")).toDF("src", "dst")
    val r = graft.graph.PageRank.ranks(edges, "src", "dst", iterations = 4)
    val agg = r.agg(min(col("rank")), sum(col("rank")),
      count(lit(1))).head()
    val (mn, total, nv) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    mn should be >= 150000000L // ⌊15·scale/100⌋
    total should be <= nv * 1000000000L
  }

  test("negative sampling: each rank's rotation is a bijection on items") {
    val df = (1L to 70L).map(i => (i, s"l${i % 6}")).toDF("id", "lab")
    val negs = NegativeSampling.ringNegatives(df, "id", "lab", k = 3)
    val perRank = negs.groupBy(col("neg_rank"))
      .agg(countDistinct(col("neg_id")).as("d"), count(lit(1)).as("n"))
      .collect()
    perRank.length shouldBe 3
    perRank.foreach { r =>
      r.getLong(1) shouldBe 70L // every anchor appears once per rank
      r.getLong(2) shouldBe 70L // ... and every item serves exactly once
    }
  }

  test("batching: batch sizes partition the input; only last batch short") {
    val bounds = Seq(50L, 120L, 400L)
    val df = (1L to 333L).map(i => (i, rng.nextInt(400).toLong + 1L))
      .toDF("id", "len")
    val got = Batching.lengthBucketedBatches(df, "id", "len", bounds, 16)
    got.count() shouldBe 333L
    val sizes = got.groupBy(col("bucket_bound"), col("batch_idx"))
      .agg(count(lit(1)).as("sz"), max(col("batch_idx")).as("bi"))
    // within each bucket every batch except the highest index is full
    val partialNonLast = sizes.as("s")
      .join(sizes.groupBy(col("bucket_bound").as("bb"))
        .agg(max(col("batch_idx")).as("last_bi")),
        col("bucket_bound") === col("bb"))
      .filter(col("sz") < 16 && col("batch_idx") =!= col("last_bi"))
      .count()
    partialNonLast shouldBe 0L
  }

  test("moments: three-way split merge equals the whole-corpus sketch") {
    val data = (1 to 150).map(i =>
      (s"g${i % 4}", rng.nextDouble() * 200 - 100))
    val df = data.toDF("g", "v")
    val parts = Seq(
      df.filter(abs(hash(col("v"))) % 3 === 0),
      df.filter(abs(hash(col("v"))) % 3 === 1),
      df.filter(abs(hash(col("v"))) % 3 === 2))
    val merged = parts.map(p =>
        graft.sketch.Moments.sketch(p, "g", "v", decimals = 2))
      .reduce(graft.sketch.Moments.mergeSketches)
    val whole = graft.sketch.Moments.sketch(df, "g", "v", decimals = 2)
    merged.except(whole).count() shouldBe 0L
    whole.except(merged).count() shouldBe 0L
  }

  test("decay: advancing in steps equals advancing once (shift composition)") {
    val df = (1 to 120).map(i =>
      (s"g${i % 5}", rng.nextInt(30).toLong)).toDF("g", "age")
    val sk = graft.sketch.Decay.halfLifeCounts(df, "g", "age")
    val once = graft.sketch.Decay.advance(sk, 7)
    val steps = graft.sketch.Decay.advance(
      graft.sketch.Decay.advance(sk, 3), 4)
    once.collect().toSet shouldBe steps.collect().toSet
  }

  test("percentile: bounded to [0,1] and monotone in the value per group") {
    val df = (1 to 200).map(i =>
      (s"g${i % 3}", rng.nextInt(40).toLong)).toDF("g", "v")
    val got = graft.sketch.Quantiles.withGroupPercentile(df, Seq("g"), "v")
    got.filter(col("pct") < 0.0 || col("pct") > 1.0).count() shouldBe 0L
    // monotone: join distinct (g, v, pct) against itself on g, v order
    val p = got.select(col("g"), col("v"), col("pct")).distinct()
    val viol = p.as("a").join(p.as("b"),
        col("a.g") === col("b.g") && col("a.v") < col("b.v") &&
          col("a.pct") >= col("b.pct"))
      .count()
    viol shouldBe 0L
  }
}
