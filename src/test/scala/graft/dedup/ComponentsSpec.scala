package graft.dedup

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import sqlImplicits._

  test("labels every component by its minimum member") {
    // chain 1-2-3, pair 10-11, and an edge order that propagates "uphill"
    val pairs = Seq((2L, 1L), (2L, 3L), (11L, 10L)).toDF("id_a", "id_b")
    val got = Components.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L)
  }

  test("converges on a long path (propagation crosses many hops)") {
    // path 0-1-2-...-9: every node must reach label 0
    val pairs = (0L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Components.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.values.toSet shouldBe Set(0L)
    got.keySet shouldBe (0L to 9L).toSet
  }

  test("maxIter too small for propagation still converges via the star fallback") {
    // was a fail-fast throw before round 8; now the large-star/
    // small-star fallback takes over, so the answer is right either way
    val pairs = (0L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Components.connectedComponents(pairs, "id_a", "id_b",
      maxIter = 2, maxDriverEdges = 0L) // force the distributed loop
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    labels shouldBe (0L to 9L).map(_ -> 0L).toMap
  }

  test("driver union-find and distributed propagation agree on random graphs") {
    val rng = new scala.util.Random(23)
    for (_ <- 1 to 5) {
      val n = 40
      val pairs = Seq.fill(30)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .toDF("id_a", "id_b")
      val fast = Components.connectedComponents(pairs, "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = Components.connectedComponents(pairs, "id_a", "id_b",
        maxDriverEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      fast shouldBe dist
    }
  }

  test("string-typed node ids work on both paths") {
    val pairs = Seq(("b", "a"), ("b", "c"), ("x", "y")).toDF("id_a", "id_b")
    val expect = Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x")
    Components.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap shouldBe expect
    Components.connectedComponents(pairs, "id_a", "id_b", maxDriverEdges = 0L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap shouldBe expect
  }

  test("both paths pick the same label for supplementary-character ids") {
    // Java String (UTF-16) order and Spark's UTF-8 byte order DISAGREE
    // here: "￿" < U+10000 in UTF-8 bytes but > in UTF-16 units —
    // the fast path must use byte order to match min()
    val hi = "￿"
    val astral = new String(Character.toChars(0x10000))
    val pairs = Seq((hi, astral)).toDF("id_a", "id_b")
    def labels(cap: Long) =
      Components.connectedComponents(pairs, "id_a", "id_b", maxDriverEdges = cap)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val fast = labels(1000L)
    val dist = labels(0L)
    fast shouldBe dist
    fast.values.toSet shouldBe Set(hi) // UTF-8 byte order: U+FFFF wins
  }

  test("scans the pair table exactly once (edges are checkpointed)") {
    import org.apache.spark.sql.functions.{col, udf}
    val scans = spark.sparkContext.longAccumulator("pairScans")
    val touch = udf { (_: Long) => scans.add(1L); true }
    // path graph: 10 rounds of propagation — the old shape re-scanned
    // the pair table every round (join + probe), ~20× here
    val pairs = (0L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      .filter(touch(col("id_a")))
    Components.connectedComponents(pairs, "id_a", "id_b").collect()
    // 9 pairs × two symmetrize arms, materialized once
    scans.value shouldBe 18L
  }

  test("keepCanonical keeps one row per cluster plus all singletons") {
    val docs = (0L until 8L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    // clusters {0,1,2} and {5,6}; 3, 4, 7 untouched
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = Components.keepCanonical(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    kept shouldBe Set(0L, 3L, 4L, 5L, 7L)
  }

  test("empty pair table keeps everything") {
    val docs = (0L until 3L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    Components.keepCanonical(docs, "doc_id", pairs).count() shouldBe 3L
  }

  test("path graph of diameter > 50 past maxIter falls back to large-star/small-star") {
    // diameter-60 chain, driver path disabled, maxIter far below the
    // diameter: propagation cannot converge, so the Kiveris et al.
    // fallback must take over and still label every node with the
    // component minimum in O(log n) rounds
    val n = 60L
    val pairs = (0L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Components.connectedComponents(
      pairs, "id_a", "id_b", maxIter = 3, maxDriverEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    labels.keySet shouldBe (0L to n).toSet
    labels.values.toSet shouldBe Set(0L)
  }

  test("large-star/small-star equals union-find on random graphs") {
    import org.apache.spark.sql.functions.col
    val rng = new scala.util.Random(123)
    for (_ <- 1 to 3) {
      val edges = Seq.fill(60)((rng.nextLong(40), rng.nextLong(40)))
        .filter { case (a, b) => a != b }
      val pairs = edges.toDF("id_a", "id_b")
      val fast = Components.connectedComponents(pairs, "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val sym = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
        .union(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      val stars = Components.largeStarSmallStar(sym)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      stars shouldBe fast
    }
  }

  test("sizeHistogram: sizes, cluster counts and doc totals") {
    // clusters: {1,2,3} size 3, {4,5} size 2, {6} and {7} singletons
    val labeled = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L,
      6L -> 6L, 7L -> 7L).toDF("id", "component")
    val hist = Components.sizeHistogram(labeled, "component")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    hist shouldBe Map(1L -> ((2L, 2L)), 2L -> ((1L, 2L)), 3L -> ((1L, 3L)))
    // dedup accounting reads straight off the report
    hist.values.map(_._2).sum shouldBe 7L              // corpus size
    hist.map { case (s, (c, _)) => (s - 1) * c }.sum shouldBe 3L // removable
  }

  test("keepBest keeps the highest-score member per cluster (ties -> min id)") {
    // clusters: {1,2,3} (chain), {5,6}; 9 is a singleton
    val pairs = Seq(1L -> 2L, 2L -> 3L, 5L -> 6L).toDF("id_a", "id_b")
    val docs = Seq(
      (1L, 10L), (2L, 30L), (3L, 30L), // tie at 30 -> id 2 wins
      (5L, 7L), (6L, 4L),
      (9L, 1L)).toDF("doc_id", "score")
    val got = Components.keepBest(docs, "doc_id", "score", pairs)
      .orderBy("component")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.toSeq shouldBe Seq((1L, 2L, 30L), (5L, 5L, 7L), (9L, 9L, 1L))
  }

  test("keepBest equals keepCanonical when score is the negated id") {
    val rng = new scala.util.Random(17)
    val edges = Seq.fill(40)((rng.nextLong(30), rng.nextLong(30)))
      .filter { case (a, b) => a != b }
    val pairs = edges.toDF("id_a", "id_b")
    val docs = (0L until 30L).map(i => (i, -i)).toDF("doc_id", "score")
    val best = Components.keepBest(docs, "doc_id", "score", pairs)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val canonical = Components.keepCanonical(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    best.toSeq shouldBe canonical.toSeq
  }
}
