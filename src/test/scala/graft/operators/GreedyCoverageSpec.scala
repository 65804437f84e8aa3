package graft.operators

import graft.SparkSpec

class GreedyCoverageSpec extends SparkSpec {
  import sqlImplicits._

  private def run(pairs: Seq[(Long, Long)], k: Int) =
    GreedyCoverage.greedySelect(pairs.toDF("id", "f"), "id", "f", k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("textbook greedy: biggest set first, then max marginal gain") {
    // doc 1: {1,2,3,4}; doc 2: {3,4,5}; doc 3: {5,6}
    val pairs = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 3L), (2L, 4L), (2L, 5L),
      (3L, 5L), (3L, 6L))
    // round 1: doc 1 (gain 4); round 2: doc 3 adds {5,6} (gain 2)
    // beats doc 2 adding {5} (gain 1); round 3: doc 2 gains 0 -> stops
    run(pairs, 5) shouldBe Seq((1L, 1L, 4L, 4L), (2L, 3L, 2L, 6L))
  }

  test("ties break to the smallest id") {
    val pairs = Seq((7L, 1L), (7L, 2L), (4L, 3L), (4L, 4L))
    run(pairs, 2).map(_._2) shouldBe Seq(4L, 7L)
  }

  test("duplicate incidence rows count once") {
    val pairs = Seq((1L, 1L), (1L, 1L), (2L, 2L), (2L, 3L))
    run(pairs, 2) shouldBe Seq((1L, 2L, 2L, 2L), (2L, 1L, 1L, 3L))
  }

  test("layout-independent") {
    val pairs = (0L until 300L).map(i => (i % 17, (i * 7) % 43))
    val a = run(pairs, 6)
    val b = GreedyCoverage.greedySelect(
      pairs.toDF("id", "f").repartition(11), "id", "f", 6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    a shouldBe b
    // gains are non-increasing (submodularity under greedy)
    a.map(_._3) shouldBe a.map(_._3).sorted.reverse
  }

  test("NULL ids or features raise") {
    val df = Seq((Some(1L), Some(2L)), (Some(1L), None)).toDF("id", "f")
    intercept[Exception] {
      GreedyCoverage.greedySelect(df, "id", "f", 1).collect()
    }
  }

  test("non-integer features raise instead of silently casting to NULL") {
    // string topic labels cast to NULL in non-ANSI Spark; a
    // null-then-cast guard would admit them and every round would
    // report bogus gain against features that never anti-join away
    val df = Seq((1L, "topicA"), (2L, "topicB")).toDF("id", "f")
    intercept[Exception] {
      GreedyCoverage.greedySelect(df, "id", "f", 1).collect()
    }
  }
}
