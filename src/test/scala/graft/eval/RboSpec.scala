package graft.eval

import graft.SparkSpec

class RboSpec extends SparkSpec {
  import spark.implicits._

  private def rank(rows: (Long, Long, Long)*) =
    rows.toDF("q", "item", "rank")

  private def run(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame, depth: Int) =
    RetrievalMetrics.rboQ20(a, b, "q", "item", "rank", depth)
      .orderBy("query").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("identical rankings score 1 - 2^-depth in Q20") {
    val a = rank((1 to 10).map(i => (7L, i.toLong, i.toLong)): _*)
    run(a, a, 10) shouldBe Array((7L, 10L, (1L << 20) - (1L << 10)))
  }

  test("disjoint rankings score 0; queries from either side appear") {
    val a = rank((1L, 1L, 1L), (1L, 2L, 2L))
    val b = rank((1L, 3L, 1L), (1L, 4L, 2L), (9L, 5L, 1L))
    run(a, b, 2) shouldBe Array((1L, 0L, 0L), (9L, 0L, 0L))
  }

  test("single common head item: closed-form terms") {
    // m = 1 -> terms (2^20 div 2) + (2^20 div (2*4)) = 524288 + 131072
    val a = rank((1L, 10L, 1L), (1L, 11L, 2L))
    val b = rank((1L, 10L, 1L), (1L, 12L, 2L))
    run(a, b, 2) shouldBe Array((1L, 1L, 655360L))
  }

  test("symmetric in its arguments") {
    val a = rank((1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L))
    val b = rank((1L, 2L, 1L), (1L, 4L, 2L), (1L, 1L, 3L))
    run(a, b, 3) shouldBe run(b, a, 3)
  }

  test("ranks beyond depth are ignored") {
    val a = rank((1L, 1L, 1L), (1L, 2L, 5L))
    val b = rank((1L, 1L, 1L), (1L, 2L, 2L))
    // only item 1 is inside depth 2 on both sides
    run(a, b, 2) shouldBe Array((1L, 1L, 655360L))
  }
}
