package graft.operators

import graft.SparkSpec

class JoinAuditSpec extends SparkSpec {
  import sqlImplicits._

  private def left = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"),   // hot key: 3 rows
    (2L, "d"),
    (3L, "e"),                          // left-only
    (4L, "f"), (4L, "g"))
    .toDF("k", "payload")

  private def right = Seq(
    (1L, 10), (1L, 11),                 // 2 rows → key 1 contributes 6
    (2L, 12), (2L, 15),                 // key 2 contributes 2 — ties key 4
    (4L, 13),
    (9L, 14))                           // right-only
    .toDF("k", "r")

  test("summary forecasts the inner join exactly") {
    val s = JoinAudit.summary(left, right, "k", "k").collect().head
    s.getAs[Long]("left_rows") shouldBe 7L
    s.getAs[Long]("right_rows") shouldBe 6L
    s.getAs[Long]("left_keys") shouldBe 4L
    s.getAs[Long]("right_keys") shouldBe 4L
    s.getAs[Long]("matched_keys") shouldBe 3L
    s.getAs[Long]("left_only_keys") shouldBe 1L
    s.getAs[Long]("right_only_keys") shouldBe 1L
    // forecast vs the actual join
    s.getAs[Long]("out_rows") shouldBe left.join(right, "k").count()
    s.getAs[Long]("out_rows") shouldBe 10L // 3·2 + 1·2 + 2·1
    s.getAs[Long]("max_key_out") shouldBe 6L
  }

  test("NULL keys are tallied, never matched") {
    val l = Seq(Some(1L), None, None).toDF("k")
    val r = Seq(Some(1L), None).toDF("k")
    val s = JoinAudit.summary(l, r, "k", "k").collect().head
    s.getAs[Long]("left_null_keys") shouldBe 2L
    s.getAs[Long]("right_null_keys") shouldBe 1L
    s.getAs[Long]("out_rows") shouldBe 1L
    s.getAs[Long]("out_rows") shouldBe l.join(r, "k").count()
  }

  test("hotKeys ranks by contribution with key tie-break") {
    val hot = JoinAudit.hotKeys(left, right, "k", "k", 2).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    hot shouldBe Array((1L, 6L), (2L, 2L)) // keys 2 and 4 tie at 2; smaller key wins
  }

  test("disjoint key sets: zero forecast, everything one-sided") {
    val s = JoinAudit.summary(
      Seq(1L).toDF("k"), Seq(2L).toDF("k"), "k", "k").collect().head
    s.getAs[Long]("out_rows") shouldBe 0L
    s.getAs[Long]("matched_keys") shouldBe 0L
    s.getAs[Long]("max_key_out") shouldBe 0L
  }
}
