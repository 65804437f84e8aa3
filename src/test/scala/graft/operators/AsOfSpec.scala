package graft.operators

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import sqlImplicits._

  private val left = Seq(
    (1L, 10L, "l-a"), // matches right at ts 5
    (1L, 20L, "l-b"), // matches right at ts 20 (ts-equal)
    (1L, 3L, "l-c"), // before any right row -> null
    (2L, 50L, "l-d"), // matches right at ts 40
    (3L, 7L, "l-e")) // key with no right rows -> null
    .toDF("k", "ts", "lv")

  private val right = Seq(
    (1L, 5L, 0.5),
    (1L, 20L, 2.0),
    (1L, 30L, 3.0), // after every left row
    (2L, 40L, 4.0))
    .toDF("k", "ts", "rv")

  test("as-of join matches the latest right row at or before each left ts") {
    val got = AsOf.joinAsOf(left, right, Seq("k"), "ts")
      .orderBy("k", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(r.fieldIndex("rv"))).map(_.asInstanceOf[Double]),
        Option(r.get(r.fieldIndex("ts_right"))).map(_.asInstanceOf[Long])))
    got.toSeq shouldBe Seq(
      (1L, 3L, "l-c", None, None),
      (1L, 10L, "l-a", Some(0.5), Some(5L)),
      (1L, 20L, "l-b", Some(2.0), Some(20L)),
      (2L, 50L, "l-d", Some(4.0), Some(40L)),
      (3L, 7L, "l-e", None, None))
  }

  test("as-of join output schema: left columns, right payload, right ts") {
    val out = AsOf.joinAsOf(left, right, Seq("k"), "ts")
    out.schema.fieldNames.toSeq shouldBe Seq("k", "ts", "lv", "rv", "ts_right")
  }

  test("as-of join is partition-count independent") {
    val got = AsOf.joinAsOf(left.repartition(7), right.repartition(3), Seq("k"), "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    got.length shouldBe 5
  }
}
