package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZoneMapSpec extends SparkSpec {
  import sqlImplicits._

  // 4 zones × 10 rows: zone z holds a in [10z, 10z+9], b = a % 4
  private def rows = (0L until 40L)
    .map(i => (i / 10L, i, i % 4L)).toDF("zone", "a", "b")

  private def workload = Seq(
    (1L, Some(5L), Some(14L), None: Option[Long], None: Option[Long]),
    (2L, None: Option[Long], None: Option[Long], Some(2L), Some(2L)),
    (3L, Some(100L), Some(200L), None: Option[Long], None: Option[Long]))
    .toDF("query_id", "a_lo", "a_hi", "b_lo", "b_hi")

  test("stats: exact per-zone bounds") {
    val s = ZoneMap.zoneStats(rows, "zone", "a", "b").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    s(0L) shouldBe ((10L, 0L, 9L, 0L, 3L))
    s(3L) shouldBe ((10L, 30L, 39L, 0L, 3L))
  }

  test("audit: range pruning, unbounded sides, empty intersection") {
    val audit = ZoneMap.scanAudit(
      ZoneMap.zoneStats(rows, "zone", "a", "b"), workload)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // a in [5,14] touches zones 0 and 1 only
    audit(1L) shouldBe ((2L, 4L, 20L, 40L))
    // b in [2,2]: every zone spans b 0..3 → no pruning
    audit(2L) shouldBe ((4L, 4L, 40L, 40L))
    // a in [100,200]: beyond all zones → full skip
    audit(3L) shouldBe ((0L, 4L, 0L, 40L))
  }

  test("zone with NULL stats is conservatively scanned") {
    val withNulls = Seq(
      (0L, Some(1L), Some(1L)),
      (9L, None: Option[Long], Some(1L))).toDF("zone", "a", "b")
    val audit = ZoneMap.scanAudit(
      ZoneMap.zoneStats(withNulls, "zone", "a", "b"),
      Seq((1L, Some(100L), Some(200L), None: Option[Long], None: Option[Long]))
        .toDF("query_id", "a_lo", "a_hi", "b_lo", "b_hi"))
      .collect().head
    // zone 0 prunes (a=1 outside [100,200]); zone 9 has no a stats → scan
    audit.getLong(1) shouldBe 1L
    audit.getLong(2) shouldBe 2L
  }

  test("audit agrees with a row-level count (zone-level is an upper bound)") {
    val stats = ZoneMap.zoneStats(rows, "zone", "a", "b")
    val audit = ZoneMap.scanAudit(stats, workload).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // rows actually matching q1: a in [5,14] → 10 rows ≤ rows_scanned 20
    rows.filter(col("a").between(5, 14)).count() should be <= audit(1L)
  }

  test("z-order layout prunes the second dimension; linear layout cannot") {
    // a = row id, b = reversed-ish second key; 64 rows, 8 zones of 8
    val data = (0L until 64L).map(i => (i, (i * 17L) % 64L)).toDF("a", "b")
    val linear = data.withColumn("zone", expr("a div 8"))
    val zord = ZOrder.withZValue(data, "a", "b", bits = 6)
      .withColumn("zone", expr("zvalue div 512"))
    val wl = Seq((1L, None: Option[Long], None: Option[Long], Some(0L), Some(7L)))
      .toDF("query_id", "a_lo", "a_hi", "b_lo", "b_hi")
    val linScan = ZoneMap.scanAudit(
      ZoneMap.zoneStats(linear, "zone", "a", "b"), wl)
      .collect().head.getLong(3)
    val zScan = ZoneMap.scanAudit(
      ZoneMap.zoneStats(zord, "zone", "a", "b"), wl)
      .collect().head.getLong(3)
    zScan should be < linScan // the whole point of the layout
  }
}
