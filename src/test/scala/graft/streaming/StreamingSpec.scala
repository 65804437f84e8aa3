package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.SparkSpec
import graft.inference.{Artifacts, Inference}
import graft.operators.Sampling

/** Streaming surface: the stateless operators (sampling, inference
  * columns) run unchanged on streaming DataFrames; windowed aggregation
  * holds watermarked state.
  */
class StreamingSpec extends SparkSpec {
  import sqlImplicits._

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermarked windowed aggregation over a memory stream") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val out = Streaming.windowedEventCounts(
      input.toDF.toDF("ts", "event_type", "value"),
      "ts", "event_type", "value", windowLength = "10 minutes")
    val query = out.writeStream
      .format("memory").queryName("win_counts").outputMode("update").start()
    try {
      input.addData(
        (ts(1), "click", 1.0), (ts(2), "click", 2.0),
        (ts(3), "view", 5.0), (ts(11), "click", 7.0))
      query.processAllAvailable()
      val rows = spark.sql(
        "SELECT window_start, event_type, n, total_value FROM win_counts")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getLong(2), r.getDouble(3))).sorted
      rows.toSeq shouldBe Seq(
        ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
        ("2024-01-01 10:00:00.0", "view", 1L, 5.0),
        ("2024-01-01 10:10:00.0", "click", 1L, 7.0))
    } finally query.stop()
  }

  test("windowed HLL registers match the batch sketch per closed window") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, String)]
    val out = Streaming.windowedDistinctSketch(
      input.toDF.toDF("ts", "g", "u"), "ts", "g", col("u"),
      p = 8, windowLength = "10 minutes")
    val query = out.writeStream
      .format("memory").queryName("win_hll").outputMode("update").start()
    try {
      input.addData(
        (ts(1), "a", "u1"), (ts(2), "a", "u2"), (ts(3), "a", "u1"),
        (ts(4), "b", "u1"), (ts(11), "a", "u3"))
      query.processAllAvailable()
      val streamed = spark.sql(
        "SELECT window_start, g, bucket, rho FROM win_hll")
      // batch twin over the same rows, windowed the same way
      val batch = Seq(
        (ts(1), "a", "u1"), (ts(2), "a", "u2"), (ts(3), "a", "u1"),
        (ts(4), "b", "u1"), (ts(11), "a", "u3"))
        .toDF("ts", "g", "u")
        .withColumn("window_start",
          window(col("ts"), "10 minutes").getField("start"))
      val expected = graft.sketch.Hll.sketch(
        batch, Seq("window_start", "g"), col("u"), p = 8)
      streamed.exceptAll(expected).count() shouldBe 0L
      expected.exceptAll(streamed).count() shouldBe 0L
      // registers finish to the same estimate as the batch one-shot
      val est = graft.sketch.Hll.estimate(
        streamed.filter(col("g") === "a" &&
          col("window_start") === Timestamp.valueOf("2024-01-01 10:00:00")),
        Seq("g"), p = 8)
        .select("est_distinct").as[Double].head()
      est should be > 0.0
    } finally query.stop()
  }

  test("stream-stream interval join matches within the bound, evicts beyond") {
    implicit val sc = spark.sqlContext
    val views = MemoryStream[(Timestamp, String, Long)]
    val clicks = MemoryStream[(Timestamp, String, Long)]
    val joined = Streaming.streamIntervalJoin(
      views.toDF.toDF("view_ts", "k", "view_id"),
      clicks.toDF.toDF("click_ts", "k", "click_id"),
      Seq("k"), "view_ts", "click_ts",
      lowerBound = "0 seconds", upperBound = "5 minutes",
      watermark = "0 seconds")
    val query = joined.writeStream
      .format("memory").queryName("sij").outputMode("append").start()
    try {
      views.addData((ts(0), "a", 1L), (ts(20), "a", 2L), (ts(0), "b", 3L))
      clicks.addData(
        (ts(3), "a", 10L),  // within 5 min of view 1
        (ts(9), "a", 11L),  // outside every view's window
        (ts(23), "a", 12L), // within view 2
        (ts(3), "c", 13L))  // key never matches
      query.processAllAvailable()
      val rows = spark.sql("SELECT view_id, click_id FROM sij")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      rows.toSeq shouldBe Seq((1L, 10L), (2L, 12L))
    } finally query.stop()
  }

  test("interval join refuses overlapping non-key columns") {
    implicit val sc = spark.sqlContext
    val a = MemoryStream[(Timestamp, String, Long)]
    an[IllegalArgumentException] should be thrownBy
      Streaming.streamIntervalJoin(
        a.toDF.toDF("ts", "k", "x"), a.toDF.toDF("ts", "k", "x"),
        Seq("k"), "ts", "ts", "0 seconds", "5 minutes", "0 seconds")
  }

  test("windowed moments match the batch sketch per window") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val out = Streaming.windowedMoments(
      input.toDF.toDF("ts", "g", "v"), "ts", "g", "v",
      decimals = 1, windowLength = "10 minutes")
    val query = out.writeStream
      .format("memory").queryName("win_moments").outputMode("update").start()
    try {
      input.addData(
        (ts(1), "a", 1.5), (ts(2), "a", 2.25), (ts(3), "a", -0.5),
        (ts(11), "a", 4.0))
      query.processAllAvailable()
      val rows = spark.sql(
        "SELECT window_start, g, n, q_absmax, s1, s2, s3, s4 FROM win_moments")
        .collect()
      rows.length shouldBe 2
      val first = rows.find(_.getTimestamp(0).toString.contains("10:00")).get
      // q = floor(v·10): 15, 22, -5 → s1 = 32, s2 = 225+484+25 = 734
      first.getLong(2) shouldBe 3L
      first.getDecimal(4).longValueExact() shouldBe 32L
      first.getDecimal(5).longValueExact() shouldBe 734L
      // the emitted window merges with a batch sketch of the same rows
      val batch = graft.sketch.Moments.sketch(
        Seq(("a", 1.5), ("a", 2.25), ("a", -0.5)).toDF("g", "v"),
        "g", "v", decimals = 1).head()
      first.getDecimal(4).longValueExact() shouldBe
        batch.getAs[java.math.BigDecimal]("s1").longValueExact()
      first.getDecimal(7).longValueExact() shouldBe
        batch.getAs[java.math.BigDecimal]("s4").longValueExact()
    } finally query.stop()
  }

  test("stream-static enrichment joins the dimension and rolls up per segment") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val dim = Seq((1L, "gold"), (2L, "gold"), (3L, "silver"))
      .toDF("user_id", "segment")
    val out = Streaming.enrichedWindowedCounts(
      input.toDF.toDF("ts", "user_id", "value"), dim,
      "ts", "user_id", "segment", "value", windowLength = "10 minutes")
    val query = out.writeStream
      .format("memory").queryName("enriched").outputMode("update").start()
    try {
      input.addData(
        (ts(1), 1L, 1.0), (ts(2), 2L, 2.0), (ts(3), 3L, 5.0),
        (ts(4), 99L, 100.0)) // no dimension row: dropped by contract
      query.processAllAvailable()
      val rows = spark.sql(
        "SELECT window_start, segment, n, total_value FROM enriched")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
          r.getLong(2), r.getDouble(3))).sorted
      rows.toSeq shouldBe Seq(
        ("2024-01-01 10:00:00.0", "gold", 2L, 3.0),
        ("2024-01-01 10:00:00.0", "silver", 1L, 5.0))
    } finally query.stop()
  }

  test("streaming exact dedup drops in-watermark duplicates, keeps distinct texts") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val out = Streaming.streamingExactDedup(
      input.toDF.toDF("doc_id", "ts", "text"), "text", "ts")
    val query = out.writeStream
      .format("memory").queryName("dedup_stream").outputMode("append").start()
    try {
      input.addData(
        (1L, ts(1), "hello world"),
        (2L, ts(2), "hello   WORLD"), // same after normalization
        (3L, ts(3), "something else"))
      query.processAllAvailable()
      input.addData((4L, ts(4), "hello world")) // duplicate in later batch
      query.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM dedup_stream")
        .collect().map(_.getLong(0)).sorted
      ids.toSeq shouldBe Seq(1L, 3L)
    } finally query.stop()
  }

  test("streaming simhash near-dup pairs documents across batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val base = (1 to 80).map(i => s"word$i").mkString(" ")
    val near = (1 to 80).map(i => if (i == 40) "flip" else s"word$i").mkString(" ")
    val far = (1 to 80).map(i => s"other$i").mkString(" ")
    val out = Streaming.streamingSimhashNearDuplicates(
      input.toDF.toDF("doc_id", "ts", "text"), "doc_id", "text", "ts",
      maxDistance = 12)
    val query = out.writeStream
      .format("memory").queryName("nd_stream").outputMode("append").start()
    try {
      input.addData((100L, ts(1), base), (1L, ts(1), far))
      query.processAllAvailable()
      input.addData((101L, ts(2), near)) // near-dup of 100 in a later batch
      query.processAllAvailable()
      val pairs = spark.sql("SELECT DISTINCT id_a, id_b FROM nd_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      pairs shouldBe Set((100L, 101L))
    } finally query.stop()
  }

  test("stratified sampling is streaming-safe (stateless filter+project)") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Double, Double)]
    // deterministic entropy from the key so the stream result is stable
    val df = input.toDF.toDF("id", "value", "u0")
      .withColumn("u", pmod(col("id") * 2654435761L, lit(4294967296L))
        .cast("double") / 4294967296.0)
    val sampled = Sampling.sampleWithPredicate(
      df, 1.0, 1.0, 0.5, col("value") > 10, samplingColOverride = Some("u"))
    val query = sampled.writeStream
      .format("memory").queryName("sampled").outputMode("append").start()
    try {
      input.addData((1L, 20.0, 0.0), (2L, 5.0, 0.0), (3L, 5.0, 0.0), (4L, 15.0, 0.0))
      query.processAllAvailable()
      val rows = spark.sql("SELECT id, weight FROM sampled").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
      // positives always kept at weight 1.0; negatives kept iff u < 0.5 at weight 2.0
      rows.map(_._1) should contain allOf(1L, 4L)
      rows.filter(r => r._1 == 1L || r._1 == 4L).map(_._2).toSet shouldBe Set(1.0)
      rows.filter(r => r._1 == 2L || r._1 == 3L).map(_._2).toSet.subsetOf(Set(2.0)) shouldBe true
    } finally query.stop()
  }

  test("inference column is streaming-safe (mapPartitions scoring)") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val model = Artifacts.broadcast(spark, 3.0)
    val scored = Inference.withInferenceColumn[Double](
      input.toDF.toDF("id", "x"), model, Seq("x"),
      (m, cols, _) => cols(0).map(v => v.asInstanceOf[Double] * m),
      DoubleType, batchSize = 2, outputCol = "score")
    val query = scored.writeStream
      .format("memory").queryName("scored").outputMode("append").start()
    try {
      input.addData((1L, 2.0), (2L, 5.0))
      query.processAllAvailable()
      spark.sql("SELECT score FROM scored ORDER BY id").collect()
        .map(_.getDouble(0)).toSeq shouldBe Seq(6.0, 15.0)
    } finally query.stop()
  }

  test("stateful streaming vocabulary accumulates counts across batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[String]
    val counts = Streaming.streamingVocabCounts(input.toDS())
    // mapGroupsWithState requires update output mode
    val query = counts.writeStream
      .format("memory").queryName("vocab_stream").outputMode("update").start()
    try {
      input.addData("click", "click", "view")
      query.processAllAvailable()
      input.addData("click", "view", "signup")
      query.processAllAvailable()
      // latest state per value after both batches
      val latest = spark.sql(
        "SELECT value, max(count) AS c FROM vocab_stream GROUP BY value")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      latest shouldBe Map("click" -> 3L, "view" -> 2L, "signup" -> 1L)
    } finally query.stop()
  }

  test("quality flag splits a stream without re-evaluating the predicate") {
    val df = Seq(("good text here", 3), ("x", 1)).toDF("text", "n_tokens")
    val flagged = Streaming.withQualityFlag(df, col("n_tokens") >= 2)
    flagged.filter(col("quality_ok")).count() shouldBe 1
    flagged.filter(!col("quality_ok")).count() shouldBe 1
  }

  test("streaming session aggregation merges within gap and splits across it") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val out = Streaming.sessionStats(
      input.toDF.toDF("user_id", "ts", "value"),
      Seq("user_id"), "ts", "value", gap = "10 minutes",
      watermark = "1 hour")
    // Session-window aggregation only supports append mode: sessions
    // emit once the watermark passes their end, so a sentinel event two
    // hours later flushes the earlier sessions as final.
    val query = out.writeStream
      .format("memory").queryName("sess_stream").outputMode("append").start()
    try {
      // user 1: 10:01, 10:05 (one session), 10:30 (new session: gap 25m)
      // user 2: 10:02 alone
      input.addData(
        (1L, ts(1), 1.0), (1L, ts(5), 2.0), (1L, ts(30), 4.0),
        (2L, ts(2), 8.0))
      query.processAllAvailable()
      input.addData((3L, Timestamp.valueOf("2024-01-01 12:30:00"), 0.0))
      query.processAllAvailable()
      val rows = spark.sql(
        """SELECT user_id, session_start, session_end, n_events, total_value
           FROM sess_stream""")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getLong(3), r.getDouble(4))).sorted
      rows.toSeq shouldBe Seq(
        (1L, "2024-01-01 10:01:00.0", 2L, 3.0),
        (1L, "2024-01-01 10:30:00.0", 1L, 4.0),
        (2L, "2024-01-01 10:02:00.0", 1L, 8.0))
    } finally query.stop()
  }
}
