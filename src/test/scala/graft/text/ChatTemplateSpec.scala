package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChatTemplateSpec extends SparkSpec {
  import sqlImplicits._

  private def turns(rows: (Long, Long, String, String)*) =
    rows.toDF("conv", "turn", "role", "text")

  test("renders in turn order with exact assistant spans") {
    val df = turns(
      (1L, 0L, "user", "hi"),
      (1L, 1L, "assistant", "hello!"),
      (1L, 2L, "user", "bye"),
      (1L, 3L, "assistant", "ok"))
    val r = ChatTemplate.render(df, "conv", "turn", "role", "text").head()
    val text = r.getAs[String]("text")
    text shouldBe "<|user|>hi\n<|assistant|>hello!\n<|user|>bye\n<|assistant|>ok\n"
    r.getAs[Long]("n_turns") shouldBe 4L
    r.getAs[Long]("total_chars") shouldBe text.length.toLong
    val spans = r.getAs[String]("loss_spans")
    // spans must slice exactly the assistant texts out of the render
    val recovered = spans.split(";").map { s =>
      val Array(a, b) = s.split("-").map(_.toInt)
      text.substring(a, b)
    }
    recovered shouldBe Array("hello!", "ok")
  }

  test("no assistant turn yields an empty span list") {
    val r = ChatTemplate.render(
      turns((1L, 0L, "user", "alone")), "conv", "turn", "role", "text")
      .head()
    r.getAs[String]("loss_spans") shouldBe ""
  }

  test("custom loss role masks that role instead") {
    val df = turns((1L, 0L, "user", "q"), (1L, 1L, "assistant", "a"))
    val r = ChatTemplate.render(df, "conv", "turn", "role", "text",
      lossRole = "user").head()
    val text = r.getAs[String]("text")
    val Array(s, e) = r.getAs[String]("loss_spans").split("-").map(_.toInt)
    text.substring(s, e) shouldBe "q"
  }

  test("result is input-order and partitioning independent") {
    val rows = (0 until 40).map(i =>
      ((i / 8).toLong, (i % 8).toLong,
        if (i % 2 == 0) "user" else "assistant", s"turn text $i"))
    val base = ChatTemplate.render(
      turns(rows: _*), "conv", "turn", "role", "text").collect().toSet
    val shuffled = ChatTemplate.render(
      turns(scala.util.Random.shuffle(rows): _*).repartition(7),
      "conv", "turn", "role", "text").collect().toSet
    shuffled shouldBe base
  }

  test("duplicate turn index raises — render order would be ambiguous") {
    val df = turns((1L, 0L, "user", "a"), (1L, 0L, "assistant", "b"))
    val ex = intercept[Exception] {
      ChatTemplate.render(df, "conv", "turn", "role", "text").collect()
    }
    ex.getMessage should include("duplicate turn index")
  }

  test("NULL text raises instead of silently shifting spans") {
    val df = Seq((1L, 0L, "user", Some("a")), (1L, 1L, "assistant", None))
      .toDF("conv", "turn", "role", "text")
    val ex = intercept[Exception] {
      ChatTemplate.render(df, "conv", "turn", "role", "text").collect()
    }
    ex.getMessage should include("NULL text")
  }
}
