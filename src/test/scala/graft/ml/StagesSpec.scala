package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{FeatureHash, TargetEncode}

class StagesSpec extends SparkSpec {
  import sqlImplicits._

  private def rows = Seq(
    (1L, "a", "x", 1.00), (2L, "a", "y", 3.00), (3L, "b", "x", 5.00))
    .toDF("id", "cat", "seg", "y")

  test("a full Pipeline fits and transforms through graft stages") {
    val pipe = new Pipeline().setStages(Array(
      new Stages.HashFeaturizer()
        .setInputCols(Seq("cat", "seg")).setOutputCol("h")
        .setDim(256).setSalt("v1"),
      new Stages.TargetEncoder()
        .setCatCol("cat").setTargetCol("y").setPrior(1L)
        .setOutputCol("enc"),
      new Stages.DeterministicSplitter()
        .setKeyCol("id").setSalt("s")))
    val out = pipe.fit(rows).transform(rows)
    out.columns should contain allOf ("h", "enc", "split")
    out.count() shouldBe 3L
  }

  test("HashFeaturizer delegates exactly to FeatureHash.hashCross") {
    val viaStage = new Stages.HashFeaturizer()
      .setInputCols(Seq("cat", "seg")).setOutputCol("h")
      .setDim(512).setSalt("z")
      .transform(rows).select($"id", $"h").as[(Long, Long)].collect()
    val direct = FeatureHash.withHashedCross(
      rows, Seq("cat", "seg"), "h", 512, "z")
      .select($"id", $"h").as[(Long, Long)].collect()
    viaStage.sorted.toSeq shouldBe direct.sorted.toSeq
  }

  test("TargetEncoder model matches the operator's encoding table") {
    val model = new Stages.TargetEncoder()
      .setCatCol("cat").setTargetCol("y").setPrior(1L).fit(rows)
    val viaModel = model.transform(rows)
      .select($"cat", $"enc").distinct()
      .as[(String, Double)].collect().toMap
    val direct = TargetEncode.encodingTable(rows, "cat", "y", 1L)
      .select($"cat", $"enc").as[(String, Double)].collect().toMap
    viaModel shouldBe direct
  }

  test("unseen categories at serve time fall back to the global prior") {
    val model = new Stages.TargetEncoder()
      .setCatCol("cat").setTargetCol("y").setPrior(1L).fit(rows)
    val serve = Seq((9L, "NEVER_SEEN", "x", 0.0))
      .toDF("id", "cat", "seg", "y")
    model.transform(serve).select($"enc").as[Double].head() shouldBe 3.0
  }

  test("HashVectorizer feeds a real MLlib LogisticRegression that learns") {
    // y depends only on catA: a linear model over hashed features must
    // separate it (the end-to-end proof the interop exists for)
    val rnd = new scala.util.Random(3)
    val train = (1 to 400).map { i =>
      val a = s"a${rnd.nextInt(10)}"
      val b = s"b${rnd.nextInt(10)}"
      (i.toLong, a, b, if (a.drop(1).toInt < 5) 1.0 else 0.0)
    }.toDF("id", "catA", "catB", "label")
    val pipe = new org.apache.spark.ml.Pipeline().setStages(Array(
      new Stages.HashVectorizer()
        .setInputCols(Seq("catA", "catB")).setDim(1 << 12).setSalt("v1"),
      new org.apache.spark.ml.classification.LogisticRegression()
        .setMaxIter(20)))
    val model = pipe.fit(train)
    val acc = model.transform(train)
      .select(avg(when($"prediction" === $"label", 1.0).otherwise(0.0)))
      .as[Double].head()
    acc should be > 0.95
  }

  test("transformSchema reports the appended columns") {
    val s = new Stages.HashFeaturizer().setInputCols(Seq("cat"))
      .setOutputCol("h").transformSchema(rows.schema)
    s.fieldNames should contain("h")
  }

  test("the splitter is deterministic across fits (no randomSplit)") {
    val st = new Stages.DeterministicSplitter().setKeyCol("id").setSalt("q")
    val a = st.transform(rows).select($"id", $"split").collect().toSeq
    val b = st.transform(rows.repartition(7))
      .select($"id", $"split").collect().toSeq
    a.sortBy(_.getLong(0)) shouldBe b.sortBy(_.getLong(0))
  }
}
