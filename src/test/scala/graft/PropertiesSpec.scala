package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.records.{ExampleCodec, Feature, RaggedToCoo}

/** Property-based invariants (SURVEY §5 test-plan upgrade): codec
  * round-trips, COO reconstruction, MinHash set semantics.
  */
class PropertiesSpec extends AnyFunSuite with Matchers {

  /** scalatest+scalacheck bridge isn't on the classpath; sample the
    * generators directly (deterministic enough — failures print the
    * offending sample via the assertion message).
    */
  private def forAll[A](gen: Gen[A], n: Int = 50)(body: A => Unit): Unit =
    Iterator.continually(gen.sample).flatten.take(n).foreach(body)

  private def forAll[A, B](genA: Gen[A], genB: Gen[B])(body: (A, B) => Unit): Unit =
    Iterator.continually(Gen.zip(genA, genB).sample).flatten.take(50)
      .foreach { case (a, b) => body(a, b) }

  private val genFeature: Gen[Feature] = Gen.oneOf(
    Gen.listOf(Gen.long).map(Feature.Int64List(_)),
    Gen.listOf(Gen.chooseNum(-1e6f, 1e6f)).map(Feature.FloatList(_)),
    Gen.listOf(Gen.alphaNumStr).map(ss => Feature.bytes(ss)))

  private val genFeatureMap: Gen[Map[String, Feature]] =
    Gen.mapOf(Gen.zip(Gen.identifier.suchThat(_.nonEmpty), genFeature))

  test("Example codec round-trips arbitrary feature maps") {
    forAll(genFeatureMap) { features =>
      ExampleCodec.decode(ExampleCodec.encode(features)) shouldBe features
    }
  }

  test("SequenceExample codec round-trips arbitrary context + lists") {
    val genLists = Gen.mapOf(Gen.zip(
      Gen.identifier.suchThat(_.nonEmpty), Gen.listOf(genFeature)))
    forAll(genFeatureMap, genLists) { (ctx, lists) =>
      val (gotCtx, gotLists) = ExampleCodec.decodeSequence(
        ExampleCodec.encodeSequence(ctx, lists))
      gotCtx shouldBe ctx
      gotLists shouldBe lists.filter(_ => true)
    }
  }

  test("ragged→COO reconstructs the original lists") {
    val genRagged = Gen.listOf(Gen.listOf(Gen.long))
    forAll(genRagged) { lists =>
      val (indices, values, (nRows, maxLen)) =
        RaggedToCoo.createSparseStacked(lists.map(l => l: collection.Seq[Long]))
      nRows shouldBe lists.size
      maxLen shouldBe (if (lists.isEmpty) 0 else lists.map(_.size).max)
      indices.size shouldBe values.size
      // rebuild: group values by row id in order
      val rebuilt = Array.fill(lists.size)(Seq.newBuilder[Long])
      indices.zip(values).foreach { case ((row, pos), v) =>
        pos shouldBe rebuilt(row.toInt).result().size.toLong
        rebuilt(row.toInt) += v
      }
      rebuilt.map(_.result()).toSeq shouldBe lists
    }
  }

  test("generateIncrements concatenates 0..k-1 runs") {
    forAll(Gen.listOf(Gen.chooseNum(0, 20))) { sizes =>
      RaggedToCoo.generateIncrements(sizes) shouldBe
        sizes.flatMap(n => 0L until n.toLong)
    }
  }

  test("minhash hash params are deterministic per seed and valid") {
    forAll(Gen.chooseNum(1, 64), Gen.long) { (n, seed) =>
      val a = graft.dedup.Dedup.hashParams(n, seed)
      val b = graft.dedup.Dedup.hashParams(n, seed)
      a shouldBe b
      a.size shouldBe n
      all(a.map(_._1)) should be > 0L
      all(a.map(_._2)) should be >= 0L
    }
  }

  test("sampling ratio filter constant-folds at the boundaries") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Sampling
    forAll(Gen.chooseNum(-2.0, 3.0)) { ratio =>
      val c = Sampling.filterForSamplingRatio(col("u"), ratio)
      val s = c.toString
      if (ratio <= 0.0) s shouldBe "false"
      else if (ratio >= 1.0) s shouldBe "true"
      else s should include("<(u,") // Column.toString prints prefix form
    }
  }

  test("capped collect equals collect_list + size filter for arbitrary groups") {
    // the capped aggregate's contract: same surviving groups and same
    // multiset of values as the unguarded collect_list + post-filter —
    // only the memory behavior differs
    import org.apache.spark.sql.functions.{col, collect_list, size => arraySize}
    import graft.functions.CappedCollectList.cappedCollectList
    val spark = SharedSpark.spark
    import spark.implicits._
    val genRows = Gen.listOfN(60,
      Gen.zip(Gen.chooseNum(0, 5), Gen.chooseNum(0L, 30L)))
    val genCap = Gen.chooseNum(1, 12)
    forAll(genRows, genCap) { (rows, cap) =>
      val df = rows.toDF("g", "v").repartition(3)
      val capped = df.groupBy("g")
        .agg(cappedCollectList(col("v"), cap).as("vs"))
        .filter(col("vs").isNotNull)
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).sorted).toMap
      val reference = df.groupBy("g")
        .agg(collect_list(col("v")).as("vs"))
        .filter(arraySize(col("vs")) <= cap)
        .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).sorted).toMap
      capped shouldBe reference
    }
  }
}
