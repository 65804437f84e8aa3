package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The SQL registration surface: every native expression callable from
  * `spark.sql`, with literal parameters decoded into constructor args.
  */
class GraftFunctionsSpec extends SparkSpec {
  import sqlImplicits._

  test("all registered natives run from SQL and match the column API") {
    GraftFunctions.register(spark)
    Seq(("a b a b a", 1L)).toDF("text", "one")
      .createOrReplaceTempView("gf_t")

    val viaSql = spark.sql("""
      SELECT
        kr_hash(text) AS kh,
        ngram_repetition(text, 2) AS nr,
        winnowing_fingerprints(text, 3, 2) AS wf,
        winnowing_fingerprint_keys(text, 3, 2) AS wk,
        ilog2_q20(CAST(3145728 AS BIGINT)) AS il
      FROM gf_t""").collect().head

    viaSql.getLong(0) shouldBe KrHash.hash("a b a b a".getBytes("UTF-8"))
    viaSql.getStruct(1).toSeq shouldBe Seq(4, 2, 2, 3)
    viaSql.getSeq[Long](2) shouldBe
      WinnowingFingerprints.winnow("a b a b a".getBytes, 3, 2).toSeq
    viaSql.getSeq[Long](3) shouldBe
      WinnowingFingerprints.winnowKeys("a b a b a".getBytes, 3, 2).toSeq
    viaSql.getLong(4) shouldBe graft.text.Dsir.ilog2Q20(3145728L)
  }

  test("minhash_fold from SQL matches the column form") {
    GraftFunctions.register(spark)
    Seq(Seq(3L, 9L, 27L)).toDF("hashes").createOrReplaceTempView("gf_mh")
    val viaSql = spark.sql("SELECT minhash_fold(hashes, 8, 42) FROM gf_mh")
      .collect().head.getSeq[Long](0)
    val viaCol = Seq(Seq(3L, 9L, 27L)).toDF("hashes")
      .select(MinHashFold.minhashFold(col("hashes"), 8, 42L))
      .collect().head.getSeq[Long](0)
    viaSql shouldBe viaCol
  }

  test("literal-parameter functions reject non-literal arguments") {
    GraftFunctions.register(spark)
    Seq(("abc", 2)).toDF("text", "n").createOrReplaceTempView("gf_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT ngram_repetition(text, n) FROM gf_bad").collect()
    }
    e.getMessage should include("integer literal")
  }
}
