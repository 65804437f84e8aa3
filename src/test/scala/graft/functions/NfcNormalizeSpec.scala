package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NfcNormalizeSpec extends SparkSpec {
  import sqlImplicits._

  // explicit escapes throughout — composed and decomposed forms render
  // identically in source, so literals would be unreviewable
  private val Decomposed = "café" // e + combining acute, 5 chars
  private val Composed = "café" // precomposed é, 4 chars

  private def norm(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(NfcNormalize.nfcNormalize(col("t"))).head.getString(0)

  test("decomposed sequences compose: e + U+0301 becomes U+00E9") {
    norm(Decomposed) shouldBe Composed
    norm(Decomposed).length shouldBe 4
  }

  test("ASCII and already-NFC text pass through unchanged") {
    norm("plain ascii text") shouldBe "plain ascii text"
    norm(Composed) shouldBe Composed
  }

  test("idempotent: normalizing twice equals once") {
    val messy = s"$Decomposed mixed à õ $Composed"
    norm(norm(messy)) shouldBe norm(messy)
  }

  test("null-safe and registered in SQL") {
    Seq(Tuple1(null: String)).toDF("t")
      .select(NfcNormalize.nfcNormalize(col("t"))).head.isNullAt(0) shouldBe true
    GraftFunctions.register(spark)
    spark.sql(s"SELECT nfc_normalize('café') AS n")
      .head.getString(0) shouldBe Composed
  }

  test("interpreted eval matches the JDK reference over random combining marks") {
    val rng = new scala.util.Random(5)
    val marks = Seq('̀', '́', '̂', '̃', '̈')
    val base = "aeiounc"
    val rows = (0 until 200).map { i =>
      val sb = new StringBuilder
      (0 until 1 + rng.nextInt(12)).foreach { _ =>
        sb.append(base(rng.nextInt(base.length)))
        if (rng.nextBoolean()) sb.append(marks(rng.nextInt(marks.size)))
      }
      (i.toLong, sb.toString)
    }
    val df = rows.toDF("id", "t")
    val viaExpr = df.select(col("id"),
      NfcNormalize.nfcNormalize(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val reference = rows.map { case (id, s) =>
      id -> java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    }.toMap
    viaExpr shouldBe reference
  }
}
