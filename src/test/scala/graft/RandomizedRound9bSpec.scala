package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{Cdc, Coverage}
import graft.graph.Triangles

/** Randomized cross-checks for the round-9b operators: each
  * distributed implementation is compared, over seeded random inputs,
  * against a NAIVE single-threaded reference implementation whose
  * correctness is obvious — the adversarial complement of the
  * hand-picked cases in the per-operator specs (a fixed example can
  * accidentally avoid the broken region; fifty random ones rarely do).
  */
class RandomizedRound9bSpec extends SparkSpec {
  import sqlImplicits._

  private val rounds = 15

  test("Cdc.applyChangelog matches the naive last-writer-wins replay") {
    val rnd = new Random(11)
    (1 to rounds).foreach { _ =>
      val keys = (1 to 8).map(i => s"k$i")
      val snap = keys.filter(_ => rnd.nextBoolean())
        .map(k => (k, rnd.nextInt(100).toLong))
      // unique seqs, random ops over random keys
      val seqs = rnd.shuffle((1L to 20L).toList)
      val changes = seqs.map { sq =>
        val op = Seq("I", "U", "D")(rnd.nextInt(3))
        (keys(rnd.nextInt(keys.size)), sq, op, rnd.nextInt(100).toLong)
      }
      // naive: sort by seq, apply sequentially to a mutable map
      val m = scala.collection.mutable.Map(snap: _*)
      changes.sortBy(_._2).foreach { case (k, _, op, v) =>
        if (op == "D") m.remove(k) else m(k) = v
      }
      val got = Cdc.applyChangelog(
        snap.toDF("k", "v"), changes.toDF("k", "seq", "op", "v"),
        Seq("k"), "seq", "op")
        .as[(String, Long)].collect().sorted.toSeq
      got shouldBe m.toSeq.sorted
    }
  }

  test("mergeVersioned over random batch splits equals the one-shot apply") {
    val rnd = new Random(13)
    (1 to rounds).foreach { _ =>
      val snap = (1 to 5).map(i => (s"k$i", i.toLong))
      val seqs = rnd.shuffle((1L to 15L).toList)
      val changes = seqs.map { sq =>
        (s"k${1 + rnd.nextInt(7)}", sq,
          Seq("I", "U", "D")(rnd.nextInt(3)), sq * 10)
      }
      val oneShot = Cdc.applyChangelog(
        snap.toDF("k", "v"), changes.toDF("k", "seq", "op", "v"),
        Seq("k"), "seq", "op").as[(String, Long)].collect().sorted.toSeq
      // random partition into 3 batches, random order
      val batches = rnd.shuffle(
        changes.groupBy(_ => rnd.nextInt(3)).values.toList)
      val init = Cdc.initState(snap.toDF("k", "v"))
      val finalState = batches.foldLeft(init) { (st, b) =>
        Cdc.mergeVersioned(st, b.toDF("k", "seq", "op", "v"),
          Seq("k"), "seq", "op")
          .localCheckpoint(true) // keep lineage flat across folds
      }
      Cdc.currentView(finalState).as[(String, Long)].collect().sorted
        .toSeq shouldBe oneShot
    }
  }

  test("Coverage.headCoverage matches the naive sorted cumsum") {
    val rnd = new Random(17)
    (1 to rounds).foreach { _ =>
      val groups = (1 to (3 + rnd.nextInt(20))).map(i =>
        (s"g$i", rnd.nextInt(1000).toLong))
      val pNum = 1L + rnd.nextInt(99)
      val got = Coverage.headCoverage(
        groups.toDF("g", "m"), Seq("g"), "m", pNum, 100L,
        bucketWidth = 1L + rnd.nextInt(6))
        .select($"g", $"in_head").as[(String, Boolean)].collect().toMap
      val total = groups.map(_._2).sum
      val target = (pNum * total + 99) / 100
      var acc = 0L
      val sorted = groups.sortBy(g => (-g._2, g._1))
      val naive = sorted.map { case (g, m) =>
        val inHead = acc < target; acc += m; g -> inHead
      }.toMap
      got shouldBe naive
    }
  }

  test("Triangles matches brute-force enumeration on random graphs") {
    val rnd = new Random(19)
    (1 to rounds).foreach { _ =>
      val n = 6 + rnd.nextInt(10)
      val edges = (1 to 25).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val und = edges.filter { case (a, b) => a != b }
        .map { case (a, b) => (a min b, a max b) }.distinct.toSet
      val verts = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val naive = verts.map { v =>
        v -> (for {
          a <- verts; b <- verts
          if a < b && a != v && b != v
          if und(((v min a), (v max a))) && und(((v min b), (v max b))) &&
            und((a, b))
        } yield 1).size.toLong
      }.toMap
      val got = Triangles.perVertex(edges.toDF("s", "d"), "s", "d")
        .as[(Long, Long)].collect().toMap
      got shouldBe naive
    }
  }

  test("TargetEncode LOO matches the brute-force per-row exclusion") {
    val rnd = new Random(23)
    (1 to rounds).foreach { _ =>
      val rows = (1 to 30).map(i =>
        (i.toLong, s"c${rnd.nextInt(5)}", rnd.nextInt(1000) / 100.0))
      val k = 1L + rnd.nextInt(10)
      val got = graft.operators.TargetEncode.withLooEncoding(
        rows.toDF("id", "cat", "y"), "cat", "y", k)
        .select($"id", $"enc").as[(Long, Double)].collect().toMap
      val cents = rows.map { case (id, c, y) =>
        (id, c, math.round(y * 100)) }
      val tg = cents.map(_._3).sum
      val ng = cents.size.toLong
      cents.foreach { case (id, c, y) =>
        val sc = cents.filter(_._2 == c).map(_._3).sum
        val nc = cents.count(_._2 == c).toLong
        val naive = ((sc - y) * ng + k * tg).toDouble /
          (ng * (nc - 1 + k) * 100).toDouble
        got(id) shouldBe naive
      }
    }
  }

  test("Trend.fitLines matches the naive normal equations") {
    val rnd = new Random(29)
    (1 to rounds).foreach { _ =>
      val pts = (1 to 20).map(_ =>
        ("g", rnd.nextInt(50).toDouble, rnd.nextInt(50).toDouble))
      val got = graft.sketch.Trend.fitLines(
        graft.sketch.Trend.sketch(pts.toDF("g", "x", "y"), "g", "x", "y"))
        .select($"slope_q", $"intercept_q")
        .as[(Option[Double], Option[Double])].head()
      val n = pts.size.toLong
      val sx = pts.map(_._2.toLong).sum; val sy = pts.map(_._3.toLong).sum
      val sxx = pts.map(p => p._2.toLong * p._2.toLong).sum
      val sxy = pts.map(p => p._2.toLong * p._3.toLong).sum
      val den = n * sxx - sx * sx
      if (den == 0) got shouldBe ((None, None))
      else {
        got._1.get shouldBe (n * sxy - sx * sy).toDouble / den.toDouble
        got._2.get shouldBe (sy * sxx - sx * sxy).toDouble / den.toDouble
      }
    }
  }
}
