package graft

/** Anti-pattern guard over every declared oracle query's physical plan:
  * nothing may plan a cartesian product or nested-loop join at any
  * scale, except the operators documented as quadratic verification
  * baselines. Plans are scale-invariant, so sf0.001 inputs suffice —
  * this is the executable form of the "no all-pairs joins" design rule.
  */
class PlanGuardSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** q24/q57 are the exact-cosine verification baselines: non-equi
    * joins that are quadratic BY CONTRACT (they are the oracles for the
    * sub-quadratic LSH paths) and bounded by their callers.
    */
  private val quadraticBaselines =
    Set("q24_embedding_neardup", "q57_semantic_decontaminate")

  test("no oracle query plans a cartesian or nested-loop join") {
    Queries.all.foreach { q =>
      val plan = q.run(spark, sfDir).queryExecution.executedPlan.toString
      withClue(s"${q.name}: ") {
        if (!quadraticBaselines(q.name)) {
          plan should not include "CartesianProduct"
          plan should not include "BroadcastNestedLoopJoin"
        }
      }
    }
  }

  /** Global (no-partition) windows funnel every row through ONE task —
    * the scale-killer Enumerate/Packing/Coverage exist to avoid. The
    * two allowed sites run over tables bounded by construction, not by
    * data size:
    *   - q83: the funnel report table (one row per STAGE);
    *   - q102: the count-CLASS table (distinct count values — O(√N)
    *     classes for N tokens, a few thousand at a trillion tokens;
    *     the bound is the point of the class rewrite, see
    *     `vocab/Coverage`).
    */
  private val boundedGlobalWindows = Set("q83_funnel", "q102_vocab_coverage")

  test("no oracle query plans an unbounded global window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    Queries.all.foreach { q =>
      val plan = q.run(spark, sfDir).queryExecution.optimizedPlan
      val globals = plan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      withClue(s"${q.name}: ") {
        if (!boundedGlobalWindows(q.name)) globals shouldBe empty
      }
    }
  }

  test("no oracle SQL line was mutilated by stripMargin (lone leading pipe)") {
    // Queries.oracleSql applies .stripMargin: an author writing a
    // continuation line that STARTS with the || concat operator loses
    // its first pipe, leaving an invalid single-| binary expression
    // the driver's DuckDB run rejects (round-8 q85-q87, round-9 q97).
    // Legit SQL never starts a line with a single pipe, so detect the
    // mutilation in the POST-stripMargin text the driver will run.
    val lonePipe = "^\\s*\\|(?!\\|)".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      withClue(s"$name: ") {
        sql.linesIterator.zipWithIndex.foreach { case (line, i) =>
          withClue(s"line ${i + 1} '${line.trim.take(40)}': ") {
            lonePipe.findFirstIn(line) shouldBe None
          }
        }
      }
    }
  }
}
