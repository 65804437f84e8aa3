package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog upsert — incremental snapshot maintenance, the `MERGE
  * INTO` of a lakehouse expressed as a pure batch operator: apply a
  * keyed stream of inserts / updates / deletes to a corpus snapshot and
  * produce the next snapshot. The refresh step of every incremental
  * curation pipeline (yesterday's corpus + today's crawl delta), and
  * the batch complement of the streaming dedup/enrichment family: CDC
  * *compacts* what a change stream accumulates. North-star extension
  * (SURVEY §2.11); the reference rebuilds datasets from scratch.
  *
  * Semantics (last-writer-wins):
  *   - within the changelog, the row with the greatest
  *     `(seqCol, tieCols…)` per key wins — earlier changes to the same
  *     key are superseded, whatever their op;
  *   - winning op `D` removes the key from the snapshot (deleting an
  *     absent key is a no-op — deletes commute with retention jobs);
  *   - winning op `I`/`U` places the change's payload at the key,
  *     whether or not the key existed (upsert: `I` vs `U` differ only
  *     as audit labels, so a replayed changelog is idempotent);
  *   - keys the changelog never mentions pass through untouched.
  *
  * `(seqCol, tieCols…)` must totally order changes within a key (the
  * [[Enumerate]] determinism contract) — a seq tie between two writers
  * is a data bug and MUST fail loudly, not resolve by partition luck:
  * ambiguous keys raise at runtime.
  *
  * Scale shape: the changelog first collapses to two rows per key via
  * the [[GroupLimit]] `row_number <= k` form — Spark's
  * `InferWindowGroupLimit` keeps a bounded per-group heap on the map
  * side, so a hot key's 100M superseded changes never reach a reducer
  * (k=2, not 1: the runner-up is what proves the winner unambiguous).
  * The tie probe is a second window over the collapsed ≤2-rows-per-key
  * table with the SAME partitioning — Catalyst reuses the exchange and
  * the local sort touches at most two rows per key. Then ONE full-outer
  * join keyed on `keyCols` (one exchange per side; at real scale the
  * snapshot side is bucketed/partitioned by key so only the delta
  * shuffles). The snapshot's payload never rides more than that single
  * exchange; nothing collects to the driver.
  */
object Cdc {

  /** Ops recognized in `opCol`; anything else (null included) raises. */
  val Ops: Seq[String] = Seq("I", "U", "D")

  /** Next snapshot from `snapshot` + `changes`.
    *
    * `changes` must carry `keyCols ++ (seqCol, opCol) ++ tieCols` plus
    * exactly the snapshot's payload (non-key) columns, by name — a
    * changelog whose payload drifted from the snapshot schema is
    * refused up front rather than silently null-filling (the
    * schema-evolution path is an explicit step, not an accident).
    * Output has the snapshot's schema.
    */
  def applyChangelog(
      snapshot: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      seqCol: String,
      opCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "applyChangelog needs at least one key column")
    val payload = snapshot.columns.filterNot(keyCols.contains).toSeq
    val expected = (keyCols ++ payload ++ Seq(seqCol, opCol) ++ tieCols).toSet
    val got = changes.columns.toSet
    require(got == expected,
      s"changelog columns ${got.toSeq.sorted.mkString(",")} != expected " +
        expected.toSeq.sorted.mkString(","))

    val ord = col(seqCol).desc +: tieCols.map(col(_).desc)
    val seqStruct = struct(col(seqCol) +: tieCols.map(col): _*)
    val top2 = GroupLimit.topKPerGroup(changes, keyCols, ord, 2, "__rn")
    val w2 = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    // Guards ride the op VALUE (the one changelog column every
    // downstream expression reads) — a guard in a dropped column would
    // be pruned away and never evaluate.
    val winners = top2
      .withColumn("__next", lead(seqStruct, 1).over(w2))
      .filter(col("__rn") === 1)
      .withColumn(opCol, when(col("__next") <=> seqStruct,
        raise_error(concat(lit("ambiguous changelog seq for key "),
          concat_ws(",", keyCols.map(c => col(c).cast("string")): _*))))
        .otherwise(
          when(col(opCol).isNull || !col(opCol).isin(Ops: _*),
            raise_error(concat(lit("unknown changelog op "),
              coalesce(col(opCol), lit("NULL")))))
            .otherwise(col(opCol))))
      .drop("__rn", "__next", seqCol)
      .drop(tieCols: _*)

    val s = snapshot.as("s")
    val c = winners.as("c")
    val joinCond = keyCols.map(k => s(k) <=> c(k)).reduce(_ && _)
    val changed = c(opCol).isNotNull // key present in changelog
    s.join(c, joinCond, "full_outer")
      .filter(!changed || c(opCol) =!= "D")
      .select(
        keyCols.map(k => coalesce(s(k), c(k)).as(k)) ++
          payload.map(p => when(changed, c(p)).otherwise(s(p)).as(p)): _*)
  }
}
