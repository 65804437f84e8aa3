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

    // rename the changelog side instead of alias-resolving: a snapshot
    // that itself derives from `changes` (replay/idempotence pipelines)
    // would otherwise hit Spark's ambiguous-self-join detection
    val c = prefixed(winnersOf(changes, keyCols, seqCol, opCol, tieCols)
      .drop(seqCol).drop(tieCols: _*))
    val joinCond = keyCols.map(k => col(k) <=> col(CP + k)).reduce(_ && _)
    val changed = col(CP + opCol).isNotNull // key present in changelog
    snapshot.join(c, joinCond, "full_outer")
      .filter(!changed || col(CP + opCol) =!= "D")
      .select(
        keyCols.map(k => coalesce(col(k), col(CP + k)).as(k)) ++
          payload.map(p =>
            when(changed, col(CP + p)).otherwise(col(p)).as(p)): _*)
  }

  /** Rename prefix separating the changelog side of the merge joins. */
  private val CP = "__c_"

  private def prefixed(df: DataFrame): DataFrame =
    df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, CP + c))

  /** One winning change per key in `(seqCol, tieCols…)` order, with the
    * seq/tie columns retained. Collapse via the [[GroupLimit]] k=2 form
    * (map-side bounded heap; the runner-up proves the winner
    * unambiguous), tie probe on the SAME partitioning. Guards ride the
    * op VALUE (the one changelog column every downstream expression
    * reads) — a guard in a dropped column would be pruned away and
    * never evaluate.
    */
  private def winnersOf(
      changes: DataFrame,
      keyCols: Seq[String],
      seqCol: String,
      opCol: String,
      tieCols: Seq[String]): DataFrame = {
    val ord = col(seqCol).desc +: tieCols.map(col(_).desc)
    val seqStruct = struct(col(seqCol) +: tieCols.map(col): _*)
    val top2 = GroupLimit.topKPerGroup(changes, keyCols, ord, 2, "__rn")
    val w2 = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    top2
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
      .drop("__rn", "__next")
  }

  // ---- versioned state (the cross-batch form) -----------------------
  //
  // [[applyChangelog]] assumes it sees the WHOLE changelog at once. A
  // change STREAM arrives in micro-batches whose boundaries are an
  // accident of file listing order — change seq 9 can land a batch
  // before seq 5. The versioned form keeps two bookkeeping columns in
  // the stored snapshot so batches merge MONOTONELY:
  //   - `__seq`: the seq of the change that produced the row — a
  //     stale change (seq <= stored) is ignored, whatever batch it
  //     rides in;
  //   - `__deleted`: deletes leave a TOMBSTONE instead of removing the
  //     row — without it, an out-of-order update older than the delete
  //     would resurrect the key. (Tombstone retention/purge beyond a
  //     seq horizon is a compaction policy, owned by the caller.)
  // Batch merge order therefore cannot change the result: per key the
  // surviving row is always the globally-greatest seq. Replaying a
  // batch is a no-op (seq comparison is strict), which is exactly the
  // idempotence foreachBatch's at-least-once contract needs.

  /** Bookkeeping columns of a versioned state table. */
  val SeqCol = "__seq"
  val DeletedCol = "__deleted"

  /** Bootstrap a versioned state from a plain snapshot. `seq` must sit
    * below every changelog seq (default -1 for non-negative seqs).
    */
  def initState(snapshot: DataFrame, seq: Long = -1L): DataFrame =
    snapshot.withColumn(SeqCol, lit(seq)).withColumn(DeletedCol, lit(false))

  /** The user-facing snapshot of a versioned state: live rows, no
    * bookkeeping columns.
    */
  def currentView(state: DataFrame): DataFrame =
    state.filter(!col(DeletedCol)).drop(SeqCol, DeletedCol)

  /** Tombstone GC — drop delete markers whose seq is at or below
    * `horizonSeq`, the caller's promise that no change with a smaller
    * seq can still arrive (source retention window, watermark, or a
    * checkpointed low-water mark). Purging EARLIER would let an
    * out-of-order update older than the delete resurrect its key —
    * which is the exact failure [[mergeVersioned]]'s tombstones exist
    * to prevent — so the horizon is an explicit argument, never a
    * default. Map-only filter; run it at compaction cadence, not per
    * batch.
    */
  def purgeTombstones(state: DataFrame, horizonSeq: Long): DataFrame =
    state.filter(!col(DeletedCol) || col(SeqCol) > horizonSeq)

  /** Merge one changelog batch into a versioned state. Within the
    * batch, last-writer-wins with the [[applyChangelog]] guards
    * (ambiguous seq raises, unknown op raises); across batches the
    * strict `seq > __seq` rule makes merging commutative over batch
    * boundaries and idempotent under replays. `seqCol` must be
    * globally unique per key across the whole stream (tie columns
    * cannot disambiguate across batches — they are refused here).
    */
  def mergeVersioned(
      state: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      seqCol: String,
      opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "mergeVersioned needs at least one key column")
    val payload = state.columns
      .filterNot(keyCols.contains).filterNot(Seq(SeqCol, DeletedCol).contains)
      .toSeq
    val expected = (keyCols ++ payload ++ Seq(seqCol, opCol)).toSet
    require(changes.columns.toSet == expected,
      s"changelog columns ${changes.columns.sorted.mkString(",")} != " +
        s"expected ${expected.toSeq.sorted.mkString(",")}")

    val c = prefixed(winnersOf(changes, keyCols, seqCol, opCol, Nil))
    val joinCond = keyCols.map(k => col(k) <=> col(CP + k)).reduce(_ && _)
    val take = col(CP + opCol).isNotNull &&
      (col(SeqCol).isNull || col(CP + seqCol) > col(SeqCol))
    state.join(c, joinCond, "full_outer")
      .select(
        keyCols.map(k => coalesce(col(k), col(CP + k)).as(k)) ++
          payload.map(p => when(take, col(CP + p)).otherwise(col(p)).as(p)) ++
          Seq(
            when(take, col(CP + seqCol)).otherwise(col(SeqCol)).as(SeqCol),
            when(take, col(CP + opCol) === "D")
              .otherwise(coalesce(col(DeletedCol), lit(false)))
              .as(DeletedCol)): _*)
  }
}
