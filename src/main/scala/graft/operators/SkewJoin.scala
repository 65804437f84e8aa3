package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fix when ONE join
  * key holds a corpus-scale share of the rows (the null-like "host =
  * cdn.example.com" of a web corpus, the bot user of an event log):
  * a hash join sends every row of a key to one reducer, so the hot
  * key's reducer runs for hours while 999 others idle. AQE's skew
  * handling (`skewJoin.enabled`, on by default here) splits
  * oversized SORT-MERGE partitions at runtime and is the first
  * resort; this operator is the portable, plan-independent form —
  * it also covers shuffled-hash joins, aggregate-then-join shapes
  * AQE can't split, and engines/configs without AQE.
  *
  * Shape: the LEFT (big, skewed) side salts each row into one of
  * `nSalts` sub-keys — `(key, salt)` with `salt =
  * pmod(xxhash64(row id), nSalts)`, entropy from a per-row column so
  * the hot key spreads evenly; the RIGHT (smaller) side replicates
  * each row `nSalts` times via a literal-range explode. The join on
  * `(key, salt)` is then a plain equi-join whose hottest partition
  * holds `1/nSalts` of the hot key. Replication multiplies the right
  * side's shuffle by `nSalts` — the knob trades right-side volume
  * for left-side balance, so salt ONLY actually-skewed joins and
  * keep `nSalts` modest (8–32); a broadcast-able right side should
  * be broadcast instead, making salting moot.
  *
  * Correctness is layout-independent BY CONSTRUCTION — every left
  * row meets every right row of its key exactly once (the salt pairs
  * each left row with exactly the one right replica carrying its
  * salt) — so `saltedJoin ≡ join` row-for-row, which is exactly what
  * the q131 oracle pins: the salted plan against the PLAIN join
  * replay. Inner join only: outer variants would need
  * per-salt-miss reconciliation that belongs upstream.
  */
object SkewJoin {

  /** Inner-join `left` and `right` on `keyCol` through `nSalts`
    * sub-keys. `entropyCol` — a left-side column with per-row
    * variation (a row id, an event id) — seeds the salt; a
    * low-cardinality entropy column degrades balance but never
    * correctness.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame, keyCol: String,
      entropyCol: String, nSalts: Int = 16): DataFrame = {
    require(nSalts >= 1, s"need nSalts >= 1, got $nSalts")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(col(entropyCol)), lit(nSalts.toLong)))
    val replicated = right.withColumn("__salt",
      explode(array((0 until nSalts).map(s => lit(s.toLong)): _*)))
    salted.join(replicated, Seq(keyCol, "__salt")).drop("__salt")
  }
}
