package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-shape utilities for skew that the planner cannot fix declaratively.
  *
  * AQE's skew-join handling splits oversized SORT-MERGE partitions at
  * runtime and is the first tool to reach for; explicit salting remains the
  * lever when a single join key is hot enough that even a split partition
  * re-skews (every split still holds only that key), when the join must be
  * shuffled-hash, or when a deterministic layout is required across runs. */
object Joins {

  /** Skew-safe equi-join on `key`: the big (skewed) side fans its rows out
    * across `salts` sub-keys, the small side is replicated `salts`× — a hot
    * key's rows then land on `salts` reducers instead of one. Replication
    * multiplies the SMALL side only (salts × |small| rows through the
    * exchange), so size `salts` to the observed hot-key multiplicity, not
    * higher. The salt is a pure hash of the big row's CONTENT — a retried
    * task recomputes identical salts, so no row can double-deliver to one
    * reducer and vanish from another the way a per-execution random salt
    * can. (Byte-identical duplicate rows share a salt; the spread comes
    * from the non-key columns, which is what distinguishes a hot key's
    * rows in the first place.) Supported `joinType`: inner / left
    * (replication breaks right/full semantics — an unmatched small-side
    * row would appear `salts` times). */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val jt = joinType.toLowerCase.replace("_", "")
    require(Seq("inner", "left", "leftouter").contains(jt),
      s"saltedJoin supports inner/left joins, got $joinType")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedJoin reserves the __salt column")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(salts.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
