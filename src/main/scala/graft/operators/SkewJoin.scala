package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed key distributions.
  *
  * A hash-partitioned join sends every row of a hot key to one reducer; at
  * 100 TB a single celebrity key stalls the stage (AQE's skew handling
  * splits sort-merge partitions, but can't help a shuffled hash join's
  * build side or extreme single-key skew). Salting splits each hot key into
  * `saltFactor` sub-keys: the big side gets a deterministic per-row salt,
  * the small side is replicated once per salt value, and the join runs on
  * (key, salt) — spreading each hot key over `saltFactor` reducers at the
  * cost of replicating the smaller input.
  *
  * The per-row salt is `xxhash64(all big-side columns) % saltFactor` —
  * deterministic (reruns and retries produce identical partitioning, which
  * a `rand()` salt would not), and uniform enough for load spreading.
  */
object SkewJoin {

  def saltedInnerJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val bigCols: Seq[Column] = big.columns.map(col).toSeq
    val salted = big.withColumn("__salt",
      pmod(xxhash64(bigCols: _*), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
