package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing primitives.
  *
  * The dedup/fingerprint operators need a hash both Spark and the DuckDB
  * oracle compute identically. Spark's `hash()`/`xxhash64` and DuckDB's
  * `hash()` are different algorithms, so we derive a 60-bit integer from
  * `md5` (identical hex output in both engines): take the first 15 hex chars
  * (60 bits — fits a signed 64-bit long with headroom, so no sign issues)
  * and parse base-16.
  *
  * DuckDB equivalent: `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`.
  *
  * md5-per-row is slower than xxhash64, but these hashes feed shingle/
  * signature computation where cross-engine verifiability is the point; swap
  * to `xxhash64` when no oracle parity is needed.
  */
object Hashing {
  val HexPrefixLen = 15

  /** 60-bit integer hash of a string column via md5. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, HexPrefixLen), 16, 10).cast("long")

  /** SQL fragment computing the same value in DuckDB. */
  def duckHash60(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 1, $HexPrefixLen) AS BIGINT)"

  /** MinHash permutation parameters: h_i(x) = (a_i * (x mod P) + b_i) mod P.
    * P = 2^31 − 1 (Mersenne prime); a, b fixed odd constants < P so products
    * stay under 2^62 (no overflow in either engine's BIGINT arithmetic).
    * Generated once from a seeded LCG and frozen as literals so the DuckDB
    * oracle can embed the identical table.
    */
  val MinhashP: Long = 2147483647L
  val MinhashParams: Seq[(Long, Long)] = {
    // LCG(seed=1337): x -> (x * 6364136223846793005 + 1442695040888963407),
    // taking |x| mod (P-2) + 1 for a and b. Frozen here; do not regenerate.
    var x = 1337L
    def next(): Long = {
      x = x * 6364136223846793005L + 1442695040888963407L
      (math.abs(x % (MinhashP - 2)) + 1)
    }
    Seq.fill(16)((next(), next()))
  }

  /** Random-hyperplane LSH planes: 8 hyperplanes × 64 dims, integer-valued
    * doubles in [−1000, 1000] from the same LCG family (seed 7331) — exact
    * in both engines' literal parsing, so sign(dot) buckets are identical
    * cross-engine. Frozen; do not regenerate.
    */
  val RpPlanes: Seq[Seq[Double]] = {
    var x = 7331L
    def next(): Long = {
      x = x * 6364136223846793005L + 1442695040888963407L
      x
    }
    Seq.fill(8)(Seq.fill(64)(((next() % 2001 + 2001) % 2001 - 1000).toDouble))
  }
}
