package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join: when one join key carries a disproportionate share
  * of the big side's rows, a plain shuffle join puts that whole key in one
  * task. Salting splits it: the big side gets a uniform salt in [0, salts),
  * the small side is replicated once per salt value, and the join runs on
  * (key, salt) — the hot key now spreads over `salts` tasks.
  *
  * The salt is data-independent (uniform per-row), so the JOIN RESULT is
  * identical to the unsalted join — only the physical distribution changes.
  * Cost: small side inflated ×salts (only acceptable for genuinely small
  * dimensions — same budget as a broadcast, which this complements when the
  * small side is too big to broadcast but the big side is skewed). AQE's
  * skewedJoin covers sort-merge cases adaptively; salting is the explicit,
  * planner-independent tool.
  */
object SkewJoin {

  /** Inner equi-join of `big` ⋈ `small` on `key`, salted `salts` ways. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // rand-free uniform salt: hash of a per-row unique id — deterministic
    // enough for distribution, and result-invariant by construction.
    val saltedBig = big.withColumn("_graft_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicatedSmall = small.withColumn("_graft_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "_graft_salt"), "inner")
      .drop("_graft_salt")
  }
}
