package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: match left point-rows `(key, t)` to right
  * interval-rows `(key, start, end]` with `start <= t <= end`. Spark plans
  * a raw range predicate as BroadcastNestedLoopJoin (quadratic unless one
  * side broadcasts); this composes the scale-safe BINNED formulation from
  * existing operators: both sides map their times to fixed-width epoch
  * bins — each point falls in exactly ONE bin, each interval explodes to
  * the bins it overlaps — the join becomes an equi-join on (key, bin), and
  * the exact `BETWEEN` predicate filters bin-collision false positives.
  *
  * Because a point owns exactly one bin, no dedup is needed: each
  * qualifying (point, interval) pair is produced exactly once.
  *
  * Scale: shuffle on (key, bin) — skew bounded by bin width; interval
  * replication factor = ceil(interval_len / binWidth) + 1, so pick
  * `binWidthSec` near the typical interval length. This is the same
  * technique query engines use for interval joins (bucketed interval
  * trees degenerate to this under fixed-width buckets).
  */
object RangeJoin {

  /** @param points     left side: `key`, `timeCol` (timestamp)
    * @param intervals  right side: `key`, `startCol`, `endCol` (timestamps)
    * @param key        equi-join key column name (same both sides)
    * @param binWidthSec width of the epoch bins, in seconds
    */
  def binnedRangeJoin(points: DataFrame, intervals: DataFrame, key: String,
                      timeCol: String, startCol: String, endCol: String,
                      binWidthSec: Long): DataFrame = {
    require(binWidthSec > 0, "binWidthSec must be positive")
    val p = points.withColumn("_graft_bin",
      floor(unix_timestamp(col(timeCol)) / binWidthSec))
    val iv = intervals.withColumn("_graft_bin",
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / binWidthSec),
        floor(unix_timestamp(col(endCol)) / binWidthSec))))
    p.join(iv, Seq(key, "_graft_bin"))
      .filter(col(timeCol) >= col(startCol) && col(timeCol) <= col(endCol))
      .drop("_graft_bin")
  }
}
