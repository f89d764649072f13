package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Binned range join: inclusive boundaries, multi-bin intervals, per-key
  * isolation, exactly-once pair production.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2026-08-12 10:$m%02d:00")

  test("matches inclusive [start, end] across bin boundaries, exactly once per pair") {
    val points = Seq(
      (1L, 100L, ts(0)),  // == start of w1 → hit
      (1L, 101L, ts(30)), // == end of w1 → hit (and start of nothing else)
      (1L, 102L, ts(31)), // just after w1 → miss
      (1L, 103L, ts(45)), // inside w2 (spans bins) → hit
      (2L, 104L, ts(10)), // other key → miss
    ).toDF("user_id", "event_id", "t")
    val intervals = Seq(
      (1L, ts(0), ts(30)),  // w1
      (1L, ts(40), ts(55)), // w2: crosses the 1800s bin edge at 10:30/11:00? (10:40–10:55 in-bin; still fine)
    ).toDF("user_id", "w_start", "w_end")

    val got = RangeJoin.binnedRangeJoin(points, intervals,
        "user_id", "t", "w_start", "w_end", binWidthSec = 600L) // 10-min bins: w1 spans 4 bins
      .select("event_id", "w_start")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet

    assert(got === Set(
      (100L, ts(0)), (101L, ts(0)), (103L, ts(40)),
    ))
  }

  test("a many-bin interval still produces each qualifying pair exactly once") {
    val points = Seq((1L, 100L, ts(30))).toDF("user_id", "event_id", "t")
    // interval spans 60 one-minute bins; the point owns exactly one bin,
    // so the equi-join can only produce the pair once.
    val intervals = Seq((1L, ts(0), ts(59))).toDF("user_id", "w_start", "w_end")
    val out = RangeJoin.binnedRangeJoin(points, intervals,
      "user_id", "t", "w_start", "w_end", binWidthSec = 60L)
    assert(out.count() === 1)
  }
}
