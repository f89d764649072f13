package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** As-of join semantics on hand-built frames: strictly-before match,
  * exact-tie match (>= convention), no-prior-row NULL, per-key isolation.
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2026-08-12 10:$m%02d:00")

  test("asof picks the latest right row at-or-before each left time, per key") {
    val left = Seq(
      (1L, ts(0)),  // before any right row → NULL
      (1L, ts(10)), // exact tie with right @10 → 100.0
      (1L, ts(15)), // between 10 and 20 → 100.0
      (1L, ts(25)), // after 20 → 200.0
      (2L, ts(25)), // other key: only right @30 exists, later → NULL
    ).toDF("user_id", "ts")
    val right = Seq(
      (1L, ts(10), 100.0),
      (1L, ts(20), 200.0),
      (2L, ts(30), 999.0),
    ).toDF("user_id", "ts", "value")

    val got = AsofJoin.asof(left, right, "user_id", "ts", "value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toSet
    assert(got === Set(
      (1L, ts(0), None),
      (1L, ts(10), Some(100.0)),
      (1L, ts(15), Some(100.0)),
      (1L, ts(25), Some(200.0)),
      (2L, ts(25), None),
    ))
  }

  test("a right row whose value is NULL matches as NULL, not an earlier value") {
    // DuckDB ASOF JOIN attaches the matched row even when its value is NULL;
    // skipping it and falling back to the @10 row would silently diverge.
    val left = Seq((1L, ts(25))).toDF("user_id", "ts")
    val right = Seq(
      (1L, ts(10), Some(100.0)),
      (1L, ts(20), None), // the latest at-or-before row — value genuinely NULL
    ).toDF("user_id", "ts", "value")

    val got = AsofJoin.asof(left, right, "user_id", "ts", "value")
      .collect().map(r => Option(r.get(2))).toSeq
    assert(got === Seq(None))
  }
}
