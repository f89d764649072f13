package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.dq.{Rule, Validator}
import graft.queries.Registry.t

/** The call-center-shaped operators mapped onto the `events` table
  * (FIXTURES.md §B: event_type buckets ≈ call_status buckets), plus the
  * streaming-adjacent batch ops: sessionization, tumbling windows, JSON
  * extraction.
  *
  * Rate columns use `CAST(n*100 AS DOUBLE)/total` — integer math plus ONE
  * IEEE division, bit-exact across engines (no round-off ambiguity).
  */
object EventQueries {

  private val buckets = Seq("signup", "click", "view", "purchase", "error")

  val all: Map[String, GraftQuery] = Map(

    // gold_call_daily_summary analog (reference 02:51-79): conditional
    // status buckets + rate per day.
    "e1_daily_summary" -> GraftQuery(
      (s, dir) => t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("event_date"))
        .agg(count(lit(1)).as("total_events"),
          buckets.map(b =>
            sum(when(col("event_type") === b, 1).otherwise(0)).as(s"${b}_events")): _*)
        .withColumn("purchase_rate_pct",
          (col("purchase_events") * 100).cast("double") / col("total_events")),
      // DuckDB sum(INT) is HUGEINT (int128) — cast every integer sum to
      // BIGINT or the driver's value compare sees 5.0 vs 5.
      Some(s"""SELECT CAST(ts AS DATE) AS event_date,
              |       count(*) AS total_events,
              |       ${buckets.map(b =>
                 s"CAST(sum(CASE WHEN event_type = '$b' THEN 1 ELSE 0 END) AS BIGINT) AS ${b}_events").mkString(",\n       ")},
              |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 100 AS DOUBLE)
              |         / count(*) AS purchase_rate_pct
              |FROM events GROUP BY 1""".stripMargin),
      "manual-PIVOT conditional aggregation, the reference's signature agg"),

    // gold_agent_performance analog (02:83-111): multi-key grain.
    "e2_user_daily" -> GraftQuery(
      (s, dir) => t(s, dir, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("event_date"))
        .agg(count(lit(1)).as("total_events"),
          sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("purchase_events"),
          sum(when(col("event_type") === "error", 1).otherwise(0)).as("error_events")),
      Some("""SELECT user_id, CAST(ts AS DATE) AS event_date,
             |       count(*) AS total_events,
             |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_events,
             |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_events
             |FROM events GROUP BY user_id, CAST(ts AS DATE)""".stripMargin),
      "multi-key conditional aggregation"),

    // gold_call_duration_metrics analog (02:116-129): avg/min/max of an
    // integer measure (value*100 is integral cents) with a >= filter.
    "e3_value_metrics" -> GraftQuery(
      (s, dir) => t(s, dir, "events")
        .withColumn("cents", round(col("value") * 100, 0).cast("long"))
        .filter(col("cents") >= 0)
        .groupBy(to_date(col("ts")).as("event_date"))
        .agg(avg("cents").as("avg_value_cents"),
             min("cents").as("min_value_cents"),
             max("cents").as("max_value_cents")),
      Some("""SELECT CAST(ts AS DATE) AS event_date,
             |       avg(cents) AS avg_value_cents,
             |       min(cents) AS min_value_cents,
             |       max(cents) AS max_value_cents
             |FROM (SELECT ts, CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events)
             |WHERE cents >= 0
             |GROUP BY 1""".stripMargin),
      "avg/min/max over exact integer measure (cents) — deterministic avg"),

    // Athena Q1/Q5 analog: top error-rate days, totally ordered.
    "e4_failure_days" -> GraftQuery(
      (s, dir) => t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("event_date"))
        .agg(count(lit(1)).as("total_events"),
          sum(when(col("event_type") === "error", 1).otherwise(0)).as("error_events"))
        .withColumn("error_rate_pct",
          (col("error_events") * 100).cast("double") / col("total_events"))
        .orderBy(col("error_rate_pct").desc, col("event_date"))
        .limit(10),
      Some("""SELECT * FROM (
             |  SELECT CAST(ts AS DATE) AS event_date,
             |         count(*) AS total_events,
             |         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_events,
             |         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 100 AS DOUBLE)
             |           / count(*) AS error_rate_pct
             |  FROM events GROUP BY 1)
             |ORDER BY error_rate_pct DESC, event_date LIMIT 10""".stripMargin),
      "derived-ratio top-k (Athena Q5 shape) with unique tiebreaker"),

    // Athena Q4 analog: top users by purchase rate — ratio of sums
    // (weighted rate), exact integer math + one division.
    "e5_top_users" -> GraftQuery(
      (s, dir) => t(s, dir, "events")
        .groupBy("user_id")
        .agg(count(lit(1)).as("total_events"),
          sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("purchase_events"))
        .withColumn("purchase_rate_pct",
          (col("purchase_events") * 100).cast("double") / col("total_events"))
        .orderBy(col("purchase_rate_pct").desc, col("user_id"))
        .limit(5),
      Some("""SELECT * FROM (
             |  SELECT user_id, count(*) AS total_events,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_events,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 100 AS DOUBLE)
             |           / count(*) AS purchase_rate_pct
             |  FROM events GROUP BY user_id)
             |ORDER BY purchase_rate_pct DESC, user_id LIMIT 5""".stripMargin),
      "top-k agents analog (Athena Q4)"),

    // The validation algebra (reference 01:48-78) applied to events:
    // two-stage when-chains folded with null-skipping concat_ws.
    "e6_validation" -> GraftQuery(
      (s, dir) => {
        val rules = Seq(
          Rule.notNullMatching("user_id", "^[0-9]+$",
            "user_id must not be NULL", "user_id must be numeric"),
          Rule.notNullInDomainCI("event_type", Seq("SIGNUP", "CLICK", "VIEW", "PURCHASE"),
            "event_type must not be NULL", "invalid event_type values"),
          Rule.notNullMatching("props", "^\\{\"k\": [0-9]+\\}$",
            "props must not be NULL", "invalid props"),
        )
        new Validator(rules).validate(t(s, dir, "events"))
          .select("event_id", "Reject_reason")
      },
      Some("""SELECT event_id,
             |  CASE WHEN joined = '' THEN NULL ELSE joined END AS Reject_reason
             |FROM (
             |  SELECT event_id, concat_ws(' | ',
             |    CASE WHEN user_id IS NULL THEN 'user_id must not be NULL'
             |         WHEN NOT regexp_matches(CAST(user_id AS VARCHAR), '^[0-9]+$')
             |           THEN 'user_id must be numeric' END,
             |    CASE WHEN event_type IS NULL THEN 'event_type must not be NULL'
             |         WHEN upper(event_type) NOT IN ('SIGNUP','CLICK','VIEW','PURCHASE')
             |           THEN 'invalid event_type values' END,
             |    CASE WHEN props IS NULL THEN 'props must not be NULL'
             |         WHEN NOT regexp_matches(props, '^\{"k": [0-9]+\}$')
             |           THEN 'invalid props' END) AS joined
             |  FROM events)""".stripMargin),
      "declarative DQ: per-rule when-chains + ' | '-joined Reject_reason"),

    // Sessionization: 30-min-gap sessions per user via lag + running sum.
    // Microsecond-exact gaps; unique (ts, event_id) order.
    "e7_sessionize" -> GraftQuery(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "events")
          .withColumn("us", unix_micros(col("ts")))
          .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
          .withColumn("is_new",
            when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1).otherwise(0))
          .withColumn("session_id", sum(col("is_new")).over(wRun))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
               (max(col("us")) - min(col("us"))).as("session_us"))
      },
      Some("""SELECT user_id, session_id, count(*) AS n_events,
             |       max(us) - min(us) AS session_us
             |FROM (
             |  SELECT user_id, us,
             |         CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END)
             |           OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM (
             |    SELECT user_id, ts, event_id, epoch_us(ts) AS us,
             |           epoch_us(ts) - lag(epoch_us(ts), 1)
             |             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
             |    FROM events))
             |GROUP BY user_id, session_id""".stripMargin),
      "gap-based sessionization: lag + running conditional sum, one shuffle"),

    // Tumbling-window aggregate (batch form of the streaming windowed agg).
    "e8_hourly_window" -> GraftQuery(
      // hour_start keeps Spark's instant (TIMESTAMP) semantics — the
      // normalization for the compare happens on the ORACLE side instead
      // (cast to TIMESTAMPTZ under the pinned UTC session), so the engine's
      // output schema is not bent to fit the test harness.
      (s, dir) => t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour_start"))
        .agg(count(lit(1)).as("n_events"),
             round(sum("value"), 2).as("total_value")),
      Some("""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMPTZ) AS hour_start,
             |       count(*) AS n_events,
             |       round(sum(value), 2) AS total_value
             |FROM events GROUP BY 1""".stripMargin),
      "tumbling 1h window as date_trunc groupBy"),

    // Scalar-function suite covering the categories the reference never
    // touches (SURVEY.md §2.4 "absent"): null-handling (coalesce), date
    // arithmetic (datediff), regexp_extract, string ops (substring/upper/
    // lpad). Pure projection — codegen'd, zero shuffles.
    "e10_scalar_suite" -> GraftQuery(
      (s, dir) => t(s, dir, "events")
        .select(col("event_id"),
          coalesce(col("value"), lit(0.0)).as("value_nz"),
          datediff(to_date(col("ts")), lit(java.sql.Date.valueOf("2026-01-01"))).as("days_since"),
          regexp_extract(col("props"), "\"k\":\\s*([0-9]+)", 1).cast("long").as("k_val"),
          upper(substring(col("event_type"), 1, 3)).as("type3"),
          lpad(col("user_id").cast("string"), 8, "0").as("user_key")),
      Some("""SELECT event_id, coalesce(value, 0.0) AS value_nz,
             |       CAST(datediff('day', DATE '2026-01-01', CAST(ts AS DATE)) AS INT) AS days_since,
             |       CAST(regexp_extract(props, '"k":\s*([0-9]+)', 1) AS BIGINT) AS k_val,
             |       upper(substring(event_type, 1, 3)) AS type3,
             |       lpad(CAST(user_id AS VARCHAR), 8, '0') AS user_key
             |FROM events""".stripMargin),
      "scalar coverage: coalesce/datediff/regexp_extract/substring/lpad"),

    // As-of join (graft.operators.AsofJoin): every event is enriched with
    // the user's most recent purchase value at-or-before its timestamp —
    // the point-in-time lookup Spark lacks natively, composed as
    // union + one keyed window pass (no range explosion). DuckDB's native
    // ASOF LEFT JOIN is the oracle.
    "e11_asof_join" -> GraftQuery(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val wDedup = Window.partitionBy("user_id", "ts").orderBy(col("event_id").desc)
        val purchases = ev.filter(col("event_type") === "purchase")
          .withColumn("rn", row_number().over(wDedup)).filter(col("rn") === 1)
          .select("user_id", "ts", "value")
        graft.operators.AsofJoin
          .asof(ev.select("event_id", "user_id", "ts"), purchases, "user_id", "ts", "value")
          .select("event_id", "user_id", "asof_value")
      },
      Some("""WITH p AS (
             |  SELECT user_id, ts, value FROM (
             |    SELECT user_id, ts, value,
             |           row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
             |    FROM events WHERE event_type = 'purchase') WHERE rn = 1)
             |SELECT e.event_id, e.user_id, p.value AS asof_value
             |FROM events e ASOF LEFT JOIN p
             |  ON e.user_id = p.user_id AND e.ts >= p.ts""".stripMargin),
      "as-of (point-in-time) join vs DuckDB's native ASOF JOIN"),

    // Binned range join (graft.operators.RangeJoin): each purchase opens a
    // 30-minute window for its user; count events landing in any window.
    // The bin width matches the interval length, so intervals replicate to
    // at most 2 bins and the join is a plain equi-join on (user, bin) —
    // never a nested-loop range scan.
    "e12_range_join" -> GraftQuery(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val windows = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("w_start"),
            (col("ts") + expr("INTERVAL 30 MINUTES")).as("w_end"))
        graft.operators.RangeJoin
          .binnedRangeJoin(ev.select("event_id", "user_id", "ts"), windows,
            "user_id", "ts", "w_start", "w_end", binWidthSec = 1800L)
          .groupBy("user_id").agg(count(lit(1)).as("n_hits"))
      },
      Some("""WITH w AS (SELECT user_id, ts AS w_start, ts + INTERVAL 30 MINUTE AS w_end
             |           FROM events WHERE event_type = 'purchase')
             |SELECT e.user_id, count(*) AS n_hits
             |FROM events e JOIN w ON e.user_id = w.user_id
             |                     AND e.ts >= w.w_start AND e.ts <= w.w_end
             |GROUP BY e.user_id""".stripMargin),
      "binned interval join vs DuckDB's plain range join"),

    // NATIVE pivot (the reference's A2 is the manual sum(when) form —
    // this is the operator-class twin with an explicit value list, which
    // keeps the plan a single pass + one shuffle, no value-discovery scan).
    "e13_pivot" -> GraftQuery(
      (s, dir) => t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("event_date"))
        .pivot("event_type", buckets)
        .count()
        .na.fill(0L, buckets),
      Some(s"""SELECT CAST(ts AS DATE) AS event_date,
              |       ${buckets.map(b =>
                 s"CAST(count(CASE WHEN event_type = '$b' THEN 1 END) AS BIGINT) AS $b").mkString(",\n       ")}
              |FROM events GROUP BY 1""".stripMargin),
      "native pivot with explicit values (vs manual sum(when) in e1)"),

    // collect_list/collect_set (absent in the reference, §2.5): per-user
    // sorted distinct event-type arrays — array_sort makes the
    // order-nondeterministic collection deterministic for the compare.
    // CSV-joined (not an array column) so the driver's cell-stringify
    // compare never sees engine-specific array formatting.
    "e14_collect" -> GraftQuery(
      (s, dir) => t(s, dir, "events")
        .groupBy("user_id")
        .agg(array_join(array_sort(collect_set(col("event_type"))), ",").as("types_csv"),
             count(lit(1)).as("n_events")),
      Some("""SELECT user_id,
             |       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_csv,
             |       count(*) AS n_events
             |FROM events GROUP BY user_id""".stripMargin),
      "collect_set + deterministic array_sort, CSV-joined"),

    // JSON extraction from the props column.
    "e9_json_extract" -> GraftQuery(
      (s, dir) => t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
             sum("k").as("sum_k"),
             max("k").as("max_k")),
      Some("""SELECT event_type, count(*) AS n_events,
             |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
             |FROM events GROUP BY event_type""".stripMargin),
      "get_json_object over JSON-in-string column"),

    // Analytic window-function suite beyond rank: lead/lag navigation,
    // ntile bucketing, cume_dist. All share ONE window (user_id, ordered by
    // the unique (ts, event_id)) so Spark plans a single shuffle + sort.
    // cume_dist is rows≤current / rows-in-partition — one IEEE division,
    // bit-exact across engines; ntile follows the SQL-standard fill rule in
    // both.
    "e15_window_suite" -> GraftQuery(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            lag(col("event_type"), 1).over(w).as("prev_type"),
            lead(col("event_type"), 1).over(w).as("next_type"),
            ntile(4).over(w).as("quartile"),
            cume_dist().over(w).as("cdist"))
      },
      Some("""SELECT user_id, event_id,
             |       lag(event_type, 1) OVER w AS prev_type,
             |       lead(event_type, 1) OVER w AS next_type,
             |       CAST(ntile(4) OVER w AS INT) AS quartile,
             |       cume_dist() OVER w AS cdist
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin),
      "lead/lag/ntile/cume_dist over one shared window — single shuffle"),

    // The remaining §2.8 window family: first/last/nth value over an
    // explicit full frame (last_value under the default frame is the
    // running last — a classic trap both engines share; the explicit
    // UNBOUNDED frame pins the intended semantics), dense_rank and
    // percent_rank over a value ordering with a unique tiebreaker. Same
    // single-shuffle shared-window shape as e15; value columns pass
    // through untouched so doubles stay bit-exact.
    "e18_window_suite2" -> GraftQuery(
      (s, dir) => {
        val frame = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val rank = Window.partitionBy(col("user_id"))
          .orderBy(col("value"), col("event_id"))
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            first(col("value")).over(frame).as("first_v"),
            last(col("value")).over(frame).as("last_v"),
            nth_value(col("value"), 3).over(frame).as("third_v"),
            dense_rank().over(rank).as("drank"),
            percent_rank().over(rank).as("prank"))
      },
      Some("""SELECT user_id, event_id,
             |       first_value(value) OVER frame AS first_v,
             |       last_value(value) OVER frame AS last_v,
             |       nth_value(value, 3) OVER frame AS third_v,
             |       CAST(dense_rank() OVER rnk AS INT) AS drank,
             |       percent_rank() OVER rnk AS prank
             |FROM events
             |WINDOW frame AS (PARTITION BY user_id ORDER BY ts, event_id
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
             |       rnk AS (PARTITION BY user_id ORDER BY value, event_id)""".stripMargin),
      "first/last/nth_value with explicit frames + dense/percent_rank"),

    // Date-arithmetic suite (SURVEY §2.4 lists date arithmetic beyond
    // year/month as absent from the reference): calendar navigation,
    // month-clamped add_months, truncation, formatting. Pure projection,
    // codegen'd. Spark's dayofweek is 1=Sunday..7 while DuckDB's is
    // 0=Sunday..6 — the oracle shifts by one; add_months and DuckDB's
    // `+ INTERVAL n MONTH` share end-of-month clamping (Jan 31 + 1M =
    // Feb 28, probed before gating).
    "e17_datetime_suite" -> GraftQuery(
      (s, dir) => t(s, dir, "events").select(
        col("event_id"),
        dayofweek(to_date(col("ts"))).as("dow"),
        weekofyear(to_date(col("ts"))).as("iso_week"),
        quarter(to_date(col("ts"))).as("qtr"),
        dayofyear(to_date(col("ts"))).as("doy"),
        last_day(to_date(col("ts"))).as("month_end"),
        add_months(to_date(col("ts")), 2).as("plus_2m"),
        trunc(to_date(col("ts")), "month").as("month_start"),
        date_add(to_date(col("ts")), 10).as("plus_10d"),
        date_format(col("ts"), "yyyy-MM").as("ym")),
      Some("""SELECT event_id,
             |       CAST(dayofweek(CAST(ts AS DATE)) + 1 AS INT) AS dow,
             |       CAST(weekofyear(CAST(ts AS DATE)) AS INT) AS iso_week,
             |       CAST(quarter(CAST(ts AS DATE)) AS INT) AS qtr,
             |       CAST(dayofyear(CAST(ts AS DATE)) AS INT) AS doy,
             |       last_day(CAST(ts AS DATE)) AS month_end,
             |       CAST(CAST(ts AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus_2m,
             |       CAST(date_trunc('month', CAST(ts AS DATE)) AS DATE) AS month_start,
             |       CAST(ts AS DATE) + 10 AS plus_10d,
             |       strftime(ts, '%Y-%m') AS ym
             |FROM events""".stripMargin),
      "date arithmetic: dow/week/quarter/doy/last_day/add_months/trunc/format"),

    // Event-time RANGE frame: per user, how many events (and the min/max
    // value) landed in the trailing hour INCLUDING this one. rangeBetween
    // needs a numeric ordering column — epoch micros; the frame bound is
    // then exact integer arithmetic. min/max are association-order-free, so
    // (unlike a windowed double sum, which DuckDB computes via segment
    // trees in a different addition order) the cells are bit-stable.
    "e16_rolling_range" -> GraftQuery(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
          .rangeBetween(-3600000000L, 0L)
        t(s, dir, "events")
          .withColumn("us", unix_micros(col("ts")))
          .withColumn("n_last_hour", count(lit(1)).over(w))
          .withColumn("min_val_hour", min(col("value")).over(w))
          .withColumn("max_val_hour", max(col("value")).over(w))
          .groupBy("user_id")
          .agg(max(col("n_last_hour")).as("peak_hourly_events"),
               min(col("min_val_hour")).as("min_val"),
               max(col("max_val_hour")).as("max_val"))
      },
      Some("""SELECT user_id,
             |       CAST(max(n_last_hour) AS BIGINT) AS peak_hourly_events,
             |       min(min_val_hour) AS min_val,
             |       max(max_val_hour) AS max_val
             |FROM (
             |  SELECT user_id,
             |         count(*) OVER w AS n_last_hour,
             |         min(value) OVER w AS min_val_hour,
             |         max(value) OVER w AS max_val_hour
             |  FROM (SELECT user_id, value, epoch_us(ts) AS us FROM events)
             |  WINDOW w AS (PARTITION BY user_id ORDER BY us
             |               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW))
             |GROUP BY user_id""".stripMargin),
      "trailing-1h RANGE frame on epoch micros; peak rolling density per user"),

    // Spark's NATIVE session_window — the idiomatic twin of e7's
    // lag-gap sessionization (and of st2's stateful streaming form): one
    // groupBy over (user, session_window(ts, gap)) and Catalyst plans the
    // merge itself, no window-function pass. Semantics pinned by the
    // oracle replay: a gap of EXACTLY the 30-minute threshold starts a
    // new session (Spark merges only events strictly inside the previous
    // window's end), and a session's window END is last event + gap.
    // One shuffle on (user_id) — the same scale shape as e7.
    "e19_session_window" -> GraftQuery(
      (s, dir) => t(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("sw.start")).as("start_us"),
          unix_micros(col("sw.end")).as("end_us"),
          col("n_events")),
      Some("""SELECT user_id, min(us) AS start_us,
             |       max(us) + 1800000000 AS end_us, count(*) AS n_events
             |FROM (
             |  SELECT user_id, us,
             |         CAST(sum(CASE WHEN gap_us IS NULL OR gap_us >= 1800000000 THEN 1 ELSE 0 END)
             |           OVER (PARTITION BY user_id ORDER BY us, event_id
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM (
             |    SELECT user_id, event_id, epoch_us(ts) AS us,
             |           epoch_us(ts) - lag(epoch_us(ts), 1)
             |             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
             |    FROM events))
             |GROUP BY user_id, session_id""".stripMargin),
      "native session_window sessionization: Catalyst-planned gap merge, one shuffle"),

    // Conversion-funnel analysis (the product-analytics staple): per user,
    // the first view, the first click STRICTLY AFTER that view, the first
    // purchase strictly after that click — ORDERED matching, not mere
    // presence (a purchase before any view must not count). One total
    // per-user order (row_number over ts, event_id — tie-safe), then three
    // chained window minima over the SAME partition key: a single
    // user-hash shuffle regardless of corpus size, no self-joins. The
    // census row is the funnel: total → viewed → clicked → purchased.
    "e20_funnel" -> GraftQuery(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val wAll = Window.partitionBy("user_id")
        t(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .withColumn("fv",
            min(when(col("event_type") === "view", col("rn"))).over(wAll))
          .withColumn("fc",
            min(when(col("event_type") === "click" && col("rn") > col("fv"),
              col("rn"))).over(wAll))
          .withColumn("fp",
            min(when(col("event_type") === "purchase" && col("rn") > col("fc"),
              col("rn"))).over(wAll))
          .groupBy("user_id")
          // per-user collapse REUSES the windows' user_id partitioning —
          // zero additional exchange — where count(DISTINCT CASE ...)
          // would Expand the corpus ×4 before its dedup shuffle
          .agg(max(col("fv")).as("fv"), max(col("fc")).as("fc"),
            max(col("fp")).as("fp"))
          .agg(count(lit(1)).as("users_total"),
            count(col("fv")).as("users_viewed"),
            count(col("fc")).as("users_clicked"),
            count(col("fp")).as("users_purchased"))
      },
      Some("""WITH o AS (
             |  SELECT user_id, event_type,
             |         row_number() OVER (PARTITION BY user_id
             |                            ORDER BY ts, event_id) AS rn
             |  FROM events),
             |v AS (SELECT *, min(CASE WHEN event_type = 'view' THEN rn END)
             |                  OVER (PARTITION BY user_id) AS fv FROM o),
             |c AS (SELECT *, min(CASE WHEN event_type = 'click' AND rn > fv
             |                         THEN rn END)
             |                  OVER (PARTITION BY user_id) AS fc FROM v),
             |p AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND rn > fc
             |                         THEN rn END)
             |                  OVER (PARTITION BY user_id) AS fp FROM c),
             |u AS (SELECT user_id, max(fv) AS fv, max(fc) AS fc, max(fp) AS fp
             |      FROM p GROUP BY user_id)
             |SELECT CAST(count(*) AS BIGINT) AS users_total,
             |       CAST(count(fv) AS BIGINT) AS users_viewed,
             |       CAST(count(fc) AS BIGINT) AS users_clicked,
             |       CAST(count(fp) AS BIGINT) AS users_purchased
             |FROM u""".stripMargin),
      "ordered conversion funnel: chained window minima, one user-hash shuffle"),

    // Cohort retention (e20's sibling product-analytics staple): users
    // cohort by FIRST-ACTIVE DAY; each later active day counts them into
    // (cohort_day, day-offset). Shapes: one (user, day) distinct shuffle,
    // a window min for the cohort day (user-keyed), a small census —
    // offsets are exact integer datediffs, and a user contributes at most
    // once per (cohort, offset) because (user, day) is already distinct,
    // so the census is a plain count, no second distinct pass.
    "e21_cohort_retention" -> GraftQuery(
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
        val w = Window.partitionBy("user_id")
        ev.withColumn("cohort_day", min(col("d")).over(w))
          .select(col("cohort_day"),
            datediff(col("d"), col("cohort_day")).as("day_offset"))
          .groupBy("cohort_day", "day_offset")
          .agg(count(lit(1)).as("n_users"))
          .orderBy("cohort_day", "day_offset")
      },
      Some("""WITH ev AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
             |            FROM events),
             |c AS (SELECT *, min(d) OVER (PARTITION BY user_id) AS cohort_day
             |      FROM ev)
             |SELECT cohort_day, CAST(datediff('day', cohort_day, d) AS INT) AS day_offset,
             |       CAST(count(*) AS BIGINT) AS n_users
             |FROM c GROUP BY cohort_day, day_offset ORDER BY cohort_day, day_offset""".stripMargin),
      "cohort retention: first-active-day cohorts, exact day-offset census"),
  )
}
