package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.Registry.t

/** Core relational coverage over the TPC-H-ish tables: scans, projections,
  * filter pushdown, hash aggregation, conditional buckets, broadcast joins,
  * multi-join chains, top-k (SURVEY.md §2.1/2.2/2.5/2.6/2.7).
  */
object CoreQueries {

  val all: Map[String, GraftQuery] = Map(

    // Pricing-summary aggregation (reference's A1/A2 hash-agg family).
    // sum(l_quantity) is exact (integer-valued doubles); avg = one division.
    "q1_agg" -> GraftQuery(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          count(lit(1)).as("n_rows"),
          round(sum("l_extendedprice"), 2).as("sum_price")),
      Some("""SELECT l_returnflag, l_linestatus,
             |       sum(l_quantity) AS sum_qty,
             |       count(*) AS n_rows,
             |       round(sum(l_extendedprice), 2) AS sum_price
             |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin),
      "hash aggregation with map-side combine; one shuffle on group keys"),

    // Projection + predicate pushdown: both filters and the 3-column read
    // schema reach the parquet scan (verified via explain: PushedFilters).
    "q2_filter_project" -> GraftQuery(
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_discount") > 0.05 && col("l_quantity") < 10)
        .select("l_orderkey", "l_linenumber", "l_extendedprice"),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice
             |FROM lineitem
             |WHERE l_discount > 0.05 AND l_quantity < 10""".stripMargin),
      "filter + column pruning pushed to the parquet scan"),

    // Distinct aggregation (absent from the reference — §2.5 notes it as an
    // engine-completeness gap): per-flag distinct supplier/part counts.
    // Spark plans this as Expand + two-phase agg; one extra shuffle, no
    // driver-side work.
    "q3_distinct_agg" -> GraftQuery(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct("l_suppkey").as("n_suppliers"),
             countDistinct("l_partkey").as("n_parts"),
             count(lit(1)).as("n_rows")),
      Some("""SELECT l_returnflag,
             |       count(DISTINCT l_suppkey) AS n_suppliers,
             |       count(DISTINCT l_partkey) AS n_parts,
             |       count(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag""".stripMargin),
      "distinct aggregation via Expand + two-phase hash agg"),

    // Broadcast-dim join: customer is the provably-small side.
    "q4_join_broadcast" -> GraftQuery(
      (s, dir) => t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
             round(sum("o_totalprice"), 2).as("revenue")),
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
             |       round(sum(o_totalprice), 2) AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment""".stripMargin),
      "broadcast hash join — no shuffle of the fact side"),

    // Deep join chain: fact ⋈ fact ⋈ dims; dims broadcast, Catalyst
    // reorders; filter on o_orderstatus pushes below the joins.
    "q5_join_deep" -> GraftQuery(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        val c = broadcast(t(s, dir, "customer"))
        val n = broadcast(t(s, dir, "nation"))
        val r = broadcast(t(s, dir, "region"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
               count(lit(1)).as("n_items"))
      },
      Some("""SELECT r_name, n_name,
             |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             |       count(*) AS n_items
             |FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey
             |WHERE o_orderstatus = 'F'
             |GROUP BY r_name, n_name""".stripMargin),
      "5-table join; one shuffle join (li⋈o), three broadcasts"),

    // Semi/anti join coverage: customers with no 'F' order (NOT EXISTS).
    "q6_anti_join" -> GraftQuery(
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
                .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment"),
      Some("""SELECT c_custkey, c_name, c_mktsegment
             |FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin),
      "left-anti join (NOT EXISTS) — the MERGE building block, user-facing"),

    // Distributed top-k: ORDER BY + LIMIT plans as TakeOrderedAndProject
    // (no full sort). Total order via (o_totalprice DESC, o_orderkey).
    "q7_topk" -> GraftQuery(
      (s, dir) => t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin),
      "top-k via TakeOrderedAndProject; unique tiebreaker for determinism"),

    // Set op + distinct coverage: suppliers' nations UNION customers'
    // nations (distinct union), EXCEPT nations of region key 0.
    "q8_set_ops" -> GraftQuery(
      (s, dir) => {
        val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
        val cn = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        val r0 = t(s, dir, "nation").filter(col("n_regionkey") === 0)
          .select(col("n_nationkey").as("nationkey"))
        sn.union(cn).distinct().except(r0)
      },
      Some("""SELECT s_nationkey AS nationkey FROM supplier
             |UNION
             |SELECT c_nationkey AS nationkey FROM customer
             |EXCEPT
             |SELECT n_nationkey AS nationkey FROM nation WHERE n_regionkey = 0""".stripMargin),
      "UNION distinct + EXCEPT"),

    // Bucketed CO-LOCATED join: both fact tables written once per JVM as
    // bucketed managed tables on the join key — the fact⋈fact join then
    // needs NO shuffle of either side (scan → sort → SortMergeJoin; the
    // only Exchange left is the one for the final groupBy). At 100 TB this
    // is the difference between re-shuffling both fact tables per query and
    // amortizing one layout write across every keyed join. Bucket layout is
    // asserted shuffle-free in LayoutSpec.
    "q10_bucketed_join" -> GraftQuery(
      (s, dir) => {
        val sfx = Registry.sanitize(dir)
        val (oTbl, lTbl) = (s"orders_bkt_$sfx", s"lineitem_bkt_$sfx")
        if (!s.catalog.tableExists(oTbl)) {
          t(s, dir, "orders").write.mode("overwrite")
            .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(oTbl)
          t(s, dir, "lineitem").write.mode("overwrite")
            .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(lTbl)
        }
        s.table(oTbl).join(s.table(lTbl), col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_items"),
               round(sum("l_extendedprice"), 2).as("revenue"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n_items,
             |       round(sum(l_extendedprice), 2) AS revenue
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY o_orderstatus""".stripMargin),
      "bucket-pruned fact-to-fact join: zero join-side shuffles"),

    // Skew-salted join (graft.operators.SkewJoin): hot keys spread over 8
    // salt buckets; the result is provably identical to the plain join (the
    // oracle IS the plain join).
    "q11_salted_join" -> GraftQuery(
      (s, dir) => {
        val big = t(s, dir, "lineitem").withColumnRenamed("l_suppkey", "suppkey")
        val small = t(s, dir, "supplier").withColumnRenamed("s_suppkey", "suppkey")
        graft.operators.SkewJoin.saltedJoin(big, small, "suppkey", salts = 8)
          .groupBy("s_nationkey")
          .agg(count(lit(1)).as("n_items"), sum("l_quantity").as("sum_qty"))
      },
      Some("""SELECT s_nationkey, count(*) AS n_items, sum(l_quantity) AS sum_qty
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY s_nationkey""".stripMargin),
      "salted skew join — result-identical to the plain join oracle"),

    // Exact percentiles (quartiles of quantity per flag): Spark's
    // `percentile` and DuckDB's `quantile_cont` share the same linear
    // interpolation h=(n-1)p — on integer-valued doubles the arithmetic is
    // bit-exact across engines.
    // Scalar columns (not an array) so the driver's cell-stringify compare
    // never sees engine-specific array formatting.
    "q14_percentiles" -> GraftQuery(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.25D)").as("qty_p25"),
             expr("percentile(l_quantity, 0.5D)").as("qty_p50"),
             expr("percentile(l_quantity, 0.75D)").as("qty_p75")),
      Some("""SELECT l_returnflag,
             |       quantile_cont(l_quantity, 0.25) AS qty_p25,
             |       quantile_cont(l_quantity, 0.5) AS qty_p50,
             |       quantile_cont(l_quantity, 0.75) AS qty_p75
             |FROM lineitem GROUP BY l_returnflag""".stripMargin),
      "exact interpolated quartiles (sort-based aggregate)"),

    // Approx distinct (HLL++): impl-specific sketch values have no DuckDB
    // twin → rows-only check; SketchSpec asserts the estimate lands within
    // the configured error bound of the exact count computed alongside.
    // At 100 TB this replaces the Expand+double-shuffle exact distinct with
    // a constant-size mergeable sketch.
    "q13_approx_distinct" -> GraftQuery(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct("l_orderkey", rsd = 0.02).as("approx_orders"),
             countDistinct("l_orderkey").as("exact_orders")),
      None,
      "HyperLogLog++ distinct estimate next to the exact count"),

    // ROLLUP (grouping-sets family — absent from the reference, §2.5):
    // subtotal rows carry NULL group keys; grouping_id disambiguates a real
    // NULL from a rollup subtotal.
    "q12_rollup" -> GraftQuery(
      (s, dir) => t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"),
             sum("l_quantity").as("sum_qty"),
             grouping_id().as("gid")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
             |       sum(l_quantity) AS sum_qty, CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin),
      "rollup with grouping_id over the pricing keys"),

    // GROUPING SETS (the general grouping-sets form; q12 covers ROLLUP):
    // per-flag totals, per-status totals, and the grand total in ONE pass —
    // Spark plans a single Expand + hash agg, not three scans.
    "q16_grouping_sets" -> GraftQuery(
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
        s.sql("""SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
                |       sum(l_quantity) AS sum_qty,
                |       grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid
                |FROM lineitem_v
                |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
             |       sum(l_quantity) AS sum_qty,
             |       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS gid
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin),
      "grouping sets: three groupings in one Expand + agg pass"),

    // UNPIVOT (wide → long melt): per-flag metric matrix to (flag, metric,
    // value) rows. Spark's native unpivot; the oracle states the same
    // relation as a UNION ALL (the ANSI-portable spelling).
    "q17_unpivot" -> GraftQuery(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(sum("l_quantity").as("sum_qty"),
             round(sum("l_extendedprice"), 2).as("sum_price"),
             count(lit(1)).cast("double").as("n_rows"))
        .unpivot(
          ids = Array(col("l_returnflag")),
          values = Array(col("sum_qty"), col("sum_price"), col("n_rows")),
          variableColumnName = "metric",
          valueColumnName = "metric_value"),
      Some("""WITH wide AS (
             |  SELECT l_returnflag, sum(l_quantity) AS sum_qty,
             |         round(sum(l_extendedprice), 2) AS sum_price,
             |         CAST(count(*) AS DOUBLE) AS n_rows
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS metric_value FROM wide
             |UNION ALL
             |SELECT l_returnflag, 'sum_price', sum_price FROM wide
             |UNION ALL
             |SELECT l_returnflag, 'n_rows', n_rows FROM wide""".stripMargin),
      "native unpivot (melt) of an aggregate matrix"),

    // FULL OUTER join with BOTH sides dangling (customers %3 pruned vs
    // order-keys %5 pruned), classified into left-only / right-only / both
    // — the join type q4-q6 don't reach. Shuffled hash/merge join on the
    // key; the classification is a post-join projection.
    "q19_full_outer" -> GraftQuery(
      (s, dir) => {
        val c = t(s, dir, "customer").filter(col("c_custkey") % 3 =!= 0)
          .select(col("c_custkey"))
        val o = t(s, dir, "orders").filter(col("o_custkey") % 5 =!= 0)
          .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
        c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(
            when(col("c_custkey").isNull, "right_only")
              .when(col("o_custkey").isNull, "left_only")
              .otherwise("both").as("side"),
            coalesce(col("c_custkey"), col("o_custkey")).as("key"),
            col("n_orders"))
          .groupBy("side")
          .agg(count(lit(1)).as("n_keys"), sum("key").as("key_sum"),
               sum("n_orders").as("order_sum"))
      },
      Some("""WITH c AS (SELECT c_custkey FROM customer WHERE c_custkey % 3 <> 0),
             |     o AS (SELECT o_custkey, count(*) AS n_orders
             |           FROM orders WHERE o_custkey % 5 <> 0 GROUP BY o_custkey)
             |SELECT CASE WHEN c_custkey IS NULL THEN 'right_only'
             |            WHEN o_custkey IS NULL THEN 'left_only'
             |            ELSE 'both' END AS side,
             |       count(*) AS n_keys,
             |       CAST(sum(coalesce(c_custkey, o_custkey)) AS BIGINT) AS key_sum,
             |       CAST(sum(n_orders) AS BIGINT) AS order_sum
             |FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
             |GROUP BY 1""".stripMargin),
      "full outer join, both sides dangling, presence classification"),

    // Left-semi join (EXISTS) — q6's anti twin: customers with at least
    // one open order. Semi joins stop probing at the first match and never
    // widen the row, unlike an inner join + distinct.
    "q20_semi_join" -> GraftQuery(
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "O")
                .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin),
      "left-semi join (EXISTS): first-match probe, no row widening"),

    // INTERSECT (q8 covers UNION/EXCEPT): nations present on BOTH the
    // supplier and customer sides.
    "q21_intersect" -> GraftQuery(
      (s, dir) => t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
        .intersect(t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))),
      Some("""SELECT s_nationkey AS nationkey FROM supplier
             |INTERSECT
             |SELECT c_nationkey AS nationkey FROM customer""".stripMargin),
      "INTERSECT distinct"),

    // ORDER BY + LIMIT + OFFSET (pagination — listed "absent" for the
    // reference in SURVEY §2.7): Spark 4 plans limit+offset as a single
    // TakeOrdered(limit+offset) then drops the head — still a true top-k,
    // no full sort.
    "q18_offset" -> GraftQuery(
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("orders_off_v")
        s.sql("""SELECT o_orderkey, o_totalprice FROM orders_off_v
                |ORDER BY o_totalprice DESC, o_orderkey LIMIT 15 OFFSET 10""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 15 OFFSET 10""".stripMargin),
      "pagination: top-k with offset, no full sort"),

    // Correlated scalar subquery (SQL API): orders priced above 2× their
    // customer's average — exercises Catalyst's subquery decorrelation
    // (rewritten to an aggregate + join; never a per-row subquery loop).
    "q15_correlated_subquery" -> GraftQuery(
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("orders_v")
        s.sql("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders_v o
                |WHERE o_totalprice > (SELECT 2 * avg(o2.o_totalprice)
                |                      FROM orders_v o2
                |                      WHERE o2.o_custkey = o.o_custkey)""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
             |WHERE o_totalprice > (SELECT 2 * avg(o2.o_totalprice)
             |                      FROM orders o2
             |                      WHERE o2.o_custkey = o.o_custkey)""".stripMargin),
      "correlated scalar subquery, decorrelated by Catalyst"),

    // CUBE (completes the grouping-sets family next to q12 ROLLUP and
    // q16 GROUPING SETS): all four groupings of (flag, status) in one
    // Expand + agg pass. gid disambiguates subtotal NULLs from data NULLs.
    "q22_cube" -> GraftQuery(
      (s, dir) => t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"),
             sum("l_quantity").as("sum_qty"),
             grouping_id().as("gid")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
             |       sum(l_quantity) AS sum_qty,
             |       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin),
      "cube: all 2^k groupings in one Expand + agg pass"),

    // Higher-order array functions (SURVEY §2.4 lists the array family as
    // absent from the reference) over the FLOAT[] embedding column:
    // filter / exists / transform / aggregate / slice — all codegen'd
    // lambda expressions, zero UDFs, zero shuffles (pure projection).
    // Every output is scalarized (counts, exact float→double casts) so the
    // compare never sees engine-specific array formatting.
    "q23_array_hof" -> GraftQuery(
      (s, dir) => t(s, dir, "embeddings").select(
        col("vec_id"),
        size(expr("filter(embedding, x -> x > 0)")).as("n_pos"),
        expr("aggregate(embedding, 0, (acc, x) -> acc + IF(x > 0.5D, 1, 0))").as("n_big"),
        expr("exists(embedding, x -> x > 3.0D)").cast("int").as("has_huge"),
        expr("array_min(transform(embedding, x -> abs(x)))").cast("double").as("min_abs"),
        expr("array_max(slice(embedding, 1, 8))").cast("double").as("max_head")),
      Some("""SELECT vec_id,
             |       len(list_filter(embedding, x -> x > 0)) AS n_pos,
             |       CAST(list_sum(list_transform(embedding,
             |              x -> CASE WHEN x > 0.5 THEN 1 ELSE 0 END)) AS INT) AS n_big,
             |       CASE WHEN len(list_filter(embedding, x -> x > 3.0)) > 0
             |            THEN 1 ELSE 0 END AS has_huge,
             |       CAST(list_min(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS min_abs,
             |       CAST(list_max(embedding[1:8]) AS DOUBLE) AS max_head
             |FROM embeddings""".stripMargin),
      "array higher-order functions: filter/exists/transform/aggregate/slice"),

    // Grouped top-k via the native TopK aggregate (functions/TopK.scala):
    // a bounded min-heap TypedImperativeAggregate, so each map task ships k
    // doubles per group — the scale path next to q9's window row_number,
    // which shuffles every row. Values-only output makes boundary ties
    // deterministic (the value multiset is unique even when rows tie).
    "q24_grouped_topk" -> GraftQuery(
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(expr("top_k(CAST(o_totalprice AS DOUBLE), 5)").as("tops"))
        .select(col("o_orderpriority"), explode(col("tops")).as("price")),
      Some("""SELECT o_orderpriority, price FROM (
             |  SELECT o_orderpriority, o_totalprice AS price,
             |         row_number() OVER (PARTITION BY o_orderpriority
             |                            ORDER BY o_totalprice DESC) AS rn
             |  FROM orders) WHERE rn <= 5""".stripMargin),
      "native grouped top-k aggregate: k values per group cross the shuffle"),

    // Window functions: rank orders within customer by price.
    "q9_window_rank" -> GraftQuery(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |         row_number() OVER (PARTITION BY o_custkey
             |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) WHERE rn <= 3""".stripMargin),
      "window row_number; one shuffle on the partition key"),

    // Recursive CTE (Spark 4's WITH RECURSIVE): a per-key halving walk —
    // each anchor key iterates cur → cur div 2 until 1, and the answer is
    // the walk depth (⌊log2 key⌋). Linear recursion: every iteration is
    // one distributed step over the frontier rows, never a driver loop,
    // and the frontier SHRINKS as keys bottom out — the shape recursive
    // hierarchies (org charts, thread trees) take at scale.
    "q25_recursive_cte" -> GraftQuery(
      (s, dir) => {
        val v = s"q25_orders_${Registry.sanitize(dir)}"
        t(s, dir, "orders").createOrReplaceTempView(v)
        s.sql(s"""WITH RECURSIVE walk(key, cur, depth) AS (
                 |  SELECT o_orderkey AS key, o_orderkey AS cur, 0 AS depth
                 |  FROM $v WHERE o_orderkey % 100 = 1
                 |  UNION ALL
                 |  SELECT key, cur DIV 2, depth + 1 FROM walk WHERE cur > 1)
                 |SELECT key, max(depth) AS depth
                 |FROM walk GROUP BY key ORDER BY key""".stripMargin)
      },
      Some("""WITH RECURSIVE walk(key, cur, depth) AS (
             |  SELECT o_orderkey AS key, o_orderkey AS cur, 0 AS depth
             |  FROM orders WHERE o_orderkey % 100 = 1
             |  UNION ALL
             |  SELECT key, cur // 2, depth + 1 FROM walk WHERE cur > 1)
             |SELECT key, max(depth) AS depth
             |FROM walk GROUP BY key ORDER BY key""".stripMargin),
      "recursive CTE: distributed frontier iteration, no driver loop"),

    // LATERAL correlated subquery join (Spark 4): per-customer most
    // expensive order via a correlated TOP-1 subquery — Catalyst decorrelates
    // it into a window/aggregate join, so the plan is one shuffle on the
    // correlation key, never a per-row subquery execution.
    "q26_lateral_join" -> GraftQuery(
      (s, dir) => {
        val v = s"q26_orders_${Registry.sanitize(dir)}"
        t(s, dir, "orders").createOrReplaceTempView(v)
        s.sql(s"""SELECT g.o_custkey, top.o_orderkey, top.o_totalprice
                 |FROM (SELECT DISTINCT o_custkey FROM $v WHERE o_custkey % 10 = 3) g,
                 |LATERAL (SELECT o_orderkey, o_totalprice FROM $v o
                 |         WHERE o.o_custkey = g.o_custkey
                 |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) top
                 |ORDER BY g.o_custkey""".stripMargin)
      },
      Some("""SELECT g.o_custkey, top.o_orderkey, top.o_totalprice
             |FROM (SELECT DISTINCT o_custkey FROM orders WHERE o_custkey % 10 = 3) g,
             |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             |         WHERE o.o_custkey = g.o_custkey
             |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) top
             |ORDER BY g.o_custkey""".stripMargin),
      "LATERAL correlated top-1 subquery, decorrelated to one shuffle"),

    // Modern SQL sugar both engines ship (Spark 4 / DuckDB): GROUP BY ALL
    // infers the grouping keys from the non-aggregate select items, and
    // ORDER BY ALL orders by every output column left-to-right — the
    // dialect-parity check that matters to anyone porting ad-hoc analyst
    // SQL onto this engine.
    "q27_group_by_all" -> GraftQuery(
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("q27_lineitem_v")
        s.sql("""SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
                |       sum(l_quantity) AS sum_qty
                |FROM q27_lineitem_v
                |GROUP BY ALL ORDER BY ALL""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
             |       sum(l_quantity) AS sum_qty
             |FROM lineitem
             |GROUP BY ALL ORDER BY ALL""".stripMargin),
      "GROUP BY ALL / ORDER BY ALL: inferred keys, both dialects agree"),

    // SQL PIVOT — the wide-report dialect the reference's Athena users
    // write by hand as conditional buckets (GoldAggregates' manual PIVOT,
    // §2.4): Spark's native `PIVOT (agg FOR col IN (...))` with TWO
    // aggregates aliased per value. Catalyst lowers it to ONE aggregate
    // over the group key (no join, no self-union — `.explain` shows a
    // single hash aggregate), which is exactly the hand-written
    // `count(*) FILTER`/`CASE WHEN` shape the DuckDB oracle uses — so the
    // gate proves dialect parity AND that the sugar costs nothing extra.
    "q28_pivot" -> GraftQuery(
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("q28_orders_v")
        s.sql("""SELECT * FROM (SELECT o_orderpriority, o_orderstatus, o_orderkey
                |               FROM q28_orders_v)
                |PIVOT (count(*) AS n, sum(o_orderkey) AS ksum
                |       FOR o_orderstatus IN ('O' AS o, 'F' AS f, 'P' AS p))
                |ORDER BY o_orderpriority""".stripMargin)
      },
      Some("""SELECT o_orderpriority,
             |       count(*) FILTER (o_orderstatus = 'O') AS o_n,
             |       CAST(sum(o_orderkey) FILTER (o_orderstatus = 'O') AS BIGINT) AS o_ksum,
             |       count(*) FILTER (o_orderstatus = 'F') AS f_n,
             |       CAST(sum(o_orderkey) FILTER (o_orderstatus = 'F') AS BIGINT) AS f_ksum,
             |       count(*) FILTER (o_orderstatus = 'P') AS p_n,
             |       CAST(sum(o_orderkey) FILTER (o_orderstatus = 'P') AS BIGINT) AS p_ksum
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin),
      "SQL PIVOT: two aggregates per value, one hash aggregate, dialect parity"),

    // QUALIFY clause (DuckDB/Snowflake dialect; Databricks SQL ships it) —
    // the idiomatic top-n-per-group filter, added to spark.sql via the
    // injected parser's parse-time desugar (QualifyRewrite): the predicate
    // computes INSIDE the select block (windows are legal there), the
    // filter runs outside, and `* EXCEPT` drops the helper column — so
    // Catalyst plans exactly the hand-written window + filter (ONE window
    // exchange on the partition key, no extra shuffle) and the oracle runs
    // the SAME text natively in DuckDB. WHERE composes before the window,
    // ORDER BY after the filter, per the dialect's clause order.
    "q29_qualify" -> GraftQuery(
      (s, dir) => {
        val v = s"q29_orders_${Registry.sanitize(dir)}"
        t(s, dir, "orders").createOrReplaceTempView(v)
        s.sql(s"""SELECT o_custkey, o_orderkey, o_totalprice
                 |FROM $v
                 |WHERE o_custkey % 10 = 3
                 |QUALIFY row_number() OVER (PARTITION BY o_custkey
                 |          ORDER BY o_totalprice DESC, o_orderkey) <= 2
                 |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice
             |FROM orders
             |WHERE o_custkey % 10 = 3
             |QUALIFY row_number() OVER (PARTITION BY o_custkey
             |          ORDER BY o_totalprice DESC, o_orderkey) <= 2
             |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin),
      "QUALIFY clause via the parser extension: desugars to window + filter, DuckDB runs it natively"),

    // QUALIFY in NESTED scopes — where real users put the clause: inside
    // a CTE body (top-n-per-group as a reusable building block) and
    // inside a derived table, composed under an outer aggregate. The
    // rewrite recurses innermost-first, each block desugared in its own
    // scope (its `* EXCEPT` drops the helper before the enclosing block
    // sees the schema), so the SAME text runs natively in DuckDB. The
    // derived table also exercises a window over an aggregate source.
    "q30_qualify_nested" -> GraftQuery(
      (s, dir) => {
        val v = s"q30_orders_${Registry.sanitize(dir)}"
        t(s, dir, "orders").createOrReplaceTempView(v)
        s.sql(s"""WITH top2 AS (
                 |  SELECT o_custkey, o_orderkey, o_totalprice
                 |  FROM $v
                 |  QUALIFY row_number() OVER (PARTITION BY o_custkey
                 |            ORDER BY o_totalprice DESC, o_orderkey) <= 2
                 |)
                 |SELECT p.o_orderpriority, count(*) AS n_top,
                 |       CAST(sum(CASE WHEN t.o_orderkey IS NULL THEN 0 ELSE 1 END)
                 |            AS BIGINT) AS n_in_top2
                 |FROM (SELECT o_orderkey, o_orderpriority
                 |      FROM $v
                 |      QUALIFY rank() OVER (PARTITION BY o_orderpriority
                 |                ORDER BY o_totalprice DESC) <= 5) p
                 |LEFT JOIN top2 t ON p.o_orderkey = t.o_orderkey
                 |GROUP BY p.o_orderpriority
                 |ORDER BY p.o_orderpriority""".stripMargin)
      },
      Some("""WITH top2 AS (
             |  SELECT o_custkey, o_orderkey, o_totalprice
             |  FROM orders
             |  QUALIFY row_number() OVER (PARTITION BY o_custkey
             |            ORDER BY o_totalprice DESC, o_orderkey) <= 2
             |)
             |SELECT p.o_orderpriority, count(*) AS n_top,
             |       CAST(sum(CASE WHEN t.o_orderkey IS NULL THEN 0 ELSE 1 END)
             |            AS BIGINT) AS n_in_top2
             |FROM (SELECT o_orderkey, o_orderpriority
             |      FROM orders
             |      QUALIFY rank() OVER (PARTITION BY o_orderpriority
             |                ORDER BY o_totalprice DESC) <= 5) p
             |LEFT JOIN top2 t ON p.o_orderkey = t.o_orderkey
             |GROUP BY p.o_orderpriority
             |ORDER BY p.o_orderpriority""".stripMargin),
      "QUALIFY inside CTE bodies and derived tables: the rewrite recurses per block, DuckDB parity"),

    // MATERIALIZED-VIEW AUTO-REWRITE (graft.plans.MvRewrite, an injected
    // Catalyst optimizer rule) — the full lifecycle in one gate:
    //   fresh     — the exact-grain aggregate collapses to a Project over
    //               the MV scan (plan-pinned: the optimized plan's only
    //               leaf is the MV path; the base is never opened);
    //   rollup    — a COARSER group-by re-aggregates the MV (sum of sums,
    //               sum of counts) instead of the base — plan-pinned too;
    //   stale     — ONE appended base file flips the fingerprint and the
    //               rule DECLINES (plan-pinned to the base scan): staleness
    //               costs speed, never correctness;
    //   refreshed — MvRewrite.refresh rebuilds + re-fingerprints and the
    //               rewrite resumes over the mutated base.
    // Each phase materializes eagerly (a lazy plan would re-optimize after
    // the mutation), and all four hash against DuckDB computing every
    // phase straight from lineitem — rewritten plans must be
    // answer-IDENTICAL to never-rewritten SQL. At 100 TB the fresh/rollup
    // paths read MV-cardinality rows (dozens) instead of the corpus.
    "q31_mv_rewrite" -> GraftQuery(
      (s, dir) => {
        import graft.plans.{MvAgg, MvCatalog, MvRewrite}
        import org.apache.spark.sql.DataFrame
        val tag = Registry.sanitize(dir)
        val root = s"${Registry.scratchRoot}/q31_$tag"
        Registry.cleanDir(root)
        val basePath = s"$root/base"
        val mvPath = s"$root/mv"
        t(s, dir, "lineitem").write.parquet(basePath)
        MvRewrite.buildAndRegister(s, s"q31_$tag", basePath,
          Seq("l_returnflag", "l_linestatus"),
          Seq(MvAgg("sum", Some("l_quantity"), "sum_qty"),
              MvAgg("count", None, "cnt")),
          mvPath)
        try {
          val mvRoots = MvCatalog.rootPathsOf(
            s.read.parquet(mvPath).queryExecution.analyzed)
          val baseRoots = MvCatalog.rootPathsOf(
            s.read.parquet(basePath).queryExecution.analyzed)
          def exact = s.read.parquet(basePath)
            .groupBy("l_returnflag", "l_linestatus")
            .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("cnt"))
          def rollup = s.read.parquet(basePath)
            .groupBy("l_returnflag")
            .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("cnt"))
          def phase(df: DataFrame, name: String, wantMv: Boolean): DataFrame = {
            val leaves = MvCatalog.rootPathsOf(df.queryExecution.optimizedPlan)
            val want = if (wantMv) mvRoots else baseRoots
            require(leaves == want,
              s"$name: expected scan of $want, optimizer chose $leaves")
            val frozen = df.collect().toSeq // pin results BEFORE later mutations
            s.createDataFrame(s.sparkContext.parallelize(frozen, 1), df.schema)
              .withColumn("phase", lit(name))
          }
          val cols = Seq("phase", "l_returnflag", "l_linestatus", "sum_qty", "cnt")
          val p1 = phase(exact, "fresh", wantMv = true)
          val p2 = phase(rollup, "rollup", wantMv = true)
            .withColumn("l_linestatus", lit("*"))
          // ONE appended row — the oracle reproduces it in closed form
          val extraRows = s.read.parquet(basePath).limit(1)
            .withColumn("l_returnflag", lit("R"))
            .withColumn("l_linestatus", lit("F"))
            .withColumn("l_quantity", lit(1.0))
          val pinned = extraRows.collect().toSeq
          s.createDataFrame(s.sparkContext.parallelize(pinned, 1), extraRows.schema)
            .write.mode("append").parquet(basePath)
          val p3 = phase(exact, "stale", wantMv = false)
          MvRewrite.refresh(s, s"q31_$tag")
          val p4 = phase(exact, "refreshed", wantMv = true)
          p1.select(cols.map(col): _*)
            .unionByName(p2.select(cols.map(col): _*))
            .unionByName(p3.select(cols.map(col): _*))
            .unionByName(p4.select(cols.map(col): _*))
        } finally MvCatalog.unregister(s"q31_$tag")
      },
      Some("""WITH base AS (
             |  SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem),
             |withx AS (
             |  SELECT * FROM base UNION ALL SELECT 'R', 'F', 1.0)
             |SELECT 'fresh' AS phase, l_returnflag, l_linestatus,
             |       sum(l_quantity) AS sum_qty, count(*) AS cnt
             |FROM base GROUP BY 2, 3
             |UNION ALL
             |SELECT 'rollup', l_returnflag, '*', sum(l_quantity), count(*)
             |FROM base GROUP BY 2
             |UNION ALL
             |SELECT 'stale', l_returnflag, l_linestatus,
             |       sum(l_quantity), count(*)
             |FROM withx GROUP BY 2, 3
             |UNION ALL
             |SELECT 'refreshed', l_returnflag, l_linestatus,
             |       sum(l_quantity), count(*)
             |FROM withx GROUP BY 2, 3""".stripMargin),
      "materialized-view rewrite: exact + rollup re-point at the MV, staleness declines, refresh resumes"),

    // PERSISTED + INCREMENTALLY-MAINTAINED MVs — q31's missing lifecycle
    // half. The definition lives in a COMMIT-LOG-BACKED catalog
    // (MvCatalog.attach: register/unregister are ACID upserts on a graft
    // table, so MVs survive the session like every other piece of engine
    // state), freshness for a graft-table base is ONE O(1) version read
    // (never a directory walk), and refresh is INCREMENTAL: the stale
    // window's CDF rows fold into signed per-group deltas (st7's IVM
    // algebra: +1 insert/update_postimage, −1 delete/update_preimage)
    // merged with the CURRENT MV rows — O(MV + delta), the base is never
    // rescanned. Four phases, all hash-matched against DuckDB recomputing
    // straight from lineitem with the mutation applied in closed form:
    //   fresh     — exact-grain aggregate over the graft base rewrites to
    //               the MV (plan-pinned to the MV's files);
    //   stale     — ONE mergeClauses commit (DELETE l_orderkey % 13 == 3,
    //               quantity UPDATE % 13 == 7, CDF on) bumps the base
    //               version; the freshness consult declines (plan-pinned
    //               to the base) — stale costs speed, never correctness;
    //   refreshed — MvRewrite.refresh folds the CDF delta into the MV
    //               (REQUIRE: lastRefreshMode == "incremental") and the
    //               rewrite resumes — the incremental arithmetic must
    //               equal the full recompute bit-for-bit;
    //   reloaded  — the in-memory catalog is CLEARED and re-attached from
    //               the definitions table (the fresh-session recovery
    //               path); the rewrite still fires.
    "q32_mv_incremental" -> GraftQuery(
      (s, dir) => {
        import graft.plans.{MvAgg, MvCatalog, MvRewrite}
        import graft.lake.MergeTable
        import org.apache.spark.sql.DataFrame
        val tag = Registry.sanitize(dir)
        val root = s"${Registry.scratchRoot}/q32_$tag"
        Registry.cleanDir(root)
        val base = new MergeTable(s"$root/base")
        // (l_orderkey, l_linenumber) is NOT unique in the testdata, so the
        // staged table carries a surrogate row id as the merge key; the
        // mutation predicate itself is on l_orderkey alone, so the oracle
        // never needs to see rid
        base.overwrite(t(s, dir, "lineitem")
          .select("l_orderkey", "l_returnflag", "l_linestatus", "l_quantity")
          .withColumn("rid", monotonically_increasing_id()))
        MvCatalog.attach(s, s"$root/catalog")
        try {
          MvRewrite.buildAndRegister(s, s"q32_$tag", s"$root/base",
            Seq("l_returnflag", "l_linestatus"),
            Seq(MvAgg("sum", Some("l_quantity"), "sum_qty"),
                MvAgg("count", None, "cnt"),
                MvAgg("min", Some("l_quantity"), "min_qty"),
                MvAgg("max", Some("l_quantity"), "max_qty")),
            s"$root/mv")
          def q = base.read(s).groupBy("l_returnflag", "l_linestatus")
            .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("cnt"),
              min("l_quantity").as("min_qty"), max("l_quantity").as("max_qty"))
          def phase(name: String, wantMv: Boolean): DataFrame = {
            // the MV's file set moves on refresh — compare per phase
            val mvRoots = MvCatalog.rootPathsOf(
              MergeTable.open(s"$root/mv").read(s).queryExecution.analyzed)
            val df = q
            val leaves = MvCatalog.rootPathsOf(df.queryExecution.optimizedPlan)
            require((leaves == mvRoots) == wantMv,
              s"$name: rewrite fired=${leaves == mvRoots}, wanted fired=$wantMv")
            val frozen = df.collect().toSeq // pin results BEFORE later mutations
            s.createDataFrame(s.sparkContext.parallelize(frozen, 1), df.schema)
              .withColumn("phase", lit(name))
          }
          val p1 = phase("fresh", wantMv = true)
          val mutSrc = base.read(s)
            .filter(col("l_orderkey") % 13 === 3 || col("l_orderkey") % 13 === 7)
            .withColumn("kind",
              when(col("l_orderkey") % 13 === 3, "del").otherwise("upd"))
            .select("rid", "kind")
          base.mergeClauses(s, mutSrc, Seq("rid"),
            Seq(MergeTable.MatchedDelete(Some("s.kind = 'del'")),
                MergeTable.MatchedUpdate(Some("s.kind = 'upd'"),
                  Seq("l_quantity" -> "t.l_quantity + CAST(5 AS DOUBLE)"))),
            changeFeed = true)
          val p2 = phase("stale", wantMv = false)
          MvRewrite.refresh(s, s"q32_$tag")
          // the mutation window RETRACTS rows while the MV carries min/max:
          // the value census must keep the refresh incremental (the r13
          // verdict's remaining min/max gap) — a full rebuild here fails
          require(MvRewrite.lastRefreshMode == "incremental",
            s"a graft-base sum/count/min/max refresh must fold the CDF " +
              s"delta via the value census, ran '${MvRewrite.lastRefreshMode}'")
          val p3 = phase("refreshed", wantMv = true)
          // fresh-session recovery: the defs reload from the commit log alone
          MvCatalog.clear()
          MvCatalog.attach(s, s"$root/catalog")
          val p4 = phase("reloaded", wantMv = true)
          val cols = Seq("phase", "l_returnflag", "l_linestatus", "sum_qty",
            "cnt", "min_qty", "max_qty")
          p1.select(cols.map(col): _*)
            .unionByName(p2.select(cols.map(col): _*))
            .unionByName(p3.select(cols.map(col): _*))
            .unionByName(p4.select(cols.map(col): _*))
        } finally { MvCatalog.unregister(s"q32_$tag"); MvCatalog.detach() }
      },
      Some("""WITH mut AS (
             |  SELECT l_returnflag, l_linestatus,
             |         CASE WHEN l_orderkey % 13 = 7 THEN l_quantity + 5
             |              ELSE l_quantity END AS q
             |  FROM lineitem WHERE l_orderkey % 13 <> 3)
             |SELECT 'fresh' AS phase, l_returnflag, l_linestatus,
             |       sum(l_quantity) AS sum_qty, count(*) AS cnt,
             |       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
             |FROM lineitem GROUP BY 2, 3
             |UNION ALL
             |SELECT 'stale', l_returnflag, l_linestatus, sum(q), count(*),
             |       min(q), max(q)
             |FROM mut GROUP BY 2, 3
             |UNION ALL
             |SELECT 'refreshed', l_returnflag, l_linestatus, sum(q), count(*),
             |       min(q), max(q)
             |FROM mut GROUP BY 2, 3
             |UNION ALL
             |SELECT 'reloaded', l_returnflag, l_linestatus, sum(q), count(*),
             |       min(q), max(q)
             |FROM mut GROUP BY 2, 3""".stripMargin),
      "persisted MV catalog + incremental refresh: CDF deltas fold into the MV, definitions survive the session"),

    // FILTERED-AGGREGATE MV REWRITE — the single most common production MV
    // query (`WHERE grp = x GROUP BY grp`), provably answerable by
    // filtering the MV when every filter reference is an MV GROUPING
    // column: each MV row is one group, all of whose base rows share those
    // values, so the predicate is uniform within a row and transplants
    // onto the MV scan — on the exact grain AND under a rollup (the
    // filter may speak a FINER grouping column than the query groups by).
    // Five phases, each plan-pinned in-gate and hash-matched against
    // DuckDB recomputing straight from lineitem:
    //   fresh_filtered  — WHERE l_returnflag='R' GROUP BY flag, status →
    //                     Filter over the MV scan (base never opened);
    //   rollup_filtered — WHERE l_linestatus='F' GROUP BY l_returnflag →
    //                     filter + re-aggregate the MV;
    //   decline         — WHERE l_quantity>10 touches a NON-grouping
    //                     column: the MV has no filtered answer, the base
    //                     scan stays (a wrong rewrite here would be
    //                     silently wrong results);
    //   stale           — one appended base row flips the fingerprint,
    //                     the filtered query declines;
    //   refreshed       — refresh re-fingerprints, the rewrite resumes.
    "q33_mv_filtered" -> GraftQuery(
      (s, dir) => {
        import graft.plans.{MvAgg, MvCatalog, MvRewrite}
        import org.apache.spark.sql.DataFrame
        val tag = Registry.sanitize(dir)
        val root = s"${Registry.scratchRoot}/q33_$tag"
        Registry.cleanDir(root)
        val basePath = s"$root/base"
        val mvPath = s"$root/mv"
        t(s, dir, "lineitem").write.parquet(basePath)
        MvRewrite.buildAndRegister(s, s"q33_$tag", basePath,
          Seq("l_returnflag", "l_linestatus"),
          Seq(MvAgg("sum", Some("l_quantity"), "sum_qty"),
              MvAgg("count", None, "cnt")),
          mvPath)
        try {
          val mvRoots = MvCatalog.rootPathsOf(
            s.read.parquet(mvPath).queryExecution.analyzed)
          val baseRoots = MvCatalog.rootPathsOf(
            s.read.parquet(basePath).queryExecution.analyzed)
          def fExact = s.read.parquet(basePath)
            .filter(col("l_returnflag") === "R")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("cnt"))
          def fRollup = s.read.parquet(basePath)
            .filter(col("l_linestatus") === "F")
            .groupBy("l_returnflag")
            .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("cnt"))
          def fDecline = s.read.parquet(basePath)
            .filter(col("l_quantity") > 10)
            .groupBy("l_returnflag", "l_linestatus")
            .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("cnt"))
          def phase(df: DataFrame, name: String, wantMv: Boolean): DataFrame = {
            val leaves = MvCatalog.rootPathsOf(df.queryExecution.optimizedPlan)
            val want = if (wantMv) mvRoots else baseRoots
            require(leaves == want,
              s"$name: expected scan of $want, optimizer chose $leaves")
            val frozen = df.collect().toSeq // pin results BEFORE later mutations
            s.createDataFrame(s.sparkContext.parallelize(frozen, 1), df.schema)
              .withColumn("phase", lit(name))
          }
          val cols = Seq("phase", "l_returnflag", "l_linestatus", "sum_qty", "cnt")
          val p1 = phase(fExact, "fresh_filtered", wantMv = true)
          val p2 = phase(fRollup, "rollup_filtered", wantMv = true)
            .withColumn("l_linestatus", lit("*"))
          val p3 = phase(fDecline, "decline", wantMv = false)
          // ONE appended row — the oracle reproduces it in closed form
          val extraRows = s.read.parquet(basePath).limit(1)
            .withColumn("l_returnflag", lit("R"))
            .withColumn("l_linestatus", lit("F"))
            .withColumn("l_quantity", lit(1.0))
          val pinned = extraRows.collect().toSeq
          s.createDataFrame(s.sparkContext.parallelize(pinned, 1), extraRows.schema)
            .write.mode("append").parquet(basePath)
          val p4 = phase(fExact, "stale", wantMv = false)
          MvRewrite.refresh(s, s"q33_$tag")
          val p5 = phase(fExact, "refreshed", wantMv = true)
          p1.select(cols.map(col): _*)
            .unionByName(p2.select(cols.map(col): _*))
            .unionByName(p3.select(cols.map(col): _*))
            .unionByName(p4.select(cols.map(col): _*))
            .unionByName(p5.select(cols.map(col): _*))
        } finally MvCatalog.unregister(s"q33_$tag")
      },
      Some("""WITH base AS (
             |  SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem),
             |withx AS (
             |  SELECT * FROM base UNION ALL SELECT 'R', 'F', 1.0)
             |SELECT 'fresh_filtered' AS phase, l_returnflag, l_linestatus,
             |       sum(l_quantity) AS sum_qty, count(*) AS cnt
             |FROM base WHERE l_returnflag = 'R' GROUP BY 2, 3
             |UNION ALL
             |SELECT 'rollup_filtered', l_returnflag, '*', sum(l_quantity), count(*)
             |FROM base WHERE l_linestatus = 'F' GROUP BY 2
             |UNION ALL
             |SELECT 'decline', l_returnflag, l_linestatus,
             |       sum(l_quantity), count(*)
             |FROM base WHERE l_quantity > 10 GROUP BY 2, 3
             |UNION ALL
             |SELECT 'stale', l_returnflag, l_linestatus,
             |       sum(l_quantity), count(*)
             |FROM withx WHERE l_returnflag = 'R' GROUP BY 2, 3
             |UNION ALL
             |SELECT 'refreshed', l_returnflag, l_linestatus,
             |       sum(l_quantity), count(*)
             |FROM withx WHERE l_returnflag = 'R' GROUP BY 2, 3""".stripMargin),
      "filtered-aggregate MV rewrite: grouping-column filters transplant onto the MV, others decline"),
  )
}
