package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.lake.MergeTable
import graft.streaming.StreamingOps
import java.util.concurrent.atomic.AtomicLong

/** Structured Streaming INSIDE the correctness gate: st1 runs the
  * watermarked hourly aggregation as a real streaming query (file source →
  * `Trigger.AvailableNow` → memory sink) and hash-checks the emitted rows
  * against a DuckDB oracle that mirrors the APPEND-MODE CONTRACT: a window
  * is emitted iff the final watermark (max event time − 1h delay) has
  * passed its end. The tail windows of the dataset are therefore — by
  * design — absent from both sides.
  */
object StreamQueries {

  private val runId = new AtomicLong()

  /** Streaming runs in a CLONED session with few shuffle partitions: a
    * stateful query's state-store count is pinned to shuffle.partitions at
    * its first checkpoint, and every state partition pays per-micro-batch
    * commit overhead (delta file + snapshot + fsync) regardless of row
    * count. At bench scale 32 partitions is pure overhead; on a real
    * cluster you'd size this to state volume, not cores. The clone shares
    * the SparkContext — only SQL conf and temp views diverge.
    */
  private def streamSession(s: SparkSession): SparkSession = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    ss
  }

  /** st7's per-micro-batch incremental-view-maintenance step, DELTA-SIZED
    * on the sink side: the CDF batch reduces to signed per-group deltas,
    * changed groups are upserted via `gold.merge` on the group key, and
    * groups whose count reaches zero are deleted — the write cost is
    * proportional to the CHANGED groups, never the gold table (a
    * read-join-overwrite sink would rewrite the whole aggregate every
    * batch, defeating the point of IVM at scale).
    *
    * Exactly-once under micro-batch REPLAY: the applied batch id is
    * recorded atomically with the MERGE commit (Delta's txn action
    * analog). The zero-group delete runs BEFORE the txn-marked merge, so
    * the replay cases all converge: crash before the delete → full re-run;
    * crash between delete and merge → the re-run's delete is a no-op
    * (rows already gone; their re-derived new count, gold-absent + negative
    * delta, stays ≤ 0 and is re-deleted harmlessly) and the merge then
    * lands with the marker; crash after the merge → the marker skips the
    * whole batch, and the delete it would repeat was already applied.
    */
  private[graft] def applyGoldDelta(gold: MergeTable, batch: DataFrame,
                                      batchId: Long, appId: String = "st7",
                                      groupCol: String = "o_orderstatus"): Unit = {
    if (gold.lastTxnVersion(appId).exists(_ >= batchId)) return
    val delta = batch
      .withColumn("sign",
        when(col(MergeTable.ChangeType).isin("insert", "update_postimage"), 1L)
          .otherwise(-1L))
      .groupBy(groupCol)
      .agg(sum(col("sign")).as("dn"),
           sum(col("o_orderkey") * col("sign")).as("dkey"))
    if (!gold.exists) {
      gold.overwrite(
        delta.filter(col("dn") > 0)
          .select(col(groupCol), col("dn").as("n"), col("dkey").as("key_sum")),
        txn = Some(appId -> batchId))
      return
    }
    // delta-sized state update: only CHANGED groups join against gold
    val newVals = delta
      .join(gold.read(batch.sparkSession).select(groupCol, "n", "key_sum"),
        Seq(groupCol), "left")
      .select(col(groupCol),
        (coalesce(col("n"), lit(0L)) + col("dn")).as("n"),
        (coalesce(col("key_sum"), lit(0L)) + col("dkey")).as("key_sum"))
    // ONE clause-merge carries upserts AND gone-group deletes: a group
    // whose count reaches zero deletes through WHEN MATCHED AND n <= 0,
    // fully distributed — no driver collect(), no literal-list predicate
    // (a CDC batch that mass-deletes, e.g. a source truncation flowing
    // through the feed, would otherwise build a million-key isin). Also
    // one commit instead of two, so the txn gate covers the whole batch.
    // gold is partitioned BY the merge key, so the key trivially determines
    // the partition — the probe and rewrite prune to the changed groups'
    // files, which is what makes the sink delta-sized on disk too
    gold.mergeClauses(batch.sparkSession, newVals, Seq(groupCol),
      Seq(MergeTable.MatchedDelete(Some("s.n <= 0")),
          MergeTable.MatchedUpdate(),
          MergeTable.NotMatchedInsert(Some("s.n > 0"))),
      // newVals is a groupBy-on-the-key output: provably key-unique, so
      // the defensive uniqueness probe would only burn a job per batch
      checkUniqueSource = false,
      txn = Some(appId -> batchId),
      keysDeterminePartitions = gold.partitionCols == Seq(groupCol))
  }

  /** Stage the single events.parquet FILE into a directory — the streaming
    * file source only accepts directories.
    */
  private def stageEvents(dir: String, id: Long): String = {
    val srcDir = java.nio.file.Paths.get(s"${Registry.scratchRoot}/st_src_$id")
    java.nio.file.Files.createDirectories(srcDir)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      srcDir.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    srcDir.toString
  }

  val all: Map[String, GraftQuery] = Map(

    "st1_stream_hourly" -> GraftQuery(
      (s, dir) => {
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val sink = s"st1_sink_$id"
        val q = StreamingOps.hourlyTypeCounts(StreamingOps.readEventStream(ss, stageEvents(dir, id)))
          .writeStream.format("memory").queryName(sink).outputMode("append")
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"${Registry.scratchRoot}/st1_ckpt_$id")
          .start()
        q.awaitTermination()
        ss.table(sink).orderBy(col("hour_start"), col("event_type"))
      },
      Some("""WITH mx AS (SELECT max(ts) AS m FROM events)
             |SELECT CAST(date_trunc('hour', ts) AS TIMESTAMPTZ) AS hour_start,
             |       event_type, count(*) AS n_events
             |FROM events, mx
             |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= m - INTERVAL 1 HOUR
             |GROUP BY 1, 2
             |ORDER BY 1, 2""".stripMargin),
      "watermarked streaming aggregation, append-mode emission hash-checked"),

    // flatMapGroupsWithState sessionization IN the gate: closed sessions =
    // every non-final session per user (closed in-batch by a later event)
    // plus final sessions flushed by the event-time timeout (last-seen +
    // gap passed by the final watermark, ms resolution). The oracle
    // re-expresses exactly that: batch lag-gap sessions filtered to the
    // streaming emission contract.
    "st2_stream_sessions" -> GraftQuery(
      (s: SparkSession, dir) => {
        val ss = streamSession(s)
        import ss.implicits._
        val id = runId.incrementAndGet()
        val sink = s"st2_sink_$id"
        val evts = StreamingOps.readEventStream(ss, stageEvents(dir, id))
          .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("us"))
          .as[StreamingOps.Evt]
        val q = StreamingOps.sessionize(evts, gapMinutes = 30).toDF()
          .writeStream.format("memory").queryName(sink).outputMode("append")
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"${Registry.scratchRoot}/st2_ckpt_$id")
          .start()
        q.awaitTermination()
        ss.table(sink).orderBy("user_id", "session_start_us")
      },
      Some("""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
             |wm AS (SELECT max(us) // 1000 - 3600000 AS wm_ms FROM ev),
             |marked AS (
             |  SELECT user_id, event_id, us,
             |         CASE WHEN lag(us) OVER w IS NULL
             |                OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
             |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
             |numbered AS (
             |  SELECT user_id, us,
             |         sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
             |                           ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM marked),
             |sess AS (SELECT user_id, sid, min(us) AS session_start_us,
             |                max(us) AS session_end_us, count(*) AS n_events
             |         FROM numbered GROUP BY 1, 2),
             |lastsid AS (SELECT user_id, max(sid) AS max_sid FROM sess GROUP BY user_id)
             |SELECT s.user_id, s.session_start_us, s.session_end_us,
             |       CAST(s.n_events AS BIGINT) AS n_events
             |FROM sess s JOIN lastsid l USING (user_id), wm
             |WHERE s.sid < l.max_sid
             |   OR s.session_end_us // 1000 + 1800000 < wm.wm_ms
             |ORDER BY 1, 2""".stripMargin),
      "stateful streaming sessionization, emission contract hash-checked"),

    // Streaming deduplication — the training-data dedup primitive as a
    // STREAM: dropDuplicatesWithinWatermark keys state by the dedup columns
    // and EVICTS it once the watermark passes the key's event time + delay,
    // so state is bounded by the delay window, not the corpus (the batch
    // d1/d2 family can't express eviction). Only the key columns are
    // emitted, so which duplicate row "wins" never affects the output —
    // the emitted set is exactly the distinct keys, which the oracle states
    // directly.
    "st4_stream_dedup" -> GraftQuery(
      (s, dir) => {
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val sink = s"st4_sink_$id"
        val q = StreamingOps.readEventStream(ss, stageEvents(dir, id))
          .withColumn("day", to_date(col("ts")))
          .withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark("user_id", "event_type", "day")
          .select("user_id", "event_type", "day")
          .writeStream.format("memory").queryName(sink).outputMode("append")
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"${Registry.scratchRoot}/st4_ckpt_$id")
          .start()
        q.awaitTermination()
        ss.table(sink).orderBy("user_id", "event_type", "day")
      },
      Some("""SELECT DISTINCT user_id, event_type, CAST(ts AS DATE) AS day
             |FROM events ORDER BY 1, 2, 3""".stripMargin),
      "streaming dedup with watermark-bounded state eviction"),

    // Stream-stream interval join: every click joined to the same user's
    // purchases within the following 10 minutes. Both sides are watermarked
    // so Spark bounds the join STATE (a side's rows are dropped once the
    // other side's watermark passes the interval bound — without it,
    // stream-stream join state grows forever); inner-join matches emit as
    // soon as both rows arrive, so a single AvailableNow batch emits the
    // complete time-bounded join, which the batch oracle states directly.
    "st5_stream_join" -> GraftQuery(
      (s, dir) => {
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val sink = s"st5_sink_$id"
        val staged = stageEvents(dir, id)
        val clicks = StreamingOps.readEventStream(ss, staged)
          .filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
                  col("event_id").as("click_id"))
          .withWatermark("c_ts", "1 hour")
        val purchases = StreamingOps.readEventStream(ss, staged)
          .filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
                  col("event_id").as("purchase_id"), col("value"))
          .withWatermark("p_ts", "1 hour")
        val q = clicks.join(purchases,
            col("c_user") === col("p_user") &&
              col("p_ts") >= col("c_ts") &&
              col("p_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"))
          .select(col("click_id"), col("purchase_id"), col("c_user").as("user_id"),
                  col("value"))
          .writeStream.format("memory").queryName(sink).outputMode("append")
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"${Registry.scratchRoot}/st5_ckpt_$id")
          .start()
        q.awaitTermination()
        ss.table(sink).orderBy("click_id", "purchase_id")
      },
      Some("""SELECT c.event_id AS click_id, p.event_id AS purchase_id,
             |       c.user_id, p.value
             |FROM events c JOIN events p
             |  ON c.user_id = p.user_id
             | AND c.event_type = 'click' AND p.event_type = 'purchase'
             | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
             |ORDER BY 1, 2""".stripMargin),
      "watermark-bounded stream-stream interval join"),

    // The change feed as a STREAMING SOURCE (Delta readChangeFeed analog):
    // a merge and a delete record CDF rows at commit time, then
    // MergeTable.changesStream replays them through a real streaming query
    // — the standard fan-out of a lakehouse table's changes to downstream
    // incremental consumers without snapshot diffing. The oracle re-derives
    // every change class (pre/post images, inserts, deletes) relationally
    // per commit version.
    "st6_stream_cdf" -> GraftQuery(
      (s, dir) => {
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val root = s"${Registry.scratchRoot}/st6_lake_$id"
        // base = a third of orders: the query's value is the CDF streaming
        // path, not batch volume — the merge/delete fixtures stay non-vacuous
        val orders = Registry.t(s, dir, "orders").filter(col("o_orderkey") % 3 === 0)
        val table = new MergeTable(root, Seq("o_orderstatus"))
        table.overwrite(orders.filter(col("o_orderkey") % 4 =!= 2))
        table.merge(s, orders.filter(col("o_orderkey") % 2 === 0)
          .withColumn("o_orderstatus", lit("M"))
          .withColumn("o_totalprice", col("o_totalprice") + 1000.0),
          Seq("o_orderkey"), changeFeed = true)                      // v1
        table.delete(s, col("o_orderstatus") === "O", changeFeed = true) // v2
        val sink = s"st6_sink_$id"
        val q = table.changesStream(ss)
          .writeStream.format("memory").queryName(sink).outputMode("append")
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"${Registry.scratchRoot}/st6_ckpt_$id")
          .start()
        q.awaitTermination()
        ss.table(sink)
          .groupBy(col(MergeTable.ChangeType).as("change_type"),
            col(MergeTable.CommitVersion).as("commit_version"))
          .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_sum"))
          .orderBy("commit_version", "change_type")
      },
      Some("""WITH base AS (SELECT * FROM orders WHERE o_orderkey % 3 = 0),
             |     tgt AS (SELECT * FROM base WHERE o_orderkey % 4 <> 2),
             |     src AS (SELECT o_orderkey, 'M' AS o_orderstatus,
             |                    o_totalprice + 1000.0 AS o_totalprice
             |             FROM base WHERE o_orderkey % 2 = 0),
             |changes AS (
             |  SELECT 'update_preimage' AS change_type, 1 AS v, o_orderkey
             |  FROM tgt WHERE o_orderkey IN (SELECT o_orderkey FROM src)
             |  UNION ALL
             |  SELECT 'update_postimage', 1, o_orderkey
             |  FROM src WHERE o_orderkey IN (SELECT o_orderkey FROM tgt)
             |  UNION ALL
             |  SELECT 'insert', 1, o_orderkey
             |  FROM src WHERE o_orderkey NOT IN (SELECT o_orderkey FROM tgt)
             |  UNION ALL
             |  SELECT 'delete', 2, o_orderkey
             |  FROM tgt WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
             |    AND o_orderstatus = 'O')
             |SELECT change_type, CAST(v AS BIGINT) AS commit_version,
             |       count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum
             |FROM changes GROUP BY 1, 2 ORDER BY commit_version, change_type""".stripMargin),
      "change data feed as a streaming source — incremental downstream fan-out"),

    // The canonical lakehouse ingest loop — the reference's silver job
    // re-expressed as a STREAM: file source → foreachBatch → MergeTable
    // MERGE per micro-batch (exactly Delta's streaming-upsert recipe). The
    // table is pre-seeded with stale rows (value = -1) that the stream must
    // overwrite; events are staged as 4 files with maxFilesPerTrigger=1 so
    // AvailableNow really runs 4 incremental merge rounds, not one bulk
    // load. Final snapshot == plain `events` (source-wins), which the
    // oracle states directly; min(value) would expose any seed row the
    // merge missed.
    "st3_stream_merge_sink" -> GraftQuery(
      (s, dir) => {
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val srcDir = s"${Registry.scratchRoot}/st3_src_$id"
        // raw read (ts keeps the file's physical type) so the staged files
        // match readEventStream's probed schema
        s.read.parquet(s"$dir/events.parquet").repartition(4)
          .write.mode("overwrite").parquet(srcDir)
        val table = new MergeTable(s"${Registry.scratchRoot}/st3_lake_$id")
        table.overwrite(Registry.t(s, dir, "events")
          .filter(col("event_id") % 10 === 0)
          .withColumn("value", lit(-1.0)))
        val q = StreamingOps.readEventStream(ss, srcDir)
          .writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            table.merge(batch.sparkSession, batch, Seq("event_id"))
          }
          .trigger(Trigger.AvailableNow())
          .option("maxFilesPerTrigger", "1")
          .option("checkpointLocation", s"${Registry.scratchRoot}/st3_ckpt_$id")
          .start()
        q.awaitTermination()
        table.read(s).groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
               sum("event_id").as("id_sum"),
               min("value").as("min_value"),
               max("value").as("max_value"))
      },
      Some("""SELECT event_type, count(*) AS n_events,
             |       CAST(sum(event_id) AS BIGINT) AS id_sum,
             |       min(value) AS min_value, max(value) AS max_value
             |FROM events GROUP BY event_type""".stripMargin),
      "streaming foreachBatch MERGE ingest — per-micro-batch lake upsert"),

    // INCREMENTAL VIEW MAINTENANCE from the change feed — the lakehouse
    // pattern that makes gold tables affordable at 100 TB: instead of
    // recomputing an aggregate from the full silver table after every
    // commit, consume its CDF stream and apply signed per-group deltas
    // (insert/update_postimage = +1, update_preimage/delete = −1). Each
    // micro-batch touches only the changed rows; the gold table never sees
    // the corpus. Deltas are integer and associative, so the result is
    // exact regardless of how the feed splits into micro-batches
    // (maxFilesPerTrigger caps each batch well below the ~3×32 feed files,
    // forcing several genuine incremental rounds without paying ~100
    // per-batch state commits at toy scale). The oracle recomputes the
    // final aggregate from the final silver state relationally — the
    // incremental path must land on the same numbers.
    "st7_incremental_gold" -> GraftQuery(
      (s, dir) => {
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val silver = new MergeTable(s"${Registry.scratchRoot}/st7_silver_$id",
          Seq("o_orderstatus"))
        val gold = new MergeTable(s"${Registry.scratchRoot}/st7_gold_$id",
          Seq("o_orderstatus"))
        val base = Registry.t(s, dir, "orders").filter(col("o_orderkey") % 3 === 0)
        silver.merge(s, base, Seq("o_orderkey"), changeFeed = true)          // v0: inserts
        silver.merge(s, base.filter(col("o_orderkey") % 2 === 0)
          .withColumn("o_orderstatus", lit("M")),
          Seq("o_orderkey"), changeFeed = true)                              // v1: updates
        silver.merge(s, base.filter(col("o_orderkey") % 5 === 0)
          .withColumn("o_orderstatus", lit("X")),
          Seq("o_orderkey"), changeFeed = true)                              // v2: updates
        silver.delete(s, col("o_orderkey") % 7 === 1, changeFeed = true)     // v3: deletes
        val q = silver.changesStream(ss, maxFilesPerTrigger = Some(12))
          .writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            StreamQueries.applyGoldDelta(gold, batch, batchId)
          }
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"${Registry.scratchRoot}/st7_ckpt_$id")
          .start()
        q.awaitTermination()
        gold.read(s).orderBy("o_orderstatus")
      },
      Some("""WITH base AS (SELECT * FROM orders
             |              WHERE o_orderkey % 3 = 0 AND o_orderkey % 7 <> 1),
             |final AS (
             |  SELECT o_orderkey,
             |         CASE WHEN o_orderkey % 5 = 0 THEN 'X'
             |              WHEN o_orderkey % 2 = 0 THEN 'M'
             |              ELSE o_orderstatus END AS o_orderstatus
             |  FROM base)
             |SELECT o_orderstatus, count(*) AS n,
             |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
             |FROM final GROUP BY 1 ORDER BY 1""".stripMargin),
      "incremental gold maintenance: signed CDF deltas incl. delete retraction, never a full recompute"),

    // Stream-STATIC enrichment join — the most common streaming join in
    // practice (events enriched by a dimension) and deliberately stateless:
    // the static side is broadcast to every micro-batch, so unlike the
    // stream-stream st5 there is no join state to watermark-evict and the
    // stream side never shuffles for the join. At 100 TB/day the dimension
    // stays MBs — this is the shape that scales. Aggregation runs in
    // complete mode (totals over the whole stream), hash-checked against
    // the batch equivalent; integer measures keep it FP-order-proof.
    "st8_stream_static" -> GraftQuery(
      (s, dir) => {
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val sink = s"st8_sink_$id"
        val dim = Registry.t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
        val q = StreamingOps.readEventStream(ss, stageEvents(dir, id))
          .withColumn("n_nationkey", (col("user_id") % 25).cast("long"))
          .join(broadcast(dim), Seq("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n_events"), sum("event_id").as("id_sum"))
          .writeStream.format("memory").queryName(sink).outputMode("complete")
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"${Registry.scratchRoot}/st8_ckpt_$id")
          .start()
        q.awaitTermination()
        ss.table(sink).orderBy("n_name")
      },
      Some("""SELECT n_name, count(*) AS n_events,
             |       CAST(sum(event_id) AS BIGINT) AS id_sum
             |FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin),
      "stream-static broadcast enrichment: stateless join, complete-mode totals"),

    // CDC FAN-OUT — one change feed maintaining TWO differently-keyed
    // downstream aggregates from the same foreachBatch, each sink with its
    // OWN txn marker. This is the production multi-consumer CDC shape: the
    // silver table's feed is read once (one stream, one checkpoint) and
    // every sink applies the batch independently, so a crash BETWEEN the
    // two applies is healed by replay — the sink that already recorded the
    // batch id skips it, the one that didn't applies it, and neither
    // double-counts (the per-sink marker is what makes multi-sink
    // foreachBatch exactly-once; a shared marker would lose whichever sink
    // crashed second). Both sinks stay delta-sized per applyGoldDelta.
    // The oracle recomputes both aggregates from the final silver state.
    "st9_cdc_fanout" -> GraftQuery(
      (s, dir) => {
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val silver = new MergeTable(s"${Registry.scratchRoot}/st9_silver_$id",
          Seq("o_orderstatus"))
        val byStatus = new MergeTable(s"${Registry.scratchRoot}/st9_status_$id",
          Seq("o_orderstatus"))
        val byBucket = new MergeTable(s"${Registry.scratchRoot}/st9_bucket_$id",
          Seq("bucket"))
        val base = Registry.t(s, dir, "orders").filter(col("o_orderkey") % 3 === 0)
        silver.merge(s, base, Seq("o_orderkey"), changeFeed = true)          // v0
        silver.merge(s, base.filter(col("o_orderkey") % 2 === 0)
          .withColumn("o_orderstatus", lit("M")),
          Seq("o_orderkey"), changeFeed = true)                              // v1
        silver.delete(s, col("o_orderkey") % 7 === 0, changeFeed = true)     // v2
        val q = silver.changesStream(ss, maxFilesPerTrigger = Some(12))
          .writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            val b = batch.persist() // one feed read, two sink applies
            StreamQueries.applyGoldDelta(byStatus, b, batchId, appId = "st9s")
            StreamQueries.applyGoldDelta(
              byBucket, b.withColumn("bucket", col("o_orderkey") % 4),
              batchId, appId = "st9b", groupCol = "bucket")
            b.unpersist()
            ()
          }
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"${Registry.scratchRoot}/st9_ckpt_$id")
          .start()
        q.awaitTermination()
        byStatus.read(s)
          .select(lit("by_status").as("sink"), col("o_orderstatus").cast("string").as("grp"),
            col("n"), col("key_sum"))
          .union(byBucket.read(s)
            .select(lit("by_bucket").as("sink"), col("bucket").cast("string").as("grp"),
              col("n"), col("key_sum")))
          .orderBy("sink", "grp")
      },
      Some("""WITH final AS (
             |  SELECT o_orderkey,
             |         CASE WHEN o_orderkey % 2 = 0 THEN 'M' ELSE o_orderstatus END
             |           AS o_orderstatus
             |  FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey % 7 <> 0)
             |SELECT * FROM (
             |  SELECT 'by_status' AS sink, o_orderstatus AS grp,
             |         count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum
             |  FROM final GROUP BY 2
             |  UNION ALL
             |  SELECT 'by_bucket' AS sink, CAST(o_orderkey % 4 AS VARCHAR) AS grp,
             |         count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum
             |  FROM final GROUP BY 2)
             |ORDER BY sink, grp""".stripMargin),
      "CDC fan-out: one feed, two sinks, per-sink txn markers — multi-consumer exactly-once"),

    // The table as a FULL streaming source (Delta streaming-source
    // semantics): MergeTable.readStream stages the starting snapshot as
    // hard links (zero copy) and emits its rows as version-stamped
    // inserts, then tails the CDF of every LATER commit — here the
    // snapshot is v1 (so v1's own feed must NOT replay: its effects are
    // already in the snapshot) and a post-subscription delete (v2)
    // arrives incrementally as delete rows.
    "st10_table_source" -> GraftQuery(
      (s, dir) => {
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val root = s"${Registry.scratchRoot}/st10_lake_$id"
        val base = Registry.t(s, dir, "orders").filter(col("o_orderkey") % 3 === 0)
        val table = new MergeTable(root, Seq("o_orderstatus"))
        table.overwrite(base.filter(col("o_orderkey") % 4 =!= 2))       // v0
        table.merge(s, base.filter(col("o_orderkey") % 2 === 0)
          .withColumn("o_orderstatus", lit("M"))
          .withColumn("o_totalprice", col("o_totalprice") + 1000.0),
          Seq("o_orderkey"), changeFeed = true)                         // v1
        val src = table.readStream(ss, snapshotVersion = Some(1L))
        table.delete(s, col("o_orderstatus") === "O", changeFeed = true) // v2
        val sink = s"st10_sink_$id"
        val q = src.writeStream.format("memory").queryName(sink)
          .outputMode("append").trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"${Registry.scratchRoot}/st10_ckpt_$id")
          .start()
        q.awaitTermination()
        ss.table(sink)
          .groupBy(col(MergeTable.ChangeType).as("change_type"),
            col(MergeTable.CommitVersion).as("commit_version"))
          .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_sum"))
          .orderBy("commit_version", "change_type")
      },
      Some("""WITH base AS (SELECT * FROM orders WHERE o_orderkey % 3 = 0),
             |     tgt AS (SELECT o_orderkey, o_orderstatus FROM base
             |             WHERE o_orderkey % 4 <> 2),
             |     src AS (SELECT o_orderkey, 'M' AS o_orderstatus
             |             FROM base WHERE o_orderkey % 2 = 0),
             |     v1 AS (
             |  SELECT o_orderkey, o_orderstatus FROM tgt
             |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
             |  UNION ALL
             |  SELECT o_orderkey, o_orderstatus FROM src),
             |changes AS (
             |  SELECT 'insert' AS change_type, 1 AS v, o_orderkey FROM v1
             |  UNION ALL
             |  SELECT 'delete', 2, o_orderkey FROM v1 WHERE o_orderstatus = 'O')
             |SELECT change_type, CAST(v AS BIGINT) AS commit_version,
             |       count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum
             |FROM changes GROUP BY 1, 2 ORDER BY commit_version, change_type""".stripMargin),
      "the table as a streaming source: linked snapshot as inserts + CDF tail"),

    // Debezium-style CDC APPLY — the canonical use of the conditional-
    // clause MERGE: a stream of (row, op) change events lands on the lake
    // table with one mergeClauses call per micro-batch — op='D' deletes
    // matched rows, anything else upserts (SET * / INSERT *, the extra op
    // column ignored by name-mapping), and a delete for an absent key is
    // dropped by the INSERT clause's condition. Exactly-once under replay
    // via the txn marker committed atomically with each batch's merge.
    // Each key appears in at most one stream event, so the net state is
    // independent of how AvailableNow splits the files into batches — the
    // oracle replays the net effect relationally.
    "st11_cdc_apply" -> GraftQuery(
      (s, dir) => {
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val srcDir = s"${Registry.scratchRoot}/st11_src_$id"
        // normalized read (ts → TIMESTAMP): the staged files carry the op
        // column so the stream IS the CDC feed, and both the stream's
        // declared schema and the target table see one ts type
        val raw = Registry.t(s, dir, "events")
        raw.filter(col("event_id") % 2 === 0)
          .withColumn("op",
            when(col("event_id") % 10 === 0, lit("D")).otherwise(lit("U")))
          .withColumn("value", when(col("op") === "U", col("value") + 1000.0)
            .otherwise(col("value")))
          .repartition(4)
          .write.mode("overwrite").parquet(srcDir)
        val table = new MergeTable(s"${Registry.scratchRoot}/st11_lake_$id")
        table.overwrite(raw.filter(col("event_id") % 3 === 0))
        import org.apache.spark.sql.types._
        // the staged CDC batches are re-written from Registry.t output, so
        // ts is already the normalized TIMESTAMP — not the raw file's type
        val cdcSchema = StructType(Seq(
          StructField("event_id", LongType), StructField("ts", TimestampType),
          StructField("user_id", LongType), StructField("event_type", StringType),
          StructField("value", DoubleType), StructField("props", StringType),
          StructField("op", StringType)))
        val q = ss.readStream.schema(cdcSchema).parquet(srcDir)
          .writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            if (!table.lastTxnVersion("st11").exists(_ >= batchId))
              table.mergeClauses(batch.sparkSession, batch, Seq("event_id"), Seq(
                MergeTable.MatchedDelete(Some("s.op = 'D'")),
                MergeTable.MatchedUpdate(None, Nil),
                MergeTable.NotMatchedInsert(Some("s.op <> 'D'"), Nil)),
                txn = Some("st11" -> batchId))
          }
          .trigger(Trigger.AvailableNow())
          .option("maxFilesPerTrigger", "1")
          .option("checkpointLocation", s"${Registry.scratchRoot}/st11_ckpt_$id")
          .start()
        q.awaitTermination()
        table.read(s).groupBy("event_type")
          .agg(count(lit(1)).as("n"),
               sum("event_id").as("id_sum"),
               min("value").as("min_value"),
               max("value").as("max_value"))
      },
      Some("""WITH seed AS (SELECT event_id, event_type, value FROM events
             |              WHERE event_id % 3 = 0),
             |cdc AS (SELECT event_id, event_type, value,
             |               CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END AS op
             |        FROM events WHERE event_id % 2 = 0),
             |final AS (
             |  SELECT event_id, event_type, value FROM seed
             |  WHERE event_id NOT IN (SELECT event_id FROM cdc)
             |  UNION ALL
             |  SELECT event_id, event_type, value + 1000.0 AS value
             |  FROM cdc WHERE op = 'U')
             |SELECT event_type, count(*) AS n,
             |       CAST(sum(event_id) AS BIGINT) AS id_sum,
             |       min(value) AS min_value, max(value) AS max_value
             |FROM final GROUP BY event_type""".stripMargin),
      "streaming CDC apply: op-routed conditional merge per micro-batch, exactly-once"),

    // The st3 ingest loop through the CONNECTOR instead of foreachBatch:
    // `writeStream.format("graft")` with merge keys — Delta's streaming
    // sink call-shape (`writeStream.format("delta")`). Exactly-once rides
    // the (appId, batchId) txn marker committed atomically with each
    // micro-batch; the table is pre-seeded with stale rows the keyed
    // upsert must overwrite, and maxFilesPerTrigger forces 4 real
    // incremental rounds. min(value) would expose any missed seed row.
    "st12_sink_connector" -> GraftQuery(
      (s, dir) => {
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val srcDir = s"${Registry.scratchRoot}/st12_src_$id"
        s.read.parquet(s"$dir/events.parquet").repartition(4)
          .write.mode("overwrite").parquet(srcDir)
        val root = s"${Registry.scratchRoot}/st12_lake_$id"
        val table = new MergeTable(root)
        table.overwrite(Registry.t(s, dir, "events")
          .filter(col("event_id") % 10 === 0)
          .withColumn("value", lit(-1.0)))
        val q = StreamingOps.readEventStream(ss, srcDir)
          .writeStream.format("graft")
          .option("path", root)
          .option("keys", "event_id")
          .option("txnAppId", "st12")
          .trigger(Trigger.AvailableNow())
          .option("maxFilesPerTrigger", "1")
          .option("checkpointLocation", s"${Registry.scratchRoot}/st12_ckpt_$id")
          .start()
        q.awaitTermination()
        require(table.lastTxnVersion("st12").isDefined,
          "the sink must record its exactly-once txn marker")
        table.read(s).groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
               sum("event_id").as("id_sum"),
               min("value").as("min_value"),
               max("value").as("max_value"))
      },
      Some("""SELECT event_type, count(*) AS n_events,
             |       CAST(sum(event_id) AS BIGINT) AS id_sum,
             |       min(value) AS min_value, max(value) AS max_value
             |FROM events GROUP BY event_type""".stripMargin),
      "writeStream.format(\"graft\"): the connector as an exactly-once streaming merge sink"),

    // readStream.format("graft") → writeStream.format("graft"): the FULL
    // Delta streaming loop through the connector alone. Offsets are commit
    // versions: drain #1 delivers the seeded snapshot as batch 0; the
    // append commits a new version; drain #2 RESUMES from the checkpoint
    // and delivers only the appended files — re-delivering the snapshot
    // would double every count and hash-fail. The sink side appends with
    // its txn marker, so the whole loop is exactly-once end to end.
    "st13_source_connector" -> GraftQuery(
      (s, dir) => {
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val events = Registry.t(s, dir, "events")
        val root = s"${Registry.scratchRoot}/st13_lake_$id"
        val outRoot = s"${Registry.scratchRoot}/st13_out_$id"
        val ckpt = s"${Registry.scratchRoot}/st13_ckpt_$id"
        val src = new MergeTable(root)
        src.overwrite(events.filter(col("event_id") % 2 === 0))
        def drain(): Unit = {
          val q = ss.readStream.format("graft").option("path", root).load()
            .writeStream.format("graft")
            .option("path", outRoot).option("txnAppId", "st13")
            .trigger(Trigger.AvailableNow())
            .option("checkpointLocation", ckpt)
            .start()
          q.awaitTermination()
        }
        drain() // batch: the initial snapshot
        src.append(events.filter(col("event_id") % 2 =!= 0))
        drain() // resumed: ONLY the appended files
        new MergeTable(outRoot).read(s).groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
               sum("event_id").as("id_sum"),
               min("value").as("min_value"),
               max("value").as("max_value"))
      },
      Some("""SELECT event_type, count(*) AS n_events,
             |       CAST(sum(event_id) AS BIGINT) AS id_sum,
             |       min(value) AS min_value, max(value) AS max_value
             |FROM events GROUP BY event_type""".stripMargin),
      "readStream.format(\"graft\"): version-offset streaming source, snapshot + append tail"),

    // Streaming CDF through the connector (Delta's
    // readStream.option("readChangeFeed")): the table records its feed via
    // the enableChangeDataFeed property, three SQL DML commits write
    // change rows, and the stream replays them grouped by
    // (change_type, commit_version) — st6's semantics, but driven entirely
    // by the connector + property surface instead of API calls.
    "st14_cdf_connector" -> GraftQuery(
      (s, dir) => {
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val orders = Registry.t(s, dir, "orders")
        val root = s"${Registry.scratchRoot}/st14_lake_$id"
        val table = new MergeTable(root, Seq("o_orderstatus"))
        table.overwrite(orders.filter(col("o_orderkey") % 4 =!= 3))      // v0
        table.setProperties(Map(MergeTable.ChangeFeedProp -> "true"))    // v1
        val name = s"st14_$id"
        val src = s"st14_src_$id"
        orders.filter(col("o_orderkey") % 4 === 3).createOrReplaceTempView(src)
        graft.sqlapi.LakeCatalog.register(name, table)
        try {
          s.sql(s"DELETE FROM $name WHERE o_orderkey % 10 = 7")          // v2
          s.sql(s"UPDATE $name SET o_orderpriority = 'CDF' WHERE o_orderkey % 10 = 2") // v3
          s.sql(s"""MERGE INTO $name USING $src ON $name.o_orderkey = $src.o_orderkey
                   |WHEN MATCHED THEN UPDATE SET *
                   |WHEN NOT MATCHED THEN INSERT *""".stripMargin)       // v4
        } finally graft.sqlapi.LakeCatalog.unregister(name)
        val outDir = s"${Registry.scratchRoot}/st14_out_$id"
        val q = ss.readStream.format("graft")
          .option("path", root).option("readChangeFeed", "true").load()
          .groupBy(col(MergeTable.ChangeType).as("change_type"),
            col(MergeTable.CommitVersion).as("commit_version"))
          .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_sum"))
          .writeStream.outputMode("complete")
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"${Registry.scratchRoot}/st14_ckpt_$id")
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.write.mode("overwrite").parquet(outDir); ()
          }
          .start()
        q.awaitTermination()
        s.read.parquet(outDir)
          .orderBy("commit_version", "change_type")
      },
      Some("""WITH base AS (SELECT * FROM orders WHERE o_orderkey % 4 <> 3),
             |changes AS (
             |  SELECT 'delete' AS change_type, 2 AS commit_version, o_orderkey
             |  FROM base WHERE o_orderkey % 10 = 7
             |  UNION ALL
             |  SELECT 'update_preimage', 3, o_orderkey FROM base WHERE o_orderkey % 10 = 2
             |  UNION ALL
             |  SELECT 'update_postimage', 3, o_orderkey FROM base WHERE o_orderkey % 10 = 2
             |  UNION ALL
             |  SELECT 'insert', 4, o_orderkey FROM orders WHERE o_orderkey % 4 = 3)
             |SELECT change_type, CAST(commit_version AS BIGINT) AS commit_version,
             |       count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum
             |FROM changes GROUP BY 1, 2
             |ORDER BY commit_version, change_type""".stripMargin),
      "streaming CDF via the connector: readChangeFeed option, version-stamped rows"),

    // Rate-limited streaming ingest (Delta's maxFilesPerTrigger): four
    // single-file commits are consumed ONE VERSION PER MICRO-BATCH — the
    // offset walk caps each batch at the version range whose added-file
    // count fits the limit, so a backlogged table drains in bounded
    // batches instead of one cluster-sized gulp (the 100 TB restart
    // story: a stream catching up over 10^4 commits must not plan one
    // batch over all of them). The in-gate require pins >= 4 batches;
    // the hash proves rate limiting loses and duplicates nothing.
    "st15_rate_limited" -> GraftQuery(
      (s, dir) => {
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val events = Registry.t(s, dir, "events")
        val root = s"${Registry.scratchRoot}/st15_lake_$id"
        val outRoot = s"${Registry.scratchRoot}/st15_out_$id"
        val src = new MergeTable(root)
        src.overwrite(events.filter(col("event_id") % 4 === 0).repartition(1)) // v0
        (1 to 3).foreach { i =>                                                // v1..v3
          src.append(events.filter(col("event_id") % 4 === i).repartition(1))
        }
        val batches = new java.util.concurrent.atomic.AtomicLong()
        val q = ss.readStream.format("graft")
          .option("path", root).option("maxFilesPerTrigger", "1").load()
          .writeStream
          .option("checkpointLocation", s"${Registry.scratchRoot}/st15_ckpt_$id")
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, batchId: Long) =>
            batches.incrementAndGet()
            val out = new MergeTable(outRoot)
            if (!out.exists || !out.lastTxnVersion("st15").exists(_ >= batchId))
              out.append(b, txn = Some("st15" -> batchId))
            ()
          }
          .start()
        try q.processAllAvailable() finally q.stop()
        require(batches.get >= 4,
          s"maxFilesPerTrigger=1 over 4 single-file commits must yield >= 4 " +
            s"micro-batches, got ${batches.get}")
        new MergeTable(outRoot).read(s).groupBy("event_type")
          .agg(count(lit(1)).as("n_events"), sum("event_id").as("id_sum"))
      },
      Some("""SELECT event_type, count(*) AS n_events,
             |       CAST(sum(event_id) AS BIGINT) AS id_sum
             |FROM events GROUP BY event_type""".stripMargin),
      "maxFilesPerTrigger: bounded micro-batches over a backlogged table, exactly-once"),

    // Trigger.AvailableNow over the connector source — Delta's scheduled
    // batch-drain shape (run-on-cron instead of always-on): each run
    // drains exactly the backlog present at start, honors the rate limit,
    // TERMINATES ON ITS OWN, and the next run resumes from the checkpoint
    // so re-drains pick up only the tail. Exactly-once across runs via
    // batch-id txn markers on the sink table.
    "st16_available_now" -> GraftQuery(
      (s, dir) => {
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val events = Registry.t(s, dir, "events")
        val root = s"${Registry.scratchRoot}/st16_lake_$id"
        val outRoot = s"${Registry.scratchRoot}/st16_out_$id"
        val ckpt = s"${Registry.scratchRoot}/st16_ckpt_$id"
        val src = new MergeTable(root)
        src.overwrite(events.filter(col("event_id") % 4 === 0).repartition(1)) // v0
        (1 to 2).foreach(i =>                                                  // v1, v2
          src.append(events.filter(col("event_id") % 4 === i).repartition(1)))
        def drain(): Long = {
          val batches = new AtomicLong()
          val q = ss.readStream.format("graft")
            .option("path", root).option("maxFilesPerTrigger", "1").load()
            .writeStream
            .option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, batchId: Long) =>
              batches.incrementAndGet()
              val out = new MergeTable(outRoot)
              if (!out.exists || !out.lastTxnVersion("st16").exists(_ >= batchId))
                out.append(b, txn = Some("st16" -> batchId))
              ()
            }
            .start()
          require(q.awaitTermination(300000),
            "AvailableNow must terminate on its own after draining the backlog")
          batches.get
        }
        val first = drain()
        require(first >= 3,
          s"rate limit must split the 3-commit backlog into >= 3 batches, got $first")
        // late tail lands AFTER the first drain; only the second run sees it
        src.append(events.filter(col("event_id") % 4 === 3).repartition(1))    // v3
        val second = drain()
        require(second >= 1 && second <= 2,
          s"the second drain must process only the tail commit, got $second")
        new MergeTable(outRoot).read(s).groupBy("event_type")
          .agg(count(lit(1)).as("n_events"), sum("event_id").as("id_sum"))
      },
      Some("""SELECT event_type, count(*) AS n_events,
             |       CAST(sum(event_id) AS BIGINT) AS id_sum
             |FROM events GROUP BY event_type""".stripMargin),
      "Trigger.AvailableNow: self-terminating backlog drain, checkpoint-resumed, exactly-once"),

    // Scheduled CDF drains: the change-feed source under Trigger
    // .AvailableNow + maxFilesPerTrigger — each run consumes exactly the
    // feed backlog present at start in bounded micro-batches and stops;
    // the next run resumes from the checkpoint and sees only the new
    // commits. This is the cron-shaped CDC consumer (nightly downstream
    // sync) as opposed to st6/st14's always-on stream.
    "st17_cdf_drain" -> GraftQuery(
      (s, dir) => {
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val orders = Registry.t(s, dir, "orders")
        val root = s"${Registry.scratchRoot}/st17_lake_$id"
        val outRoot = s"${Registry.scratchRoot}/st17_out_$id"
        val ckpt = s"${Registry.scratchRoot}/st17_ckpt_$id"
        val table = new MergeTable(root, Seq("o_orderstatus"))
        table.overwrite(orders)                                          // v0
        table.setProperties(Map(MergeTable.ChangeFeedProp -> "true"))    // v1
        table.delete(s, col("o_orderkey") % 10 === 7, changeFeed = true) // v2
        table.update(s, col("o_orderkey") % 10 === 2,
          Map("o_orderpriority" -> lit("CDF")), changeFeed = true)       // v3
        def drain(): Long = {
          val batches = new AtomicLong()
          val q = ss.readStream.format("graft")
            .option("path", root).option("readChangeFeed", "true")
            .option("maxFilesPerTrigger", "1").load()
            .writeStream
            .option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, batchId: Long) =>
              batches.incrementAndGet()
              val out = new MergeTable(outRoot)
              if (!out.exists || !out.lastTxnVersion("st17").exists(_ >= batchId))
                out.append(b.select(col(MergeTable.ChangeType),
                  col(MergeTable.CommitVersion), col("o_orderkey")),
                  txn = Some("st17" -> batchId))
              ()
            }
            .start()
          require(q.awaitTermination(300000),
            "the CDF drain must terminate on its own")
          batches.get
        }
        val first = drain()
        require(first >= 2,
          s"maxFilesPerTrigger=1 over two feed commits must take >= 2 batches, got $first")
        // a commit landing after the first drain is only seen by the next
        table.delete(s, col("o_orderkey") % 10 === 4, changeFeed = true) // v4
        val second = drain()
        require(second >= 1 && second <= 2,
          s"the second drain must cover only the tail feed, got $second")
        new MergeTable(outRoot).read(s)
          .groupBy(col(MergeTable.ChangeType).as("change_type"),
            col(MergeTable.CommitVersion).as("commit_version"))
          .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_sum"))
          .orderBy("commit_version", "change_type")
      },
      Some("""WITH changes AS (
             |  SELECT 'delete' AS change_type, 2 AS commit_version, o_orderkey
             |  FROM orders WHERE o_orderkey % 10 = 7
             |  UNION ALL
             |  SELECT 'update_preimage', 3, o_orderkey FROM orders
             |  WHERE o_orderkey % 10 = 2 AND o_orderkey % 10 <> 7
             |  UNION ALL
             |  SELECT 'update_postimage', 3, o_orderkey FROM orders
             |  WHERE o_orderkey % 10 = 2 AND o_orderkey % 10 <> 7
             |  UNION ALL
             |  SELECT 'delete', 4, o_orderkey FROM orders
             |  WHERE o_orderkey % 10 = 4 AND o_orderkey % 10 NOT IN (7))
             |SELECT change_type, commit_version, count(*) AS n,
             |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
             |FROM changes GROUP BY change_type, commit_version
             |ORDER BY commit_version, change_type""".stripMargin),
      "scheduled CDF drains: AvailableNow + rate limit, checkpoint-resumed, exactly-once"),

    // Stream-side DATA SKIPPING (graft extension beyond Delta's source):
    // `option("where", p)` filters every batch's ROWS and prunes every
    // batch's FILES through the table's partition/stats machinery before
    // any read — a consumer tailing one partition of a firehose table
    // reads that partition's files, not every commit's. The gate feeds a
    // lake partitioned by event_type (each commit = one file per type),
    // streams WHERE event_type = 'click', and requires the per-batch file
    // census to show real pruning (kept < total) with results identical
    // to the filtered oracle.
    "st18_stream_skipping" -> GraftQuery(
      (s, dir) => {
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val events = Registry.t(s, dir, "events")
        val root = s"${Registry.scratchRoot}/st18_lake_$id"
        val src = new MergeTable(root, Seq("event_type"))
        src.overwrite(events.filter(col("event_id") % 3 === 0).repartition(1)) // v0
        (1 to 2).foreach { i =>                                                // v1, v2
          src.append(events.filter(col("event_id") % 3 === i).repartition(1))
        }
        val sink = s"st18_sink_$id"
        val q = ss.readStream.format("graft")
          .option("path", root)
          .option("where", "event_type = 'click'")
          .load()
          .writeStream.format("memory").queryName(sink).outputMode("append")
          .option("checkpointLocation", s"${Registry.scratchRoot}/st18_ckpt_$id")
          .start()
        try q.processAllAvailable() finally q.stop()
        val (tot, kept) = MergeTable.lastStreamPrune
        require(kept > 0 && kept < tot,
          s"stream-side skipping must prune the batch's files, kept $kept of $tot")
        ss.table(sink).groupBy("event_type")
          .agg(count(lit(1)).as("n_events"), sum("event_id").as("id_sum"))
      },
      Some("""SELECT event_type, count(*) AS n_events,
             |       CAST(sum(event_id) AS BIGINT) AS id_sum
             |FROM events WHERE event_type = 'click' GROUP BY event_type""".stripMargin),
      "stream-side data skipping: a where'd tail reads one partition's files, not the firehose"),

    // INCREMENTAL CURATION — t39's batch pipeline lifted to a MAINTAINED
    // view over the corpus table's change feed via the retraction-correct
    // [[graft.operators.IncrementalCuration]] operator: per micro-batch,
    // newly added documents are quality/repetition-gated (map-only over
    // the delta), registered in the PERSISTED fingerprint CENSUS
    // (doc_id + 16-byte md5 + 3 scalars per quality-passing doc — the
    // only dedup state that ever exists), decontaminated against the
    // FIXED benchmark 8-gram set (the evals exist BEFORE curation — the
    // production reality; the set broadcasts into every batch), and the
    // affected hash groups' canonicals (min doc_id, t39's window rule)
    // are re-derived and clause-merged into the curated table. Batches
    // here are staged by doc_id % 3 — deliberately NON-monotone ids, so
    // a hash's smaller-id canonical routinely arrives AFTER a sitting
    // duplicate and must DEMOTE it: the hash match against t39's VERBATIM
    // batch oracle proves arrival-order independence (production CDC
    // replays and multi-source ingest are not monotone). Per-batch work
    // is delta-sized, require-checked below; the corpus is NEVER
    // re-curated. Retraction under corpus deletes/updates is the same
    // code path, gated by st23 with a mid-stream mutation commit.
    //
    // Exactly-once across TWO state tables without a cross-table
    // transaction: fingerprints commit FIRST, curated SECOND, each under
    // its own txn marker (the st9 per-sink idiom). Replay of a crashed
    // batch re-derives the winner set from the deterministic post-fps
    // state, so every crash point converges (operator Scaladoc).
    "st19_incremental_curation" -> GraftQuery(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import graft.operators.IncrementalCuration
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val corpus = new MergeTable(s"${Registry.scratchRoot}/st19_corpus_$id")
        // bucketed state tables: the winner recompute partition-prunes fps
        // to the batch's touched hash-prefix buckets (operator Scaladoc)
        val fps = IncrementalCuration.fpsTable(s, s"${Registry.scratchRoot}/st19_fps_$id")
        val curated = IncrementalCuration.curatedTable(s, s"${Registry.scratchRoot}/st19_curated_$id")
        val docs = Registry.t(s, dir, "documents")
        val evalGrams = IncrementalCuration.evalGramSet(docs).cache()
        val batchRows = scala.collection.concurrent.TrieMap.empty[Long, Long]
        def curate(batch: DataFrame, batchId: Long): Unit = {
          batchRows(batchId) = IncrementalCuration.applyBatch(
            batch, batchId, fps, curated, evalGrams, "st19")
          ()
        }
        // OUT-OF-ORDER staging: residue classes interleave small and large
        // ids across batches, so canonical demotion must actually fire
        (0 to 2).foreach(i => corpus.merge(s,
          docs.filter(col("doc_id") % 3 === i).repartition(1),
          Seq("doc_id"), changeFeed = true))
        val q = corpus.changesStream(ss, maxFilesPerTrigger = Some(1))
          .writeStream
          .foreachBatch(curate _)
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"${Registry.scratchRoot}/st19_ckpt_$id")
          .start()
        q.awaitTermination()
        evalGrams.unpersist()
        // incrementality, require-checked: at least two non-empty deltas,
        // and every corpus document flowed through EXACTLY once — a batch
        // that rescanned the corpus would overshoot the total
        require(batchRows.values.count(_ > 0) >= 2,
          s"expected >= 2 non-empty micro-batches, saw $batchRows")
        require(batchRows.values.sum == docs.count(),
          s"each doc must be curated exactly once, no corpus rescan: $batchRows")
        // the final answer is t39's pack aggregate over the MAINTAINED
        // table — hash-matched against t39's verbatim batch oracle
        val w = Window.partitionBy("source").orderBy("doc_id")
        curated.read(s)
          .withColumn("cum", sum(col("n_tok")).over(w))
          .withColumn("pack_id", ((col("cum") - col("n_tok")) / 256).cast("long"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
            countDistinct(col("pack_id")).as("n_packs"))
          .orderBy("source")
      },
      Some("""WITH m AS (
             |  SELECT doc_id, text, source,
             |         list_filter(string_split(text, ' '), x -> x <> '') AS words,
             |         len(list_filter(string_split(text, ' '), x -> x <> '')) AS nw
             |  FROM documents),
             |qual AS (
             |  SELECT * FROM (
             |    SELECT *, length(text) - (nw - 1) AS sum_wlen,
             |           length(regexp_replace(text, '[a-z ]', '', 'g')) AS n_sym,
             |           len(list_intersect(list_distinct(words),
             |                              ['the','and','of','to','a'])) AS n_stop
             |    FROM m)
             |  WHERE nw BETWEEN 5 AND 1000
             |    AND sum_wlen >= nw * 2 AND sum_wlen <= nw * 12
             |    AND n_sym * 10 <= length(text) AND n_stop >= 2),
             |rep AS (
             |  SELECT * FROM (
             |    SELECT *, list_transform(generate_series(1, nw - 2),
             |             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) AS g3
             |    FROM qual)
             |  WHERE (len(g3) - len(list_distinct(g3))) * 5 < len(g3)),
             |canon AS (SELECT min(doc_id) AS doc_id FROM rep GROUP BY md5(text)),
             |k1 AS (SELECT rep.* FROM rep JOIN canon USING (doc_id)),
             |eg AS (SELECT DISTINCT array_to_string(words[i: i+7], ' ') AS gram
             |       FROM m CROSS JOIN LATERAL
             |         (SELECT unnest(generate_series(1, greatest(nw - 7, 0))) AS i) g
             |       WHERE doc_id % 97 = 0),
             |cont AS (SELECT DISTINCT k1.doc_id
             |         FROM k1 CROSS JOIN LATERAL
             |           (SELECT unnest(generate_series(1, greatest(nw - 7, 0))) AS i) g
             |         WHERE array_to_string(words[i: i+7], ' ') IN
             |               (SELECT gram FROM eg)),
             |kept AS (SELECT * FROM k1
             |         WHERE doc_id % 97 <> 0
             |           AND doc_id NOT IN (SELECT doc_id FROM cont)),
             |cums AS (SELECT source, doc_id, CAST(nw AS BIGINT) AS n_tok,
             |                sum(nw) OVER (PARTITION BY source ORDER BY doc_id
             |                              ROWS UNBOUNDED PRECEDING) AS cum
             |         FROM kept)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             |       CAST(count(DISTINCT (cum - n_tok) // 256) AS BIGINT) AS n_packs
             |FROM cums GROUP BY source ORDER BY source""".stripMargin),
      "incremental curation: t39 maintained from the CDF, delta-sized, state-table dedup"),

    // STREAMING ANN-INDEX MAINTENANCE — the persisted IVF-PQ index (v16)
    // maintained from the embeddings table's change feed, closing the
    // loop: every index this engine ships (d13's LSH, st19's fingerprint
    // state, and now the vector index) is incrementally maintained. The
    // FIRST micro-batch trains (k-means fit, the once-per-index cost) and
    // writes all three model tables; every later batch ENCODES against the
    // persisted centroids/codebooks and appends codes — O(batch), zero
    // refit, the FAISS add-after-train discipline. Exactly-once: the
    // codes-table txn marker is written atomically with each batch's
    // codes (build writes it last; a crashed build replays into an
    // identical seeded re-train), so replay can neither skip nor
    // double-index a vector. The gate REQUIREs >= 2 non-empty deltas,
    // exactly one code row per corpus vector, and a recall floor for BOTH
    // a first-batch query and a LAST-batch query (a vector indexed by the
    // final delta must be findable) vs the exact brute force.
    "st20_streaming_ann_index" -> GraftQuery(
      (s, dir) => {
        import graft.operators.PersistedAnnIndex
        graft.functions.GraftFunctions.register(s)
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val corpus = new MergeTable(s"${Registry.scratchRoot}/st20_corpus_$id")
        val idxRoot = s"${Registry.scratchRoot}/st20_idx_$id"
        val h = PersistedAnnIndex.Handle(idxRoot)
        val emb = Registry.t(s, dir, "embeddings")
          .withColumn("norm", expr("sqrt(float_dot(embedding, embedding))"))
        val batchRows = scala.collection.concurrent.TrieMap.empty[Long, Long]
        def index(batch: DataFrame, batchId: Long): Unit = {
          val sess = batch.sparkSession
          val inserts = batch.filter(col(MergeTable.ChangeType) === "insert")
            .select("vec_id", "label", "embedding", "norm")
          batchRows(batchId) = inserts.count()
          if (h.codesTable.lastTxnVersion("st20").exists(_ >= batchId)) return
          if (!h.codesTable.exists)
            PersistedAnnIndex.build(sess, inserts, idxRoot,
              txn = Some("st20" -> batchId))
          else PersistedAnnIndex.append(sess, h, inserts,
            txn = Some("st20" -> batchId))
          ()
        }
        val maxId = emb.agg(max("vec_id")).head.getLong(0)
        val cuts = Seq(maxId / 3, 2 * maxId / 3)
        Seq(col("vec_id") <= cuts(0),
            col("vec_id") > cuts(0) && col("vec_id") <= cuts(1),
            col("vec_id") > cuts(1))
          .foreach(p => corpus.merge(s, emb.filter(p).repartition(1),
            Seq("vec_id"), changeFeed = true))
        val q = corpus.changesStream(ss, maxFilesPerTrigger = Some(1))
          .writeStream
          .foreachBatch(index _)
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"${Registry.scratchRoot}/st20_ckpt_$id")
          .start()
        q.awaitTermination()
        require(batchRows.values.count(_ > 0) >= 2,
          s"expected >= 2 non-empty micro-batches, saw $batchRows")
        val total = emb.count()
        val indexed = h.codesTable.read(s).count()
        require(indexed == total,
          s"every vector indexed exactly once: $indexed codes for $total vectors")
        // recall floors for an early query AND a last-delta query, each vs
        // the exact brute-force top-10 over the WHOLE corpus
        def exactTop(qid: Long): Set[Long] = {
          val qv = emb.filter(col("vec_id") === qid)
            .select(col("embedding").as("q_emb"), col("norm").as("q_norm"))
          emb.filter(col("vec_id") =!= qid).crossJoin(broadcast(qv))
            .withColumn("cosine", round(
              expr("float_dot(embedding, q_emb)") / (col("norm") * col("q_norm")), 6))
            .orderBy(col("cosine").desc, col("vec_id")).limit(10)
            .select("vec_id").collect().map(_.getLong(0)).toSet
        }
        var out: DataFrame = null
        for (qid <- Seq(0L, maxId)) {
          val got = PersistedAnnIndex.search(s, h, emb, qid,
            k = 10, nProbe = 8, rerank = 100)
          val overlap = got.select("vec_id").collect().map(_.getLong(0)).toSet
            .intersect(exactTop(qid)).size
          require(overlap >= 5,
            s"streamed-index recall for query $qid: $overlap/10 vs exact")
          out = got
        }
        // replay oracle from the COMMITTED model tables (trained on the
        // first micro-batch; appends encoded against them, so one replay
        // covers the whole corpus) — AnnOracle's v12 discipline
        val (centers, cbk) = PersistedAnnIndex.models(s, h)
        AnnOracle.stash.put("st20_streaming_ann_index",
          AnnOracle.ivfPqSql(centers, cbk.centers, s"vec_id = $maxId",
            nProbe = 8, rerank = 100, k = 10))
        out.orderBy(col("cosine").desc, col("vec_id"))
      },
      None,
      "streaming ANN-index maintenance: first batch trains, later deltas append-encode, exactly-once",
      dynOracle = AnnOracle.dyn("st20_streaming_ann_index")),

    // Stream-stream LEFT OUTER interval join — st5's inner join plus the
    // semantics the outer variant actually adds: an unmatched left row
    // emits NULL-padded exactly when the watermark has CLOSED its join
    // window (no purchase can still arrive for it), and a left row whose
    // window the final watermark never passed is withheld forever — the
    // append-mode emission contract, mirrored by the oracle: matched pairs
    // are the plain relational join; null rows are clicks with no matching
    // purchase whose window end (c_ts + 10 min) lies strictly below the
    // final watermark (min over both streams of max event time − 1 h).
    // Spark's no-data final micro-batch (on by default) is what flushes
    // the closed-window state under Trigger.AvailableNow.
    "st21_stream_outer_join" -> GraftQuery(
      (s, dir) => {
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val sink = s"st21_sink_$id"
        val staged = stageEvents(dir, id)
        val clicks = StreamingOps.readEventStream(ss, staged)
          .filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
                  col("event_id").as("click_id"))
          .withWatermark("c_ts", "1 hour")
        val purchases = StreamingOps.readEventStream(ss, staged)
          .filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
                  col("event_id").as("purchase_id"), col("value"))
          .withWatermark("p_ts", "1 hour")
        val q = clicks.join(purchases,
            col("c_user") === col("p_user") &&
              col("p_ts") >= col("c_ts") &&
              col("p_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"),
            "leftOuter")
          .select(col("click_id"), col("purchase_id"), col("c_user").as("user_id"),
                  col("value"))
          .writeStream.format("memory").queryName(sink).outputMode("append")
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"${Registry.scratchRoot}/st21_ckpt_$id")
          .start()
        q.awaitTermination()
        ss.table(sink).orderBy("click_id", "purchase_id")
      },
      Some("""WITH wm AS (
             |  SELECT least((SELECT max(ts) FROM events WHERE event_type = 'click'),
             |               (SELECT max(ts) FROM events WHERE event_type = 'purchase'))
             |         - INTERVAL 1 HOUR AS w),
             |matched AS (
             |  SELECT c.event_id AS click_id, p.event_id AS purchase_id,
             |         c.user_id, p.value
             |  FROM events c JOIN events p
             |    ON c.user_id = p.user_id
             |   AND c.event_type = 'click' AND p.event_type = 'purchase'
             |   AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE),
             |nulls AS (
             |  SELECT c.event_id AS click_id, NULL AS purchase_id,
             |         c.user_id, NULL AS value
             |  FROM events c, wm
             |  WHERE c.event_type = 'click'
             |    AND c.ts + INTERVAL 10 MINUTE < wm.w
             |    AND NOT EXISTS (
             |      SELECT 1 FROM events p
             |      WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
             |        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE))
             |SELECT * FROM matched
             |UNION ALL SELECT * FROM nulls
             |ORDER BY 1, 2""".stripMargin),
      "stream-stream LEFT OUTER join: null-padded emission only after the watermark closes the window"),

    // Stream-stream FULL OUTER interval join — st21 completed on both
    // sides (the CDC-reconciliation shape: every click AND every purchase
    // surfaces exactly once, matched or null-padded). The emission
    // contract now has TWO eviction rules, each mirrored by the oracle:
    // an unmatched CLICK null-pads when the watermark passes its window
    // end (c_ts + 10 min < wm — no purchase can still arrive for it,
    // st21's rule), and an unmatched PURCHASE null-pads when the
    // watermark passes its OWN event time (p_ts < wm — any future click
    // has c_ts ≥ wm > p_ts, which the `p_ts >= c_ts` bound can never
    // match). Rows above the final watermark are withheld forever on
    // both sides — append-mode semantics, flushed by the no-data final
    // micro-batch under Trigger.AvailableNow.
    "st22_stream_full_outer_join" -> GraftQuery(
      (s, dir) => {
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val sink = s"st22_sink_$id"
        val staged = stageEvents(dir, id)
        val clicks = StreamingOps.readEventStream(ss, staged)
          .filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
                  col("event_id").as("click_id"))
          .withWatermark("c_ts", "1 hour")
        val purchases = StreamingOps.readEventStream(ss, staged)
          .filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
                  col("event_id").as("purchase_id"), col("value"))
          .withWatermark("p_ts", "1 hour")
        val q = clicks.join(purchases,
            col("c_user") === col("p_user") &&
              col("p_ts") >= col("c_ts") &&
              col("p_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"),
            "fullOuter")
          .select(col("click_id"), col("purchase_id"),
                  coalesce(col("c_user"), col("p_user")).as("user_id"),
                  col("value"))
          .writeStream.format("memory").queryName(sink).outputMode("append")
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"${Registry.scratchRoot}/st22_ckpt_$id")
          .start()
        q.awaitTermination()
        ss.table(sink).orderBy("click_id", "purchase_id")
      },
      Some("""WITH wm AS (
             |  SELECT least((SELECT max(ts) FROM events WHERE event_type = 'click'),
             |               (SELECT max(ts) FROM events WHERE event_type = 'purchase'))
             |         - INTERVAL 1 HOUR AS w),
             |matched AS (
             |  SELECT c.event_id AS click_id, p.event_id AS purchase_id,
             |         c.user_id, p.value
             |  FROM events c JOIN events p
             |    ON c.user_id = p.user_id
             |   AND c.event_type = 'click' AND p.event_type = 'purchase'
             |   AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE),
             |null_left AS (
             |  SELECT c.event_id AS click_id, NULL AS purchase_id,
             |         c.user_id, NULL AS value
             |  FROM events c, wm
             |  WHERE c.event_type = 'click'
             |    AND c.ts + INTERVAL 10 MINUTE < wm.w
             |    AND NOT EXISTS (
             |      SELECT 1 FROM events p
             |      WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
             |        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE)),
             |null_right AS (
             |  SELECT NULL AS click_id, p.event_id AS purchase_id,
             |         p.user_id, p.value
             |  FROM events p, wm
             |  WHERE p.event_type = 'purchase'
             |    AND p.ts < wm.w
             |    AND NOT EXISTS (
             |      SELECT 1 FROM events c
             |      WHERE c.event_type = 'click' AND c.user_id = p.user_id
             |        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE))
             |SELECT * FROM matched
             |UNION ALL SELECT * FROM null_left
             |UNION ALL SELECT * FROM null_right
             |ORDER BY 1, 2""".stripMargin),
      "stream-stream FULL OUTER join: both sides null-pad exactly when the watermark closes their window"),

    // RETRACTING CURATION — the gap between "maintained under append" and
    // "maintained": the corpus MUTATES mid-stream and the curated view
    // must still equal the batch recompute over the FINAL corpus. The
    // staged corpus is documents ∪ duplicate COPIES (same text, id + M —
    // the raw table is duplicate-free, so dup groups are constructed),
    // inserted in two doc_id % 2 commits (the deeper multi-commit history
    // lives in BucketedCurationSpec — the benched query keeps the
    // steady-state shape), then ONE mutation commit:
    //   • DELETE originals with id % 20 ∈ {4, 9} — every %20==4 original
    //     has a surviving copy, so its hash's canonical must PROMOTE to
    //     the copy (re-gated for eval/contamination at promotion);
    //   • UPDATE originals with id % 20 == 13 to 'x x' — below the
    //     quality bar, so a curated doc RETRACTS and its fingerprint
    //     leaves the census (its hash is freed).
    // The same IncrementalCuration.applyBatch consumes every batch —
    // retraction is not a special path. The oracle replays t39 over the
    // post-mutation corpus (copies built and mutations applied in SQL);
    // requires prove delta-sized processing (net changes sum to corpus +
    // mutations, no rescan) and that promotion actually fired (a curated
    // copy whose deleted original was canonical).
    "st23_retracting_curation" -> GraftQuery(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import graft.operators.IncrementalCuration
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val corpus = new MergeTable(s"${Registry.scratchRoot}/st23_corpus_$id")
        val fps = IncrementalCuration.fpsTable(s, s"${Registry.scratchRoot}/st23_fps_$id")
        val curated = IncrementalCuration.curatedTable(s, s"${Registry.scratchRoot}/st23_curated_$id")
        val docs = Registry.t(s, dir, "documents")
        val maxId = docs.agg(max("doc_id")).head.getLong(0)
        val m = maxId + 1000
        val copies = docs.filter(col("doc_id") % 10 === 4)
          .withColumn("doc_id", col("doc_id") + m)
        val corp0 = docs.select("doc_id", "text", "source")
          .unionByName(copies.select("doc_id", "text", "source"))
        val evalGrams = IncrementalCuration.evalGramSet(docs).cache()
        val batchRows = scala.collection.concurrent.TrieMap.empty[Long, Long]
        def curate(batch: DataFrame, batchId: Long): Unit = {
          batchRows(batchId) = IncrementalCuration.applyBatch(
            batch, batchId, fps, curated, evalGrams, "st23")
          ()
        }
        (0 to 1).foreach(i => corpus.merge(s,
          corp0.filter(col("doc_id") % 2 === i).repartition(1),
          Seq("doc_id"), changeFeed = true))
        // the mutation commit: deletes and a below-bar update in ONE
        // clause-merge, CDF on — originals only (copies stay)
        val mutSrc = docs.select("doc_id")
          .filter(col("doc_id") % 20 === 4 || col("doc_id") % 20 === 9 ||
            col("doc_id") % 20 === 13)
          .withColumn("kind", when(col("doc_id") % 20 === 13, "upd")
            .otherwise("del"))
          .repartition(1)
        corpus.mergeClauses(s, mutSrc, Seq("doc_id"),
          Seq(MergeTable.MatchedDelete(Some("s.kind = 'del'")),
              MergeTable.MatchedUpdate(Some("s.kind = 'upd'"),
                Seq("text" -> "'x x'"))),
          checkUniqueSource = false, changeFeed = true)
        val q = corpus.changesStream(ss, maxFilesPerTrigger = Some(1))
          .writeStream
          .foreachBatch(curate _)
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"${Registry.scratchRoot}/st23_ckpt_$id")
          .start()
        q.awaitTermination()
        evalGrams.unpersist()
        val nMut = mutSrc.count()
        val nUpd = mutSrc.filter(col("kind") === "upd").count()
        require(batchRows.values.count(_ > 0) >= 3,
          s"expected >= 3 non-empty micro-batches, saw $batchRows")
        // delta-sized, no rescan: every corpus doc nets once, every
        // mutation once — plus at most one extra appearance per UPDATE
        // when the file source splits a commit's pre/postimage files
        // across micro-batches (the operator is order-independent there;
        // a corpus rescan would overshoot by the corpus size)
        val net = batchRows.values.sum
        require(net >= corp0.count() + nMut && net <= corp0.count() + nMut + nUpd,
          s"net changes must be corpus + mutations (± split updates): $batchRows")
        // promotion fired: a COPY of a deleted %20==4 canonical is curated
        val promoted = curated.read(s)
          .filter(col("doc_id") > m && (col("doc_id") - m) % 20 === 4).count()
        require(promoted >= 1,
          s"expected at least one promoted copy canonical, saw $promoted")
        // the final answer: t39's pack aggregate over the maintained
        // table — hash-matched against the post-mutation batch replay
        val w = Window.partitionBy("source").orderBy("doc_id")
        curated.read(s)
          .withColumn("cum", sum(col("n_tok")).over(w))
          .withColumn("pack_id", ((col("cum") - col("n_tok")) / 256).cast("long"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
            countDistinct(col("pack_id")).as("n_packs"))
          .orderBy("source")
      },
      Some("""WITH mx AS (SELECT max(doc_id) AS mxid FROM documents),
             |copies AS (SELECT doc_id + mxid + 1000 AS doc_id, text, source
             |           FROM documents, mx WHERE doc_id % 10 = 4),
             |corp0 AS (SELECT doc_id, text, source FROM documents
             |          UNION ALL SELECT * FROM copies),
             |corp AS (SELECT c.doc_id,
             |                CASE WHEN c.doc_id <= mx.mxid AND c.doc_id % 20 = 13
             |                     THEN 'x x' ELSE c.text END AS text,
             |                c.source
             |         FROM corp0 c, mx
             |         WHERE NOT (c.doc_id <= mx.mxid AND c.doc_id % 20 IN (4, 9))),
             |m AS (
             |  SELECT doc_id, text, source,
             |         list_filter(string_split(text, ' '), x -> x <> '') AS words,
             |         len(list_filter(string_split(text, ' '), x -> x <> '')) AS nw
             |  FROM corp),
             |qual AS (
             |  SELECT * FROM (
             |    SELECT *, length(text) - (nw - 1) AS sum_wlen,
             |           length(regexp_replace(text, '[a-z ]', '', 'g')) AS n_sym,
             |           len(list_intersect(list_distinct(words),
             |                              ['the','and','of','to','a'])) AS n_stop
             |    FROM m)
             |  WHERE nw BETWEEN 5 AND 1000
             |    AND sum_wlen >= nw * 2 AND sum_wlen <= nw * 12
             |    AND n_sym * 10 <= length(text) AND n_stop >= 2),
             |rep AS (
             |  SELECT * FROM (
             |    SELECT *, list_transform(generate_series(1, nw - 2),
             |             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) AS g3
             |    FROM qual)
             |  WHERE (len(g3) - len(list_distinct(g3))) * 5 < len(g3)),
             |canon AS (SELECT min(doc_id) AS doc_id FROM rep GROUP BY md5(text)),
             |k1 AS (SELECT rep.* FROM rep JOIN canon USING (doc_id)),
             |morig AS (
             |  SELECT doc_id,
             |         list_filter(string_split(text, ' '), x -> x <> '') AS words,
             |         len(list_filter(string_split(text, ' '), x -> x <> '')) AS nw
             |  FROM documents),
             |eg AS (SELECT DISTINCT array_to_string(words[i: i+7], ' ') AS gram
             |       FROM morig CROSS JOIN LATERAL
             |         (SELECT unnest(generate_series(1, greatest(nw - 7, 0))) AS i) g
             |       WHERE doc_id % 97 = 0),
             |cont AS (SELECT DISTINCT k1.doc_id
             |         FROM k1 CROSS JOIN LATERAL
             |           (SELECT unnest(generate_series(1, greatest(nw - 7, 0))) AS i) g
             |         WHERE array_to_string(words[i: i+7], ' ') IN
             |               (SELECT gram FROM eg)),
             |kept AS (SELECT * FROM k1
             |         WHERE doc_id % 97 <> 0
             |           AND doc_id NOT IN (SELECT doc_id FROM cont)),
             |cums AS (SELECT source, doc_id, CAST(nw AS BIGINT) AS n_tok,
             |                sum(nw) OVER (PARTITION BY source ORDER BY doc_id
             |                              ROWS UNBOUNDED PRECEDING) AS cum
             |         FROM kept)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             |       CAST(count(DISTINCT (cum - n_tok) // 256) AS BIGINT) AS n_packs
             |FROM cums GROUP BY source ORDER BY source""".stripMargin),
      "retracting curation: corpus deletes/updates retract curated rows + fingerprints, canonicals promote"),

    // RETRACTING ANN-INDEX MAINTENANCE — st20's append-only loop closed
    // under corpus DELETEs: a deleted vector's code rows are MASKED via
    // the codes table's deletion-vector machinery (PersistedAnnIndex
    // .remove — zero file rewrites, the delete preimages' embeddings
    // re-assign to their cells so the position probe partition-prunes to
    // touched cells), and search NEVER returns a deleted id. Exactly-once
    // split: appends carry the txn marker; removes are idempotent
    // (re-masking masked positions is a no-op commit), so any replay
    // order converges. The gate stages two insert commits, then deletes
    // vec_id % 5 == 2 from the corpus (CDF on), maintains the index from
    // the feed, and REQUIREs: visible codes equal the post-deletion
    // corpus exactly (dv dir present — masked, not rewritten), zero
    // deleted ids in any result, and a recall floor vs the exact brute
    // force over the POST-MUTATION corpus for an early and a late query.
    "st24_retracting_ann_index" -> GraftQuery(
      (s, dir) => {
        import graft.operators.PersistedAnnIndex
        graft.functions.GraftFunctions.register(s)
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val corpus = new MergeTable(s"${Registry.scratchRoot}/st24_corpus_$id")
        val idxRoot = s"${Registry.scratchRoot}/st24_idx_$id"
        val h = PersistedAnnIndex.Handle(idxRoot)
        val emb = Registry.t(s, dir, "embeddings")
          .withColumn("norm", expr("sqrt(float_dot(embedding, embedding))"))
        val ins = scala.collection.concurrent.TrieMap.empty[Long, Long]
        val rem = scala.collection.concurrent.TrieMap.empty[Long, Long]
        def index(batch: DataFrame, batchId: Long): Unit = {
          val sess = batch.sparkSession
          val inserts = batch.filter(col(MergeTable.ChangeType) === "insert")
            .select("vec_id", "label", "embedding", "norm")
          ins(batchId) = inserts.count()
          if (ins(batchId) > 0 &&
              h.codesTable.lastTxnVersion("st24").forall(_ < batchId)) {
            if (!h.codesTable.exists)
              PersistedAnnIndex.build(sess, inserts, idxRoot,
                txn = Some("st24" -> batchId))
            else PersistedAnnIndex.append(sess, h, inserts,
              txn = Some("st24" -> batchId))
          }
          rem(batchId) = PersistedAnnIndex.remove(sess, h,
            batch.filter(col(MergeTable.ChangeType) === "delete")
              .select("vec_id", "label", "embedding", "norm"))
          ()
        }
        val maxId = emb.agg(max("vec_id")).head.getLong(0)
        (0 to 1).foreach(i => corpus.merge(s,
          emb.filter(col("vec_id") % 2 === i).repartition(1),
          Seq("vec_id"), changeFeed = true))
        corpus.delete(s, col("vec_id") % 5 === 2, changeFeed = true)
        val q = corpus.changesStream(ss, maxFilesPerTrigger = Some(1))
          .writeStream
          .foreachBatch(index _)
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"${Registry.scratchRoot}/st24_ckpt_$id")
          .start()
        q.awaitTermination()
        require(ins.values.count(_ > 0) >= 2,
          s"expected >= 2 non-empty insert micro-batches, saw $ins")
        val survivors = emb.filter(col("vec_id") % 5 =!= 2)
        require(rem.values.sum == emb.count() - survivors.count(),
          s"every deleted vector retracted exactly once: $rem")
        // masked, not rewritten — and invisible to every read
        val visible = h.codesTable.read(s)
        require(visible.count() == survivors.count(),
          "visible codes must equal the post-deletion corpus")
        require(visible.filter(col("vec_id") % 5 === 2).count() == 0,
          "a masked code row leaked into the snapshot read")
        require(java.nio.file.Files.exists(
            java.nio.file.Paths.get(s"$idxRoot/codes/dv")),
          "retraction must go through deletion vectors, not file rewrites")
        def exactTop(qid: Long): Set[Long] = {
          val qv = survivors.filter(col("vec_id") === qid)
            .select(col("embedding").as("q_emb"), col("norm").as("q_norm"))
          survivors.filter(col("vec_id") =!= qid).crossJoin(broadcast(qv))
            .withColumn("cosine", round(
              expr("float_dot(embedding, q_emb)") / (col("norm") * col("q_norm")), 6))
            .orderBy(col("cosine").desc, col("vec_id")).limit(10)
            .select("vec_id").collect().map(_.getLong(0)).toSet
        }
        var out: DataFrame = null
        var preFold: Seq[org.apache.spark.sql.Row] = Nil
        for (qid <- Seq(0L, maxId).filter(_ % 5 != 2)) {
          val got = PersistedAnnIndex.search(s, h, survivors, qid,
            k = 10, nProbe = 8, rerank = 100)
          val ids = got.select("vec_id").collect().map(_.getLong(0)).toSet
          require(ids.forall(_ % 5 != 2),
            s"search returned a deleted vector for query $qid")
          val overlap = ids.intersect(exactTop(qid)).size
          require(overlap >= 5,
            s"post-retraction recall for query $qid: $overlap/10 vs exact")
          out = got
          preFold = got.collect().toSeq
        }
        // LIFECYCLE CLOSE-OUT: the 20% corpus delete left the masked
        // fraction past maintain's default threshold — the refresh policy
        // must FOLD the deletion vectors (partition-scoped OPTIMIZE on the
        // masked cells only) and folding must be invisible to search: the
        // last query's rows byte-identical, recall re-proved post-fold
        val rep = PersistedAnnIndex.maintain(s, h, maxMaskedFraction = 0.1)
        require(rep.foldedCells.nonEmpty && h.codesTable.deletionVectors.isEmpty,
          s"maintain must fold the masked cells' dvs, saw $rep")
        require(!rep.retrainAdvised,
          s"a shrink within threshold must not advise retrain: $rep")
        val lastQid = Seq(0L, maxId).filter(_ % 5 != 2).last
        val refold = PersistedAnnIndex.search(s, h, survivors, lastQid,
          k = 10, nProbe = 8, rerank = 100)
        require(refold.collect().toSeq == preFold,
          "dv fold changed search results")
        val postIds = refold.select("vec_id").collect().map(_.getLong(0)).toSet
        require(postIds.intersect(exactTop(lastQid)).size >= 5,
          "post-fold recall regressed")
        // replay oracle over the SURVIVING corpus only (the dv-masked
        // codes are exactly the vec_id % 5 = 2 rows — spec-pinned above),
        // from the committed model tables
        val (centers, cbk) = PersistedAnnIndex.models(s, h)
        AnnOracle.stash.put("st24_retracting_ann_index",
          AnnOracle.ivfPqSql(centers, cbk.centers, s"vec_id = $lastQid",
            nProbe = 8, rerank = 100, k = 10,
            corpusPred = "vec_id % 5 <> 2"))
        out.orderBy(col("cosine").desc, col("vec_id"))
      },
      None,
      "retracting ANN maintenance: corpus deletes dv-mask their codes, search never returns them, maintain folds the masks",
      dynOracle = AnnOracle.dyn("st24_retracting_ann_index")),

    // RETRACTING LSH MAINTENANCE — closes the last insert-only maintenance
    // surface: d13's band-partitioned MinHash index kept equal to the
    // batch build over the CURRENT corpus snapshot while the corpus
    // mutates. Two doc_id % 2 insert commits, then ONE mutation commit:
    // DELETE doc_id % 7 == 2 (their band rows leave the index) and UPDATE
    // doc_id % 11 == 5 with a text suffix (their signatures re-derive in
    // place — new shingles move minhash minima). LshMaintenance.applyBatch
    // consumes all three batches through one code path; the answer is d13's
    // candidate-pair query over the MAINTAINED index, hash-matched against
    // the DuckDB replay of the whole MinHash chain over the post-mutation
    // corpus. REQUIREs prove delta-sized processing, deleted-doc absence,
    // and that at least one updated doc actually re-signed.
    "st25_retracting_lsh" -> GraftQuery(
      (s, dir) => {
        import graft.operators.LshMaintenance
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val corpus = new MergeTable(s"${Registry.scratchRoot}/st25_corpus_$id")
        val index = new MergeTable(s"${Registry.scratchRoot}/st25_idx_$id",
          Seq("band"))
        val docs = Registry.t(s, dir, "documents").select("doc_id", "text")
        val batchRows = scala.collection.concurrent.TrieMap.empty[Long, Long]
        def handle(batch: DataFrame, batchId: Long): Unit = {
          batchRows(batchId) =
            LshMaintenance.applyBatch(batch, batchId, index, "st25")
          ()
        }
        (0 to 1).foreach(i => corpus.merge(s,
          docs.filter(col("doc_id") % 2 === i).repartition(1),
          Seq("doc_id"), changeFeed = true))
        val mutSrc = docs
          .filter(col("doc_id") % 7 === 2 || col("doc_id") % 11 === 5)
          .withColumn("kind", when(col("doc_id") % 7 === 2, "del")
            .otherwise("upd"))
          .withColumn("new_text",
            concat(col("text"), lit(" revised edition of it")))
          .select("doc_id", "kind", "new_text")
          .repartition(1)
        corpus.mergeClauses(s, mutSrc, Seq("doc_id"),
          Seq(MergeTable.MatchedDelete(Some("s.kind = 'del'")),
              MergeTable.MatchedUpdate(Some("s.kind = 'upd'"),
                Seq("text" -> "s.new_text"))),
          checkUniqueSource = false, changeFeed = true)
        val q = corpus.changesStream(ss, maxFilesPerTrigger = Some(1))
          .writeStream
          .foreachBatch(handle _)
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"${Registry.scratchRoot}/st25_ckpt_$id")
          .start()
        q.awaitTermination()
        val nMut = mutSrc.count()
        val nUpd = mutSrc.filter(col("kind") === "upd").count()
        require(batchRows.values.count(_ > 0) >= 3,
          s"expected >= 3 non-empty micro-batches, saw $batchRows")
        val net = batchRows.values.sum
        require(net >= docs.count() + nMut && net <= docs.count() + nMut + nUpd,
          s"net changes must be corpus + mutations (± split updates): $batchRows")
        val idx = index.read(s)
        require(idx.filter(col("doc_id") % 7 === 2).count() == 0,
          "a deleted doc's band rows leaked in the maintained index")
        // re-sign proof: an updated doc's stored band signature differs
        // from its PRE-mutation signature (the suffix moved a minhash min)
        val origSigs = DedupQueries.bandedSignatures(
            docs.filter(col("doc_id") % 11 === 5 && col("doc_id") % 7 =!= 2))
          .select(col("doc_id"), col("band"), col("sig").as("old_sig"))
        val resigned = idx.join(origSigs, Seq("doc_id", "band"))
          .filter(col("sig") =!= col("old_sig")).count()
        require(resigned >= 1,
          "expected at least one updated doc to re-sign, saw none")
        val agree = (0 until DedupQueries.NumHashes)
          .map(i => when(col(s"x.h$i") === col(s"y.h$i"), 1).otherwise(0))
          .reduce(_ + _)
        val pairs = idx.filter(col("doc_id") % 3 =!= 0).alias("x")
          .join(idx.filter(col("doc_id") % 3 === 0).alias("y"),
            col("x.band") === col("y.band") && col("x.sig") === col("y.sig"))
          .select(col("y.doc_id").as("doc_id"), col("x.doc_id").as("corpus_id"),
            (agree.cast("double") / DedupQueries.NumHashes).as("est"))
          .distinct()
        pairs.filter(col("est") >= 0.5)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_dups"), max("est").as("best_jaccard"))
          .orderBy("doc_id")
      },
      Some {
        val mins = DedupQueries.lshOracleMins
        val bandSelects = DedupQueries.lshOracleBandSelects
        val agree = DedupQueries.lshOracleAgree
        s"""WITH corp AS (
           |  SELECT doc_id,
           |         CASE WHEN doc_id % 7 <> 2 AND doc_id % 11 = 5
           |              THEN text || ' revised edition of it'
           |              ELSE text END AS text
           |  FROM documents WHERE doc_id % 7 <> 2),
           |d AS (
           |  SELECT doc_id, list_distinct(list_transform(
           |           generate_series(1, len(words) - 2),
           |           i -> concat_ws(' ', words[i], words[i+1], words[i+2]))) AS shs
           |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM corp)
           |  WHERE len(words) >= 3),
           |sh AS (SELECT doc_id,
           |              ('0x' || substring(md5(sh), 1, 15))::BIGINT % ${DedupQueries.MinhashPrime} AS h
           |       FROM (SELECT doc_id, unnest(shs) AS sh FROM d)),
           |mh AS (
           |  SELECT doc_id,
           |    $mins
           |  FROM sh GROUP BY doc_id),
           |banded AS (
           |  $bandSelects),
           |cand AS (
           |  SELECT DISTINCT y.doc_id AS doc_id, x.doc_id AS corpus_id
           |  FROM banded x JOIN banded y
           |    ON x.band = y.band AND x.sig = y.sig
           |  WHERE x.doc_id % 3 <> 0 AND y.doc_id % 3 = 0),
           |est AS (
           |  SELECT c.doc_id, c.corpus_id,
           |         CAST($agree AS DOUBLE) / ${DedupQueries.NumHashes} AS est
           |  FROM cand c
           |  JOIN mh a ON a.doc_id = c.corpus_id
           |  JOIN mh b ON b.doc_id = c.doc_id)
           |SELECT doc_id, count(*) AS n_dups, max(est) AS best_jaccard
           |FROM est WHERE est >= 0.5
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin
      },
      "retracting LSH maintenance: corpus deletes/updates retract and re-sign the persisted MinHash index"),

    // CONCURRENT WRITERS vs THE MAINTENANCE STREAM — the real deployment
    // failure mode of any always-on pipeline: a SECOND CORPUS WRITER lands
    // a mutation commit (deletes + re-hashing updates, CDF on) WHILE the
    // maintenance foreachBatch is mid-apply — after the stream latched its
    // AvailableNow offsets, before the state merges commit. Snapshot
    // isolation (the atomic _LATEST swap) keeps the in-flight batch
    // consistent; the commit is consumed INCREMENTALLY by the next
    // maintenance run over the same checkpoint (the periodic-job shape).
    // The benched gate runs the STEADY-STATE shape (the r13-verdict trim
    // st23/st25/st28 already got): one staging commit, one mid-apply
    // mutation, one catch-up run. The ACCIDENTAL-DOUBLE-DEPLOYMENT layer
    // it used to re-run per batch (a second instance with fresh handles
    // must serialize to a txn-marker no-op) lives in the specs —
    // IncrementalCurationSpec's fresh-handle replay no-op pins the
    // sequential shape, ConcurrentCurationSpec the thread-level race.
    // The answer hash-matches t39's batch replay over the FINAL corpus —
    // proof the interleaved history converged exactly.
    "st26_concurrent_writers" -> GraftQuery(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import graft.operators.IncrementalCuration
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val corpus = new MergeTable(s"${Registry.scratchRoot}/st26_corpus_$id")
        val fpsRoot = s"${Registry.scratchRoot}/st26_fps_$id"
        val curRoot = s"${Registry.scratchRoot}/st26_curated_$id"
        val fps = IncrementalCuration.fpsTable(s, fpsRoot)
        val curated = IncrementalCuration.curatedTable(s, curRoot)
        val docs = Registry.t(s, dir, "documents")
        val evalGrams = IncrementalCuration.evalGramSet(docs).cache()
        val batchRows = scala.collection.concurrent.TrieMap.empty[Long, Long]
        @volatile var mutated = false
        def curate(batch: DataFrame, batchId: Long): Unit = {
          val sess = batch.sparkSession
          if (!mutated) { // the second writer, racing this very batch
            mutated = true
            val mutSrc = docs.select("doc_id")
              .filter(col("doc_id") % 20 === 7 || col("doc_id") % 20 === 11)
              .withColumn("kind", when(col("doc_id") % 20 === 7, "del")
                .otherwise("upd"))
              .repartition(1)
            corpus.mergeClauses(sess, mutSrc, Seq("doc_id"),
              Seq(MergeTable.MatchedDelete(Some("s.kind = 'del'")),
                  MergeTable.MatchedUpdate(Some("s.kind = 'upd'"),
                    Seq("text" ->
                      "concat(t.text, ' and the crew of the north')"))),
              checkUniqueSource = false, changeFeed = true)
          }
          batchRows(batchId) = IncrementalCuration.applyBatch(
            batch, batchId, fps, curated, evalGrams, "st26")
          ()
        }
        corpus.merge(s, docs.repartition(1), Seq("doc_id"), changeFeed = true)
        def drain(): Unit = {
          val q = corpus.changesStream(ss, maxFilesPerTrigger = Some(1))
            .writeStream
            .foreachBatch(curate _)
            .trigger(Trigger.AvailableNow())
            .option("checkpointLocation", s"${Registry.scratchRoot}/st26_ckpt_$id")
            .start()
          q.awaitTermination()
        }
        drain() // run 1: the concurrent commit lands mid-apply …
        require(mutated, "the second writer must have committed mid-stream")
        drain() // … run 2 consumes it incrementally over the same checkpoint
        evalGrams.unpersist()
        val nMut = docs
          .filter(col("doc_id") % 20 === 7 || col("doc_id") % 20 === 11).count()
        val nUpd = docs.filter(col("doc_id") % 20 === 11).count()
        val net = batchRows.values.sum
        require(net >= docs.count() + nMut && net <= docs.count() + nMut + nUpd,
          s"net changes must be corpus + mutations (± split updates): $batchRows")
        require(curated.read(s).filter(col("doc_id") % 20 === 7).count() == 0,
          "a doc deleted by the concurrent writer stayed curated")
        val w = Window.partitionBy("source").orderBy("doc_id")
        curated.read(s)
          .withColumn("cum", sum(col("n_tok")).over(w))
          .withColumn("pack_id", ((col("cum") - col("n_tok")) / 256).cast("long"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
            countDistinct(col("pack_id")).as("n_packs"))
          .orderBy("source")
      },
      Some("""WITH corp AS (
             |  SELECT doc_id,
             |         CASE WHEN doc_id % 20 = 11
             |              THEN text || ' and the crew of the north'
             |              ELSE text END AS text,
             |         source
             |  FROM documents WHERE doc_id % 20 <> 7),
             |m AS (
             |  SELECT doc_id, text, source,
             |         list_filter(string_split(text, ' '), x -> x <> '') AS words,
             |         len(list_filter(string_split(text, ' '), x -> x <> '')) AS nw
             |  FROM corp),
             |qual AS (
             |  SELECT * FROM (
             |    SELECT *, length(text) - (nw - 1) AS sum_wlen,
             |           length(regexp_replace(text, '[a-z ]', '', 'g')) AS n_sym,
             |           len(list_intersect(list_distinct(words),
             |                              ['the','and','of','to','a'])) AS n_stop
             |    FROM m)
             |  WHERE nw BETWEEN 5 AND 1000
             |    AND sum_wlen >= nw * 2 AND sum_wlen <= nw * 12
             |    AND n_sym * 10 <= length(text) AND n_stop >= 2),
             |rep AS (
             |  SELECT * FROM (
             |    SELECT *, list_transform(generate_series(1, nw - 2),
             |             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) AS g3
             |    FROM qual)
             |  WHERE (len(g3) - len(list_distinct(g3))) * 5 < len(g3)),
             |canon AS (SELECT min(doc_id) AS doc_id FROM rep GROUP BY md5(text)),
             |k1 AS (SELECT rep.* FROM rep JOIN canon USING (doc_id)),
             |morig AS (
             |  SELECT doc_id,
             |         list_filter(string_split(text, ' '), x -> x <> '') AS words,
             |         len(list_filter(string_split(text, ' '), x -> x <> '')) AS nw
             |  FROM documents),
             |eg AS (SELECT DISTINCT array_to_string(words[i: i+7], ' ') AS gram
             |       FROM morig CROSS JOIN LATERAL
             |         (SELECT unnest(generate_series(1, greatest(nw - 7, 0))) AS i) g
             |       WHERE doc_id % 97 = 0),
             |cont AS (SELECT DISTINCT k1.doc_id
             |         FROM k1 CROSS JOIN LATERAL
             |           (SELECT unnest(generate_series(1, greatest(nw - 7, 0))) AS i) g
             |         WHERE array_to_string(words[i: i+7], ' ') IN
             |               (SELECT gram FROM eg)),
             |kept AS (SELECT * FROM k1
             |         WHERE doc_id % 97 <> 0
             |           AND doc_id NOT IN (SELECT doc_id FROM cont)),
             |cums AS (SELECT source, doc_id, CAST(nw AS BIGINT) AS n_tok,
             |                sum(nw) OVER (PARTITION BY source ORDER BY doc_id
             |                              ROWS UNBOUNDED PRECEDING) AS cum
             |         FROM kept)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             |       CAST(count(DISTINCT (cum - n_tok) // 256) AS BIGINT) AS n_packs
             |FROM cums GROUP BY source ORDER BY source""".stripMargin),
      "concurrent writers: a corpus commit mid-apply and a racing maintenance instance both converge"),

    // SCHEMA EVOLUTION THROUGH THE CDF CONSUMER — a column arrives
    // MID-STREAM: run 1 curates the pre-evolution corpus; then
    // `addColumns` widens the corpus with `lang` and a backfill commit
    // (an UPDATE that sets lang WITHOUT touching text — pre/postimage
    // hashes are EQUAL, the shape that forced the same-commit drop guard)
    // stamps doc_id % 9 == 0; run 2 restarts the change stream over the
    // same checkpoint — changesStream tracks the LATEST snapshot schema —
    // and the operator's passthroughCols contract picks the column up the
    // first batch it appears in: the state tables' schemas evolve
    // (addColumns on fps and curated), earlier rows read NULL, and the
    // backfilled canonicals propagate lang into curated. The answer
    // (t39's kept set + a lang census) hash-matches DuckDB's replay.
    "st27_schema_evolution" -> GraftQuery(
      (s, dir) => {
        import graft.operators.IncrementalCuration
        import org.apache.spark.sql.types.{StringType, StructField, StructType}
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val corpus = new MergeTable(s"${Registry.scratchRoot}/st27_corpus_$id")
        val fps = IncrementalCuration.fpsTable(s, s"${Registry.scratchRoot}/st27_fps_$id")
        val curated = IncrementalCuration.curatedTable(s, s"${Registry.scratchRoot}/st27_curated_$id")
        // the raw table's OWN lang column is deliberately dropped: the
        // gate is about a column that does not exist until mid-stream
        val docs = Registry.t(s, dir, "documents")
          .select("doc_id", "text", "source")
        val evalGrams = IncrementalCuration.evalGramSet(docs).cache()
        val batchRows = scala.collection.concurrent.TrieMap.empty[Long, Long]
        def curate(batch: DataFrame, batchId: Long): Unit = {
          batchRows(batchId) = IncrementalCuration.applyBatch(
            batch, batchId, fps, curated, evalGrams, "st27",
            passthroughCols = Seq("lang"))
          ()
        }
        def drain(): Unit = {
          val q = corpus.changesStream(ss, maxFilesPerTrigger = Some(1))
            .writeStream
            .foreachBatch(curate _)
            .trigger(Trigger.AvailableNow())
            .option("checkpointLocation", s"${Registry.scratchRoot}/st27_ckpt_$id")
            .start()
          q.awaitTermination()
        }
        // steady-state benched shape (the r13-verdict st23/st25/st28 trim):
        // ONE pre-evolution staging commit — multi-commit increment depth
        // is spec territory (IncrementalCurationSpec) and stays benched in
        // st19/st23; this gate's subject is the mid-stream schema change
        corpus.merge(s, docs.repartition(1), Seq("doc_id"), changeFeed = true)
        drain() // run 1: the pre-evolution schema
        require(!curated.read(s).columns.contains("lang"),
          "state must not anticipate a column the corpus does not have yet")
        // mid-stream evolution: widen the corpus, backfill lang only
        corpus.addColumns(StructType(Seq(StructField("lang", StringType))))
        corpus.mergeClauses(s,
          docs.select("doc_id").filter(col("doc_id") % 9 === 0).repartition(1),
          Seq("doc_id"),
          Seq(MergeTable.MatchedUpdate(None, Seq("lang" -> "'en'"))),
          checkUniqueSource = false, changeFeed = true)
        drain() // run 2: the widened change feed
        evalGrams.unpersist()
        require(fps.read(s).columns.contains("lang") &&
            curated.read(s).columns.contains("lang"),
          "the passthrough column must evolve BOTH state tables")
        val nBack = docs.filter(col("doc_id") % 9 === 0).count()
        val net = batchRows.values.sum
        require(net >= docs.count() + nBack && net <= docs.count() + 2 * nBack,
          s"net changes must be corpus + backfill (± split updates): $batchRows")
        require(curated.read(s).filter(col("lang") === "en").count() >= 1,
          "at least one backfilled canonical must propagate lang")
        require(curated.read(s).filter(col("lang").isNull).count() >= 1,
          "pre-evolution canonicals must read NULL, not vanish")
        curated.read(s).groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
            count(col("lang")).as("n_lang"))
          .orderBy("source")
      },
      Some("""WITH m AS (
             |  SELECT doc_id, text, source,
             |         list_filter(string_split(text, ' '), x -> x <> '') AS words,
             |         len(list_filter(string_split(text, ' '), x -> x <> '')) AS nw
             |  FROM documents),
             |qual AS (
             |  SELECT * FROM (
             |    SELECT *, length(text) - (nw - 1) AS sum_wlen,
             |           length(regexp_replace(text, '[a-z ]', '', 'g')) AS n_sym,
             |           len(list_intersect(list_distinct(words),
             |                              ['the','and','of','to','a'])) AS n_stop
             |    FROM m)
             |  WHERE nw BETWEEN 5 AND 1000
             |    AND sum_wlen >= nw * 2 AND sum_wlen <= nw * 12
             |    AND n_sym * 10 <= length(text) AND n_stop >= 2),
             |rep AS (
             |  SELECT * FROM (
             |    SELECT *, list_transform(generate_series(1, nw - 2),
             |             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) AS g3
             |    FROM qual)
             |  WHERE (len(g3) - len(list_distinct(g3))) * 5 < len(g3)),
             |canon AS (SELECT min(doc_id) AS doc_id FROM rep GROUP BY md5(text)),
             |k1 AS (SELECT rep.* FROM rep JOIN canon USING (doc_id)),
             |eg AS (SELECT DISTINCT array_to_string(words[i: i+7], ' ') AS gram
             |       FROM m CROSS JOIN LATERAL
             |         (SELECT unnest(generate_series(1, greatest(nw - 7, 0))) AS i) g
             |       WHERE doc_id % 97 = 0),
             |cont AS (SELECT DISTINCT k1.doc_id
             |         FROM k1 CROSS JOIN LATERAL
             |           (SELECT unnest(generate_series(1, greatest(nw - 7, 0))) AS i) g
             |         WHERE array_to_string(words[i: i+7], ' ') IN
             |               (SELECT gram FROM eg)),
             |kept AS (SELECT * FROM k1
             |         WHERE doc_id % 97 <> 0
             |           AND doc_id NOT IN (SELECT doc_id FROM cont))
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(nw) AS BIGINT) AS n_tokens,
             |       CAST(count(CASE WHEN doc_id % 9 = 0 THEN 1 END) AS BIGINT) AS n_lang
             |FROM kept GROUP BY source ORDER BY source""".stripMargin),
      "schema evolution through the CDF consumer: a mid-stream column evolves the maintained state and propagates"),

    // RETRACTION-CORRECT INCREMENTAL CONNECTED COMPONENTS — the cluster
    // ASSIGNMENT maintained under arbitrary edge mutation (st25 maintains
    // the LSH candidate INDEX; this closes the remaining dedup-state gap).
    // The staged edge table is a deterministic closed form over doc_ids —
    // chains inside blocks of 8 (one component per block), staged across
    // two insert commits — then ONE mutation commit both MERGES
    // components (bridge edges between even/odd block pairs) and SPLITS
    // them (a mid-chain edge deleted from every 4k+1 block, carving its
    // 16-node merged component into 12 + 4). IncrementalCc.applyBatch
    // consumes every micro-batch through the same code path; per batch it
    // relabels ONLY the affected components (labels probed by id-bucket,
    // their edges fetched by label-bucket — both file-pruned). The final
    // labels table hash-matches DuckDB's recursive min-label walk over
    // the net surviving edge set; requires prove delta-sized processing
    // (each edge mutation nets exactly once) and that a merge AND a split
    // actually happened.
    "st28_incremental_cc" -> GraftQuery(
      (s, dir) => {
        import graft.operators.IncrementalCc
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val mut = new MergeTable(s"${Registry.scratchRoot}/st28_mut_$id")
        val edges = IncrementalCc.edgesTable(s, s"${Registry.scratchRoot}/st28_edges_$id")
        val labels = IncrementalCc.labelsTable(s, s"${Registry.scratchRoot}/st28_labels_$id")
        val docs = Registry.t(s, dir, "documents").select("doc_id")
        val maxId = docs.agg(max("doc_id")).head.getLong(0)
        val chains = docs
          .filter(col("doc_id") % 8 =!= 7 && col("doc_id") < maxId)
          .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
        val bridges = docs
          .filter(col("doc_id") % 8 === 7 && expr("(doc_id DIV 8) % 2") === 0 &&
            col("doc_id") < maxId)
          .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
        val splits = docs
          .filter(col("doc_id") % 8 === 3 && expr("(doc_id DIV 8) % 4") === 1 &&
            col("doc_id") < maxId)
          .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
        val batchRows = scala.collection.concurrent.TrieMap.empty[Long, Long]
        def relabel(batch: DataFrame, batchId: Long): Unit = {
          batchRows(batchId) = IncrementalCc.applyBatch(
            batch, batchId, edges, labels, "st28")
          ()
        }
        (0 to 1).foreach(i => mut.merge(s,
          chains.filter(col("src") % 2 === i).repartition(1),
          Seq("src", "dst"), changeFeed = true))
        // the mutation commit: component merges AND splits in one commit
        mut.mergeClauses(s,
          splits.withColumn("kind", lit("del"))
            .unionByName(bridges.withColumn("kind", lit("add")))
            .repartition(1),
          Seq("src", "dst"),
          Seq(MergeTable.MatchedDelete(Some("s.kind = 'del'")),
              MergeTable.NotMatchedInsert(Some("s.kind = 'add'"),
                Seq("src" -> "s.src", "dst" -> "s.dst"))),
          checkUniqueSource = false, changeFeed = true)
        val q = mut.changesStream(ss, maxFilesPerTrigger = Some(1))
          .writeStream
          .foreachBatch(relabel _)
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"${Registry.scratchRoot}/st28_ckpt_$id")
          .start()
        q.awaitTermination()
        require(batchRows.values.count(_ > 0) >= 3,
          s"expected >= 3 non-empty micro-batches, saw $batchRows")
        // delta-sized: every edge mutation nets exactly once (inserts and
        // deletes have single-image change rows — no split-update slack)
        val expected = chains.count() + bridges.count() + splits.count()
        require(batchRows.values.sum == expected,
          s"net edge changes must equal staged mutations ($expected): $batchRows")
        val lab = labels.read(s)
        // a MERGE happened: some node sits >= 8 ids past its block-crossing
        // label (bridged pair), and a SPLIT: some 8k+4 node in a 4k+1 block
        // became its own component head
        require(lab.filter(col("id") - col("label") >= 8).count() >= 1,
          "expected at least one cross-block merged component")
        require(lab.filter(col("id") === col("label") && col("id") % 8 === 4 &&
            expr("(id DIV 8) % 4") === 1).count() >= 1,
          "expected at least one split-off component head")
        lab.select("id", "label").orderBy("id")
      },
      Some("""WITH RECURSIVE mx AS (SELECT max(doc_id) AS m FROM documents),
             |ever AS (
             |  SELECT doc_id AS a, doc_id + 1 AS b FROM documents, mx
             |  WHERE doc_id < m
             |    AND (doc_id % 8 <> 7 OR (doc_id // 8) % 2 = 0)),
             |fin AS (
             |  SELECT a, b FROM ever
             |  WHERE NOT (a % 8 = 3 AND (a // 8) % 4 = 1)),
             |nodes AS (SELECT a AS id FROM ever UNION SELECT b FROM ever),
             |e2 AS (SELECT a, b FROM fin UNION ALL SELECT b, a FROM fin),
             |walk(node, lbl) AS (
             |  SELECT id, id FROM nodes
             |  UNION
             |  SELECT e.b, w.lbl FROM walk w JOIN e2 e ON e.a = w.node)
             |SELECT node AS id, min(lbl) AS label FROM walk
             |GROUP BY node ORDER BY id""".stripMargin),
      "incremental connected components: edge adds merge and deletes SPLIT maintained cluster labels"),

    // END-TO-END INCREMENTAL FUZZY DEDUP — the composite: one corpus
    // change feed drives LshMaintenance (signature index) → pair-delta
    // derivation (time-travel-pinned to the LSH commit, delta-sized:
    // only mutated docs' pairs can change) → IncrementalCc (edges +
    // component labels). Staged like st25: two doc_id % 2 insert
    // commits, then ONE mutation commit (DELETE % 7 == 2, UPDATE
    // % 11 == 5 with a text suffix — deletions retract their pairs,
    // re-signed docs move theirs). The answer is the maintained
    // CLUSTERING — labels of every node with a surviving est ≥ 0.5
    // pair — hash-matched against DuckDB replaying the entire MinHash
    // chain over the post-mutation corpus plus a recursive min-label
    // walk. Requires prove delta-sized processing, no deleted doc in any
    // surviving edge, and the min-label invariant.
    "st29_neardup_clusters" -> GraftQuery(
      (s, dir) => {
        import graft.operators.{IncrementalCc, IncrementalNearDup}
        val ss = streamSession(s)
        val id = runId.incrementAndGet()
        val corpus = new MergeTable(s"${Registry.scratchRoot}/st29_corpus_$id")
        val index = new MergeTable(s"${Registry.scratchRoot}/st29_idx_$id",
          Seq("band"))
        val edges = IncrementalCc.edgesTable(s, s"${Registry.scratchRoot}/st29_edges_$id")
        val labels = IncrementalCc.labelsTable(s, s"${Registry.scratchRoot}/st29_labels_$id")
        val docs = Registry.t(s, dir, "documents").select("doc_id", "text")
        val batchRows = scala.collection.concurrent.TrieMap.empty[Long, Long]
        def handle(batch: DataFrame, batchId: Long): Unit = {
          batchRows(batchId) = IncrementalNearDup.applyBatch(
            batch, batchId, index, edges, labels, "st29")
          ()
        }
        // two insert commits + one mutation commit; the stream drains
        // at TWO files per trigger — the composite pays three state
        // stages per micro-batch (LSH merge, pair probes, CC merges), so
        // the gate bounds the commit-overhead multiplier while still
        // proving multi-batch incrementality
        (0 to 1).foreach(i => corpus.merge(s,
          docs.filter(col("doc_id") % 2 === i).repartition(1),
          Seq("doc_id"), changeFeed = true))
        val mutSrc = docs
          .filter(col("doc_id") % 7 === 2 || col("doc_id") % 11 === 5)
          .withColumn("kind", when(col("doc_id") % 7 === 2, "del")
            .otherwise("upd"))
          .withColumn("new_text",
            concat(col("text"), lit(" revised edition of it")))
          .select("doc_id", "kind", "new_text")
          .repartition(1)
        corpus.mergeClauses(s, mutSrc, Seq("doc_id"),
          Seq(MergeTable.MatchedDelete(Some("s.kind = 'del'")),
              MergeTable.MatchedUpdate(Some("s.kind = 'upd'"),
                Seq("text" -> "s.new_text"))),
          checkUniqueSource = false, changeFeed = true)
        val q = corpus.changesStream(ss, maxFilesPerTrigger = Some(2))
          .writeStream
          .foreachBatch(handle _)
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"${Registry.scratchRoot}/st29_ckpt_$id")
          .start()
        q.awaitTermination()
        val nMut = mutSrc.count()
        val nUpd = mutSrc.filter(col("kind") === "upd").count()
        require(batchRows.values.count(_ > 0) >= 3,
          s"expected >= 3 non-empty micro-batches, saw $batchRows")
        val net = batchRows.values.sum
        require(net >= docs.count() + nMut && net <= docs.count() + nMut + nUpd,
          s"net doc changes must be corpus + mutations (± split updates): $batchRows")
        val edg = edges.read(s)
        require(edg.count() >= 1, "expected at least one surviving near-dup pair")
        require(edg.filter(col("a") % 7 === 2 || col("b") % 7 === 2).count() == 0,
          "a deleted doc survived in the maintained edge set")
        val lab = labels.read(s)
        // min-label invariant: every component's label IS its min member
        require(lab.groupBy("label").agg(min("id").as("mn"))
            .filter(col("label") =!= col("mn")).count() == 0,
          "a component's label must be its minimum member id")
        val nodes = edg.select(col("a").as("id"))
          .unionByName(edg.select(col("b").as("id"))).distinct()
        lab.join(nodes, Seq("id"), "left_semi")
          .select("id", "label").orderBy("id")
      },
      Some {
        val mins = DedupQueries.lshOracleMins
        val bandSelects = DedupQueries.lshOracleBandSelects
        val agree = DedupQueries.lshOracleAgree
        s"""WITH RECURSIVE corp AS (
           |  SELECT doc_id,
           |         CASE WHEN doc_id % 7 <> 2 AND doc_id % 11 = 5
           |              THEN text || ' revised edition of it'
           |              ELSE text END AS text
           |  FROM documents WHERE doc_id % 7 <> 2),
           |d AS (
           |  SELECT doc_id, list_distinct(list_transform(
           |           generate_series(1, len(words) - 2),
           |           i -> concat_ws(' ', words[i], words[i+1], words[i+2]))) AS shs
           |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM corp)
           |  WHERE len(words) >= 3),
           |sh AS (SELECT doc_id,
           |              ('0x' || substring(md5(sh), 1, 15))::BIGINT % ${DedupQueries.MinhashPrime} AS h
           |       FROM (SELECT doc_id, unnest(shs) AS sh FROM d)),
           |mh AS (
           |  SELECT doc_id,
           |    $mins
           |  FROM sh GROUP BY doc_id),
           |banded AS (
           |  $bandSelects),
           |cand AS (
           |  SELECT DISTINCT x.doc_id AS pa, y.doc_id AS pb
           |  FROM banded x JOIN banded y
           |    ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
           |pairs AS (
           |  SELECT pa, pb FROM cand c
           |  JOIN mh a ON a.doc_id = c.pa
           |  JOIN mh b ON b.doc_id = c.pb
           |  WHERE CAST($agree AS DOUBLE) / ${DedupQueries.NumHashes} >= 0.5),
           |nodes AS (SELECT pa AS id FROM pairs UNION SELECT pb FROM pairs),
           |e2 AS (SELECT pa AS a, pb AS b FROM pairs
           |       UNION ALL SELECT pb, pa FROM pairs),
           |walk(node, lbl) AS (
           |  SELECT id, id FROM nodes
           |  UNION
           |  SELECT e.b, w.lbl FROM walk w JOIN e2 e ON e.a = w.node)
           |SELECT node AS id, min(lbl) AS label FROM walk
           |GROUP BY node ORDER BY id""".stripMargin
      },
      "end-to-end incremental fuzzy dedup: one corpus feed maintains LSH index, pair set, and cluster labels"),
  )
}
