package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Event-stream operators (watermarked windowed aggregation + custom
  * sessionization state) over the `events` shape. Batch twins exist in
  * EventQueries (e7/e8) — these are the streaming formulations, sharing
  * semantics so a stream output can be oracle-checked against batch SQL.
  */
object StreamingOps {

  /** Tumbling 1-hour counts with a watermark: in append mode a window emits
    * only once the watermark (max event time − delay) passes its end —
    * late rows beyond the delay are dropped, the streaming contract the
    * batch e8 can't express. One shuffle on (window, event_type); state is
    * per-open-window partial aggregates, bounded by the watermark.
    */
  def hourlyTypeCounts(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n_events"))

  // ---- gap sessionization via flatMapGroupsWithState ----

  /** `ts` drives the watermark (Spark requires a timestamp column); `us` is
    * the same instant in epoch MICROS for exact gap arithmetic (Timestamp
    * getters truncate to millis — events carry microsecond times).
    */
  final case class Evt(user_id: Long, ts: Timestamp, us: Long)
  final case class SessionAcc(start: Long, last: Long, n: Long)
  final case class ClosedSession(user_id: Long, session_start_us: Long,
                                 session_end_us: Long, n_events: Long)

  object Evt {
    def at(userId: Long, ts: Timestamp): Evt =
      Evt(userId, ts, ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L)
  }

  /** Close sessions after `gapMinutes` of user inactivity, emitting each
    * exactly once (append mode). Within a batch, gaps split eagerly (micros
    * arithmetic, strict `>` — identical to the batch e7 lag-gap rule);
    * across batches the open session lives in GroupState and is flushed by
    * an EVENT-TIME timeout when the watermark passes last_seen + gap
    * (timeout registered in ms — the watermark's own resolution). State per
    * user is one (start, last, n) triple — O(active users), not O(events).
    */
  def sessionize(events: Dataset[Evt], gapMinutes: Int): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60000000L

    def flush(userId: Long, acc: SessionAcc): ClosedSession =
      ClosedSession(userId, acc.start, acc.last, acc.n)

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Evt], state: GroupState[SessionAcc]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            val closed = flush(userId, state.get)
            state.remove()
            Iterator(closed)
          } else {
            val times = batch.map(_.us).toArray.sorted
            var acc = state.getOption.orNull
            val closed = Seq.newBuilder[ClosedSession]
            times.foreach { t =>
              acc match {
                case null => acc = SessionAcc(t, t, 1)
                case a if t - a.last > gapUs =>
                  closed += flush(userId, a)
                  acc = SessionAcc(t, t, 1)
                case a => acc = SessionAcc(a.start, math.max(a.last, t), a.n + 1)
              }
            }
            if (acc != null) {
              state.update(acc)
              state.setTimeoutTimestamp(acc.last / 1000L + gapMinutes * 60000L)
            }
            closed.result().iterator
          }
      }
  }

  /** readStream source over a DIRECTORY of events parquet files (same ts
    * normalization as Registry.t — the raw file's physical type has varied
    * across testdata generations: TIMESTAMP(NANOS) read as BIGINT, or
    * TIMESTAMP(MICROS, NTZ) cast under the session's UTC zone; downstream
    * always sees TIMESTAMP). The streaming file source requires a
    * directory — single-file test inputs must be staged into one first
    * (see StreamQueries). The declared schema must match the file's
    * PHYSICAL type, so it is probed from the staged file with a one-off
    * batch read of its footer — metadata-sized, never a data scan.
    */
  def readEventStream(spark: SparkSession, eventsDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val physTs = spark.read.parquet(eventsDir).schema
      .fields.find(_.name == "ts").map(_.dataType).getOrElse(LongType)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", physTs),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val raw = spark.readStream.schema(schema).parquet(eventsDir)
    physTs match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", expr("cast(ts as timestamp)"))
      case _ => raw
    }
  }
}
