package graft.queries

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
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

  val all: Map[String, GraftQuery] = Map(

    "st1_stream_hourly" -> GraftQuery(
      (s, dir) => {
        val id = runId.incrementAndGet()
        val sink = s"st1_sink_$id"
        // stage the single events.parquet FILE into a directory — the
        // streaming file source only accepts directories.
        val srcDir = java.nio.file.Paths.get(s"${Registry.scratchRoot}/st1_src_$id")
        java.nio.file.Files.createDirectories(srcDir)
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$dir/events.parquet"),
          srcDir.resolve("events.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        val q = StreamingOps.hourlyTypeCounts(StreamingOps.readEventStream(s, srcDir.toString))
          .writeStream.format("memory").queryName(sink).outputMode("append")
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"${Registry.scratchRoot}/st1_ckpt_$id")
          .start()
        q.awaitTermination()
        s.table(sink).orderBy(col("hour_start"), col("event_type"))
      },
      Some("""WITH mx AS (SELECT max(ts) AS m FROM events)
             |SELECT CAST(date_trunc('hour', ts) AS TIMESTAMPTZ) AS hour_start,
             |       event_type, count(*) AS n_events
             |FROM events, mx
             |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= m - INTERVAL 1 HOUR
             |GROUP BY 1, 2
             |ORDER BY 1, 2""".stripMargin),
      "watermarked streaming aggregation, append-mode emission hash-checked"),
  )
}
