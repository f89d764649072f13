package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.model.CallCenter
import graft.pipeline.CallCenterPipeline
import graft.pipeline.CallCenterPipeline.LakePaths
import java.time.LocalDate

/** Structured Streaming ingest for the call-center lake (SURVEY.md §2.10 /
  * §7.6): the reference is batch-only by design — late files are handled by
  * "re-run the job, MERGE makes it idempotent" (README.md:105-118). Because
  * that design is already foreachBatch-shaped, the streaming version is a
  * drop-in: `readStream` over the CSV landing directory, each micro-batch
  * running the SAME silver logic (validate → split → MERGE valid → append
  * exceptions). The checkpoint tracks which files were consumed, so a
  * restart neither loses nor re-processes batches — and even a replayed
  * batch is safe, because the MERGE is idempotent by key.
  *
  * Scale: the file source lists only NEW files per trigger (maxFilesPerTrigger
  * bounds batch size); state is the tiny file log, not data. The merge cost
  * profile is identical to the batch job's.
  */
object StreamingIngest {

  /** Start the ingest; `Trigger.AvailableNow` drains everything currently
    * in `sourceDir` and stops — the streaming analog of one batch re-run.
    */
  def start(spark: SparkSession, sourceDir: String, paths: LakePaths,
            processingDate: LocalDate, checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val raw = spark.readStream
      .schema(CallCenter.rawSchema)
      .option("header", "true")
      .csv(sourceDir)
    raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        CallCenterPipeline.silverBatch(spark, batch, paths, processingDate)
      }
      .start()
  }

  /** Drain the source dir and wait for completion (test/bench helper). */
  def runOnce(spark: SparkSession, sourceDir: String, paths: LakePaths,
              processingDate: LocalDate, checkpointDir: String): Unit = {
    val q = start(spark, sourceDir, paths, processingDate, checkpointDir)
    q.awaitTermination()
  }
}
