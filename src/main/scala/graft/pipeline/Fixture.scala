package graft.pipeline

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The representative call-center CSV fixture from FIXTURES.md §A.1 —
  * one row per validation rule and semantic quirk (Q1–Q5). Delivered as two
  * files: the initial batch and a re-delivery of call_id 101 (the
  * reference's late-data story: re-run + MERGE, README.md:105-118).
  */
object Fixture {

  val header = "call_id,caller_id,agent_id,call_start_time,call_end_time,call_status"

  val initialBatch: Seq[String] = Seq(
    "101,5001,11,09:15:00,09:20:30,COMPLETED", // valid
    "102,5002,12,10:00:00,10:01:00,dropped",   // Q2: passes validation, not counted in gold bucket
    "103,5003,13,23:58:00,00:03:00,COMPLETED", // Q5: midnight wrap → excluded from duration metrics
    "104,5004,14,99:99:99,10:00:00,FAILED",    // Q4: pattern-valid, unparseable → NULL duration
    "105,,15,09:00:00,09:05:00,COMPLETED",     // caller_id NULL → reject
    "106,abc,16,09:00:00,09:05:00,COMPLETED",  // CSV→NULL caller_id → reject
    "-7,5007,17,09:00:00,09:05:00,COMPLETED",  // Q1: negative id → "must be numeric"
    "108,5008,18,9:00:00,09:05:00,COMPLETED",  // bad time format → reject
    "109,5009,19,09:00:00,09:05:00,BUSY",      // invalid status → reject
    "110,5010,,bad,also-bad,",                 // multi-failure → joined Reject_reason
  )

  val redelivery: Seq[String] = Seq(
    "101,5001,11,09:15:00,09:25:00,DROPPED",   // re-delivered call_id → MERGE update
  )

  /** Write a batch as a CSV file; returns the path. */
  def writeCsv(dir: String, name: String, rows: Seq[String]): String = {
    val p = Paths.get(dir)
    Files.createDirectories(p)
    val f = p.resolve(name)
    Files.write(f, (header +: rows).asJava)
    f.toString
  }
}
