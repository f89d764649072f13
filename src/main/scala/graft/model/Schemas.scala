package graft.model

import org.apache.spark.sql.types._
import graft.dq.Rule

/** Schemas + validation rules of the call-center lakehouse (reference
  * README.md:59-93, glue_jobs/01_silver_delta_upsert.py:38,48-74).
  */
object CallCenter {

  /** Declared CSV read schema (reference 01:38). PERMISSIVE mode means bad
    * INT tokens parse to NULL — the DQ rules depend on this (quirk Q1).
    */
  val rawDdl: String =
    "call_id INT,caller_id INT,agent_id INT,call_start_time STRING,call_end_time STRING,call_status STRING"

  val rawSchema: StructType = StructType.fromDDL(rawDdl)

  val timePattern = "^[0-9]{2}:[0-9]{2}:[0-9]{2}$"
  val validStatuses: Seq[String] = Seq("COMPLETED", "DROPPED", "FAILED")

  /** The six rules, in declaration order (messages verbatim from 01:52-73 —
    * the oracle checks the joined Reject_reason strings bit-for-bit).
    */
  val rules: Seq[Rule] = Seq(
    Rule.notNullMatching("call_id", "^[0-9]+$", "call_id must not be NULL", "call_id must be numeric"),
    Rule.notNullMatching("caller_id", "^[0-9]+$", "caller_id must not be NULL", "caller_id must be numeric"),
    Rule.notNullMatching("agent_id", "^[0-9]+$", "agent_id must not be NULL", "agent_id must be numeric"),
    Rule.notNullMatching("call_start_time", timePattern, "call_start_time must not be NULL", "invalid call_start_time"),
    Rule.notNullMatching("call_end_time", timePattern, "call_end_time must not be NULL", "invalid call_end_time"),
    Rule.notNullInDomainCI("call_status", validStatuses, "call_status must not be NULL", "invalid call_status values"),
  )
}
