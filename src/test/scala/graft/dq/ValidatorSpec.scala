package graft.dq

import graft.SparkSpec
import graft.model.CallCenter
import graft.pipeline.Fixture
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The six DQ rules and quirks Q1–Q3 (SURVEY.md §2.3) on the fixture rows —
  * every expected Reject_reason bit-for-bit, plus the split partition law.
  */
class ValidatorSpec extends SparkSpec {

  private lazy val validated: DataFrame = {
    val dir = scratch("validator")
    val csv = Fixture.writeCsv(dir, "batch.csv", Fixture.initialBatch)
    val raw = spark.read.schema(CallCenter.rawSchema).option("header", "true").csv(csv)
    new Validator(CallCenter.rules).validate(raw)
  }

  private def reasonOf(callId: Any): Option[String] = {
    val rows = validated.filter(
      if (callId == null) col("call_id").isNull else col("call_id") === callId.toString.toInt)
      .select("Reject_reason").collect()
    assert(rows.length == 1, s"expected one row for call_id=$callId")
    Option(rows.head.getString(0))
  }

  test("valid row passes (101)") { assert(reasonOf(101).isEmpty) }

  test("Q2 setup: lowercase status passes case-insensitive validation (102)") {
    assert(reasonOf(102).isEmpty)
  }

  test("Q4/Q5 setup: pattern-valid times pass validation (103, 104)") {
    assert(reasonOf(103).isEmpty)
    assert(reasonOf(104).isEmpty)
  }

  test("NULL caller_id rejected (105)") {
    assert(reasonOf(105).contains("caller_id must not be NULL"))
  }

  test("CSV PERMISSIVE parse: non-numeric INT token → NULL → NULL rule (106)") {
    assert(reasonOf(106).contains("caller_id must not be NULL"))
  }

  test("Q1: negative id fails the regex as 'must be numeric' (-7)") {
    assert(reasonOf(-7).contains("call_id must be numeric"))
  }

  test("malformed time rejected (108)") {
    assert(reasonOf(108).contains("invalid call_start_time"))
  }

  test("out-of-domain status rejected (109)") {
    assert(reasonOf(109).contains("invalid call_status values"))
  }

  test("Q3: multi-failure messages joined ' | ' in rule declaration order (110)") {
    assert(reasonOf(110).contains(
      "agent_id must not be NULL | invalid call_start_time | invalid call_end_time | call_status must not be NULL"))
  }

  test("empty input validates to empty valid and invalid frames") {
    val dir = scratch("validator_empty")
    val csv = Fixture.writeCsv(dir, "empty.csv", Seq.empty)
    val raw = spark.read.schema(CallCenter.rawSchema).option("header", "true").csv(csv)
    val (valid, invalid) = new Validator(CallCenter.rules).split(raw)
    assert(valid.count() === 0)
    assert(invalid.count() === 0)
  }

  test("split is a partition: valid ∪ invalid = input, disjoint") {
    val raw = validated.drop("Reject_reason")
    val (valid, invalid) = new Validator(CallCenter.rules).split(raw)
    assert(valid.count() + invalid.count() === raw.count())
    assert(valid.count() === 4)
    assert(invalid.count() === 6)
  }
}
