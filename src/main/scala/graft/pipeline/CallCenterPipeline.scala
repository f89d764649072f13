package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dq.Validator
import graft.gold.GoldAggregates
import graft.lake.MergeTable
import graft.model.CallCenter
import java.time.LocalDate

/** The two reference jobs re-expressed as pure functions of
  * (SparkSession, paths, processingDate).
  *
  * `processingDate` is injected instead of `current_date()`
  * (01_silver_delta_upsert.py:83-84, 02_gold_analytics.py:32) so results are
  * deterministic for tests and the oracle (SURVEY.md §7.5.2).
  */
object CallCenterPipeline {

  final case class LakePaths(root: String) {
    val silver = s"$root/silver_delta"
    val exception = s"$root/exception"
    val goldDailySummary = s"$root/gold/gold_callcenter_analytics/gold_call_daily_summary"
    val goldAgentPerformance = s"$root/gold/gold_callcenter_analytics/gold_agent_performance"
    val goldDurationMetrics = s"$root/gold/gold_callcenter_analytics/gold_call_duration_metrics"
  }

  private val partCols = Seq("year", "month")

  def silverTable(p: LakePaths) = new MergeTable(p.silver, partCols)
  def goldTables(p: LakePaths): Map[String, (MergeTable, Seq[String])] = Map(
    "gold_call_daily_summary" -> (new MergeTable(p.goldDailySummary, partCols), Seq("call_date")),
    "gold_agent_performance" -> (new MergeTable(p.goldAgentPerformance, partCols), Seq("call_date", "agent_id")),
    "gold_call_duration_metrics" -> (new MergeTable(p.goldDurationMetrics, partCols), Seq("call_date")),
  )

  /** Silver job (reference 01_silver_delta_upsert.py): CSV → validate →
    * split → MERGE valid into silver on call_id; append invalid (with
    * Reject_reason) to the exception parquet.
    *
    * Improvement over the reference (semantics-preserving, SURVEY.md §4):
    * the validated frame is cached so the valid/invalid split doesn't scan
    * and re-validate the CSV three times.
    */
  def silverJob(spark: SparkSession, csvPath: String, p: LakePaths,
                processingDate: LocalDate): Unit = {
    val raw = spark.read.schema(CallCenter.rawSchema).option("header", "true").csv(csvPath)
    silverBatch(spark, raw, p, processingDate)
  }

  /** The silver job body on an already-read batch — shared by the batch
    * entry above and the streaming `foreachBatch` ingest
    * (graft.streaming.StreamingIngest): validate → split → MERGE valid →
    * append invalid. MERGE keys make every micro-batch idempotent, which is
    * exactly the reference's late-data story (README.md:105-118) lifted
    * from "re-run the job" to "every micro-batch".
    */
  def silverBatch(spark: SparkSession, raw: DataFrame, p: LakePaths,
                  processingDate: LocalDate): Unit = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic") // 01:25
    val validated = new Validator(CallCenter.rules).validate(raw)
      .withColumns(Map(
        "year" -> year(lit(processingDate)),
        "month" -> month(lit(processingDate))))
      .cache()
    try {
      val valid = validated.filter(col("Reject_reason").isNull)
      val invalid = validated.filter(col("Reject_reason").isNotNull)

      val cleanValid = valid.drop("Reject_reason")
      // Reference merges the source as-is; Delta would throw if a batch
      // carried the same call_id twice (SURVEY.md §2.6.4). We pre-dedupe
      // DETERMINISTICALLY: row_number over a total order of every non-key
      // column, keep rn=1 — identical duplicates collapse to the same row,
      // and conflicting duplicates always resolve to the same winner
      // (unlike dropDuplicates, whose pick is partition-order-dependent).
      val nonKey = cleanValid.columns.filterNot(_ == "call_id")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("call_id").orderBy(nonKey.map(c => col(c).asc_nulls_first): _*)
      val deduped = cleanValid
        .withColumn("_graft_rn", row_number().over(w))
        .filter(col("_graft_rn") === 1).drop("_graft_rn")
      silverTable(p).merge(spark, deduped, Seq("call_id"))

      invalid.write.mode("append").partitionBy(partCols: _*).parquet(p.exception) // 01:125-129
    } finally validated.unpersist()
  }

  /** Gold job (reference 02_gold_analytics.py): silver → 3 aggregate tables,
    * each MERGEd on its grain.
    */
  def goldJob(spark: SparkSession, p: LakePaths, processingDate: LocalDate): Unit = {
    val silver = silverTable(p).read(spark).cache()
    try {
      val prcsd = lit(processingDate)
      val g = goldTables(p)
      val results = Map(
        "gold_call_daily_summary" -> GoldAggregates.dailySummary(silver, prcsd),
        "gold_agent_performance" -> GoldAggregates.agentPerformance(silver, prcsd),
        "gold_call_duration_metrics" -> GoldAggregates.durationMetrics(silver, prcsd),
      )
      results.foreach { case (name, df) =>
        val (table, keys) = g(name)
        // Gold keys contain call_date, and year/month are derived from the
        // same processing date that call_date carries — keys functionally
        // determine the partition values, so the merge probe can restrict
        // itself to the processed day's partitions (MergeTable class doc).
        table.merge(spark, GoldAggregates.withYearMonth(df, prcsd), keys,
          keysDeterminePartitions = true)
      }
    } finally silver.unpersist()
  }

  /** Full pipeline: silver then gold, one processing day. */
  def run(spark: SparkSession, csvPath: String, p: LakePaths, processingDate: LocalDate): Unit = {
    silverJob(spark, csvPath, p, processingDate)
    goldJob(spark, p, processingDate)
  }
}
