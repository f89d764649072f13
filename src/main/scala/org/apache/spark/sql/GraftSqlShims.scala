package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` bridge a V1 streaming Source needs: a DataFrame
  * whose plan carries the streaming flag (MicroBatchExecution asserts it
  * on every `getBatch` result). Spark's own built-in sources construct
  * their batches through exactly this call, and connector libraries that
  * ship V1 streaming sources (Delta among them) host their access in an
  * `org.apache.spark.sql` subpackage the same way. Nothing else from the
  * private surface is touched.
  */
object GraftSqlShims {
  def streamingDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
                         schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** An analyzed logical plan as a DataFrame (`Dataset.ofRows`) — what a
    * command node injected by a resolution rule needs to execute the
    * query subtree it captured (Delta's command rewrites use the same
    * call from their own sql subpackage).
    */
  def dataFrame(spark: SparkSession,
                plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Spark's own v2 Column[] → StructType conversion (metadata-encoding
    * defaults and comments exactly as the analyzer expects) — the util is
    * `private[sql]`, hence bridged here for the catalog's createTable.
    */
  def v2ColumnsToStructType(
      columns: Array[org.apache.spark.sql.connector.catalog.Column]): StructType =
    org.apache.spark.sql.connector.catalog.CatalogV2Util.v2ColumnsToStructType(columns)

  /** Spark's own Catalyst-expression → `sources.Filter` translation
    * (`protected[sql]` on DataSourceStrategy) — what lets the DML probe
    * pruning reuse the EXACT semantics the scan pushdown uses, instead of
    * a hand-rolled re-translation that could drift.
    */
  def translateFilter(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = true)

  /** Column ↔ Catalyst Expression bridges (`private[sql]` in Spark 4's
    * classic.ExpressionUtils) — what a library needs to hand a custom
    * codegen expression carrying NON-LITERAL plan state (e.g. a Bloom
    * filter reference object) straight to the DataFrame API without
    * round-tripping it through SQL text and the parser.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Drain the listener bus (`private[spark]`) — lets tests that count
    * query executions via a QueryExecutionListener observe every event
    * before asserting.
    */
  def waitForListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(30000)
}
