package graft.sqlapi

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

/** Delegating SQL parser injected via `SparkSessionExtensions.injectParser`
  * (see `graft.functions.GraftExtensions`) — the piece that makes the lake
  * DML surface a REAL `spark.sql` surface instead of a side API, which is
  * how Delta ships it. For every statement it consults [[LakeCatalog]]:
  *
  *  - `DELETE FROM t …` / `UPDATE t …` / `VACUUM t …` / `OPTIMIZE t …` /
  *    `MERGE INTO t …` where `t` is REGISTERED → a [[GraftDmlCommand]]
  *    node (eagerly executed by Spark's command machinery, like every DDL);
  *  - `DESCRIBE HISTORY t` / `SHOW PARTITIONS t` (registered) → a
  *    [[GraftMetaCommand]] whose output schema is derived at parse time
  *    (fixed for history; partition-column-typed for partitions);
  *  - any other statement mentioning a registered name (bare or
  *    `VERSION AS OF n`) → the reference is rewritten to a snapshot temp
  *    view and the REWRITTEN text is delegated — the full Spark SELECT
  *    surface (joins, windows, subqueries) composes with versioned reads;
  *  - everything else → delegated verbatim. An unregistered `DELETE FROM`
  *    still reaches Spark's own parser, so real catalog tables are
  *    untouchable by construction.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  @throws[ParseException]
  override def parsePlan(sqlText: String): LogicalPlan = {
    // CREATE TABLE … USING GRAFT carries its own provider tag, so it is
    // routed on shape alone — its target is by definition not registered
    // yet (and it may be the session's very first lake statement)
    if (LakeSql.isCreateStatement(sqlText)) return GraftDmlCommand(sqlText)
    // QUALIFY desugars to the standard windowed-filter shape and the
    // REWRITTEN text re-enters this parser, so it composes with lake-table
    // read rewrites below (the rewrite consumed the clause — no recursion)
    QualifyRewrite.rewrite(sqlText).foreach(r => return parsePlan(r))
    val targets = LakeCatalog.targets
    if (targets.nonEmpty) {
      if (LakeSql.runStatementTarget(sqlText).exists(targets.contains) ||
          MergeInto.targetOf(sqlText).exists(targets.contains))
        return GraftDmlCommand(sqlText)
      LakeSql.metaStatementTarget(sqlText).filter(targets.contains).foreach { tgt =>
        return GraftMetaCommand(sqlText, GraftSqlParser.metaAttributes(sqlText, targets(tgt)))
      }
      LakeSql.rewriteReads(session, sqlText, targets).foreach { rewritten =>
        return delegate.parsePlan(rewritten)
      }
    }
    // Catalog-qualified lake statements Spark has NO native executor for
    // (UPDATE / MERGE INTO / VACUUM / OPTIMIZE / RESTORE / DESCRIBE
    // HISTORY …): `cat.ns.t` resolves through a configured GraftCatalog.
    // Everything the native v2 surface runs (SELECT, INSERT, DELETE,
    // ALTER DDL, DROP) deliberately stays with the delegate.
    LakeSql.catalogRoutableTarget(sqlText).orElse(MergeInto.targetOf(sqlText))
      .foreach { tgt =>
        LakeCatalog.resolveViaCatalog(session, tgt).foreach { table =>
          return if (LakeSql.metaStatementTarget(sqlText).isDefined)
            GraftMetaCommand(sqlText, GraftSqlParser.metaAttributes(sqlText, table))
          else GraftDmlCommand(sqlText)
        }
      }
    delegate.parsePlan(sqlText)
  }

  override def parseQuery(sqlText: String): LogicalPlan = {
    QualifyRewrite.rewrite(sqlText).foreach(r => return parseQuery(r))
    val targets = LakeCatalog.targets
    if (targets.nonEmpty)
      LakeSql.rewriteReads(session, sqlText, targets).foreach { rewritten =>
        return delegate.parseQuery(rewritten)
      }
    delegate.parseQuery(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {
  /** Output attributes of a metadata statement, derived at parse time:
    * DESCRIBE HISTORY has a fixed audit schema; SHOW PARTITIONS is typed
    * by the target table's partition columns (a metadata-only read).
    */
  private[sqlapi] def metaAttributes(sql: String,
                                     table: graft.lake.MergeTable): Seq[AttributeReference] = {
    val schema =
      if (LakeSql.isHistoryStatement(sql))
        StructType(Seq(
          StructField("version", LongType, nullable = false),
          StructField("timestamp", TimestampType, nullable = false),
          StructField("operation", StringType, nullable = false),
          StructField("txns", StringType, nullable = false),
          StructField("num_added_files", LongType, nullable = true),
          StructField("num_removed_files", LongType, nullable = true),
          StructField("num_files", LongType, nullable = true)))
      else if (LakeSql.isDetailStatement(sql))
        StructType(Seq(
          StructField("format", StringType, nullable = false),
          StructField("location", StringType, nullable = false),
          StructField("version", LongType, nullable = false),
          StructField("last_modified", TimestampType, nullable = false),
          StructField("num_files", LongType, nullable = false),
          StructField("size_bytes", LongType, nullable = false),
          StructField("partition_columns", ArrayType(StringType), nullable = true),
          StructField("num_deletion_vectors", LongType, nullable = false),
          StructField("num_masked_rows", LongType, nullable = false),
          StructField("num_constraints", LongType, nullable = false),
          StructField("table_features", ArrayType(StringType), nullable = true)))
      else if (LakeSql.isPropertiesStatement(sql))
        StructType(Seq(
          StructField("key", StringType, nullable = false),
          StructField("value", StringType, nullable = false)))
      else if (LakeSql.isDryRunStatement(sql))
        StructType(Seq(StructField("path", StringType, nullable = false)))
      else if (LakeSql.isShowCreateStatement(sql))
        StructType(Seq(StructField("createtab_stmt", StringType, nullable = false)))
      else {
        val t = table.schemaOf(table.currentVersion)
        StructType(table.partitionCols.map(c => t(c)) :+
          StructField("n_files", LongType, nullable = false))
      }
    schema.map(f => AttributeReference(f.name, f.dataType, f.nullable)())
  }
}

/** A lake DML statement as a Spark command node: Spark executes commands
  * eagerly inside `spark.sql`, which gives the DML the exact semantics a
  * user expects from `DELETE FROM` — run at call time, empty result.
  */
case class GraftDmlCommand(sql: String) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(session: SparkSession): Seq[Row] = {
    val targets = LakeCatalog.targets
    if (MergeInto.targetOf(sql).isDefined) MergeInto.run(session, sql, targets)
    else LakeSql.run(session, sql, targets)
    Nil
  }
}

/** DESCRIBE HISTORY / SHOW PARTITIONS as a rows-returning command. The
  * result is metadata-sized by construction (one row per commit /
  * per partition), so the collect is safe at any table size.
  */
case class GraftMetaCommand(sql: String, override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] =
    LakeSql.query(session, sql, LakeCatalog.targets).collect().toSeq
}
