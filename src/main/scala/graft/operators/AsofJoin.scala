package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of join (point-in-time lookup): for every left row (key, t), attach
  * the value of the LATEST right row with the same key and right-time ≤ t.
  * Spark has no native ASOF operator; rather than a custom physical plan,
  * this composes existing operators (preference (a) in the build doctrine):
  * tag both sides, union them, and run ONE window pass per key ordered by
  * (time, side-tag) taking `last(value, ignoreNulls)` over the preceding
  * frame — right rows sort before left rows at equal timestamps, so an
  * exact-tie right row IS visible to the left row (the `>=` convention,
  * matching DuckDB's ASOF JOIN).
  *
  * Scale: one shuffle on the key (the union is shuffle-free), state is the
  * window's running last value — no join explosion, no range cross
  * product. This is the standard large-scale formulation; a right side
  * small enough to broadcast could use a broadcast range join instead.
  *
  * Contract: right must be unique per (key, time) — pre-dedupe if not, or
  * ties make "the" latest row ambiguous (DuckDB ASOF has the same
  * ambiguity).
  */
object AsofJoin {

  /** @param left      rows to enrich
    * @param right     lookup rows: key, time, and `valueCol`
    * @param key       equi-join key column (same name both sides)
    * @param time      event-time column (same name both sides)
    * @param valueCol  right column to carry; emitted as `asof_<valueCol>`
    */
  def asof(left: DataFrame, right: DataFrame, key: String, time: String,
           valueCol: String): DataFrame = {
    val leftCols = left.columns
    // The carried value is wrapped in a single-field struct: a right row
    // whose valueCol is genuinely NULL is a non-null struct{v: NULL}, while
    // the left-side placeholder is a NULL struct. `last(_, ignoreNulls)`
    // then skips only placeholders — a NULL right value propagates as NULL
    // (DuckDB ASOF JOIN semantics) instead of falling back to an earlier row.
    val vStruct = StructType(Seq(StructField("v", right.schema(valueCol).dataType)))
    val tagged = left
      .withColumn("_graft_side", lit(1))
      .withColumn("_graft_v", lit(null).cast(vStruct))
      .select((leftCols.map(col) :+ col("_graft_side") :+ col("_graft_v")): _*)
      .unionByName(
        right
          .withColumn("_graft_side", lit(0))
          .withColumn("_graft_v", struct(col(valueCol).as("v")))
          .select(key, time, "_graft_side", "_graft_v"),
        allowMissingColumns = true)

    val w = Window.partitionBy(key)
      .orderBy(col(time).asc, col("_graft_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    tagged
      .withColumn(s"asof_$valueCol",
        last(col("_graft_v"), ignoreNulls = true).over(w).getField("v"))
      .filter(col("_graft_side") === 1)
      .select((leftCols.map(col) :+ col(s"asof_$valueCol")): _*)
  }
}
