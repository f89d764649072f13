package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.queries.Registry.{t, sanitize, scratchRoot}

/** Source/sink format coverage beyond the reference's CSV + Parquet
  * (+ Delta-analog): JSON-lines and ORC roundtrips through scratch, read
  * back with explicit schemas (never inference — schema-on-read is a scan
  * with no row-group statistics; at scale inference is an extra full pass).
  * The roundtrip columns are chosen lossless per format: JSON carries only
  * integers/strings (doubles would re-enter through text), ORC is a binary
  * format so doubles survive bit-for-bit. Oracles state the same aggregate
  * over the original parquet — the roundtrip must be invisible.
  */
object FormatQueries {

  val all: Map[String, GraftQuery] = Map(

    // JSON-lines sink + source with explicit schema.
    "f1_json_roundtrip" -> GraftQuery(
      (s, dir) => {
        val path = s"$scratchRoot/f1_${sanitize(dir)}"
        t(s, dir, "events")
          .select("event_id", "user_id", "event_type")
          .write.mode("overwrite").json(path)
        val schema = StructType(Seq(
          StructField("event_id", LongType), StructField("user_id", LongType),
          StructField("event_type", StringType)))
        s.read.schema(schema).json(path)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"), sum("event_id").as("id_sum"),
               countDistinct("user_id").as("n_users"))
      },
      Some("""SELECT event_type, count(*) AS n_events,
             |       CAST(sum(event_id) AS BIGINT) AS id_sum,
             |       count(DISTINCT user_id) AS n_users
             |FROM events GROUP BY event_type""".stripMargin),
      "JSON-lines write + schema'd read, aggregate unchanged"),

    // ORC sink + source (binary format: doubles survive bit-for-bit).
    "f2_orc_roundtrip" -> GraftQuery(
      (s, dir) => {
        val path = s"$scratchRoot/f2_${sanitize(dir)}"
        t(s, dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
          .write.mode("overwrite").orc(path)
        s.read.orc(path)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_orders"),
               round(sum("o_totalprice"), 2).as("revenue"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n_orders,
             |       round(sum(o_totalprice), 2) AS revenue
             |FROM orders GROUP BY o_orderstatus""".stripMargin),
      "ORC write + read, aggregate unchanged"),

    // CSV sink + source — the reference's own ingest format (S1: header +
    // DDL schema, never inference), closed into a roundtrip. Lossless
    // columns only (ints + strings; doubles re-entering through text would
    // depend on float formatting).
    "f3_csv_roundtrip" -> GraftQuery(
      (s, dir) => {
        val path = s"$scratchRoot/f3_${sanitize(dir)}"
        t(s, dir, "customer")
          .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
          .write.mode("overwrite").option("header", "true").csv(path)
        s.read
          .schema("c_custkey BIGINT, c_name STRING, c_nationkey BIGINT, c_mktsegment STRING")
          .option("header", "true").csv(path)
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_customers"),
               sum("c_custkey").as("key_sum"),
               countDistinct("c_nationkey").as("n_nations"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n_customers,
             |       CAST(sum(c_custkey) AS BIGINT) AS key_sum,
             |       count(DISTINCT c_nationkey) AS n_nations
             |FROM customer GROUP BY c_mktsegment""".stripMargin),
      "CSV write + header/schema read — the reference's ingest format, roundtripped"),
  )
}
