package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HiveFunctions
import graft.functions.HiveFunctions._
import graft.functions.UrlDecode
import graft.sources.Tables

/** Queries #14-#18 of SURVEY.md §2 — the Hive/Snowflake scalar-function
  * surface enumerated by the reference's conversion rules
  * (reference: tools/script_converter_tool.py:31-95). Each query exercises
  * the graft.functions implementations against a DuckDB-expressible twin.
  */
object FunctionQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // locate / split_part / lcase / substr / concat_ws / trim / length
    "q_string_funcs" -> ((s, dir) =>
      Tables.load(s, dir, "part").select(
        col("p_partkey"),
        hlocate("a", col("p_name")).as("loc_a"),
        splitPart(col("p_type"), " ", 1).as("type_head"),
        splitPart(col("p_type"), " ", 9).as("type_oob"),
        HiveFunctions.lcase(col("p_brand")).as("brand_lc"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        length(col("p_name")).as("name_len"))
        .orderBy(col("p_partkey"))),

    // md5 / sha256hex row fingerprints (converter rules 9, 17)
    "q_hash_funcs" -> ((s, dir) =>
      Tables.load(s, dir, "part").select(
        col("p_partkey"),
        md5(col("p_name")).as("name_md5"),
        sha256hex(col("p_name")).as("name_sha256"),
        rowHash(Seq(col("p_brand"), col("p_type"), col("p_size"))).as("row_fp"))
        .orderBy(col("p_partkey"))),

    // epoch-ms conversions, date_trunc, dateadd (rules 14, 32, 34, 36)
    "q_datetime_funcs" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        // parquet timestamps land as NTZ; session tz is UTC so the cast is
        // instant-preserving and unlocks the epoch functions.
        .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
        .select(
        col("o_orderkey"),
        unix_millis(col("o_orderdate")).as("ms"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        msToDate(unix_millis(col("o_orderdate"))).as("as_date"),
        (col("o_orderdate") + expr("INTERVAL 1 SECOND")).as("plus_1s"))
        .orderBy(col("o_orderkey"))),

    // find_in_set (rule 35)
    "q_find_in_set" -> ((s, dir) =>
      Tables.load(s, dir, "nation").select(
        col("n_nationkey"), col("n_name"),
        findInSet(col("n_name"), lit("FRANCE,GERMANY,INDIA,CHINA")).as("pos"),
        findInSet(splitPart(col("n_name"), " ", 1),
          concat(lit("KENYA,"), col("n_name"))).as("self_pos"))
        .orderBy(col("n_nationkey"))),

    // decodeurl custom Catalyst expression (rule 8). Oracle: the escape
    // set in this query is fixed and p_brand is escape-free, so a literal
    // replace-chain expansion reproduces URLDecoder exactly on this
    // corpus (DuckDB 1.0 has no url_decode); the general decoder
    // semantics (lenient malformed escapes, arbitrary input) stay pinned
    // by ScalaTest.
    // (No register() call: the Column wrapper builds UrlDecodeExpr
    // directly, and GraftSession sessions register the SQL function via
    // GraftExtensions — mutating registry state here was dead weight.)
    "q_decodeurl" -> ((s, dir) => {
      Tables.load(s, dir, "part").select(
        col("p_partkey"),
        UrlDecode.decodeurl(
          concat(lit("a%20b+c%2Fd%E2%82%AC-"), col("p_brand"))).as("decoded"))
        .orderBy(col("p_partkey"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_string_funcs" ->
      """SELECT p_partkey,
        |  strpos(p_name, 'a') AS loc_a,
        |  split_part(p_type, ' ', 1) AS type_head,
        |  split_part(p_type, ' ', 9) AS type_oob,
        |  lower(p_brand) AS brand_lc,
        |  substring(p_name, 1, 8) AS name_prefix,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  length(p_name) AS name_len
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_hash_funcs" ->
      """SELECT p_partkey,
        |  md5(p_name) AS name_md5,
        |  sha256(p_name) AS name_sha256,
        |  md5(concat_ws('|',
        |    coalesce(p_brand, 'NULL'),
        |    coalesce(p_type, 'NULL'),
        |    coalesce(CAST(p_size AS VARCHAR), 'NULL'))) AS row_fp
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_datetime_funcs" ->
      """SELECT o_orderkey,
        |  epoch_ms(o_orderdate) AS ms,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS d,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(o_orderdate AS DATE) AS as_date,
        |  o_orderdate + INTERVAL 1 SECOND AS plus_1s
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_find_in_set" ->
      """SELECT n_nationkey, n_name,
        |  CAST(coalesce(list_position(string_split('FRANCE,GERMANY,INDIA,CHINA', ','), n_name), 0) AS INTEGER) AS pos,
        |  CAST(coalesce(list_position(string_split(concat('KENYA,', n_name), ','), split_part(n_name, ' ', 1)), 0) AS INTEGER) AS self_pos
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    // Literal expansion of the query's fixed escape set: %20->space,
    // '+'->space (form-encoding), %2F->'/', %E2%82%AC->U+20AC (UTF-8
    // multibyte) — exactly java.net.URLDecoder on this input.
    "q_decodeurl" ->
      """SELECT p_partkey,
        |  replace(replace(replace(replace('a%20b+c%2Fd%E2%82%AC-' || p_brand,
        |    '%E2%82%AC', chr(8364)), '%2F', '/'), '%20', ' '), '+', ' ') AS decoded
        |FROM part ORDER BY p_partkey""".stripMargin
  )
}
