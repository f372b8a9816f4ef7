package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic "hive side" vs "sf side" table pairs.
  *
  * The reference validates a real Hive warehouse against its Snowflake
  * migration; here both sides derive from the same parquet with a fixed
  * perturbation (drop keys, inject keys, mutate cells) applied identically
  * in Spark and in the DuckDB oracle SQL (see [[OracleDialect]]), so the
  * discrepancy engine's output is independently checkable.
  *
  * Money columns are projected to integral cents (BIGINT) up front: row
  * fingerprints and mismatch cells then never depend on an engine's
  * float-to-string rendering.
  */
object Fixtures {

  /** Portable orders projection: o_totalprice → o_totalprice_cents. */
  def hiveOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders").select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long").as("o_totalprice_cents"),
      col("o_orderdate"), col("o_orderpriority"))

  /** SF-side orders: keys %97 dropped (hive-only), keys %101 re-injected at
    * +100000000 (sf-only), price bumped on %89, priority mutated on %131. */
  def sfOrders(spark: SparkSession, dir: String): DataFrame = {
    val h = hiveOrders(spark, dir)
    val kept = h.filter(col("o_orderkey") % 97 =!= 0).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      when(col("o_orderkey") % 89 === 0, col("o_totalprice_cents") + 100)
        .otherwise(col("o_totalprice_cents")).as("o_totalprice_cents"),
      col("o_orderdate"),
      when(col("o_orderkey") % 131 === 0, lit("DISCREPANT"))
        .otherwise(col("o_orderpriority")).as("o_orderpriority"))
    val injected = h.filter(col("o_orderkey") % 101 === 0).select(
      (col("o_orderkey") + 100000000L).as("o_orderkey"), col("o_custkey"),
      col("o_orderstatus"), col("o_totalprice_cents"), col("o_orderdate"),
      col("o_orderpriority"))
    kept.unionByName(injected)
  }

  /** Portable customer projection: c_acctbal → c_acctbal_cents. */
  def hiveCustomer(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer").select(
      col("c_custkey"), col("c_name"), col("c_nationkey"),
      round(col("c_acctbal") * 100).cast("long").as("c_acctbal_cents"),
      col("c_mktsegment"))

  /** SF-side customer: keys %43 dropped, %47 injected at +1000000, balance
    * bumped on %41, segment mutated on %37. */
  def sfCustomer(spark: SparkSession, dir: String): DataFrame = {
    val h = hiveCustomer(spark, dir)
    val kept = h.filter(col("c_custkey") % 43 =!= 0).select(
      col("c_custkey"), col("c_name"), col("c_nationkey"),
      when(col("c_custkey") % 41 === 0, col("c_acctbal_cents") + 100)
        .otherwise(col("c_acctbal_cents")).as("c_acctbal_cents"),
      when(col("c_custkey") % 37 === 0, lit("DISCREPANT"))
        .otherwise(col("c_mktsegment")).as("c_mktsegment"))
    val injected = h.filter(col("c_custkey") % 47 === 0).select(
      (col("c_custkey") + 1000000L).as("c_custkey"), col("c_name"),
      col("c_nationkey"), col("c_acctbal_cents"), col("c_mktsegment"))
    kept.unionByName(injected)
  }

  /** Portable lineitem projection with its natural composite key. */
  def hiveLineitem(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
      round(col("l_extendedprice") * 100).cast("long").as("l_price_cents"),
      col("l_returnflag"))

  /** SF-side lineitem: composite-keyed perturbation — rows with
    * (10·orderkey + linenumber) % 59 == 0 dropped, quantity bumped on
    * % 53 == 0. */
  def sfLineitem(spark: SparkSession, dir: String): DataFrame = {
    val h = hiveLineitem(spark, dir)
    val k = col("l_orderkey") * 10 + col("l_linenumber")
    h.filter(k % 59 =!= 0).select(
      col("l_orderkey"), col("l_linenumber"),
      when(k % 53 === 0, col("l_quantity") + 1).otherwise(col("l_quantity"))
        .as("l_quantity"),
      col("l_price_cents"), col("l_returnflag"))
  }

  /** DuckDB WITH-clause fragments mirroring the Spark derivations above.
    * Composed into every oracle query that uses a fixture pair. */
  object Sql {
    val hiveOrders: String =
      """hive_orders AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS o_totalprice_cents,
        |         o_orderdate, o_orderpriority
        |  FROM orders)""".stripMargin

    val sfOrders: String =
      """sf_orders AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |         CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice_cents + 100
        |              ELSE o_totalprice_cents END AS o_totalprice_cents,
        |         o_orderdate,
        |         CASE WHEN o_orderkey % 131 = 0 THEN 'DISCREPANT'
        |              ELSE o_orderpriority END AS o_orderpriority
        |  FROM hive_orders WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
        |         o_totalprice_cents, o_orderdate, o_orderpriority
        |  FROM hive_orders WHERE o_orderkey % 101 = 0)""".stripMargin

    val hiveCustomer: String =
      """hive_customer AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS c_acctbal_cents,
        |         c_mktsegment
        |  FROM customer)""".stripMargin

    val sfCustomer: String =
      """sf_customer AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |         CASE WHEN c_custkey % 41 = 0 THEN c_acctbal_cents + 100
        |              ELSE c_acctbal_cents END AS c_acctbal_cents,
        |         CASE WHEN c_custkey % 37 = 0 THEN 'DISCREPANT'
        |              ELSE c_mktsegment END AS c_mktsegment
        |  FROM hive_customer WHERE c_custkey % 43 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal_cents,
        |         c_mktsegment
        |  FROM hive_customer WHERE c_custkey % 47 = 0)""".stripMargin

    val hiveLineitem: String =
      """hive_lineitem AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS l_price_cents,
        |         l_returnflag
        |  FROM lineitem)""".stripMargin

    val sfLineitem: String =
      """sf_lineitem AS (
        |  SELECT l_orderkey, l_linenumber,
        |         CASE WHEN (l_orderkey * 10 + l_linenumber) % 53 = 0
        |              THEN l_quantity + 1 ELSE l_quantity END AS l_quantity,
        |         l_price_cents, l_returnflag
        |  FROM hive_lineitem
        |  WHERE (l_orderkey * 10 + l_linenumber) % 59 <> 0)""".stripMargin

    val ordersPair: String = s"WITH $hiveOrders,\n$sfOrders"
    val lineitemPair: String = s"WITH $hiveLineitem,\n$sfLineitem"
    val bothPairs: String =
      s"WITH $hiveOrders,\n$sfOrders,\n$hiveCustomer,\n$sfCustomer"
  }
}
