package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables

/** General analytics over the star schema — the "plain Spark SQL batch
  * query" capability the reference's north star calls for (its validation
  * queries are ordinary filtered aggregates/joins over warehouse tables).
  * Money math stays in integral cents so the DuckDB oracle hash-matches.
  */
object AnalyticsQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Multi-level aggregate via ROLLUP: per-(status, priority) totals,
    // per-status subtotals, and the grand total in ONE pass (Spark
    // expands grouping sets map-side — no re-scan per level). NULLS
    // FIRST is explicit: Spark's asc default is nulls-first while
    // DuckDB's is nulls-last, and rollup rows are keyed by NULLs.
    "q_rollup_agg" -> ((s, dir) =>
      graft.Fixtures.hiveOrders(s, dir)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice_cents")).as("cents"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    // TPC-H q3 shape: three-way join with filters pushed to all scans,
    // grouped revenue, top-10 by revenue. Revenue is exact integer
    // micro-cents: price_cents × (100 − discount_pct) — no float sums,
    // so the aggregate hash-matches cross-engine. Customer filter and
    // date filters prune at the scans; AQE picks the join strategy.
    "q_ship_priority" -> ((s, dir) => {
      val cutoff = "1995-03-15"
      val c = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") < lit(cutoff))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit(cutoff))
        .select(col("l_orderkey"),
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("rev_microcents"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(sum(col("rev_microcents")).as("revenue_microcents"))
        .orderBy(col("revenue_microcents").desc, col("o_orderkey"))
        .limit(10)
    }),

    // Skew diagnostic: top-10 heaviest join keys with share and skew
    // factor — what an operator reads before reaching for q_salted_join.
    "q_key_skew" -> ((s, dir) =>
      graft.operators.Skew.keySkewReport(
        Tables.load(s, dir, "orders"), Seq("o_custkey"), topK = 10)),

    // Pricing-summary shape: scan-heavy grouped aggregate with a pushed
    // date filter (the TPC-H q1 pattern on our lineitem).
    "q_pricing_summary" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity"),
          round(col("l_extendedprice") * 100).cast("long").as("price_c"),
          round(col("l_discount") * 100).cast("long").as("disc_c"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity"))).cast("long").as("sum_qty"),
          sum(col("price_c")).as("sum_price_cents"),
          // (100 - disc_c) percent scale, not basis points: disc_c is an
          // integral percent, so the value is exact either way, and the
          // 100x smaller per-row term (~1e9 for a 100k-dollar line) keeps
          // the BIGINT group sum inside Long past sf~10^4 — the
          // basis-point form wrapped (ansi off) around sf~200 while
          // DuckDB's HUGEINT promotion didn't, diverging exactly when the
          // number matters.
          sum(col("price_c") * (lit(100L) - col("disc_c"))).as("sum_disc_price_scaled"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // Star join with broadcast dimensions: revenue per nation/segment.
    "q_star_join_agg" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"),
          round(col("l_extendedprice") * 100).cast("long").as("price_c"))
      val o = Tables.load(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
      val n = Tables.load(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      // customer is fact-scaled (grows with sf) — no broadcast hint; AQE
      // picks broadcast at small sf and shuffle join at scale. nation is a
      // genuinely bounded dim (25 rows), so its hint is safe at any sf.
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"), col("c_mktsegment"))
        .agg(sum(col("price_c")).as("revenue_cents"),
          countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("n_name"), col("c_mktsegment"))
    }),

    // Skew-salted join (Skew.saltedJoin): identical results to the plain
    // join — the oracle proves it — while the shuffle key is (key, salt)
    // so one hot user can't pin a reducer.
    "q_salted_join" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          round(col("value") * 1000).cast("long").as("value_milli"))
      val dim = e.groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      graft.operators.Skew.saltedJoin(e, dim, "user_id", salts = 8,
          saltSrc = col("event_id"))
        .select(col("event_id"), col("user_id"), col("value_milli"), col("n_events"))
        .orderBy(col("event_id"))
    }),

    // Top-N per group over a join: 3 highest-value orders per segment
    // (WindowGroupLimit pushes the rank limit below the shuffle).
    "q_topn_per_group" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice") * 100).cast("long").as("price_c"))
      val c = Tables.load(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("price_c").desc, col("o_orderkey"))
      // customer is fact-scaled: no forced broadcast (AQE decides).
      o.join(c, col("o_custkey") === col("c_custkey"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("c_mktsegment"), col("rank"), col("o_orderkey"), col("price_c"))
        .orderBy(col("c_mktsegment"), col("rank"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_ship_priority" ->
      """SELECT o.o_orderkey, o.o_orderdate,
        |  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
        |           (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
        |    AS revenue_microcents
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY 1, 2
        |ORDER BY revenue_microcents DESC, o.o_orderkey LIMIT 10""".stripMargin,

    "q_key_skew" ->
      """WITH counts AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS n_keys FROM counts)
        |SELECT o_custkey, n, n / total AS share,
        |       CAST(n AS DOUBLE) * n_keys / total AS skew_factor
        |FROM counts, tot
        |ORDER BY n DESC, o_custkey LIMIT 10""".stripMargin,

    "q_rollup_agg" ->
      s"""${graft.Fixtures.Sql.ordersPair}
         |SELECT o_orderstatus, o_orderpriority,
         |       count(*) AS n,
         |       CAST(sum(o_totalprice_cents) AS BIGINT) AS cents,
         |       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
         |FROM hive_orders
         |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty,
        |  CAST(sum(price_c) AS BIGINT) AS sum_price_cents,
        |  CAST(sum(price_c * (100 - disc_c)) AS BIGINT) AS sum_disc_price_scaled,
        |  count(*) AS n_rows
        |FROM (
        |  SELECT l_returnflag, l_linestatus, l_quantity,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
        |    CAST(round(l_discount * 100) AS BIGINT) AS disc_c
        |  FROM lineitem
        |  WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00') t
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_star_join_agg" ->
      """SELECT n_name, c_mktsegment,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(DISTINCT o_custkey) AS n_customers,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name, c_mktsegment
        |ORDER BY n_name, c_mktsegment""".stripMargin,

    "q_salted_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id,
        |    CAST(round(value * 1000) AS BIGINT) AS value_milli
        |  FROM events),
        |dim AS (SELECT user_id, count(*) AS n_events FROM e GROUP BY user_id)
        |SELECT e.event_id, e.user_id, e.value_milli, dim.n_events
        |FROM e JOIN dim ON e.user_id = dim.user_id
        |ORDER BY e.event_id""".stripMargin,

    "q_topn_per_group" ->
      """SELECT c_mktsegment, CAST(rank AS INTEGER) AS rank, o_orderkey, price_c
        |FROM (
        |  SELECT c_mktsegment, o_orderkey, price_c,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY price_c DESC, o_orderkey) AS rank
        |  FROM (
        |    SELECT o_orderkey, o_custkey,
        |      CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
        |    FROM orders) o
        |  JOIN customer ON o_custkey = c_custkey) t
        |WHERE rank <= 3
        |ORDER BY c_mktsegment, rank""".stripMargin
  )
}
