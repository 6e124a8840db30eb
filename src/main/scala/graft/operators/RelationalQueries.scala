package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator surface (SURVEY.md §2.2 / §7.2): scans,
  * filter/project, every join shape, aggregation (plain, distinct,
  * rollup, cube, conditional), windows, top-k, set ops.
  *
  * The reference (/root/reference/etl/main.go) has none of these — its only
  * dataflow is scan->transform->partition->sink — but the engine's north
  * star requires the full relational vocabulary, each entry verified
  * against a DuckDB oracle at sf0.01. All code is declarative
  * DataFrame/Column so Catalyst owns pushdown, pruning, join selection and
  * AQE owns runtime re-planning; every query ends in a total-order sort so
  * results are deterministic across engines.
  */
object RelationalQueries {

  /** Exact, overflow-safe, FAST sum of integer price units: the units
    * (per-row magnitude up to ~1.1e11 for 1e-6-unit charges) are split
    * lo/hi at 1e6 and summed as two codegen'd LONGs — order-independent
    * and exact to ~9.2e12 rows per group (±15x headroom over 100 TB
    * lineitem's ~6e11 rows; an exabyte corpus would split three ways).
    * A single long sum wraps SILENTLY at ~8e7 rows/group for charge
    * units (caught by review, round 3); a DECIMAL(30,0) sum is exact at
    * any scale but measured ~2x slower on the fact-table aggregations
    * (q01 0.5 -> 1.6 s at sf0.1) because the >18-digit buffer leaves the
    * compact-long fast path. The split keeps both properties. The
    * combine — hi::double * 1e6 + lo::double, one final division — is
    * the IDENTICAL operation sequence in the DuckDB oracle, so the
    * result is bit-equal even past 2^53 where the total rounds.
    * (floor(u/1e6) is exact here: u is integer-valued, so the quotient
    * is never within an ulp of the wrong integer.) */
  private[operators] def unitSplitSum(units: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val hi = floor(units / 1000000.0).cast("long")
    val lo = (units - floor(units / 1000000.0) * 1000000.0).cast("long")
    sum(hi).cast("double") * 1000000.0 + sum(lo).cast("double")
  }

  /** The DuckDB twin of [[unitSplitSum]] for a unit expression `u`.
    * private[operators]: q41 (ExtendedQueries) interpolates it too, so
    * the correctness-critical split constant/combine sequence has exactly
    * one definition per dialect. */
  private[operators] def sqlSplitSum(u: String): String =
    s"(sum(CAST(floor(($u)/1000000) AS BIGINT))::DOUBLE * 1000000.0" +
      s" + sum(CAST(($u) - floor(($u)/1000000)*1000000 AS BIGINT))::DOUBLE)"

  val defs: Seq[(String, QueryDef)] = Seq(

    // ---------------------------------------------------------------- q01
    "q01_pricing_summary" -> QueryDef.sql(
      "TPC-H Q1-shaped scan+filter+aggregate: the canonical partial-agg " +
      "(map-side combine) shape; filter pushed to parquet scan.",
      s"""SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  ${sqlSplitSum("round(l_extendedprice * 100)")} / 100.0 AS sum_base_price,
        |  ${sqlSplitSum("round(l_extendedprice * (1 - l_discount) * 10000)")} / 10000.0 AS sum_disc_price,
        |  ${sqlSplitSum("round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000)")} / 1000000.0 AS sum_charge,
        |  sum(CAST(l_quantity AS BIGINT))::DOUBLE / count(*)::DOUBLE AS avg_qty,
        |  sum(CAST(round(l_discount * 100) AS BIGINT))::DOUBLE / (100.0 * count(*)::DOUBLE) AS avg_disc,
        |  count(*)::BIGINT AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      // Price sums aggregate EXACT INTEGER UNITS (cents / 1e-4 / 1e-6
      // units — prices are 2-decimal, so the per-row product is exact at
      // those scales and round() recovers the integer despite float ulp)
      // via the lo/hi split-sum (see unitSplitSum: two codegen'd long
      // sums, exact to ~9e12 rows/group, no silent wrap, no decimal-agg
      // slowdown). round(sum(double)) diverged between engines on a .495
      // boundary at the 10x oracle gate (BASELINE.md round 3).
      // Averages derive from exact integer sums too (no round(avg(...)):
      // engines round the same double differently near .xxxx5 — Spark
      // rounds the shortest-decimal repr, DuckDB the binary value).
      // Small-unit sums (quantity <= 50, discount cents <= 10) stay
      // single longs: they wrap only past ~1e17 rows/group.
      Tables.lineitem(s, d)
        .where(col("l_shipdate") <= lit("1998-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 4).as("sum_qty"),
          (unitSplitSum(round(col("l_extendedprice") * 100, 0)) / 100.0).as("sum_base_price"),
          (unitSplitSum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000, 0)) / 10000.0).as("sum_disc_price"),
          (unitSplitSum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")) * 1000000, 0)) / 1000000.0).as("sum_charge"),
          (sum(col("l_quantity").cast("long")).cast("double") /
            count(lit(1)).cast("double")).as("avg_qty"),
          (sum(round(col("l_discount") * 100, 0).cast("long")).cast("double") /
            (lit(100.0) * count(lit(1)).cast("double"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---------------------------------------------------------------- q02
    "q02_filter_project" -> QueryDef.sql(
      "Selective filter + computed projection; predicate and column " +
      "pruning both reach the parquet scan.",
      """SELECT o_orderkey, o_custkey,
        |  round(o_totalprice * (1 - 0.05), 4) AS discounted,
        |  CASE WHEN o_totalprice >= 200000 THEN 'high'
        |       WHEN o_totalprice >= 100000 THEN 'mid'
        |       ELSE 'low' END AS price_band
        |FROM orders
        |WHERE o_orderstatus = 'O' AND o_totalprice > 150000
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .where(col("o_orderstatus") === "O" && col("o_totalprice") > 150000)
        .select(
          col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice") * (lit(1) - lit(0.05)), 4).as("discounted"),
          when(col("o_totalprice") >= 200000, "high")
            .when(col("o_totalprice") >= 100000, "mid")
            .otherwise("low").as("price_band"))
        .orderBy("o_orderkey")
    },

    // ---------------------------------------------------------------- q03
    "q03_join_broadcast_dims" -> QueryDef.sql(
      "Star join: fact orders -> customer -> nation -> region with " +
      "explicit broadcast of the small dims (no shuffle for dim sides); " +
      "revenue + distinct customers per region/nation.",
      s"""SELECT r_name, n_name,
        |  ${sqlSplitSum("round(o_totalprice * 100)")} / 100.0 AS revenue,
        |  count(DISTINCT c_custkey)::BIGINT AS n_customers,
        |  count(*)::BIGINT AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          // exact cents split-sum — see q01's note on boundary drift
          (unitSplitSum(round(col("o_totalprice") * 100, 0)) / 100.0).as("revenue"),
          countDistinct("c_custkey").as("n_customers"),
          count(lit(1)).as("n_orders"))
        .orderBy("r_name", "n_name")
    },

    // ---------------------------------------------------------------- q04
    "q04_join_sortmerge_facts" -> QueryDef.sql(
      "Fact-to-fact join lineitem x orders forced to sort-merge (the " +
      "shape that survives when neither side fits a broadcast at 100 TB); " +
      "both sides shuffle-partition on the join key once.",
      s"""SELECT year(o_orderdate)::BIGINT AS order_year, o_orderpriority,
        |  ${sqlSplitSum("round(l_extendedprice * (1 - l_discount) * 10000)")} / 10000.0 AS revenue,
        |  count(*)::BIGINT AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2
        |ORDER BY order_year, o_orderpriority""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d).hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("order_year"), col("o_orderpriority"))
        .agg(
          // exact 1e-4-unit split-sum: this query's round(sum) landed on
          // a .495 boundary at the 10x oracle gate (BASELINE.md r3)
          (unitSplitSum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000, 0)) / 10000.0).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("order_year", "o_orderpriority")
    },

    // ---------------------------------------------------------------- q05
    "q05_join_left_outer" -> QueryDef.sql(
      "Left outer join preserving customers with no orders; " +
      "count(non-null) semantics.",
      """SELECT c_custkey, c_mktsegment,
        |  count(o_orderkey)::BIGINT AS n_orders,
        |  round(coalesce(sum(o_totalprice), 0), 2) AS spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_mktsegment
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum("o_totalprice"), lit(0)), 2).as("spend"))
        .orderBy("c_custkey")
    },

    // ---------------------------------------------------------------- q06
    "q06_join_semi" -> QueryDef.sql(
      "Left-semi join (EXISTS): customers having at least one finished " +
      "order, rolled up by segment.",
      """SELECT c_mktsegment, count(*)::BIGINT AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(
          Tables.orders(s, d).where(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    },

    // ---------------------------------------------------------------- q07
    "q07_join_anti" -> QueryDef.sql(
      "Left-anti join (NOT EXISTS): customers with no pending ('P') order.",
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).where(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // ---------------------------------------------------------------- q08
    "q08_agg_distinct" -> QueryDef.sql(
      "Distinct aggregation (expand + two-phase agg in Spark) alongside " +
      "plain aggregates.",
      s"""SELECT o_orderpriority,
        |  count(DISTINCT o_custkey)::BIGINT AS n_custs,
        |  count(*)::BIGINT AS n_orders,
        |  ${sqlSplitSum("round(o_totalprice * 100)")} / 100.0 AS revenue,
        |  round(min(o_totalprice), 2) AS min_price,
        |  round(max(o_totalprice), 2) AS max_price
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          countDistinct("o_custkey").as("n_custs"),
          count(lit(1)).as("n_orders"),
          (unitSplitSum(round(col("o_totalprice") * 100, 0)) / 100.0).as("revenue"),
          round(min("o_totalprice"), 2).as("min_price"),
          round(max("o_totalprice"), 2).as("max_price"))
        .orderBy("o_orderpriority")
    },

    // ---------------------------------------------------------------- q09
    "q09_rollup" -> QueryDef.sql(
      "ROLLUP hierarchy totals (returnflag -> linestatus -> grand total).",
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*)::BIGINT AS n,
        |  round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("sum_qty"))
        .orderBy("returnflag", "linestatus")
    },

    // ---------------------------------------------------------------- q10
    "q10_cube" -> QueryDef.sql(
      "CUBE over order status x priority: all 2^2 grouping sets.",
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*)::BIGINT AS n,
        |  ${sqlSplitSum("round(o_totalprice * 100)")} / 100.0 AS revenue
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          (unitSplitSum(round(col("o_totalprice") * 100, 0)) / 100.0).as("revenue"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("revenue"))
        .orderBy("status", "priority")
    },

    // ---------------------------------------------------------------- q11
    "q11_window_topn_per_group" -> QueryDef.sql(
      "Ranking window: top-3 orders per customer (row_number with full " +
      "tie-break so ranking is engine-independent).",
      """SELECT c_custkey, o_orderkey, rnk FROM (
        |  SELECT o_custkey AS c_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey)::BIGINT AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3
        |ORDER BY c_custkey, rnk""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(
          col("o_custkey").as("c_custkey"), col("o_orderkey"),
          row_number().over(w).cast("long").as("rnk"))
        .where(col("rnk") <= 3)
        .orderBy("c_custkey", "rnk")
    },

    // ---------------------------------------------------------------- q12
    "q12_window_running_lag" -> QueryDef.sql(
      "Analytic windows over an ordered event stream: running sum " +
      "(rows frame), lag and lead per user.",
      """SELECT event_id, user_id,
        |  round(sum(value) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |FROM events
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(
          col("event_id"), col("user_id"),
          round(sum("value").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4)
            .as("running_value"),
          lag("event_type", 1).over(w).as("prev_type"),
          lead("event_type", 1).over(w).as("next_type"))
        .orderBy("event_id")
    },

    // ---------------------------------------------------------------- q13
    "q13_topk_global" -> QueryDef.sql(
      "Global top-k (Spark plans TakeOrderedAndProject: per-partition " +
      "heap + single reduce, no full sort at scale).",
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 10""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(10)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 2).as("price"))
    },

    // ---------------------------------------------------------------- q14
    "q14_set_ops" -> QueryDef.sql(
      "Set operators: customers ordering in both 1995 and 1996 " +
      "(INTERSECT), only 1995 (EXCEPT), tagged and unioned.",
      """WITH y95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
        |     y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
        |SELECT 'both' AS tag, o_custkey FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96) a
        |UNION ALL
        |SELECT 'only95' AS tag, o_custkey FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96) b
        |ORDER BY tag, o_custkey""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val y95 = o.where(year(col("o_orderdate")) === 1995).select("o_custkey").distinct()
      val y96 = o.where(year(col("o_orderdate")) === 1996).select("o_custkey").distinct()
      y95.intersect(y96).select(lit("both").as("tag"), col("o_custkey"))
        .unionByName(y95.except(y96).select(lit("only95").as("tag"), col("o_custkey")))
        .orderBy("tag", "o_custkey")
    },

    // --------------------------------------------------------------- q167
    "q167_salted_skew_join" -> QueryDef.sql(
      "Skew-salted equi-join, driver-visible: the lineitem->supplier " +
      "join executed through Salting.saltedEquiJoin (salt the large " +
      "side by a DETERMINISTIC content hash mod 8 — xxhash64, never " +
      "rand(), so task retries cannot double-count — and replicate " +
      "the small side across the salt domain, joining on (key, " +
      "salt)), then a per-nation integer rollup. Salting is " +
      "CORRECTNESS-TRANSPARENT: the oracle is the PLAIN join + " +
      "rollup, and the hash-exact match IS the proof that the " +
      "mitigation changes the shuffle layout, never the answer. " +
      "Shape at 100 TB: this is the tool for the skew AQE cannot " +
      "split (a skewed aggregation feeding the join, or a bounded " +
      "deliberate replication factor) — one hot supplier key spread " +
      "over 8 partitions costs 8x small-side replication, bounded " +
      "up front, instead of one straggler task the size of the skew.",
      """SELECT s_nationkey,
        |  count(*)::BIGINT AS n_items,
        |  sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey
        |ORDER BY s_nationkey""".stripMargin) { (s, d) =>
      val large = Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_quantity"))
      val small = Tables.supplier(s, d)
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
      graft.functions.Salting
        .saltedEquiJoin(large, small, "l_suppkey", salts = 8)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("long")).cast("long").as("sum_qty"))
        .orderBy("s_nationkey")
    }
  )
}
