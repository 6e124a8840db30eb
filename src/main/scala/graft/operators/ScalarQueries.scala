package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Scalar-function surface: string, math, date/time, JSON, unpivot and
  * nested array-of-struct shapes (the reference's transform vocabulary,
  * /root/reference/etl/main.go:213-234 and §2.1's micro-function list,
  * re-expressed as codegen'd Catalyst expressions — no UDFs anywhere).
  */
object ScalarQueries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // ---------------------------------------------------------------- q15
    "q15_string_math" -> QueryDef.sql(
      "String + math scalar functions as native expressions (upper, " +
      "substr, length, regexp_replace, split, concat; round/floor/abs/mod).",
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper,
        |  substr(p_name, 1, 5) AS name_pfx,
        |  length(p_name)::BIGINT AS name_len,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devoweled,
        |  string_split(p_name, ' ')[1] AS first_word,
        |  concat(p_brand, ':', p_type) AS brand_type,
        |  round(p_retailprice * 1.1, 2) AS price_up,
        |  floor(p_retailprice)::BIGINT AS price_floor,
        |  abs(p_size - 25)::BIGINT AS size_dev,
        |  (p_size % 5)::BIGINT AS size_mod
        |FROM part
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          substring(col("p_name"), 1, 5).as("name_pfx"),
          length(col("p_name")).cast("long").as("name_len"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("name_devoweled"),
          split(col("p_name"), " ").getItem(0).as("first_word"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
          round(col("p_retailprice") * 1.1, 2).as("price_up"),
          floor(col("p_retailprice")).cast("long").as("price_floor"),
          abs(col("p_size") - 25).cast("long").as("size_dev"),
          (col("p_size") % 5).cast("long").as("size_mod"))
        .orderBy("p_partkey")
    },

    // ---------------------------------------------------------------- q16
    "q16_datetime" -> QueryDef.sql(
      "Date/time scalar functions: extract parts, truncate, interval " +
      "arithmetic, day difference from a fixed anchor.",
      """SELECT o_orderkey,
        |  year(o_orderdate)::BIGINT AS y,
        |  month(o_orderdate)::BIGINT AS m,
        |  day(o_orderdate)::BIGINT AS dom,
        |  date_trunc('month', o_orderdate)::TIMESTAMP AS month_start,
        |  o_orderdate + INTERVAL 5 DAY AS plus5d,
        |  datediff('day', TIMESTAMP '1995-01-01', o_orderdate)::BIGINT AS days_since_95
        |FROM orders
        |WHERE o_orderkey % 10 = 0
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .where(col("o_orderkey") % 10 === 0)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          (col("o_orderdate") + expr("INTERVAL 5 DAYS")).as("plus5d"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long")
            .as("days_since_95"))
        .orderBy("o_orderkey")
    },

    // ---------------------------------------------------------------- q17
    "q17_json_extract" -> QueryDef.sql(
      "JSON path extraction from the events.props payload column " +
      "(reference wire format is JSON, /root/reference/etl/main.go:284), " +
      "aggregated per event type; missing-key -> NULL semantics.",
      """SELECT event_type,
        |  sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
        |  count(json_extract_string(props, '$.missing'))::BIGINT AS n_missing,
        |  count(*)::BIGINT AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
          count(get_json_object(col("props"), "$.missing")).as("n_missing"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // ---------------------------------------------------------------- q18
    "q18_unpivot_stack" -> QueryDef.sql(
      "Wide->long unpivot of 4 measure columns (the reference's O8 " +
      "transform shape, /root/reference/etl/main.go:213-234) then " +
      "re-aggregated per metric.",
      """SELECT metric, l_returnflag,
        |  round(sum(value), 4) AS sum_value,
        |  count(*)::BIGINT AS n
        |FROM (
        |  SELECT l_returnflag, 'quantity' AS metric, l_quantity AS value FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'discount', l_discount FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'tax', l_tax FROM lineitem) u
        |GROUP BY metric, l_returnflag
        |ORDER BY metric, l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .selectExpr("l_returnflag",
          "stack(4, 'quantity', l_quantity, 'extendedprice', l_extendedprice, " +
            "'discount', l_discount, 'tax', l_tax) AS (metric, value)")
        .groupBy("metric", "l_returnflag")
        .agg(round(sum("value"), 4).as("sum_value"), count(lit(1)).as("n"))
        .orderBy("metric", "l_returnflag")
    },

    // ---------------------------------------------------------------- q19
    "q19_nested_indicators" -> QueryDef.sql(
      "The reference's DeviceData shape (/root/reference/etl/main.go:48-53," +
      "220-226): build ARRAY<STRUCT<name,value>> of 5 indicators per row, " +
      "explode back to long form, aggregate per indicator.",
      """SELECT ind_name, round(sum(ind_value), 4) AS sum_value, count(*)::BIGINT AS n
        |FROM (
        |  SELECT 'utilization' AS ind_name, 100 - l_discount * 100 AS ind_value FROM lineitem
        |  UNION ALL SELECT 'nice', l_tax * 100 FROM lineitem
        |  UNION ALL SELECT 'user', l_quantity FROM lineitem
        |  UNION ALL SELECT 'system', l_linenumber::DOUBLE FROM lineitem
        |  UNION ALL SELECT 'irq', 0.5 FROM lineitem) u
        |GROUP BY ind_name
        |ORDER BY ind_name""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select(array(
          struct(lit("utilization").as("name"), (lit(100) - col("l_discount") * 100).as("value")),
          struct(lit("nice").as("name"), (col("l_tax") * 100).as("value")),
          struct(lit("user").as("name"), col("l_quantity").as("value")),
          struct(lit("system").as("name"), col("l_linenumber").cast("double").as("value")),
          struct(lit("irq").as("name"), lit(0.5).as("value"))).as("indicators"))
        .select(explode(col("indicators")).as("ind"))
        .groupBy(col("ind.name").as("ind_name"))
        .agg(round(sum(col("ind.value")), 4).as("sum_value"), count(lit(1)).as("n"))
        .orderBy("ind_name")
    },

    // ---------------------------------------------------------------- q20
    "q20_conditional_agg_having" -> QueryDef.sql(
      "Conditional aggregation (agg over CASE) + HAVING filter on " +
      "aggregate output.",
      """SELECT c_mktsegment,
        |  count(*)::BIGINT AS n,
        |  count(CASE WHEN c_acctbal > 0 THEN 1 END)::BIGINT AS n_positive,
        |  round(sum(CASE WHEN c_acctbal < 0 THEN c_acctbal ELSE 0 END), 2) AS debt_sum
        |FROM customer
        |GROUP BY c_mktsegment
        |HAVING count(*) >= 5
        |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n"),
          count(when(col("c_acctbal") > 0, lit(1))).as("n_positive"),
          round(sum(when(col("c_acctbal") < 0, col("c_acctbal")).otherwise(lit(0))), 2)
            .as("debt_sum"))
        .where(col("n") >= 5)
        .orderBy("c_mktsegment")
    },

    // ---------------------------------------------------------------- q21
    "q21_above_customer_avg" -> QueryDef.sql(
      "Decorrelated 'above group average' pattern: join facts back to " +
      "their per-group aggregate (how Catalyst executes the correlated " +
      "subquery form).",
      // NOTE: the customer average is exported as (sum, count), not as a
      // rounded avg: an avg over a small group can have a true value with
      // a terminating decimal ending in 5 (e.g. .70375 for 8 orders), where
      // Spark (HALF_UP on shortest decimal repr) and DuckDB (binary-value
      // rounding) legitimately disagree. round(sum,2) is exact because the
      // true sum IS a 2-decimal number.
      """WITH ca AS (SELECT o_custkey AS ck, avg(o_totalprice) AS cavg,
        |                   sum(o_totalprice) AS csum, count(*) AS cn
        |            FROM orders GROUP BY o_custkey)
        |SELECT o_orderkey, o_custkey,
        |  round(o_totalprice, 2) AS price,
        |  round(csum, 2) AS cust_total, cn::BIGINT AS cust_n
        |FROM orders JOIN ca ON o_custkey = ck
        |WHERE o_totalprice > cavg
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val ca = o.groupBy(col("o_custkey").as("ck")).agg(
        avg("o_totalprice").as("cavg"),
        sum("o_totalprice").as("csum"), count(lit(1)).as("cn"))
      o.join(ca, col("o_custkey") === col("ck"))
        .where(col("o_totalprice") > col("cavg"))
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("price"),
          round(col("csum"), 2).as("cust_total"), col("cn").as("cust_n"))
        .orderBy("o_orderkey")
    }
  )
}
