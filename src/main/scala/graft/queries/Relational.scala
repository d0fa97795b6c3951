package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/** One named query: the Spark plan and (when SQL-expressible) the exact
  * DuckDB oracle producing identical column names + values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Relational surface — in the reference this layer is delegated to
  * DuckDB/pandas/Ray (`pypaimon/api/table_read.py:31-56`,
  * `to_duckdb` at `pypaimon/py4j/java_implementation.py:244-253`); here
  * it is Spark SQL itself over the same snapshot. Queries are shaped for
  * scale: aggregations are partial-aggregatable, the small dimension side
  * of every join is broadcast, and sorts happen after reduction.
  */
object Relational {

  val defs: Seq[QueryDef] = Seq(
    // TPC-H Q1 shape: map-side partial agg, 6 output rows, no shuffle
    // beyond the final 4-group exchange.
    QueryDef(
      "q1_pricing_summary",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum("l_quantity").as("sum_qty"),
            sumMoney(col("l_extendedprice")).as("sum_base_price"),
            sumMoney(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("sum_disc_price"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        SUM(l_quantity) AS sum_qty,
        ${sqlSumMoney("l_extendedprice")} AS sum_base_price,
        ${sqlSumMoney("l_extendedprice*(1.0-l_discount)")} AS sum_disc_price,
        COUNT(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // TPC-H Q3 shape: shuffle-agg on orderkey, top-k via
    // TakeOrderedAndProject (no global sort). No broadcast hints:
    // orders and customer both scale with sf, so the join strategy is
    // left to statistics (AQE broadcasts them at small SF, shuffles at
    // corpus scale — a hint here would pin a driver-OOM plan at 100x).
    QueryDef(
      "q3_shipping_priority",
      (s, dir) => {
        val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val ord = t(s, dir, "orders")
          .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val li = t(s, dir, "lineitem")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy("l_orderkey")
          .agg(sumMoney(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT l_orderkey,
        ${sqlSumMoney("l_extendedprice*(1.0-l_discount)")} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey
        ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // TPC-H Q5 shape: star join. Orders/customer scale with the fact
    // table, so they shuffle-join (AQE picks the physical strategy);
    // only the true dims nation/region are broadcast.
    QueryDef(
      "q5_region_revenue",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val ord = t(s, dir, "orders")
        val cust = t(s, dir, "customer")
        val nat = t(s, dir, "nation")
        val reg = t(s, dir, "region")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(
            sumMoney(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("r_name")
      },
      Some(s"""SELECT r_name,
        ${sqlSumMoney("l_extendedprice*(1.0-l_discount)")} AS revenue,
        COUNT(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name""")),

    // Part/lineitem join with dim-side filter pushed below the join.
    QueryDef(
      "q_part_type_revenue",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        // No broadcast hint: `part` is sf-proportional (TPC-H 200k x sf),
        // so a forced broadcast is an OOM at 100x scale. AQE broadcasts
        // the filtered dim automatically while it is genuinely small.
        val part = t(s, dir, "part").filter(col("p_size") <= 20)
        li.join(part, col("l_partkey") === col("p_partkey"))
          .groupBy("p_type")
          .agg(
            sumMoney(col("l_extendedprice")).as("revenue"),
            sum("l_quantity").as("qty"))
          .orderBy("p_type")
      },
      Some(s"""SELECT p_type,
        ${sqlSumMoney("l_extendedprice")} AS revenue,
        SUM(l_quantity) AS qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_size <= 20
        GROUP BY p_type ORDER BY p_type""")),

    // Window: rank + running sum per user over event time.
    QueryDef(
      "q_window_user_running",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        ev.withColumn("rn", row_number().over(w))
          .withColumn("running_cents", sum(cents(col("value"))).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .filter(col("rn") <= 5)
          .select(col("user_id"), col("event_id"), col("rn"),
            (col("running_cents") / 100.0).as("running_value"))
          .orderBy("user_id", "rn")
      },
      Some(s"""SELECT user_id, event_id, rn, (running_cents/100.0) AS running_value
        FROM (
          SELECT user_id, event_id,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
            SUM(${sqlCents("value")}) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_cents
          FROM events) q
        WHERE rn <= 5 ORDER BY user_id, rn""")),

    // Window: lag/lead deltas.
    QueryDef(
      "q_window_lag_delta",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        ev.withColumn("prev_cents", lag(cents(col("value")), 1).over(w))
          .filter(col("prev_cents").isNotNull)
          .select(col("user_id"), col("event_id"),
            ((cents(col("value")) - col("prev_cents")) / 100.0).as("delta"))
          .orderBy("user_id", "event_id")
      },
      Some(s"""SELECT user_id, event_id,
          ((${sqlCents("value")} - prev_cents)/100.0) AS delta
        FROM (
          SELECT user_id, event_id, value,
            LAG(${sqlCents("value")}, 1) OVER (
              PARTITION BY user_id ORDER BY ts, event_id) AS prev_cents
          FROM events) q
        WHERE prev_cents IS NOT NULL
        ORDER BY user_id, event_id""")),

    // Top-k: TakeOrderedAndProject, never a global sort of the input.
    QueryDef(
      "q_topk_orders",
      (s, dir) =>
        t(s, dir, "orders")
          .select(col("o_orderkey"), cents(col("o_totalprice")).as("price_cents"))
          .orderBy(col("price_cents").desc, col("o_orderkey"))
          .limit(15),
      Some(s"""SELECT o_orderkey, ${sqlCents("o_totalprice")} AS price_cents
        FROM orders ORDER BY price_cents DESC, o_orderkey LIMIT 15""")),

    // Distinct + exact and approximate cardinalities.
    QueryDef(
      "q_distinct_counts",
      (s, dir) =>
        t(s, dir, "lineitem").agg(
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_returnflag"), col("l_linestatus")).as("n_flag_status")),
      Some("""SELECT COUNT(DISTINCT l_orderkey) AS n_orders,
        COUNT(DISTINCT l_partkey) AS n_parts,
        COUNT(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status
        FROM lineitem""")),

    // Set ops: customers in BUILDING vs with high balance.
    QueryDef(
      "q_set_ops",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val a = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val b = c.filter(col("c_acctbal") > 5000.0).select("c_custkey")
        val u = a.union(b).distinct().agg(count(lit(1)).as("n")).select(lit("union").as("op"), col("n"))
        val i = a.intersect(b).agg(count(lit(1)).as("n")).select(lit("intersect").as("op"), col("n"))
        val e = a.except(b).agg(count(lit(1)).as("n")).select(lit("except").as("op"), col("n"))
        u.union(i).union(e).orderBy("op")
      },
      Some("""WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment='BUILDING'),
             b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
        SELECT * FROM (
          SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT * FROM a UNION SELECT * FROM b)
          UNION ALL
          SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
          UNION ALL
          SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT * FROM a EXCEPT SELECT * FROM b))
        ORDER BY op""")),

    // Semi / anti joins (EXISTS / NOT EXISTS).
    QueryDef(
      "q_semi_anti_join",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val ord = t(s, dir, "orders").filter(col("o_totalprice") > 100000.0)
        val semi = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
          .agg(count(lit(1)).as("n")).select(lit("with_big_order").as("kind"), col("n"))
        val anti = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
          .agg(count(lit(1)).as("n")).select(lit("without_big_order").as("kind"), col("n"))
        semi.union(anti).orderBy("kind")
      },
      Some("""SELECT * FROM (
          SELECT 'with_big_order' AS kind, COUNT(*) AS n FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
          UNION ALL
          SELECT 'without_big_order' AS kind, COUNT(*) AS n FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000.0))
        ORDER BY kind""")),

    // Outer join with null-fill semantics.
    QueryDef(
      "q_outer_join_orders",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val ord = t(s, dir, "orders").groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"))
        cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_outer")
          .select(col("c_custkey"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, COALESCE(n_orders, 0) AS n_orders
        FROM customer LEFT JOIN (
          SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) o
        ON c_custkey = o_custkey
        ORDER BY c_custkey""")),

    // GROUP BY + HAVING + conditional aggregation (CASE WHEN).
    QueryDef(
      "q_having_case",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_finished"),
            sumMoney(col("o_totalprice")).as("total"))
          .filter(col("n") > 10)
          .orderBy("o_orderpriority"),
      Some(s"""SELECT o_orderpriority, COUNT(*) AS n,
          CAST(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
          ${sqlSumMoney("o_totalprice")} AS total
        FROM orders GROUP BY o_orderpriority HAVING COUNT(*) > 10
        ORDER BY o_orderpriority""")),

    // Rollup (grouping sets) over returnflag/linestatus.
    QueryDef(
      "q_rollup",
      (s, dir) =>
        t(s, dir, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
          .orderBy(col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, COUNT(*) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // Scalar/date functions: extract, date_trunc, string ops.
    QueryDef(
      "q_date_trunc_month",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
          .agg(count(lit(1)).as("n"), sumMoney(col("o_totalprice")).as("total"))
          .orderBy("month"),
      Some(s"""SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
          COUNT(*) AS n, ${sqlSumMoney("o_totalprice")} AS total
        FROM orders GROUP BY 1 ORDER BY month""")),

    // Correlated scalar subquery shape: orders above their customer's
    // avg. One window shuffle on o_custkey — no join, no broadcast of
    // an sf-proportional per-customer aggregate. sum/count (exact
    // longs) divided once matches the oracle's SUM/COUNT division.
    QueryDef(
      "q_above_cust_avg",
      (s, dir) => {
        val ord = t(s, dir, "orders")
        val w = Window.partitionBy("o_custkey")
        ord.withColumn("pc", cents(col("o_totalprice")))
          .withColumn("avg_cents",
            sum(col("pc")).over(w) / count(lit(1)).over(w))
          .filter(col("pc") > col("avg_cents"))
          .groupBy("o_custkey").agg(count(lit(1)).as("n_above"))
          .orderBy("o_custkey")
      },
      Some(s"""SELECT o_custkey, COUNT(*) AS n_above
        FROM orders o JOIN (
          SELECT o_custkey AS k,
            (SUM(${sqlCents("o_totalprice")})/COUNT(*)) AS avg_cents
          FROM orders GROUP BY 1) a
        ON o.o_custkey = a.k
        WHERE ${sqlCents("o_totalprice")} > avg_cents
        GROUP BY o_custkey ORDER BY o_custkey"""))
  )
}
