package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/** Fourth wave: value-range window frames, unpivot, grouping
  * identifiers, and robust statistics (median / MAD).
  */
object Relational4 {

  val defs: Seq[QueryDef] = Seq(
    // RANGE frame: sum of quantities within ±2 of each row's quantity,
    // per returnflag (value-based frame, not row-based).
    QueryDef("q_window_range_frame",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
          .rangeBetween(-2, 2)
        li.select(col("l_returnflag"), col("l_quantity"),
            sum(col("l_quantity")).over(w).as("near_qty_sum"))
          .groupBy("l_returnflag")
          .agg(sum("near_qty_sum").as("total_near"), count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, SUM(near_qty_sum) AS total_near, COUNT(*) AS n
        FROM (
          SELECT l_returnflag, l_quantity,
            SUM(l_quantity) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
              RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS near_qty_sum
          FROM lineitem) q
        GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Unpivot: wide per-part measures to (measure, value) rows.
    QueryDef("q_unpivot",
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"),
          expr("stack(2, 'size', CAST(p_size AS DOUBLE), " +
            "'retail_cents', CAST(ROUND(p_retailprice*100,0) AS DOUBLE))")
            .as(Seq("measure", "value")))
        .groupBy("measure")
        .agg(sum(col("value").cast("long")).as("total"))
        .orderBy("measure"),
      Some("""SELECT measure, CAST(SUM(CAST(value AS BIGINT)) AS BIGINT) AS total FROM (
          SELECT 'size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
          UNION ALL
          SELECT 'retail_cents', CAST(ROUND(p_retailprice*100,0) AS DOUBLE) FROM part) q
        GROUP BY measure ORDER BY measure""")),

    // grouping() flags distinguish total rows from NULL-valued groups.
    QueryDef("q_grouping_id",
      (s, dir) => t(s, dir, "orders")
        .rollup("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).as("is_total"))
        .orderBy(col("is_total"), col("o_orderstatus").asc_nulls_first),
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
          GROUPING(o_orderstatus) AS is_total
        FROM orders GROUP BY ROLLUP (o_orderstatus)
        ORDER BY is_total, o_orderstatus ASC NULLS FIRST""")),

    // Robust stats: exact median + median absolute deviation per flag
    // (integral doubles → deterministic interpolation both engines).
    QueryDef("q_median_mad",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val med = li.groupBy("l_returnflag")
          .agg(expr("percentile(l_quantity, 0.5)").as("med"))
        li.join(broadcast(med), Seq("l_returnflag"))
          .groupBy("l_returnflag")
          .agg(first(col("med")).as("median_qty"),
            expr("percentile(abs(l_quantity - med), 0.5)").as("mad_qty"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT a.l_returnflag, ANY_VALUE(m.med) AS median_qty,
          quantile_cont(abs(a.l_quantity - m.med), 0.5) AS mad_qty
        FROM lineitem a JOIN (
          SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med
          FROM lineitem GROUP BY l_returnflag) m
        ON a.l_returnflag = m.l_returnflag
        GROUP BY a.l_returnflag ORDER BY a.l_returnflag""")),

    // Skew-safe join via salting: `events` joins a per-type dimension
    // on event_type, which has only a handful of values — unsalted,
    // every row of a type lands on ONE reducer (the classic hot-key
    // stall at corpus scale). The dim side is replicated S ways and the
    // fact side salts deterministically with pmod(user_id, S), so each
    // hot key spreads over S reducers; the salt never reaches the
    // result, and the oracle is the plain unsalted join.
    QueryDef("q_salted_skew_join",
      (s, dir) => {
        val S = 16
        val ev = t(s, dir, "events")
          .withColumn("salt", pmod(col("user_id"), lit(S.toLong)).cast("int"))
        val dim = t(s, dir, "events").select("event_type").distinct()
          .withColumn("weight", length(col("event_type")).cast("long"))
          .withColumn("salt", explode(array((0 until S).map(lit): _*)))
        ev.join(dim, Seq("event_type", "salt"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum(cents(col("value")) * col("weight")).as("weighted_cents"))
          .orderBy("event_type")
      },
      Some(s"""SELECT event_type, COUNT(*) AS n_events,
          CAST(SUM(${sqlCents("value")} * length(event_type)) AS BIGINT)
            AS weighted_cents
        FROM events GROUP BY event_type ORDER BY event_type"""))
  )
}
