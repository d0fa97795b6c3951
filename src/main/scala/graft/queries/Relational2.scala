package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/** Second wave of the relational/function surface: JSON extraction,
  * as-of join (window formulation, cross-validated against DuckDB's
  * native ASOF JOIN), sessionization, SCD2 intervals, pivot, cube,
  * ranking family, string/math scalar functions, grouped string
  * aggregation, histograms, and positional n-gram analysis.
  */
object Relational2 {

  val defs: Seq[QueryDef] = Seq(
    // JSON column extraction (events.props is a JSON string).
    QueryDef("q_json_extract",
      (s, dir) => t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
          CAST(SUM(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS BIGINT) AS sum_k,
          COUNT(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // As-of join: each purchase matched to the user's most recent
    // signup at-or-before it, TIES INCLUDED and pinned — "at-or-before"
    // means s.ts <= p.ts regardless of event-id order within the
    // timestamp, and among equal-ts signups the largest event_id wins.
    // Spark expresses it as a running max(struct(ts, event_id)) over a
    // RANGE frame (the default frame includes ALL peer rows of the
    // current ts — a ROWS frame ordered by (ts, event_id) would miss a
    // same-ts signup with a larger event_id, which DuckDB-style ASOF
    // semantics match); sort-merge window, no quadratic blowup. The
    // oracle is an independent per-purchase lookup (correlated
    // ORDER BY/LIMIT 1) with the same explicit tiebreak — DuckDB's
    // native ASOF JOIN leaves equal-ts winner choice unspecified, so
    // it cannot pin this contract.
    QueryDef("q_asof_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val w = Window.partitionBy("user_id").orderBy("ts") // RANGE frame
        ev.withColumn("last_signup",
            max(when(col("event_type") === "signup",
              struct(col("ts"), col("event_id")))).over(w)
              .getField("event_id"))
          .filter(col("event_type") === "purchase" && col("last_signup").isNotNull)
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("last_signup").as("signup_id"))
          .orderBy("user_id", "purchase_id")
      },
      Some("""SELECT user_id, purchase_id, signup_id FROM (
          SELECT p.user_id, p.event_id AS purchase_id,
            (SELECT s.event_id FROM events s
             WHERE s.user_id = p.user_id AND s.event_type = 'signup'
               AND s.ts <= p.ts
             ORDER BY s.ts DESC, s.event_id DESC LIMIT 1) AS signup_id
          FROM events p WHERE p.event_type = 'purchase') x
        WHERE signup_id IS NOT NULL
        ORDER BY user_id, purchase_id""")),

    // Range (interval) join, BINNED: each event_type's campaign window
    // [first event, +3 days] is matched against ALL events by time
    // containment. Naive planning of an interval predicate is a
    // broadcast-nested-loop; binning both sides to day buckets turns it
    // into an EQUI-join on the bucket (intervals explode into the ≤4
    // days they cover) with the range test as a residual filter — the
    // shuffle key exists on both sides, so the plan scales when the
    // interval side is also huge (no broadcast assumption).
    QueryDef("q_range_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("ts"), date_trunc("DAY", col("ts")).as("day"))
        val iv = t(s, dir, "events")
          .groupBy("event_type").agg(min(col("ts")).as("lo"))
          .withColumn("hi", col("lo") + expr("INTERVAL 3 DAYS"))
        val ivDays = iv.withColumn("day",
          explode(expr(
            "sequence(date_trunc('DAY', lo), date_trunc('DAY', hi), interval 1 day)")))
        ev.join(ivDays, Seq("day"))
          .filter(col("ts") >= col("lo") && col("ts") <= col("hi"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_in_window"))
          .orderBy("event_type")
      },
      Some("""WITH iv AS (
          SELECT event_type, MIN(CAST(ts AS TIMESTAMP)) AS lo,
            MIN(CAST(ts AS TIMESTAMP)) + INTERVAL 3 DAY AS hi
          FROM events GROUP BY event_type)
        SELECT iv.event_type, COUNT(*) AS n_in_window
        FROM iv JOIN events e
          ON CAST(e.ts AS TIMESTAMP) >= iv.lo AND CAST(e.ts AS TIMESTAMP) <= iv.hi
        GROUP BY iv.event_type ORDER BY iv.event_type""")),

    // Sessionization: 30-minute inactivity gap starts a new session;
    // session id = running count of gap starts (gaps-and-islands).
    QueryDef("q_sessionize",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        ev.withColumn("gap",
            when(unix_timestamp(col("ts")) -
              unix_timestamp(lag(col("ts"), 1).over(w)) > 1800 ||
              lag(col("ts"), 1).over(w).isNull, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("gap")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"))
          .orderBy("user_id", "session_id")
      },
      Some("""SELECT user_id, session_id, COUNT(*) AS n_events
        FROM (
          SELECT user_id,
            CAST(SUM(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
          FROM (
            SELECT user_id, ts, event_id,
              CASE WHEN prev_ts IS NULL
                     OR date_diff('second', prev_ts, ts) > 1800 THEN 1
                   ELSE 0 END AS gap
            FROM (SELECT *, LAG(ts, 1) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
              FROM events) a) b) c
        GROUP BY user_id, session_id ORDER BY user_id, session_id""")),

    // SCD2: each event opens a validity interval closed by the next.
    QueryDef("q_scd2_intervals",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        ev.select(col("user_id"), col("event_id"),
            unix_timestamp(col("ts")).as("valid_from"),
            unix_timestamp(lead(col("ts"), 1).over(w)).as("valid_to"))
          .orderBy("user_id", "event_id")
      },
      // floor(epoch(...)): Spark's unix_timestamp truncates sub-second
      // parts; DuckDB's CAST(double AS BIGINT) would round.
      Some("""SELECT user_id, event_id,
          CAST(floor(epoch(ts)) AS BIGINT) AS valid_from,
          CAST(floor(epoch(LEAD(ts, 1) OVER (
            PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS valid_to
        FROM events ORDER BY user_id, event_id""")),

    // Pivot returnflag columns per linestatus.
    QueryDef("q_pivot",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum("l_quantity"))
        .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus,
          SUM(CASE WHEN l_returnflag='A' THEN l_quantity END) AS "A",
          SUM(CASE WHEN l_returnflag='N' THEN l_quantity END) AS "N",
          SUM(CASE WHEN l_returnflag='R' THEN l_quantity END) AS "R"
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // Cube over two dimensions.
    QueryDef("q_cube",
      (s, dir) => t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    // Ranking family with exact-int percent_rank.
    QueryDef("q_rank_family",
      (s, dir) => {
        val ord = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            cents(col("o_totalprice")).as("pc"))
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("pc").desc, col("o_orderkey"))
        ord.select(col("o_orderpriority"), col("o_orderkey"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            ntile(4).over(w).as("quartile"))
          .filter(col("rnk") <= 5)
          .orderBy("o_orderpriority", "rnk")
      },
      Some(s"""SELECT o_orderpriority, o_orderkey, rnk, drnk, quartile FROM (
          SELECT o_orderpriority, o_orderkey,
            RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk,
            NTILE(4) OVER w AS quartile
          FROM (SELECT o_orderkey, o_orderpriority,
              ${sqlCents("o_totalprice")} AS pc FROM orders) q
          WINDOW w AS (PARTITION BY o_orderpriority ORDER BY pc DESC, o_orderkey)) r
        WHERE rnk <= 5 ORDER BY o_orderpriority, rnk""")),

    // Scalar string functions.
    QueryDef("q_string_funcs",
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_name")).as("up"),
          substring(col("p_name"), 2, 3).as("sub"),
          regexp_replace(col("p_name"), "a", "X").as("repl"),
          length(col("p_name")).as("len"),
          reverse(col("p_name")).as("rev"),
          concat_ws("-", col("p_brand"), col("p_type")).as("bt"),
          lpad(col("p_brand"), 10, "*").as("pad"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, upper(p_name) AS up,
          substring(p_name, 2, 3) AS sub,
          regexp_replace(p_name, 'a', 'X', 'g') AS repl,
          length(p_name) AS len, reverse(p_name) AS rev,
          concat_ws('-', p_brand, p_type) AS bt,
          lpad(p_brand, 10, '*') AS pad
        FROM part ORDER BY p_partkey""")),

    // Scalar math functions (IEEE-identical subset across engines).
    QueryDef("q_math_funcs",
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"),
          sqrt(col("p_size").cast("double")).as("sq"),
          (col("p_size") * col("p_size")).as("pw"),
          floor(col("p_retailprice")).cast("long").as("fl"),
          ceil(col("p_retailprice")).cast("long").as("ce"),
          pmod(col("p_size"), lit(7)).as("md"),
          greatest(col("p_size"), lit(25)).as("gr"),
          least(col("p_size"), lit(25)).as("le"),
          abs(col("p_size") - 25).as("ab"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, sqrt(CAST(p_size AS DOUBLE)) AS sq,
          p_size * p_size AS pw,
          CAST(floor(p_retailprice) AS BIGINT) AS fl,
          CAST(ceil(p_retailprice) AS BIGINT) AS ce,
          p_size % 7 AS md,
          greatest(p_size, 25) AS gr, least(p_size, 25) AS le,
          abs(p_size - 25) AS ab
        FROM part ORDER BY p_partkey""")),

    // Grouped string aggregation (sorted, deterministic).
    QueryDef("q_string_agg",
      (s, dir) => t(s, dir, "customer")
        .groupBy("c_mktsegment")
        .agg(array_join(array_sort(collect_set(col("c_nationkey"))), ",")
          .as("nations"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment,
          array_to_string(list_sort(list(DISTINCT c_nationkey)), ',') AS nations
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Value histogram with integer bucket edges.
    QueryDef("q_histogram",
      (s, dir) => t(s, dir, "events")
        .groupBy(floor(col("value") / 50).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket"),
      Some("""SELECT CAST(floor(value / 50) AS BIGINT) AS bucket, COUNT(*) AS n
        FROM events GROUP BY 1 ORDER BY bucket""")),

    // Positional n-grams: distinct trigram count per doc via the
    // codegen WordShingles expression — map-only, zero shuffles
    // (replaces a posexplode + lead-window plan that shuffled every
    // token of every document). Docs with < 3 tokens are filtered to
    // keep the legacy semantics (the window plan emitted no row).
    QueryDef("t_trigram_distinct",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.TextFunctions.ascii_words(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"),
          size(array_distinct(
            graft.functions.TextFunctions.word_shingles(col("toks"), 3)))
            .cast("long").as("n_distinct_trigrams"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
          CAST(len(list_distinct(list_transform(range(1, len(toks) - 1),
            i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS BIGINT)
            AS n_distinct_trigrams
        FROM (SELECT doc_id,
            regexp_extract_all(lower(text), '[a-z]+') AS toks
          FROM documents) a
        WHERE len(toks) >= 3
        ORDER BY doc_id"""))
  )
}
