package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/** Third wave: exact percentiles, calendar functions, regex extraction,
  * fingerprint banding, document frequency, first-seen dedup.
  */
object Relational3 {

  val defs: Seq[QueryDef] = Seq(
    // Exact interpolated percentiles (integral doubles → deterministic
    // interpolation in both engines).
    QueryDef("q_percentile",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.75)").as("p75"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
          quantile_cont(l_quantity, 0.25) AS p25,
          quantile_cont(l_quantity, 0.5) AS p50,
          quantile_cont(l_quantity, 0.75) AS p75,
          COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Calendar: orders per day-of-week (DuckDB Sunday=0, Spark
    // Sunday=1 → +1 in the oracle).
    QueryDef("q_day_of_week",
      (s, dir) => t(s, dir, "orders")
        .groupBy(dayofweek(col("o_orderdate")).as("dow"))
        .agg(count(lit(1)).as("n"))
        .orderBy("dow"),
      Some("""SELECT dayofweek(o_orderdate) + 1 AS dow, COUNT(*) AS n
        FROM orders GROUP BY 1 ORDER BY dow""")),

    // Shipping delay histogram across an order/lineitem join.
    QueryDef("q_ship_delay",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val ord = t(s, dir, "orders")
        // no hint: orders scales with sf — stats pick broadcast only
        // while it actually fits
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select(datediff(col("l_shipdate"), col("o_orderdate")).as("delay_days"))
          .groupBy("delay_days").agg(count(lit(1)).as("n"))
          .orderBy("delay_days")
      },
      Some("""SELECT date_diff('day', o_orderdate, l_shipdate) AS delay_days,
          COUNT(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1 ORDER BY delay_days""")),

    // Regex group extraction.
    QueryDef("q_regexp_extract",
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"),
          regexp_extract(col("p_name"), "(b[a-z]+)", 1).as("first_b_word"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
          regexp_extract(p_name, '(b[a-z]+)', 1) AS first_b_word
        FROM part ORDER BY p_partkey""")),

    // Fingerprint banding: docs bucketed by an md5 prefix — the
    // SQL-expressible cousin of LSH banding, fully oracle-checked.
    QueryDef("d_fingerprint_band",
      (s, dir) => t(s, dir, "documents")
        .select(substring(fingerprint(col("text")), 1, 3).as("band"))
        .groupBy("band").agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .orderBy("band"),
      Some(s"""SELECT band, COUNT(*) AS n FROM (
          SELECT substring(${sqlFingerprint("text")}, 1, 3) AS band
          FROM documents) q
        GROUP BY band HAVING COUNT(*) > 1 ORDER BY band""")),

    // Document frequency: in how many docs does each word appear.
    QueryDef("t_doc_freq",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          explode(array_distinct(graft.functions.TextFunctions.ascii_words(col("text"))))
            .as("word"))
        .groupBy("word").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("word")).limit(30),
      Some("""SELECT word, COUNT(*) AS df FROM (
          SELECT DISTINCT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
          FROM documents) q
        GROUP BY word ORDER BY df DESC, word LIMIT 30""")),

    // First-seen dedup: keep the earliest event per (user, type) — the
    // mirror image of last-write-wins.
    QueryDef("m_first_seen",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy("ts", "event_id")
        ev.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"),
            col("event_id").as("first_event_id"))
          .orderBy("user_id", "event_type")
      },
      Some("""SELECT user_id, event_type, event_id AS first_event_id
        FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
          FROM events) q
        WHERE rn = 1 ORDER BY user_id, event_type"""))
  )
}
