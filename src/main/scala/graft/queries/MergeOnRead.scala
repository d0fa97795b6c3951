package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/** Merge-on-read semantics (SURVEY §2.4) expressed over the `events`
  * changelog: last-write-wins per key by sequence number
  * (`pypaimon/pynative/reader/sort_merge_reader.py:78-108`), delete
  * filtering (`drop_delete_reader.py:26-62`), and changelog-style
  * aggregation. `event_id` is the monotone sequence; `user_id` the key;
  * `event_type='delete'`-like kinds are simulated with 'error'.
  *
  * The same logic runs inside the Paimon-format connector's scan
  * (graft.connector) without a shuffle (bucket-local merge); these
  * query-level formulations are the shuffle-based equivalents that also
  * serve as the DuckDB-checkable oracle of the merge semantics.
  */
object MergeOnRead {

  val defs: Seq[QueryDef] = Seq(
    // DeduplicateMergeFunction ≡ keep latest row per key by sequence.
    QueryDef("m_latest_per_key",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val w = Window.partitionBy("user_id")
          .orderBy(col("event_id").desc)
        ev.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_id").as("last_event_id"),
            col("event_type").as("last_type"), cents(col("value")).as("last_cents"))
          .orderBy("user_id")
      },
      Some(s"""SELECT user_id, event_id AS last_event_id,
          event_type AS last_type, ${sqlCents("value")} AS last_cents
        FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY event_id DESC) AS rn FROM events) q
        WHERE rn = 1 ORDER BY user_id""")),

    // Same result via aggregation (max_by ≙ arg_max) — the partial-agg
    // formulation that scales without a full sort.
    QueryDef("m_latest_per_key_argmax",
      (s, dir) => t(s, dir, "events")
        .groupBy("user_id")
        .agg(max(col("event_id")).as("last_event_id"),
          max_by(col("event_type"), col("event_id")).as("last_type"))
        .orderBy("user_id"),
      Some("""SELECT user_id, MAX(event_id) AS last_event_id,
          ARG_MAX(event_type, event_id) AS last_type
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // Drop-delete: merged view excluding keys whose latest kind is a
    // delete (`RowKind.is_add()` false ⇒ row disappears).
    QueryDef("m_upsert_drop_delete",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val w = Window.partitionBy("user_id").orderBy(col("event_id").desc)
        ev.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1 && col("event_type") =!= "error")
          .select(col("user_id"), col("event_id").as("last_event_id"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_id AS last_event_id
        FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY event_id DESC) AS rn FROM events) q
        WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""")),

    // Changelog aggregate: net value per key treating 'error' rows as
    // retractions (-value) — the +I/-D arithmetic of RowKind folding.
    QueryDef("m_changelog_net",
      (s, dir) => t(s, dir, "events")
        .groupBy("user_id")
        .agg((sum(when(col("event_type") === "error", -cents(col("value")))
          .otherwise(cents(col("value")))) / 100.0).as("net_value"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id"),
      Some(s"""SELECT user_id,
          (SUM(CASE WHEN event_type='error' THEN -${sqlCents("value")}
                    ELSE ${sqlCents("value")} END)/100.0) AS net_value,
          COUNT(*) AS n_events
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // Sessionization-ish: per-user event-time ordering with gap flags —
    // exercises the ordered within-key scan the sort-merge reader does.
    QueryDef("m_time_ordered_scan",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        ev.withColumn("prev_ts", lag(col("ts"), 1).over(w))
          .select(col("user_id"), col("event_id"),
            when(col("prev_ts").isNull, lit(true))
              .otherwise(unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 3600)
              .as("new_session"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
          (prev_ts IS NULL OR date_diff('second', prev_ts, ts) > 3600) AS new_session
        FROM (SELECT *, LAG(ts, 1) OVER (
            PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM events) q
        ORDER BY user_id, event_id"""))
  )
}
