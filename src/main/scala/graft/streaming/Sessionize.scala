package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time sessionization with explicit per-key state — the
  * `flatMapGroupsWithState` path for semantics windowed aggregation
  * can't express (variable-length gap sessions).
  *
  * A session CLOSES when the key's next event arrives more than
  * `gapSeconds` after the previous one (emitted in that batch —
  * deterministic, no timer race), or when the event-time timeout fires
  * with no successor (trailing sessions, watermark-driven cleanup).
  * State per key is O(1) — one open session — so a 100 TB stream
  * shards by key across executors with bounded state; the watermark
  * bounds how long a silent key's state survives.
  *
  * The input MUST carry a watermark on `ts` (EventTimeTimeout
  * requires it): `df.withWatermark("ts", ...)` BEFORE the `.as[Ev]`.
  *
  * ≙ the batch `q_sessionize` query (same gap rule), re-expressed for
  * unbounded input. Beyond reference parity: the reference has no
  * streaming surface at all (SURVEY §2.6).
  */
object Sessionize {

  /** One input event; `weight` is any additive payload. */
  final case class Ev(user_id: Long, ts: Timestamp, weight: Long)

  /** Open-session state carried between micro-batches (epoch millis). */
  final case class Open(startMs: Long, lastMs: Long, n: Long, weight: Long)

  /** A closed session. */
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_weight: Long)

  def sessions(events: Dataset[Ev], gapSeconds: Long): Dataset[Session] = {
    val gapMs = gapSeconds * 1000L
    implicit val sessEnc: Encoder[Session] = Encoders.product[Session]
    implicit val openEnc: Encoder[Open] = Encoders.product[Open]
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong

    def close(key: Long, o: Open): Session =
      Session(key, new Timestamp(o.startMs), new Timestamp(o.lastMs),
        o.n, o.weight)

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Open, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, evs: Iterator[Ev], state: GroupState[Open]) =>
          val out = Seq.newBuilder[Session]
          var open = state.getOption
          if (state.hasTimedOut) {
            // watermark passed last+gap with no successor: close trailing
            open.foreach(o => out += close(key, o))
            state.remove()
          } else {
            // LATE-session accumulator: consecutive late events within
            // gap of each other merge into ONE emitted session (the
            // batch gap rule would), instead of per-event singletons
            var late: Option[Open] = None
            def flushLate(): Unit = {
              late.foreach(l => out += close(key, l))
              late = None
            }
            // within a batch the iterator is NOT time-ordered; sort
            // (bounded: one key's events in one micro-batch)
            evs.toSeq.sortBy(e => (e.ts.getTime, e.weight)).foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(o) if t - o.lastMs > gapMs =>
                  flushLate()
                  out += close(key, o)
                  open = Some(Open(t, t, 1, e.weight))
                // LATE events (within the watermark, older than the
                // open session): older than start-gap cannot merge
                // under the batch gap rule — accumulate into a late
                // session that closes when its own gap breaks (best
                // effort: the events that would have bridged it to the
                // open session are already folded there); within
                // [start-gap, start) merges and EXTENDS the start, so
                // session_start can never postdate an included event
                case Some(o) if o.startMs - t > gapMs =>
                  late match {
                    case Some(l) if t - l.lastMs <= gapMs =>
                      late = Some(l.copy(lastMs = math.max(l.lastMs, t),
                        n = l.n + 1, weight = l.weight + e.weight))
                    case _ =>
                      flushLate()
                      late = Some(Open(t, t, 1, e.weight))
                  }
                case Some(o) =>
                  open = Some(o.copy(startMs = math.min(o.startMs, t),
                    lastMs = math.max(o.lastMs, t),
                    n = o.n + 1, weight = o.weight + e.weight))
                case None =>
                  open = Some(Open(t, t, 1, e.weight))
              }
            }
            flushLate()
            open.foreach { o =>
              state.update(o)
              // fire once the watermark proves no in-gap successor can
              // come. CLAMPED above the current watermark as defense in
              // depth: Spark REJECTS a timeout at or below the watermark
              // with an IllegalArgumentException that kills the whole
              // query. Spark 4.1's FlatMapGroupsWithStateExec drops
              // below-watermark input rows before the function (pinned
              // in StreamingSpec "a below-watermark event is dropped"),
              // which makes every surviving event satisfy
              // t + gap > watermark — but that pre-filter is an operator
              // implementation detail, not an API contract, and the
              // clamp's only effect in edge cases is firing the trailing
              // close at the next watermark advance, when it was due
              // anyway.
              state.setTimeoutTimestamp(math.max(o.lastMs + gapMs,
                state.getCurrentWatermarkMs() + 1))
            }
          }
          out.result().iterator
      }
  }
}
