package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Budget-capped streaming ingest: per key, admit rows in ascending
  * `id` order while the key's running weight total (over ALL rows
  * seen, admitted or not) stays within `budget` — the quota step a
  * curation pipeline runs at ingest to stop pulling from a source once
  * its token budget fills.
  *
  * The admission rule is deliberately the PREFIX-SUM rule ("admit row
  * r iff cum(weight up to and including r, in id order) <= budget"),
  * not stop-at-first-overflow: for non-negative weights the two are
  * identical, and the prefix rule stays an exact SQL window
  * (`SUM OVER ... ROWS UNBOUNDED PRECEDING <= budget`) even when
  * weights can be negative, so the batch restatement is always a
  * one-window query. State per key is a single running total — O(1),
  * so a 100 TB stream shards by key with bounded state and no timer.
  *
  * Determinism across the stream/batch divide needs the source to
  * deliver ids in non-decreasing order ACROSS micro-batches (within a
  * batch the group iterator is sorted here); a single-commit graft
  * table under AvailableNow delivers exactly one batch and satisfies
  * this trivially.
  */
object QuotaCap {

  /** One input row; `weight` is the additive quota currency. */
  final case class In(key: String, id: Long, weight: Long)

  /** An admitted row. */
  final case class Admitted(key: String, id: Long, weight: Long)

  def cap(rows: Dataset[In], budget: Long): Dataset[Admitted] = {
    implicit val outEnc: Encoder[Admitted] = Encoders.product[Admitted]
    implicit val stEnc: Encoder[Long] = Encoders.scalaLong
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState[Long, Admitted](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[In], state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          val out = Seq.newBuilder[Admitted]
          // within a batch the iterator is NOT id-ordered; sort
          // (bounded: one key's rows in one micro-batch). weight as
          // tiebreaker: equal-id rows otherwise keep nondeterministic
          // shuffle order, and when the budget boundary falls between
          // them the admitted SET differs run to run (same reason
          // Sessionize's in-batch sort carries one)
          it.toSeq.sortBy(r => (r.id, r.weight)).foreach { r =>
            cum += r.weight
            if (cum <= budget) out += Admitted(key, r.id, r.weight)
          }
          state.update(cum)
          out.result().iterator
      }
  }
}
