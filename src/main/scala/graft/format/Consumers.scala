package graft.format

import java.nio.file.Path

/** Streaming-read consumers (≙ Paimon's consumer-id mechanism — the
  * read-side mirror of the streaming-SINK identity pins this engine
  * already keeps): a stream started with `option("consumer-id", "x")`
  * records its progress in `<table>/consumers/x` after every committed
  * micro-batch, and [[Maintenance.expireSnapshots]] retains every
  * snapshot at or beyond the minimum live consumer offset. Without
  * this, a reader that falls behind the table's retention fails its
  * next batch with "expired from the table's retention" and the data
  * is simply GONE; with it, retention waits for the slow reader.
  *
  * The reference's Python SDK is batch-only (SURVEY §2.6) — consumers
  * belong to the format machinery its tables carry for the streaming
  * engines sitting on the same layout.
  *
  * File format: one JSON object `{"nextSnapshot":N,"ts":millis}` per
  * consumer. `nextSnapshot` is the first UNCONSUMED snapshot id (Spark
  * offset `end` ⇒ `end + 1`); `ts` is the consumer's last heartbeat,
  * written by us rather than trusted from store mtimes so the age
  * bound below is io-agnostic. Progress writes are last-write-wins
  * `writeAtomic` but MONOTONIC: a zombie run of the same query that
  * lags a newer incarnation can re-write an old offset, and regressing
  * the file would silently re-expand what expiry must retain, so
  * `record` keeps the max.
  *
  * Registration contract: a consumer protects retention FROM THE
  * MOMENT it is registered — expiry re-lists consumers immediately
  * before its delete phase, so registering any time before that phase
  * is honored; a registration racing the delete phase itself can
  * still lose its first range, and the failure is the stream's loud
  * expired-snapshot error, never silent data loss. One consumer id
  * names ONE logical pipeline across restarts (progress is a
  * monotonic max; concurrent streams need distinct ids).
  *
  * Age bound: a consumer whose heartbeat is older than
  * `consumer.retain-millis` (default 7 days) no longer pins retention
  * — the same double-bound rationale as the sink identity pins: an
  * abandoned consumer id must not anchor 100 TB of history forever.
  * (Paimon reaches the same end via `consumer.expiration-time`, but
  * defaults to never-expiring consumers; defaulting to a bound is this
  * engine's deliberate deviation, documented in COVERAGE.md.)
  */
object Consumers {

  final case class Consumer(id: String, nextSnapshot: Long, tsMillis: Long)

  val DefaultRetainMillis: Long = 7L * 24 * 3600 * 1000

  private def dir(tableDir: Path): Path = tableDir.resolve("consumers")

  /** Consumer ids become file names: whitelist the same portable shape
    * tags enforce (letters, digits, `_` `.` `-`; not starting with
    * `.`) so an id can never escape the consumers directory, collide
    * with metadata, or need escaping on any store.
    */
  def validateId(id: String): String = {
    require(id.nonEmpty && id.length <= 200 && !id.startsWith(".") &&
      id.forall(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_' || c == '.' || c == '-'),
      s"Invalid consumer-id '$id': expected letters, digits, '_', '.' " +
        "or '-', not starting with '.'")
    id
  }

  private def render(nextSnapshot: Long, ts: Long): String =
    s"""{"nextSnapshot":$nextSnapshot,"ts":$ts}"""

  // corrupted/hand-edited files (e.g. a number overflowing Long) are
  // skipped like missing ones — one bad consumer file must not abort
  // every expiry run and $consumers read for the table
  private def parse(id: String, s: String): Option[Consumer] =
    try for {
      next <- "\"nextSnapshot\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(s)
        .map(_.group(1).toLong)
      ts <- "\"ts\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(s)
        .map(_.group(1).toLong)
    } yield Consumer(id, next, ts)
    catch { case _: NumberFormatException => None }

  def get(tableDir: Path, io: FileIO, id: String): Option[Consumer] = {
    val p = dir(tableDir).resolve(validateId(id))
    if (!io.exists(p)) None
    else
      try parse(id, io.readString(p))
      catch { case _: java.nio.file.NoSuchFileException => None }
  }

  /** All consumers, unreadable/torn files skipped (a concurrent reset
    * can delete one mid-listing).
    */
  def list(tableDir: Path, io: FileIO): Seq[Consumer] =
    (try io.list(dir(tableDir))
     catch { case _: java.nio.file.NoSuchFileException => Seq.empty })
      .filterNot(_.startsWith("."))
      .sorted
      .flatMap(id => get(tableDir, io, id))

  /** Record progress: `nextSnapshot` = first unconsumed id. Monotonic —
    * an older offset refreshes the heartbeat but never rewinds the
    * file (rewinding is an operator action: [[reset]]).
    *
    * Monotonicity is best-effort, not atomic: the max is a read-then-
    * writeAtomic, so a lagging ZOMBIE incarnation of the same consumer
    * id (two streams misconfigured onto one id, or a hung executor
    * reviving) can read before a newer write lands and still publish
    * the older offset. The consequence is bounded: the pin retains a
    * few extra snapshots until the live incarnation's next heartbeat
    * re-advances it — never data loss, since pins only ever HOLD
    * history. Serializing writers per id (create-exclusive generation
    * files) would add a commit round-trip per batch on an object store
    * for a window that costs at most one heartbeat of over-retention.
    * DECISION (final): the documented bound stands; per-id generation
    * files are deliberately not taken. ConcurrencySpec ("consumer
    * progress races are bounded and self-healing") pins the invariants
    * the bound rests on: the file never tears, a regression never
    * exceeds one racing write, and the next live heartbeat restores
    * the max.
    */
  def record(tableDir: Path, io: FileIO, id: String,
      nextSnapshot: Long): Consumer = {
    validateId(id)
    io.createDirectories(dir(tableDir))
    val next = math.max(nextSnapshot, get(tableDir, io, id)
      .map(_.nextSnapshot).getOrElse(Long.MinValue))
    val c = Consumer(id, next, System.currentTimeMillis())
    io.writeAtomicString(dir(tableDir).resolve(id),
      render(c.nextSnapshot, c.tsMillis))
    c
  }

  /** Operator override (`CALL graft.system.reset_consumer`): pin the
    * consumer to an explicit next snapshot — the one path allowed to
    * REWIND (replay history into an existing pipeline) — or delete it
    * entirely (`next = None`) so it stops pinning retention.
    * Returns false when deleting a consumer that did not exist.
    */
  def reset(tableDir: Path, io: FileIO, id: String,
      next: Option[Long]): Boolean = {
    validateId(id)
    next match {
      case Some(n) =>
        require(n >= 1, s"nextSnapshot must be >= 1, got $n")
        io.createDirectories(dir(tableDir))
        io.writeAtomicString(dir(tableDir).resolve(id),
          render(n, System.currentTimeMillis()))
        true
      case None => io.delete(dir(tableDir).resolve(id))
    }
  }

  /** Minimum `nextSnapshot` over consumers whose heartbeat is within
    * `retainMillis` — the snapshot floor expiry must keep. None when
    * no live consumer exists.
    */
  def minLiveNext(tableDir: Path, io: FileIO, retainMillis: Long,
      nowMillis: Long): Option[Long] = {
    val live = list(tableDir, io)
      .filter(_.tsMillis >= nowMillis - retainMillis)
    if (live.isEmpty) None else Some(live.map(_.nextSnapshot).min)
  }
}
