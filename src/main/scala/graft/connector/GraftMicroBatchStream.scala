package graft.connector

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import graft.core.TableSchema
import graft.format.SnapshotManager
import java.nio.file.Path

/** AvailableNow contract for snapshot-offset streams: pin the latest
  * committed snapshot id when the trigger starts, then report the pinned
  * id as the latest offset until the stream drains it and stops. Without
  * this, Spark logs "does not support Trigger.AvailableNow. Falling back
  * to single batch execution" and the drain-everything-then-stop
  * guarantee rests on there being no concurrent commits — with it, a
  * commit landing mid-stream is deterministically excluded (it belongs
  * to the next trigger).
  */
trait GraftAvailableNowStream extends SupportsTriggerAvailableNow {
  /** Current latest committed snapshot id (0 when the table is empty). */
  protected def currentLatestSnapshotId: Long

  /** `(tableDir, io, consumerId)` when this stream records consumer
    * progress ([[graft.format.Consumers]]); None = no bookkeeping.
    */
  protected def consumerContext
      : Option[(Path, graft.format.FileIO, String)] = None

  /** Durable-progress hook for consumer files: `consumedThrough` is the
    * snapshot id everything at or below which has been committed to
    * the SINK. Fired from `latestOffset(start, …)` rather than only
    * `commit(end)` because Spark calls the latter while constructing a
    * FURTHER batch — a single-batch AvailableNow run (the common
    * batch-ish pipeline shape) terminates without it, whereas its
    * final "drained?" admission check still passes the committed
    * offset through here. `start` can only lag true sink progress
    * (first call passes the initial offset), so recording it
    * UNDERSTATES — retention then over-retains, never under-retains.
    * (Caveat: under opt-in asyncProgressTrackingEnabled the offset log
    * itself lags, `start` may exceed the DURABLE checkpoint, and a
    * crash+restart can land before the pin — the failure is the loud
    * expired-snapshot error, not silent data loss; consumer pins
    * assume the default synchronous progress tracking.)
    * Throttled: a tight ProcessingTime stream over an object-store
    * table must not PUT the consumer file on every idle poll — write
    * only on real advances or a minute-stale heartbeat. Monotonic
    * inside [[graft.format.Consumers.record]]; an explicit
    * `fromSnapshot` replay under an existing consumer-id never REWINDS
    * the pin — rewinding is `CALL sys.reset_consumer`.
    */
  @volatile private var lastRecorded: (Long, Long) = (Long.MinValue, 0L)
  protected final def onDurableProgress(consumedThrough: Long): Unit =
    consumerContext.foreach { case (dir, io, id) =>
      val next = consumedThrough + 1
      val now = System.currentTimeMillis()
      if (next > lastRecorded._1 || now - lastRecorded._2 >= 60000L) {
        graft.format.Consumers.record(dir, io, id, next)
        lastRecorded = (math.max(next, lastRecorded._1), now)
      }
    }

  /** Consumer-recorded start offset for a FRESH checkpoint (pipeline
    * checkpoint relocation without history replay); None without a
    * consumer or a recorded file.
    */
  protected final def consumerSeed: Option[Long] =
    consumerContext.flatMap { case (dir, io, id) =>
      graft.format.Consumers.get(dir, io, id).map(_.nextSnapshot - 1)
    }

  /** Fires only while a further batch is being constructed (never
    * after an AvailableNow drain — onDurableProgress via latestOffset
    * covers that); kept for the freshest possible pin on
    * continuously-triggered streams.
    */
  def commit(end: Offset): Unit =
    onDurableProgress(end.asInstanceOf[GraftOffset].snapshotId)

  @volatile private var pinned: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    pinned = Some(currentLatestSnapshotId)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** `max-snapshots-per-trigger` read option: cap each micro-batch at
    * this many snapshot ids past its start. At scale a catch-up read
    * over a long snapshot history must not plan one giant batch (task
    * count and shuffle state proportional to the WHOLE backlog);
    * capping turns the drain into bounded batches, each committing its
    * own offset — which also makes an AvailableNow drain multi-batch,
    * with per-batch durable consumer progress instead of
    * all-or-nothing. None = drain everything (the default).
    */
  protected def maxSnapshotsPerTrigger: Option[Long] = None

  /** Admission-control latestOffset: the pinned id under AvailableNow,
    * live otherwise (micro-batch triggers also route through this once
    * the source implements SupportsAdmissionControl), capped by
    * [[maxSnapshotsPerTrigger]].
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GraftOffset].snapshotId
    onDurableProgress(s)
    val target = pinned.getOrElse(currentLatestSnapshotId)
    GraftOffset(maxSnapshotsPerTrigger match {
      case Some(k) if s + k < target => s + k
      case _ => target
    })
  }
}

/** Incremental streaming read over the snapshot chain: offsets are
  * snapshot ids, one micro-batch = the data files ADDed by snapshots
  * `(start, end]`. This is the streaming half of the Paimon design the
  * reference's batch-only Python SDK doesn't expose (SURVEY §2.6) but
  * whose format machinery (sequence numbers, RowKind, snapshot chain)
  * exists to serve — re-expressed as a Spark Structured Streaming
  * source.
  *
  * Semantics:
  *  - APPEND snapshots stream their added files exactly once.
  *  - OVERWRITE snapshots are skipped (their file set replaces history;
  *    a consistent changelog would need -D retractions — out of scope).
  *  - PK tables stream the raw upsert rows (+I/+U wins are NOT merged
  *    across batches — downstream dedups per key, e.g. with
  *    `dropDuplicates` or `flatMapGroupsWithState`). Retraction rows
  *    (-U/-D) are NOT surfaced — deletes are invisible here by
  *    contract; consume `$changelog` with `retractions` to see them.
  */
final case class GraftOffset(snapshotId: Long) extends Offset {
  override def json(): String = s"""{"snapshotId":$snapshotId}"""
}

class GraftMicroBatchStream(tableDir: Path, schema: TableSchema,
    required: StructType,
    startSnapshot: Option[Long] = None,
    consumerId: Option[String] = None,
    maxPerTrigger: Option[Long] = None)
  extends MicroBatchStream with GraftAvailableNowStream {

  private val io = graft.format.FileIO.resolve(schema.ioSpec)
  private val sm = new SnapshotManager(tableDir, io = io)

  override protected def currentLatestSnapshotId: Long =
    sm.latestSnapshotId.getOrElse(0L)

  override protected def maxSnapshotsPerTrigger: Option[Long] = maxPerTrigger

  override protected def consumerContext
      : Option[(Path, graft.format.FileIO, String)] =
    consumerId.map(id => (tableDir, io, id))

  /** First offset: 0 (full replay), a specific snapshot id, or -1 for
    * "latest" (only new commits stream — the scan-from-now mode a
    * large table needs; replaying 100 TB of history is not a default
    * anyone wants by accident, but 0 preserves batch/stream parity).
    * A registered consumer's recorded progress seeds a FRESH
    * checkpoint (this method is only consulted when the checkpoint has
    * no offsets) unless an explicit fromSnapshot overrides it — so a
    * pipeline can relocate its checkpoint without replaying history,
    * exactly what the consumer file is for.
    */
  override def initialOffset(): Offset = GraftOffset(startSnapshot match {
    case Some(-1L) => sm.latestSnapshotId.getOrElse(0L)
    case Some(id) => id
    case None => consumerSeed.getOrElse(0L)
  })

  // not called once SupportsAdmissionControl is implemented; Spark
  // routes through latestOffset(start, limit)
  override def latestOffset(): Offset = GraftOffset(currentLatestSnapshotId)

  override def deserializeOffset(json: String): Offset = {
    val id = "\"snapshotId\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(json)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(s"Bad offset: $json"))
    GraftOffset(id)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GraftOffset].snapshotId
    val to = end.asInstanceOf[GraftOffset].snapshotId
    ((from + 1) to to).flatMap { id =>
      val snap =
        try sm.snapshot(id)
        catch {
          case _: java.nio.file.NoSuchFileException =>
            throw new IllegalStateException(s"Snapshot $id needed by this " +
              "stream was expired from the table's retention; restart the " +
              "stream from a retained snapshot (fromSnapshot option)")
        }
      if (snap.commitKind != "APPEND") Seq.empty
      else {
        // the snapshot's own delta manifest is the last in its list
        val delta = snap.manifests.lastOption.toSeq.flatMap(sm.readManifest)
        delta.filter(_.isAdd).map(_.file).map(f =>
          GraftInputPartition(Array(tableDir.resolve(f.fileName).toString),
            f.partition.toArray, f.bucket))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // per-file raw reads: PK tables stream upsert rows without
    // cross-batch merge (merge=false keeps the KV file layout but skips
    // the dedup). Retraction rows (-U/-D — merge-on-read DML appends
    // them with null non-key columns) are dropped: deletes are
    // documented invisible to the plain stream; `$changelog` with
    // `retractions` carries them as first-class -D/-U events.
    GraftReaderFactory(schema.fields.json, schema.partitionKeys,
      schema.trimmedPrimaryKeys, isPk = schema.isPrimaryKeyTable,
      required.json, merge = false, fieldIds = schema.idMap,
      ioSpec = schema.ioSpec, dropNonAdd = true)

  override def stop(): Unit = ()
}
