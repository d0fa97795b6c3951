package graft.connector

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import graft.core.{RowKind, TableSchema}
import graft.format.{FormatIO, SnapshotManager, SortMergeReader}
import java.nio.file.{Path, Paths}
import scala.collection.mutable

/** Retraction-mode changelog stream (`readStream.option("retractions",
  * "true").table("t$changelog")`): each APPEND commit's rows are merged
  * against the bucket's pre-commit state and re-emitted as a complete
  * changelog — `+I` for new keys, `-U`/`+U` pairs for updates, `-D`
  * with the old values for deletes — so downstream aggregations can
  * retract (Paimon's lookup changelog-producer semantics, the piece the
  * reference's batch-only surface leaves to the Java engine).
  *
  * Cost model: one micro-batch reads the delta plus the baseline files
  * of the touched buckets only; baseline state is a bucket-local map
  * (the lookup producer's classic trade — bounded by bucket size, no
  * shuffle).
  */
class GraftChangelogStream(tableDir: Path, schema: TableSchema,
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

  // consumer seeding/advancement ≙ GraftMicroBatchStream (shared in
  // GraftAvailableNowStream): same offset space (snapshot ids), same
  // consumers/ directory. A consumer-id names ONE logical pipeline
  // across its restarts — progress is a monotonic max, so two
  // CONCURRENT streams sharing an id would let the faster one unpin
  // the laggard's unread range; run each concurrent stream under its
  // own id. Expiry keeps `floor - 1` precisely so this stream's
  // pre-commit BASELINE (snapshot id-1 of the first unread id)
  // survives retention.
  override protected def consumerContext
      : Option[(java.nio.file.Path, graft.format.FileIO, String)] =
    consumerId.map(id => (tableDir, io, id))

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
              "changelog stream was expired from the table's retention; " +
              "restart from a retained snapshot (fromSnapshot option)")
        }
      if (snap.commitKind != "APPEND") Seq.empty
      else {
        val delta = snap.manifests.lastOption.toSeq.flatMap(sm.readManifest)
          .filter(_.isAdd).map(_.file)
        val baseline =
          if (id == 1) Seq.empty
          else sm.liveFiles(
            // same retention guard as the delta read above: the
            // BASELINE (id - 1) may be the snapshot just past the
            // retention cutoff, and a raw NoSuchFileException here
            // would replace the friendly restart instruction
            try sm.snapshot(id - 1)
            catch {
              case _: java.nio.file.NoSuchFileException =>
                throw new IllegalStateException(s"Snapshot ${id - 1} " +
                  "(the retraction baseline) was expired from the " +
                  "table's retention; restart from a retained snapshot " +
                  "(fromSnapshot option)")
            })
        delta.groupBy(f => (f.partition, f.bucket)).map {
          case ((part, bucket), deltaFiles) =>
            val base = baseline.filter(f =>
              f.partition == part && f.bucket == bucket)
            GraftChangelogPartition(
              deltaFiles.map(f => tableDir.resolve(f.fileName).toString).toArray,
              base.map(f => tableDir.resolve(f.fileName).toString).toArray,
              part.toArray, bucket)
        }
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // retraction rows (-U/-D) are SYNTHESIZED against pre-commit state
    // — they have no source data file, so _file is undefined here; the
    // fallback assembler would otherwise throw a bare
    // IllegalArgumentException from kvSchema.fieldIndex at reader
    // creation on the executor
    require(!required.fieldNames.contains("_file"),
      "_file is not defined on the retraction changelog stream " +
        "(synthesized -U/-D rows have no source file); read _file from " +
        "the batch changelog view instead")
    GraftChangelogReaderFactory(schema.fields.json, schema.partitionKeys,
      schema.trimmedPrimaryKeys, required.json, schema.idMap,
      ioSpec = schema.ioSpec,
      sortEngine = schema.options.getOrElse("sort-engine", "min-heap"))
  }

  override def stop(): Unit = ()
}

final case class GraftChangelogPartition(
    deltaFiles: Array[String],
    baselineFiles: Array[String],
    partitionValues: Array[String],
    bucket: Int) extends InputPartition

final case class GraftChangelogReaderFactory(
    fieldsJson: String,
    partitionKeys: Seq[String],
    trimmedPk: Seq[String],
    requiredJson: String,
    fieldIds: Map[String, Int] = Map.empty,
    ioSpec: String = "local",
    sortEngine: String = "min-heap") extends PartitionReaderFactory {

  @transient private lazy val fio = graft.format.FileIO.resolve(ioSpec)

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[GraftChangelogPartition]
    val fields = DataType.fromJson(fieldsJson).asInstanceOf[StructType]
    val required = DataType.fromJson(requiredJson).asInstanceOf[StructType]
    val dataFields = StructType(
      fields.fields.filterNot(f => partitionKeys.contains(f.name)))
    val kvSchema = StructType(
      StructField("_SEQUENCE_NUMBER", LongType, nullable = false) +:
        StructField("_VALUE_KIND", IntegerType, nullable = false) +:
        dataFields.fields)
    val keyIdx = trimmedPk.map(kvSchema.fieldIndex)
    val keyTypes = trimmedPk.map(k => kvSchema(kvSchema.fieldIndex(k)).dataType)

    def keyOf(r: InternalRow): Seq[String] =
      keyIdx.zip(keyTypes).map { case (i, dt) => Values.encodeField(r, i, dt) }

    // baseline: merged pre-commit state of the bucket (key -> value row)
    val state = mutable.HashMap.empty[Seq[String], InternalRow]
    if (part.baselineFiles.nonEmpty) {
      val sources = part.baselineFiles.toSeq.map(f =>
        FormatIO.reader(FormatIO.ofFile(f), Paths.get(f), kvSchema, kvSchema,
          fieldIds, io = fio, ioSpec = ioSpec).map(r => (f, r)))
      new SortMergeReader(sources, keyIdx, keyTypes, 0, 1, sortEngine)
        .foreach { case (_, r) => state.update(keyOf(r), r) }
    }

    // delta rows in sequence order
    val delta = part.deltaFiles.toSeq.flatMap(f =>
      FormatIO.reader(FormatIO.ofFile(f), Paths.get(f), kvSchema, kvSchema,
        fieldIds, io = fio, ioSpec = ioSpec).toSeq).sortBy(_.getLong(0))

    // synthesize the changelog
    val out = mutable.ArrayBuffer.empty[(Byte, Long, InternalRow)]
    delta.foreach { r =>
      val key = keyOf(r)
      val seq = r.getLong(0)
      val rawKind = r.getInt(1).toByte
      val newIsAdd = RowKind.isAdd(rawKind)
      val old = state.get(key)
      old match {
        case Some(prev) if newIsAdd =>
          out += ((RowKind.UpdateBefore, seq, prev))
          out += ((RowKind.UpdateAfter, seq, r))
          state.update(key, r)
        case Some(prev) =>
          // preserve the producer's kind: a -U (the retraction half of
          // a merge-on-read UPDATE pair) must not read as a delete —
          // its +U partner follows at the next sequence. The emitted
          // values are the PRIOR state (richer than the raw -U row,
          // whose non-key columns are null).
          out += ((if (rawKind == RowKind.UpdateBefore) RowKind.UpdateBefore
            else RowKind.Delete, seq, prev))
          state.remove(key)
        case None if newIsAdd =>
          // a raw +U lands here right after its -U partner retracted
          // the state — surface it with its own kind so the pair reads
          // -U/+U; plain inserts (+I) stay +I
          out += ((if (rawKind == RowKind.UpdateAfter) RowKind.UpdateAfter
            else RowKind.Insert, seq, r))
          state.update(key, r)
        case None => () // delete of an absent key: no event
      }
    }

    // assemble into the changelog view's schema
    val pValues = partitionKeys.zipWithIndex.map { case (k, i) =>
      k -> Values.parse(fields(fields.fieldIndex(k)).dataType,
        part.partitionValues(i))
    }.toMap
    val assemblers: Array[((Byte, Long, InternalRow)) => Any] =
      required.fields.map { f =>
        f.name match {
          case "_row_kind" => (e: (Byte, Long, InternalRow)) => e._1.toInt
          case "_sequence_number" => (e: (Byte, Long, InternalRow)) => e._2
          case n if pValues.contains(n) =>
            (_: (Byte, Long, InternalRow)) => pValues(n)
          case n =>
            val i = kvSchema.fieldIndex(n)
            val dt = f.dataType
            (e: (Byte, Long, InternalRow)) =>
              if (e._3.isNullAt(i)) null else e._3.get(i, dt)
        }
      }

    val it = out.iterator
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) {
          val e = it.next()
          val row = new GenericInternalRow(assemblers.length)
          var i = 0
          while (i < assemblers.length) { row.update(i, assemblers(i)(e)); i += 1 }
          current = row
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
