package graft.connector

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.core.TableSchema
import graft.format.SnapshotManager
import java.nio.file.Path
import java.util
import scala.jdk.CollectionConverters._

/** Read-only metadata system tables: `t$snapshots` (the snapshot chain)
  * and `t$files` (live file metadata ≙ the reference's split metadata —
  * row_count/file_size/file_paths, `pypaimon/api/split.py:24-35` — plus
  * partition/bucket/sequence bounds). Rows are materialized driver-side
  * at planning (metadata is small by construction: manifests fold).
  */
object MetaTables {

  val snapshotsSchema: StructType = StructType(Seq(
    StructField("snapshot_id", LongType, nullable = false),
    StructField("schema_id", LongType, nullable = false),
    StructField("commit_kind", StringType, nullable = false),
    StructField("commit_time", TimestampType, nullable = false),
    StructField("total_record_count", LongType, nullable = false),
    StructField("manifest_count", IntegerType, nullable = false)))

  val filesSchema: StructType = StructType(Seq(
    StructField("file_name", StringType, nullable = false),
    StructField("partition", StringType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("row_count", LongType, nullable = false),
    StructField("file_size", LongType, nullable = false),
    StructField("min_seq", LongType, nullable = false),
    StructField("max_seq", LongType, nullable = false)))

  def snapshotRows(dir: Path, ioSpec: String = "local"): Seq[Array[Any]] = {
    val sm = new SnapshotManager(dir, io = graft.format.FileIO.resolve(ioSpec))
    // listing-based, NOT (1..latest): expiry leaves gaps at the front.
    // A snapshot expired between the listing and its read is skipped
    // (same TOCTOU guard as the time-travel walk) — a metadata query
    // racing expire_snapshots must not die on NoSuchFileException.
    sm.existingSnapshotIds.flatMap { id =>
      try {
        val s = sm.snapshot(id)
        Some(Array[Any](s.id, s.schemaId, UTF8String.fromString(s.commitKind),
          s.timeMillis * 1000L, s.totalRecordCount, s.manifests.size))
      } catch { case _: java.nio.file.NoSuchFileException => None }
    }
  }

  val tagsSchema: StructType = StructType(Seq(
    StructField("tag_name", StringType, nullable = false),
    StructField("snapshot_id", LongType, nullable = false),
    StructField("schema_id", LongType, nullable = false),
    StructField("commit_time", TimestampType, nullable = false),
    StructField("record_count", LongType, nullable = false)))

  def tagRows(dir: Path, ioSpec: String = "local"): Seq[Array[Any]] = {
    val sm = new SnapshotManager(dir, io = graft.format.FileIO.resolve(ioSpec))
    sm.listTags.map { case (name, s) =>
      Array[Any](UTF8String.fromString(name), s.id, s.schemaId,
        s.timeMillis * 1000L, s.totalRecordCount)
    }
  }

  val partitionsSchema: StructType = StructType(Seq(
    StructField("partition", StringType),
    StructField("record_count", LongType, nullable = false),
    StructField("file_count", LongType, nullable = false),
    StructField("file_size_in_bytes", LongType, nullable = false)))

  /** ≙ the reference's partitions metadata view: per-partition rollup of
    * the live file set, straight from manifests (no data IO).
    */
  def partitionRows(dir: Path, schema: TableSchema): Seq[Array[Any]] = {
    new SnapshotManager(dir, io = graft.format.FileIO.resolve(schema.ioSpec))
      .liveFilesLatest
      .groupBy(_.partition).toSeq.sortBy(_._1.mkString("/"))
      .map { case (part, fs) =>
        Array[Any](
          UTF8String.fromString(schema.partitionKeys.zip(part)
            .map { case (k, v) => s"$k=$v" }.mkString("/")),
          fs.map(_.rowCount).sum, fs.size.toLong, fs.map(_.fileSize).sum)
      }
  }

  val optionsSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** ≙ the format family's `t$options` view: the table's dynamic
    * options as key/value rows (structural ones included — they ARE
    * options, just immutable ones).
    */
  def optionRows(schema: TableSchema): Seq[Array[Any]] =
    schema.options.toSeq.sortBy(_._1).map { case (k, v) =>
      Array[Any](UTF8String.fromString(k), UTF8String.fromString(v))
    }

  val schemasSchema: StructType = StructType(Seq(
    StructField("schema_id", LongType, nullable = false),
    StructField("fields", StringType, nullable = false),
    StructField("partition_keys", StringType, nullable = false),
    StructField("primary_keys", StringType, nullable = false),
    StructField("options", StringType, nullable = false),
    StructField("comment", StringType)))

  /** ≙ `t$schemas`: the full persisted schema lineage (ids are dense
    * from 0 = CREATE; schema files are immutable and never expire), so
    * an operator can audit exactly which fields/options each historical
    * file era was written under. JSON-rendered columns match the
    * on-disk representation.
    */
  def schemaRows(dir: Path): Seq[Array[Any]] = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    TableSchema.listIds(dir).flatMap(id => TableSchema.loadById(dir, id))
      .map { s =>
        Array[Any](s.id,
          UTF8String.fromString(s.fields.json),
          UTF8String.fromString(
            JsonMethods.compact(JsonMethods.render(s.partitionKeys))),
          UTF8String.fromString(
            JsonMethods.compact(JsonMethods.render(s.primaryKeys))),
          UTF8String.fromString(JsonMethods.compact(JsonMethods.render(
            scala.collection.immutable.ListMap(
              s.options.toSeq.sortBy(_._1): _*)))),
          s.comment.map(UTF8String.fromString).orNull)
      }
  }

  val consumersSchema: StructType = StructType(Seq(
    StructField("consumer_id", StringType, nullable = false),
    StructField("next_snapshot_id", LongType, nullable = false),
    StructField("last_heartbeat", TimestampType, nullable = false)))

  /** ≙ `t$consumers`: registered streaming-read consumers — each pins
    * retention from `next_snapshot_id` onward until its heartbeat ages
    * past `consumer.retain-millis` ([[graft.format.Consumers]]).
    */
  def consumerRows(dir: Path, ioSpec: String = "local"): Seq[Array[Any]] =
    graft.format.Consumers
      .list(dir, graft.format.FileIO.resolve(ioSpec)).map { c =>
        Array[Any](UTF8String.fromString(c.id), c.nextSnapshot,
          c.tsMillis * 1000L)
      }

  val manifestsSchema: StructType = StructType(Seq(
    StructField("manifest_name", StringType, nullable = false),
    StructField("num_added_files", LongType, nullable = false),
    StructField("num_deleted_files", LongType, nullable = false),
    StructField("added_row_count", LongType, nullable = false),
    StructField("deleted_row_count", LongType, nullable = false)))

  /** ≙ `t$manifests`: the CURRENT snapshot's manifest chain in commit
    * order with per-manifest ADD/DELETE entry rollups — the view that
    * shows whether reads are planning over a folded chain or a long
    * tail of deltas.
    */
  def manifestRows(dir: Path, ioSpec: String = "local"): Seq[Array[Any]] = {
    val sm = new SnapshotManager(dir, io = graft.format.FileIO.resolve(ioSpec))
    sm.latestSnapshot.toSeq.flatMap(_.manifests).flatMap { name =>
      // same expiry-race tolerance as snapshotRows
      try {
        val entries = sm.readManifest(name)
        val (adds, dels) = entries.partition(_.isAdd)
        Some(Array[Any](UTF8String.fromString(name),
          adds.size.toLong, dels.size.toLong,
          adds.map(_.file.rowCount).sum, dels.map(_.file.rowCount).sum))
      } catch { case _: java.nio.file.NoSuchFileException => None }
    }
  }

  def fileRows(dir: Path, schema: TableSchema): Seq[Array[Any]] = {
    new SnapshotManager(dir, io = graft.format.FileIO.resolve(schema.ioSpec))
      .liveFilesLatest.map { f =>
      Array[Any](UTF8String.fromString(f.fileName),
        UTF8String.fromString(
          schema.partitionKeys.zip(f.partition)
            .map { case (k, v) => s"$k=$v" }.mkString("/")),
        f.bucket, f.rowCount, f.fileSize, f.minSeq, f.maxSeq)
    }
  }
}

/** A fixed-schema table over driver-materialized rows. */
class StaticRowsTable(tableName: String, tableSchema: StructType,
    rows: () => Seq[Array[Any]]) extends Table with SupportsRead {

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required = tableSchema
      override def pruneColumns(r: StructType): Unit = required = r
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = required
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] = {
          val idx = required.fieldNames.map(tableSchema.fieldIndex)
          Array(StaticRowsPartition(rows().map(r => idx.map(r(_))).toArray))
        }
        override def createReaderFactory(): PartitionReaderFactory =
          (p: InputPartition) => new PartitionReader[InternalRow] {
            private val data = p.asInstanceOf[StaticRowsPartition].rows
            private var i = -1
            override def next(): Boolean = { i += 1; i < data.length }
            override def get(): InternalRow =
              new GenericInternalRow(data(i))
            override def close(): Unit = ()
          }
      }
    }
}

final case class StaticRowsPartition(rows: Array[Array[Any]])
  extends InputPartition
