package graft.connector

import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{ScanBuilder, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.core.TableSchema
import graft.format.{Compactor, SnapshotManager}
import java.nio.file.Path
import java.util.concurrent.atomic.AtomicReference

/** Copy-on-write row-level DML (SQL DELETE with non-partition
  * predicates, UPDATE, MERGE INTO): Spark's rewrite rules run a group
  * filter (`SELECT DISTINCT _file WHERE cond`), runtime-filter this
  * operation's scan down to the affected groups, recompute those
  * groups' surviving/updated rows, and hand them to the write — whose
  * commit atomically replaces exactly the files the scan planned.
  *
  * Groups: the merge unit. Append tables replace individual files; PK
  * tables replace whole (partition, bucket) groups — a `_file` hit on a
  * merge winner pulls in every file of its bucket, and replacement rows
  * get fresh (higher) sequence numbers, so any bucket left untouched
  * by the runtime filter still merges correctly against them.
  */
class GraftRowLevelOperation(tableDir: Path, schema: TableSchema,
    info: RowLevelOperationInfo) extends RowLevelOperation {

  /** Absolute paths of the files the row-level scan planned — set at
    * planInputPartitions, consumed by the replacement commit.
    */
  private[connector] val planned =
    new AtomicReference[Seq[String]](Seq.empty)

  override def command(): RowLevelOperation.Command = info.command()

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(tableDir, schema, rowLevelOp = Some(this))

  override def newWriteBuilder(winfo: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = {
        val clusterCols = (schema.partitionKeys ++ schema.trimmedPrimaryKeys)
          .map(Expressions.column)
        new Write with RequiresDistributionAndOrdering {
          override def requiredDistribution()
              : org.apache.spark.sql.connector.distributions.Distribution =
            if (clusterCols.isEmpty)
              org.apache.spark.sql.connector.distributions.Distributions.unspecified()
            else
              org.apache.spark.sql.connector.distributions.Distributions
                .clustered(clusterCols.toArray)
          override def requiredOrdering()
              : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
            Array.empty
          override def toBatch: BatchWrite =
            new GraftReplaceBatchWrite(tableDir, schema,
              () => planned.get())
        }
      }
    }

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column("_file"))
}

/** Replacement write: normal bucket-file writing, but the commit
  * deletes the scan-planned files and adds the new ones in one
  * OVERWRITE snapshot.
  */
class GraftReplaceBatchWrite(tableDir: Path, schema: TableSchema,
    plannedFiles: () => Seq[String]) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val sm = new SnapshotManager(tableDir, io = graft.format.FileIO.resolve(schema.ioSpec))
    val baseSeq = sm.latestSnapshot.map(_.lastSequenceNumber + 1).getOrElse(1L)
    GraftWriterFactory(tableDir.toString, schema.fields.json,
      schema.partitionKeys, schema.trimmedPrimaryKeys,
      schema.isPrimaryKeyTable, schema.numBuckets, baseSeq,
      schema.options.getOrElse("file.format", "parquet"),
      GraftDataWriter.spillRows(schema.options), schema.idMap,
      GraftDataWriter.blockSize(schema.options),
      ioSpec = schema.ioSpec)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val adds = messages.collect { case m: GraftCommitMessage => m.files }.flatten
    val prefix = tableDir.toString + "/"
    val deleteNames = plannedFiles().map(_.stripPrefix(prefix)).toSet
    val ok = Compactor.commit(new SnapshotManager(tableDir,
      io = graft.format.FileIO.resolve(schema.ioSpec)), schema.id,
      adds.toSeq, deleteNames, tableDir, kind = "OVERWRITE")
    if (!ok) throw new IllegalStateException(
      "Row-level operation lost a race with a concurrent commit; retry")
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: GraftCommitMessage => m.files }.flatten
      .foreach(f => graft.format.FileIO.resolve(schema.ioSpec)
        .delete(tableDir.resolve(f.fileName)))
}

/** Runtime-filtering hooks mixed into the row-level scan. */
trait GraftRuntimeFiltering extends SupportsRuntimeFiltering {
  protected def onRuntimeFileFilter(files: Set[String]): Unit

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("_file"))

  override def filter(filters: Array[Filter]): Unit =
    filters.foreach {
      case In("_file", vs) =>
        onRuntimeFileFilter(vs.collect { case s: String => s }.toSet)
      case EqualTo("_file", v: String) => onRuntimeFileFilter(Set(v))
      case _ => () // unknown shapes: keep everything (sound)
    }
}
