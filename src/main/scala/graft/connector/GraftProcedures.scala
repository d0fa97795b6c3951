package graft.connector

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures._
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.core.TableSchema
import graft.format.{Maintenance, SnapshotManager}
import java.nio.file.Path

/** SQL maintenance procedures under the virtual `sys` namespace —
  * `CALL graft.sys.compact('db.t')`, `CALL graft.sys.expire_snapshots
  * ('db.t', 5)`, `CALL graft.sys.create_tag('db.t', 'corpus-v1')`,
  * `CALL graft.sys.rollback('db.t', 3)` … — the ops surface every
  * lakehouse exposes through `CALL` (Spark 4 ProcedureCatalog), so a
  * SQL-only operator can run the whole maintenance lifecycle without
  * touching the Scala facade. Each call returns a one-row result set
  * describing what happened.
  */
object GraftProcedures {

  val names: Seq[String] = Seq("compact", "expire_snapshots", "vacuum",
    "create_tag", "delete_tag", "list_tags", "rollback", "rollback_to_tag",
    "reset_consumer")

  def load(catalog: GraftCatalog, name: String): UnboundProcedure =
    name match {
      case "compact" => new Compact(catalog)
      case "expire_snapshots" => new ExpireSnapshots(catalog)
      case "vacuum" => new Vacuum(catalog)
      case "create_tag" => new CreateTag(catalog)
      case "delete_tag" => new DeleteTag(catalog)
      case "list_tags" => new ListTags(catalog)
      case "rollback" => new Rollback(catalog)
      case "rollback_to_tag" => new RollbackToTag(catalog)
      case "reset_consumer" => new ResetConsumer(catalog)
      case other => throw new IllegalArgumentException(
        s"Unknown procedure sys.$other (available: ${names.mkString(", ")})")
    }

  /** Shared shape: bind is identity (parameters are static), calls are
    * side-effecting (never deterministic), and the result is one
    * in-memory row set.
    */
  private abstract class Base(catalog: GraftCatalog, procName: String)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false

    protected def tableParam: ProcedureParameter =
      ProcedureParameter.in("table", StringType)
        .comment("table identifier, 'database.table'").build()

    protected def resolve(input: InternalRow): (Path, TableSchema) =
      catalog.resolveForMaintenance(input.getUTF8String(0).toString)

    protected def result(schema: StructType,
        out: Seq[Array[Any]]): java.util.Iterator[Scan] =
      java.util.List.of[Scan](new LocalScan {
        override def rows(): Array[InternalRow] =
          out.map(vs => new GenericInternalRow(vs): InternalRow).toArray
        override def readSchema(): StructType = schema
      }).iterator()
  }

  private final class Compact(catalog: GraftCatalog)
      extends Base(catalog, "compact") {
    override def description(): String =
      "rewrite every multi-file (partition, bucket) group into one file"
    override def parameters(): Array[ProcedureParameter] = Array(tableParam)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (dir, schema) = resolve(input)
      val n = graft.format.Compactor.compactAll(
        org.apache.spark.sql.SparkSession.getActiveSession, dir, schema)
      result(StructType(Seq(StructField("compacted_groups", IntegerType))),
        Seq(Array[Any](n)))
    }
  }

  private final class ExpireSnapshots(catalog: GraftCatalog)
      extends Base(catalog, "expire_snapshots") {
    override def description(): String =
      "expire all but the last retain_last snapshots (tags stay " +
        "pinned; older_than_millis keeps younger snapshots regardless)"
    override def parameters(): Array[ProcedureParameter] = Array(tableParam,
      ProcedureParameter.in("retain_last", IntegerType).build(),
      ProcedureParameter.in("older_than_millis", LongType)
        .defaultValue("NULL").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (dir, schema) = resolve(input)
      val age = if (input.isNullAt(2)) None else Some(input.getLong(2))
      val r = Maintenance.expireSnapshots(dir, input.getInt(1),
        schema.ioSpec, age)
      result(StructType(Seq(
        StructField("expired_snapshots", IntegerType),
        StructField("deleted_data_files", IntegerType),
        StructField("deleted_manifests", IntegerType))),
        Seq(Array[Any](r.expiredSnapshots, r.deletedDataFiles,
          r.deletedManifests)))
    }
  }

  private final class Vacuum(catalog: GraftCatalog)
      extends Base(catalog, "vacuum") {
    override def description(): String =
      "delete unreferenced data files older than older_than_millis"
    override def parameters(): Array[ProcedureParameter] = Array(tableParam,
      ProcedureParameter.in("older_than_millis", LongType)
        .defaultValue("3600000").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (dir, schema) = resolve(input)
      val n = Maintenance.vacuumOrphans(dir, input.getLong(1), schema.ioSpec)
      result(StructType(Seq(StructField("deleted_files", IntegerType))),
        Seq(Array[Any](n)))
    }
  }

  private final class CreateTag(catalog: GraftCatalog)
      extends Base(catalog, "create_tag") {
    override def description(): String =
      "pin a snapshot (default latest) under a stable name"
    override def parameters(): Array[ProcedureParameter] = Array(tableParam,
      ProcedureParameter.in("tag", StringType).build(),
      ProcedureParameter.in("snapshot_id", LongType)
        .defaultValue("NULL").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (dir, schema) = resolve(input)
      val sid = if (input.isNullAt(2)) None else Some(input.getLong(2))
      val s = new SnapshotManager(dir,
        io = graft.format.FileIO.resolve(schema.ioSpec))
        .createTag(input.getUTF8String(1).toString, sid)
      result(StructType(Seq(
        StructField("tag_name", StringType),
        StructField("snapshot_id", LongType))),
        Seq(Array[Any](input.getUTF8String(1).copy(), s.id)))
    }
  }

  private final class DeleteTag(catalog: GraftCatalog)
      extends Base(catalog, "delete_tag") {
    override def description(): String =
      "remove a tag; its snapshot becomes expirable again"
    override def parameters(): Array[ProcedureParameter] = Array(tableParam,
      ProcedureParameter.in("tag", StringType).build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (dir, schema) = resolve(input)
      val deleted = new SnapshotManager(dir,
        io = graft.format.FileIO.resolve(schema.ioSpec))
        .deleteTag(input.getUTF8String(1).toString)
      result(StructType(Seq(StructField("deleted", BooleanType))),
        Seq(Array[Any](deleted)))
    }
  }

  private final class ListTags(catalog: GraftCatalog)
      extends Base(catalog, "list_tags") {
    override def description(): String = "list tags (name, snapshot id)"
    override def parameters(): Array[ProcedureParameter] = Array(tableParam)
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (dir, schema) = resolve(input)
      val tags = new SnapshotManager(dir,
        io = graft.format.FileIO.resolve(schema.ioSpec)).listTags
      result(StructType(Seq(
        StructField("tag_name", StringType),
        StructField("snapshot_id", LongType))),
        tags.map { case (n, s) =>
          Array[Any](UTF8String.fromString(n), s.id)
        })
    }
  }

  /** Operator override of a streaming-read consumer (the retention
    * pins `option("consumer-id", …)` streams maintain): rewind/advance
    * it to an explicit next snapshot, or delete it (NULL next) so it
    * stops pinning expiry. ≙ Paimon's `sys.reset_consumer`.
    */
  private final class ResetConsumer(catalog: GraftCatalog)
      extends Base(catalog, "reset_consumer") {
    override def description(): String =
      "set a streaming consumer's next snapshot, or delete it (NULL)"
    override def parameters(): Array[ProcedureParameter] = Array(tableParam,
      ProcedureParameter.in("consumer_id", StringType).build(),
      ProcedureParameter.in("next_snapshot_id", LongType)
        .defaultValue("NULL").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (dir, schema) = resolve(input)
      val id = input.getUTF8String(1).toString
      val next = if (input.isNullAt(2)) None else Some(input.getLong(2))
      val changed = graft.format.Consumers.reset(dir,
        graft.format.FileIO.resolve(schema.ioSpec), id, next)
      result(StructType(Seq(
        StructField("consumer_id", StringType),
        StructField("next_snapshot_id", LongType),
        StructField("changed", BooleanType))),
        Seq(Array[Any](UTF8String.fromString(id),
          next.map(Long.box).orNull, changed)))
    }
  }

  private val RollbackSchema = StructType(Seq(
    StructField("from_snapshot_id", LongType),
    StructField("target_snapshot_id", LongType),
    StructField("new_snapshot_id", LongType)))

  private final class Rollback(catalog: GraftCatalog)
      extends Base(catalog, "rollback") {
    override def description(): String =
      "publish a revert commit restoring the state of snapshot_id " +
        "(nothing deleted; expiry reclaims the rolled-away history)"
    override def parameters(): Array[ProcedureParameter] = Array(tableParam,
      ProcedureParameter.in("snapshot_id", LongType).build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (dir, schema) = resolve(input)
      val r = Maintenance.rollbackTo(dir, input.getLong(1), schema.ioSpec)
      result(RollbackSchema, Seq(Array[Any](
        r.fromSnapshotId, r.targetSnapshotId, r.newSnapshotId)))
    }
  }

  private final class RollbackToTag(catalog: GraftCatalog)
      extends Base(catalog, "rollback_to_tag") {
    override def description(): String =
      "revert commit restoring the snapshot a tag pins (works even " +
        "after the snapshot itself expired — the tag carries a copy)"
    override def parameters(): Array[ProcedureParameter] = Array(tableParam,
      ProcedureParameter.in("tag", StringType).build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val (dir, schema) = resolve(input)
      val tagName = input.getUTF8String(1).toString
      val sm = new SnapshotManager(dir,
        io = graft.format.FileIO.resolve(schema.ioSpec))
      val target = sm.tag(tagName).getOrElse(throw new IllegalArgumentException(
        s"Tag '$tagName' does not exist " +
          s"(known: ${sm.listTags.map(_._1).mkString(", ")})")).id
      val r = Maintenance.rollbackTo(dir, target, schema.ioSpec)
      result(RollbackSchema, Seq(Array[Any](
        r.fromSnapshotId, r.targetSnapshotId, r.newSnapshotId)))
    }
  }
}
