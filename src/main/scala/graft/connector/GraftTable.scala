package graft.connector

import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.core.TableSchema
import java.nio.file.Path
import java.util
import scala.jdk.CollectionConverters._

/** DSv2 table over one table directory — ≙ reference `Table`
  * (`pypaimon/api/table.py:26-35`): `newScanBuilder` ≙
  * `new_read_builder`, `newWriteBuilder` ≙ `new_batch_write_builder`.
  */
class GraftTable(ident: Identifier, val tableDir: Path, val tableSchema: TableSchema,
    val pinnedSnapshot: Option[Long] = None)
  extends Table with SupportsRead with SupportsWrite {

  override def name(): String = ident.toString

  override def schema(): StructType = tableSchema.fields

  override def partitioning(): Array[Transform] =
    tableSchema.partitionKeys.map(Expressions.identity).toArray

  override def properties(): util.Map[String, String] = {
    val base = tableSchema.options ++
      tableSchema.comment.map(TableCatalog.PROP_COMMENT -> _) ++
      (if (tableSchema.primaryKeys.nonEmpty)
        Map("primary-key" -> tableSchema.primaryKeys.mkString(","))
      else Map.empty)
    base.asJava
  }

  override def capabilities(): util.Set[TableCapability] = {
    import TableCapability._
    Set(BATCH_READ, BATCH_WRITE, MICRO_BATCH_READ, TRUNCATE,
      OVERWRITE_BY_FILTER, OVERWRITE_DYNAMIC).asJava
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(tableDir, tableSchema, pinnedSnapshot)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinnedSnapshot.isEmpty, "Cannot write to a time-travel read")
    new GraftWriteBuilder(tableDir, tableSchema, info)
  }
}
