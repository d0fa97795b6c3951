package graft.core

import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.JsonDSL._
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Table schema ≙ reference `Schema(pa_schema, partition_keys,
  * primary_keys, options, comment)` (`pypaimon/api/table.py:38-51`),
  * persisted as JSON at `<table>/schema/schema-<id>` with the field list
  * in Spark's own DataType JSON format.
  *
  * Semantics carried over from the reference:
  *  - supported column types are the primitive matrix of
  *    `pypaimon/py4j/util/java_utils.py:64-93` (we additionally allow
  *    date/timestamp/binary, which the reference reads but cannot
  *    create); nested/decimal types are rejected with the reference's
  *    error shape.
  *  - primary keys must not be a subset of partition keys
  *    (`pypaimon/pynative/reader/sort_merge_reader.py:203-207`).
  */
final case class TableSchema(
    id: Long,
    fields: StructType,
    partitionKeys: Seq[String],
    primaryKeys: Seq[String],
    options: Map[String, String],
    comment: Option[String],
    fieldIds: Seq[Int] = Seq.empty,
    highestFieldId: Int = -1) {

  def isPrimaryKeyTable: Boolean = primaryKeys.nonEmpty

  /** Stable per-column field ids, parallel to `fields` — the identity
    * that survives RENAME and distinguishes DROP + re-ADD (≙ the
    * reference's `DataField.id` consumed by the read-time index mapping,
    * `pypaimon/pynative/reader/data_file_record_reader.py:104-133`).
    * Legacy schemas (written before ids existed) default to position,
    * which is exact for their ADD-COLUMN-only history.
    */
  def ids: Seq[Int] =
    if (fieldIds.length == fields.length) fieldIds else fields.indices

  /** High-water mark for id allocation (never reused after a DROP). */
  def maxFieldId: Int = math.max(highestFieldId, ids.foldLeft(-1)(math.max))

  /** Column name → field id, for the IO layer. */
  def idMap: Map[String, Int] = fields.fieldNames.zip(ids).toMap

  // .trim matches the CREATE-time validation below, so any value that
  // passes validate() also parses here (e.g. 'bucket'=' 4 ')
  def numBuckets: Int = options.getOrElse("bucket", "-1").trim.toInt

  /** Storage backend spec for the table's DATA PLANE (snapshots,
    * manifests, data files) — see [[graft.format.FileIO.resolve]].
    * Catalog metadata (schema files, namespaces) stays with the
    * catalog's own filesystem, the usual split when data lives on an
    * object store.
    */
  def ioSpec: String = options.getOrElse("io", "local")

  /** Explicit split-packing target from `source.split.target-size`
    * (reference knob, `test_pynative_reader.py:167`): scan planning
    * packs files into splits of about this many bytes instead of the
    * adaptive 128 MiB / parallelism-floor default.
    */
  def splitTargetSize: Option[Long] =
    options.get("source.split.target-size")
      .flatMap(TableSchema.parseMemorySize)

  /** Trimmed primary key: pk fields minus partition fields — the key the
    * merge compares (`sort_merge_reader.py:203-210`).
    */
  def trimmedPrimaryKeys: Seq[String] =
    primaryKeys.filterNot(partitionKeys.contains)

  /** Merge-engine configuration (validated at CREATE). */
  def mergeSpec: graft.format.MergeFunction.Spec =
    graft.format.MergeFunction.specOf(options)

  def validate(): TableSchema = {
    fields.fields.foreach { f =>
      if (!TableSchema.supportedTypes.exists(_ == f.dataType))
        throw new IllegalArgumentException(
          s"Found unsupported data type ${f.dataType.simpleString} for field ${f.name}")
    }
    val names = fields.fieldNames.toSet
    (partitionKeys ++ primaryKeys).foreach { k =>
      require(names.contains(k), s"The field $k is not in field list ${fields.fieldNames.mkString("[", ", ", "]")}")
    }
    if (primaryKeys.nonEmpty && trimmedPrimaryKeys.isEmpty)
      throw new IllegalArgumentException(
        "Primary key constraint should not be same with partition fields")
    // the bucket option must PARSE for every table kind — a bare
    // .toInt in numBuckets would otherwise accept 'bucket'='abc' on an
    // append table at CREATE and explode with a context-free
    // NumberFormatException on the first INSERT
    options.get("bucket").foreach { b =>
      if (b.trim.toIntOption.isEmpty)
        throw new IllegalArgumentException(
          s"Invalid bucket value: '$b' (expected an int >= 1)")
    }
    options.get("compaction.trigger-file-count").foreach { v =>
      if (v.trim.toIntOption.isEmpty)
        throw new IllegalArgumentException(
          s"Invalid compaction.trigger-file-count: '$v' " +
            "(expected a file count; <= 0 disables compaction)")
    }
    options.get("bucket.rows-warning-threshold").foreach { v =>
      if (v.trim.toLongOption.isEmpty)
        throw new IllegalArgumentException(
          s"Invalid bucket.rows-warning-threshold: '$v' " +
            "(expected a row count; <= 0 disables the warning)")
    }
    // retention-pin TTLs must parse: a typo'd value silently falling
    // back to the 7-day default would mis-state what expiry retains
    Seq("consumer.retain-millis", "streaming.identity.retain-millis")
      .foreach { k =>
        options.get(k).foreach { v =>
          if (v.trim.toLongOption.forall(_ < 0L))
            throw new IllegalArgumentException(
              s"Invalid $k: '$v' (expected a non-negative millisecond count)")
        }
      }
    options.get("source.split.target-size").foreach { v =>
      if (TableSchema.parseMemorySize(v).forall(_ <= 0L))
        throw new IllegalArgumentException(
          s"Invalid source.split.target-size: '$v' " +
            "(expected a positive size, e.g. '128mb', '1gb', or bytes)")
    }
    if (isPrimaryKeyTable && numBuckets < 1)
      throw new IllegalArgumentException(
        "Doesn't support writing dynamic bucket or cross partition table. " +
          "Set a fixed 'bucket' option >= 1 for primary-key tables.")
    val fmt = options.getOrElse("file.format", "parquet")
    if (!Seq("parquet", "orc", "avro").contains(fmt))
      throw new IllegalArgumentException(s"Unsupported file.format: $fmt")
    val engine = options.getOrElse("sort-engine", "min-heap")
    if (!Seq("min-heap", "loser-tree").contains(engine))
      throw new IllegalArgumentException(
        s"Unsupported sort-engine: $engine (expected min-heap or loser-tree)")
    // merge-engine family (table-format semantics beyond the
    // reference's shipped deduplicate; the seam itself ≙
    // `sort_merge_reader.py:78` `DeduplicateMergeFunction`).
    // Validation inspects the SAME decoded Spec the read/compaction
    // paths use (MergeFunction.specOf) — one parser, no drift.
    val mspec = mergeSpec
    if (!graft.format.MergeFunction.Engines.contains(mspec.engine))
      throw new IllegalArgumentException(
        s"Unsupported merge-engine: ${mspec.engine} (expected " +
          graft.format.MergeFunction.Engines.mkString(", ") + ")")
    if (mspec.engine != "deduplicate" && !isPrimaryKeyTable)
      throw new IllegalArgumentException(
        s"merge-engine '${mspec.engine}' requires a primary-key table")
    // LWW ordered by a data column (out-of-order ingest): must be a
    // real non-key comparable column, deduplicate engine only (other
    // engines fold runs by rules a reordering would contradict)
    mspec.seqField.foreach { sf =>
      if (!isPrimaryKeyTable) throw new IllegalArgumentException(
        "sequence.field requires a primary-key table")
      if (!names.contains(sf)) throw new IllegalArgumentException(
        s"The field $sf of 'sequence.field' is not in field list " +
          fields.fieldNames.mkString("[", ", ", "]"))
      if (primaryKeys.contains(sf) || partitionKeys.contains(sf))
        throw new IllegalArgumentException(
          "sequence.field must not be a key or partition column")
      val dt = fields(fields.fieldIndex(sf)).dataType
      if (!Seq[DataType](ByteType, ShortType, IntegerType, LongType,
          DateType, TimestampType).contains(dt))
        throw new IllegalArgumentException(
          s"sequence.field $sf has unsupported type ${dt.simpleString} " +
            "(expected an integer, date, or timestamp column)")
      if (mspec.engine != "deduplicate")
        throw new IllegalArgumentException(
          s"sequence.field is only supported with merge-engine " +
            s"'deduplicate' (got '${mspec.engine}')")
    }
    // sequence-groups (`fields.<g>.sequence-group=a,b`): per-group
    // out-of-order partial updates, partial-update engine only. The
    // group version column orders its members, so it needs the same
    // comparable types as sequence.field; sets must be disjoint or the
    // fold order between overlapping groups would be ambiguous.
    if (mspec.seqGroups.nonEmpty && mspec.engine != "partial-update")
      throw new IllegalArgumentException(
        "'fields.<col>.sequence-group' is only supported with " +
          s"merge-engine 'partial-update' (got '${mspec.engine}')")
    mspec.seqGroups.foreach { case (g, members) =>
      val k = s"fields.$g.sequence-group"
      def checkCol(c: String, role: String): Unit = {
        if (!names.contains(c)) throw new IllegalArgumentException(
          s"The $role $c of '$k' is not in field list " +
            fields.fieldNames.mkString("[", ", ", "]"))
        if (primaryKeys.contains(c) || partitionKeys.contains(c))
          throw new IllegalArgumentException(
            s"'$k': key and partition columns cannot be in a sequence group")
      }
      checkCol(g, "sequence-group column")
      if (members.isEmpty) throw new IllegalArgumentException(
        s"'$k' must name at least one member column")
      members.foreach(checkCol(_, "member"))
      if (members.contains(g)) throw new IllegalArgumentException(
        s"'$k': the group's version column $g cannot be its own member")
      if (mspec.seqGroups.exists { case (g2, m2) =>
          g2 != g && (m2.contains(g) || members.contains(g2) ||
            members.exists(m2.contains))
        })
        throw new IllegalArgumentException(
          s"'$k': sequence groups must be disjoint (no column may " +
            "belong to two groups or version another group)")
      val dt = fields(fields.fieldIndex(g)).dataType
      if (!Seq[DataType](ByteType, ShortType, IntegerType, LongType,
          DateType, TimestampType).contains(dt))
        throw new IllegalArgumentException(
          s"sequence-group column $g has unsupported type " +
            s"${dt.simpleString} (expected an integer, date, or " +
            "timestamp column)")
    }
    // specOf treats anything but 'true' as false — reject typos loudly
    options.get("ignore-delete").foreach { v =>
      if (!Seq("true", "false").contains(v.trim.toLowerCase))
        throw new IllegalArgumentException(
          s"Unsupported ignore-delete: $v (expected true/false)")
    }
    mspec.aggFns.foreach { case (colName, fn) =>
      val k = s"fields.$colName.aggregate-function"
      if (mspec.engine != "aggregation")
        throw new IllegalArgumentException(
          s"'$k' requires merge-engine 'aggregation' (got '${mspec.engine}')")
      if (!names.contains(colName))
        throw new IllegalArgumentException(
          s"The field $colName of '$k' is not in field list " +
            fields.fieldNames.mkString("[", ", ", "]"))
      if (primaryKeys.contains(colName) || partitionKeys.contains(colName))
        throw new IllegalArgumentException(
          s"'$k': key and partition columns are never aggregated")
      if (!graft.format.MergeFunction.AggFunctions.contains(fn))
        throw new IllegalArgumentException(
          s"Unsupported aggregate-function: $fn (expected " +
            graft.format.MergeFunction.AggFunctions.mkString(", ") + ")")
      val dt = fields(fields.fieldIndex(colName)).dataType
      if (!graft.format.MergeFunction.FieldAgg.validFor(fn, dt))
        throw new IllegalArgumentException(
          s"aggregate-function '$fn' does not support column $colName " +
            s"of type ${dt.simpleString}")
    }
    val strict = options.getOrElse("commit.strict-sequence", "false")
    if (!Seq("true", "false").contains(strict))
      throw new IllegalArgumentException(
        s"Unsupported commit.strict-sequence: $strict (expected true/false)")
    // reference read-parallelism knob (`java_implementation.py:315-320`):
    // accepted with the same validation so ported configs round-trip,
    // and intentionally a NO-OP — Spark schedules one task per input
    // split, which supersedes a per-reader worker pool
    options.get("max-workers").foreach { mw =>
      val n =
        try mw.trim.toInt
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"Invalid max-workers value: '$mw' (expected a positive int)") }
      if (n <= 0) throw new IllegalArgumentException(
        "max_workers must be greater than 0")
    }
    this
  }

  def toJson: String = {
    val j: JObject =
      ("id" -> id) ~
        ("fields" -> JsonMethods.parse(fields.json)) ~
        ("partitionKeys" -> partitionKeys) ~
        ("primaryKeys" -> primaryKeys) ~
        ("options" -> options) ~
        ("comment" -> comment) ~
        ("fieldIds" -> ids) ~
        ("highestFieldId" -> maxFieldId)
    JsonMethods.pretty(JsonMethods.render(j))
  }
}

object TableSchema {
  val supportedTypes: Seq[DataType] = Seq(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    BooleanType, StringType, DateType, TimestampType, BinaryType)

  private val MemorySizeRe = "^([0-9]+)\\s*(b|kb|k|mb|m|gb|g|tb|t)?$".r

  /** Paimon-style memory-size strings — `'1mb'`, `'128 mb'`, `'4kb'`,
    * bare bytes — as used by `source.split.target-size`
    * (`test_pynative_reader.py:167`). Binary multiples.
    */
  def parseMemorySize(s: String): Option[Long] =
    s.trim.toLowerCase match {
      case MemorySizeRe(num, unit) =>
        val mult = unit match {
          case null | "b" => 1L
          case "kb" | "k" => 1L << 10
          case "mb" | "m" => 1L << 20
          case "gb" | "g" => 1L << 30
          case "tb" | "t" => 1L << 40
        }
        // multiplyExact: a wrapping product could pass validation as a
        // small positive size and silently mis-pack splits
        num.toLongOption.flatMap(n =>
          try Some(Math.multiplyExact(n, mult))
          catch { case _: ArithmeticException => None })
      case _ => None
    }

  def fromJson(json: String): TableSchema = {
    implicit val fmt: Formats = DefaultFormats
    val v = JsonMethods.parse(json)
    TableSchema(
      id = (v \ "id").extract[Long],
      fields = DataType.fromJson(JsonMethods.compact(JsonMethods.render(v \ "fields")))
        .asInstanceOf[StructType],
      partitionKeys = (v \ "partitionKeys").extract[Seq[String]],
      primaryKeys = (v \ "primaryKeys").extract[Seq[String]],
      options = (v \ "options").extract[Map[String, String]],
      comment = (v \ "comment").extractOpt[String],
      fieldIds = (v \ "fieldIds").extractOpt[Seq[Int]].getOrElse(Seq.empty),
      highestFieldId = (v \ "highestFieldId").extractOpt[Int].getOrElse(-1))
  }

  /** Ids of all persisted schema versions, ascending. Schema files are
    * immutable and never deleted (each ALTER appends `schema-<id+1>`),
    * so the listing is the table's full schema lineage — id 0 is the
    * CREATE schema.
    */
  def listIds(tableDir: Path): Seq[Long] = {
    val dir = tableDir.resolve("schema")
    if (!Files.isDirectory(dir)) return Seq.empty
    val s = Files.list(dir)
    try s.iterator().asScala
      .filter(_.getFileName.toString.startsWith("schema-"))
      .flatMap(_.getFileName.toString.stripPrefix("schema-").toLongOption)
      .toSeq.sorted
    finally s.close()
  }

  /** A specific persisted schema version (None if that id was never
    * written — callers walking the lineage must tolerate gaps never
    * existing, since ids are dense by construction).
    */
  /** A schema file that stayed unparseable past the torn-read retry
    * window. Deliberately NOT IllegalStateException: the fence and
    * maintenance paths catch ISE as "merge rules changed / commit
    * conflict" and would silently absorb or misdiagnose real
    * corruption (compaction would quietly disable itself; rollback
    * would tell the operator to restore merge rules).
    */
  final class CorruptSchemaException(msg: String, cause: Throwable)
      extends RuntimeException(msg, cause)

  def loadById(tableDir: Path, id: Long): Option[TableSchema] = {
    val p = tableDir.resolve("schema").resolve(s"schema-$id")
    if (!Files.isRegularFile(p)) return None
    // save()'s no-hard-link fallback writes content non-atomically: a
    // reader racing that single write can observe partial JSON. Schema
    // files are immutable once fully written and the create-exclusive
    // protocol guarantees the content converges to exactly one value,
    // so a PARSE failure here is transient — retry briefly before
    // treating the file as genuinely corrupt. IO errors are not
    // retried: a vanished file (concurrent DROP TABLE) is a missing
    // schema like before, and any other IO failure propagates as-is.
    var last: Throwable = null
    var a = 0
    while (a < 20) {
      val body =
        try Files.readString(p)
        catch { case _: java.nio.file.NoSuchFileException => return None }
      try return Some(fromJson(body))
      catch {
        // only malformed-JSON failures are consistent with a torn read
        // (a truncated prefix of valid JSON never parses); anything
        // else — a MappingException from an incompatible field, a
        // MatchError from an unknown enum — is deterministic and would
        // just burn the full 500ms window before failing identically
        case t: com.fasterxml.jackson.core.JsonProcessingException =>
          last = t; a += 1
          try Thread.sleep(25)
          catch { case ie: InterruptedException =>
            // a read path must not swallow cancellation: restore the
            // flag and surface the (possibly transient) parse failure
            Thread.currentThread().interrupt()
            throw new CorruptSchemaException(
              s"schema-$id unparseable and retry interrupted after " +
                s"$a attempts (parse failure may be a transient torn " +
                "read)", last)
          }
        case scala.util.control.NonFatal(t) =>
          throw new CorruptSchemaException(
            s"schema-$id parsed as JSON but failed schema decoding — " +
              "not a torn read (truncated content never parses); the " +
              "file is corrupt or version-incompatible", t)
      }
    }
    throw new CorruptSchemaException(
      s"schema-$id unparseable after 20 attempts over 500ms — not a " +
        "racing writer (content converges under the create-exclusive " +
        "protocol); the schema file is corrupt", last)
  }

  def load(tableDir: Path): Option[TableSchema] =
    // one listing implementation (listIds closes its stream and
    // tolerates foreign files) — load is just "latest of the lineage"
    listIds(tableDir).lastOption.flatMap(id => loadById(tableDir, id))

  /** Create-EXCLUSIVE publish (hard-link, the AtomicPublisher.local
    * pattern): every save writes a brand-new id — CREATE writes
    * schema-0, each ALTER appends the next id — so a collision always
    * means a concurrent DDL computed the same id from the same loaded
    * base. A replacing rename here would let the loser silently
    * overwrite the winner's contents while both DDLs report success
    * (and the winner's marker snapshot would vouch for options its
    * ALTER never wrote); failing loudly makes the loser reload and
    * retry on the advanced lineage.
    */
  def save(tableDir: Path, schema: TableSchema): Unit = {
    val dir = tableDir.resolve("schema")
    Files.createDirectories(dir)
    val target = dir.resolve(s"schema-${schema.id}")
    val tmp = Files.createTempFile(dir, ".schema", ".tmp")
    try {
      Files.writeString(tmp, schema.toJson)
      try Files.createLink(target, tmp)
      catch { case _: UnsupportedOperationException |
                   _: java.nio.file.FileSystemException
          if !Files.exists(target) =>
        // no-hard-link filesystem (CIFS/FAT/some FUSE): fall back to
        // O_EXCL creation — same create-exclusive guarantee, at the
        // cost of non-atomic CONTENT (a reader racing the single
        // write of this KB-scale JSON may see a partial file; the
        // link path has no such window)
        Files.write(target, Files.readAllBytes(tmp),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
      }
      Files.deleteIfExists(tmp)
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        try Files.deleteIfExists(tmp) catch { case _: Throwable => () }
        throw new IllegalStateException(
          s"schema-${schema.id} already exists: a concurrent DDL " +
            "published the same schema version first — reload the " +
            "table and retry the statement")
      case t: Throwable =>
        // a failed write/link (disk full, interrupt) must not strand
        // .schema*.tmp files in the schema dir forever
        try Files.deleteIfExists(tmp) catch { case _: Throwable => () }
        throw t
    }
  }
}
