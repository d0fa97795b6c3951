package graft.connector

import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, NamespaceAlreadyExistsException, TableAlreadyExistsException}
import graft.core.TableSchema
import java.nio.file.{Files, Path, Paths}
import java.util
import scala.jdk.CollectionConverters._

/** Filesystem warehouse catalog ≙ reference `Catalog.create({'warehouse':
  * dir})` (`pypaimon/api/catalog.py:24-45`): databases are `<db>.db/`
  * directories, tables are subdirectories owning schema/snapshot/
  * manifest/data files. Registered via
  * `spark.sql.catalog.<name>=graft.connector.GraftCatalog` +
  * `spark.sql.catalog.<name>.warehouse=<dir>`.
  *
  * Primary keys (a concept Spark DDL lacks) arrive as the table property
  * `primary-key` (comma-separated), matching the reference's
  * `Schema(primary_keys=[...])`.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with FunctionCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  /** Maintenance procedures under the virtual `sys` namespace:
    * `CALL graft.sys.compact('db.t')` etc. — see [[GraftProcedures]].
    */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace().sameElements(Array("sys")),
      s"Procedures live under the 'sys' namespace " +
        s"(CALL $catalogName.sys.<name>), got ${ident}")
    GraftProcedures.load(this, ident.name())
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("sys")))
      GraftProcedures.names.map(n => Identifier.of(namespace, n)).toArray
    else Array.empty

  /** Procedure-side table resolution: 'db.table' → (dir, schema). A
    * leading segment equal to this catalog's name is accepted and
    * stripped — users naturally pass the identifier they query with
    * ('graft.default.t'); anything else with >1 dot is rejected with
    * the expected form rather than a misleading not-found.
    */
  private[connector] def resolveForMaintenance(
      tableArg: String): (Path, TableSchema) = {
    // strip ONE leading '<catalogName>.' if present, then split at the
    // FIRST remaining dot — so dotted table names stay addressable
    // ('default.a.b' → db=default, table=a.b) and a database literally
    // named like the catalog is reachable as 'graft.graft.t'
    val local = if (tableArg.startsWith(catalogName + "."))
      tableArg.stripPrefix(catalogName + ".") else tableArg
    val ident = local.split("\\.", 2) match {
      case Array(db, t) if db.nonEmpty && t.nonEmpty =>
        Identifier.of(Array(db), t)
      case _ => throw new IllegalArgumentException(
        s"Invalid table argument '$tableArg' " +
          s"(expected 'database.table' or '$catalogName.database.table')")
    }
    val dir = tableDir(ident)
    TableSchema.load(dir) match {
      case Some(s) => (dir, s)
      case None => throw new NoSuchTableException(ident)
    }
  }

  /** Custom functions under the virtual `sys` namespace:
    * `SELECT graft.sys.vec_dot(a, b)` etc. — see [[GraftFunctions]].
    */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("sys")))
      GraftFunctions.names.map(n => Identifier.of(namespace, n)).toArray
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction = {
    // storage-partitioned joins resolve the bucket transform at the
    // EMPTY namespace (V2ExpressionUtils.loadV2FunctionOpt)
    if (ident.namespace().isEmpty && ident.name() == "bucket")
      return GraftFunctions.load("bucket")
    if (!ident.namespace().sameElements(Array("sys")))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)
    try GraftFunctions.load(ident.name())
    catch { case _: NoSuchElementException =>
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)
    }
  }

  private var catalogName: String = _
  private var warehouse: Path = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val wh = options.get("warehouse")
    require(wh != null, s"Catalog $name requires option 'warehouse'")
    warehouse = Paths.get(wh)
    Files.createDirectories(warehouse)
  }

  override def name(): String = catalogName

  private def dbDir(ns: Array[String]): Path = {
    require(ns.length == 1, s"Only single-level namespaces supported, got ${ns.mkString(".")}")
    GraftCatalog.requirePathSafeComponent(ns(0), "namespace")
    warehouse.resolve(ns(0) + ".db")
  }

  private def tableDir(ident: Identifier): Path = {
    GraftCatalog.requirePathSafeComponent(ident.name(), "table name")
    dbDir(ident.namespace()).resolve(ident.name())
  }

  // ----- namespaces ------------------------------------------------------

  // Files.list streams hold a directory descriptor until closed — the
  // listing verbs here close them explicitly (a long-lived driver
  // serving many SHOW TABLES/NAMESPACES otherwise leaks one per call)
  private def listDir[T](dir: Path)(f: Iterator[Path] => T): T = {
    val s = Files.list(dir)
    try f(s.iterator().asScala) finally s.close()
  }

  override def listNamespaces(): Array[Array[String]] =
    listDir(warehouse)(_
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.endsWith(".db"))
      .map(p => Array(p.getFileName.toString.stripSuffix(".db")))
      .toArray)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && Files.isDirectory(dbDir(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Map.empty[String, String].asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    if (namespaceExists(namespace)) throw new NamespaceAlreadyExistsException(namespace)
    Files.createDirectories(dbDir(namespace))
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("alterNamespace")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) return false
    val dir = dbDir(namespace)
    val hasTables = listDir(dir)(_.nonEmpty)
    if (hasTables && !cascade)
      throw new IllegalStateException(s"Namespace ${namespace.mkString(".")} is not empty")
    // route each table through dropTable: tables whose data plane is
    // remote (io != local) purge their remote prefix there — a plain
    // local deleteRecursively would leak every remote object and a
    // later CREATE of the same name would resurrect the dropped data
    if (cascade) listTables(namespace).foreach(dropTable)
    deleteRecursively(dir)
    true
  }

  // ----- tables ----------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    listDir(dbDir(namespace))(_
      .filter(Files.isDirectory(_))
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray)
  }

  override def loadTable(ident: Identifier): Table = {
    // System table `t$changelog`: raw KV rows of a PK table with
    // _row_kind/_sequence_number as ordinary columns — the
    // changelog-producer=input stream, batch- and stream-readable.
    if (ident.name().endsWith("$changelog")) {
      val base = Identifier.of(ident.namespace(),
        ident.name().stripSuffix("$changelog"))
      val dir = tableDir(base)
      val ts = TableSchema.load(dir).getOrElse(throw new NoSuchTableException(base))
      require(ts.isPrimaryKeyTable,
        s"$$changelog view requires a primary-key table: ${base}")
      return new GraftTable(ident, dir, ts, changelogView = true)
    }
    if (ident.name().endsWith("$snapshots")) {
      val base = Identifier.of(ident.namespace(),
        ident.name().stripSuffix("$snapshots"))
      val dir = tableDir(base)
      val ts = TableSchema.load(dir).getOrElse(throw new NoSuchTableException(base))
      return new StaticRowsTable(ident.toString, MetaTables.snapshotsSchema,
        () => MetaTables.snapshotRows(dir, ts.ioSpec))
    }
    if (ident.name().endsWith("$partitions")) {
      val base = Identifier.of(ident.namespace(),
        ident.name().stripSuffix("$partitions"))
      val dir = tableDir(base)
      val ts = TableSchema.load(dir).getOrElse(throw new NoSuchTableException(base))
      return new StaticRowsTable(ident.toString, MetaTables.partitionsSchema,
        () => MetaTables.partitionRows(dir, ts))
    }
    if (ident.name().endsWith("$files")) {
      val base = Identifier.of(ident.namespace(),
        ident.name().stripSuffix("$files"))
      val dir = tableDir(base)
      val ts = TableSchema.load(dir).getOrElse(throw new NoSuchTableException(base))
      return new StaticRowsTable(ident.toString, MetaTables.filesSchema,
        () => MetaTables.fileRows(dir, ts))
    }
    if (ident.name().endsWith("$tags")) {
      val base = Identifier.of(ident.namespace(),
        ident.name().stripSuffix("$tags"))
      val dir = tableDir(base)
      val ts = TableSchema.load(dir).getOrElse(throw new NoSuchTableException(base))
      return new StaticRowsTable(ident.toString, MetaTables.tagsSchema,
        () => MetaTables.tagRows(dir, ts.ioSpec))
    }
    if (ident.name().endsWith("$options")) {
      val base = Identifier.of(ident.namespace(),
        ident.name().stripSuffix("$options"))
      val dir = tableDir(base)
      val ts = TableSchema.load(dir).getOrElse(throw new NoSuchTableException(base))
      return new StaticRowsTable(ident.toString, MetaTables.optionsSchema,
        () => MetaTables.optionRows(
          TableSchema.load(dir).getOrElse(ts))) // re-read: ALTERs visible
    }
    if (ident.name().endsWith("$schemas")) {
      val base = Identifier.of(ident.namespace(),
        ident.name().stripSuffix("$schemas"))
      val dir = tableDir(base)
      TableSchema.load(dir).getOrElse(throw new NoSuchTableException(base))
      return new StaticRowsTable(ident.toString, MetaTables.schemasSchema,
        () => MetaTables.schemaRows(dir))
    }
    if (ident.name().endsWith("$consumers")) {
      val base = Identifier.of(ident.namespace(),
        ident.name().stripSuffix("$consumers"))
      val dir = tableDir(base)
      val ts = TableSchema.load(dir).getOrElse(throw new NoSuchTableException(base))
      return new StaticRowsTable(ident.toString, MetaTables.consumersSchema,
        () => MetaTables.consumerRows(dir, ts.ioSpec))
    }
    if (ident.name().endsWith("$manifests")) {
      val base = Identifier.of(ident.namespace(),
        ident.name().stripSuffix("$manifests"))
      val dir = tableDir(base)
      val ts = TableSchema.load(dir).getOrElse(throw new NoSuchTableException(base))
      return new StaticRowsTable(ident.toString, MetaTables.manifestsSchema,
        () => MetaTables.manifestRows(dir, ts.ioSpec))
    }
    val dir = tableDir(ident)
    TableSchema.load(dir) match {
      case Some(schema) => new GraftTable(ident, dir, schema)
      case None => throw new NoSuchTableException(ident)
    }
  }

  /** Time travel: `SELECT ... FROM t VERSION AS OF <snapshotId | 'tag'>`.
    * A non-numeric version names a TAG; tagged snapshots resolve even
    * after expiry (the tag file carries a snapshot copy).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident)
    TableSchema.load(dir) match {
      case Some(schema) =>
        val sm = new graft.format.SnapshotManager(dir,
          io = graft.format.FileIO.resolve(schema.ioSpec))
        version.toLongOption match {
          case Some(id) =>
            // a tag pinning this id keeps numeric references valid
            // after the snapshot's own JSON expires (the scan resolves
            // through the tag copy) — recorded `VERSION AS OF <id>`
            // notebooks keep working exactly like the tag name does
            require(sm.existingSnapshotIds.contains(id) ||
                sm.listTags.exists(_._2.id == id),
              s"Snapshot $version does not exist for table $ident " +
                "(never created, or expired by expireSnapshots)")
            new GraftTable(ident, dir, schema, Some(id))
          case None =>
            val tagged = sm.tag(version).getOrElse(
              throw new IllegalArgumentException(
                s"Tag '$version' does not exist for table $ident " +
                  s"(known tags: ${sm.listTags.map(_._1).mkString(", ")})"))
            new GraftTable(ident, dir, schema, Some(tagged.id))
        }
      case None => throw new NoSuchTableException(ident)
    }
  }

  /** Time travel: `TIMESTAMP AS OF` — latest snapshot at or before the
    * given time (micros since epoch, per the DSv2 contract).
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val dir = tableDir(ident)
    TableSchema.load(dir) match {
      case Some(schema) =>
        val sm = new graft.format.SnapshotManager(dir,
          io = graft.format.FileIO.resolve(schema.ioSpec))
        val tsMillis = timestampMicros / 1000
        // Enumerate only snapshots that still exist: expireSnapshots
        // removes low ids, so `1L to latest` would hit missing files.
        // A concurrent expire can still delete one between the listing
        // and the read (TOCTOU) — skip those instead of surfacing a raw
        // NoSuchFileException; the friendly retention error below stays
        // for the no-usable-snapshot case.
        val snaps = sm.existingSnapshotIds.flatMap { sid =>
          try Some(sm.snapshot(sid))
          catch { case _: java.nio.file.NoSuchFileException => None }
        }
        val id = snaps.filter(_.timeMillis <= tsMillis)
          .map(_.id).maxOption.getOrElse {
            val oldest = snaps.headOption
            oldest match {
              case Some(o) if o.timeMillis > tsMillis && o.id > 1 =>
                throw new IllegalArgumentException(
                  s"Timestamp $tsMillis predates the oldest retained " +
                    s"snapshot ${o.id} of $ident (time ${o.timeMillis}); " +
                    "earlier history was removed by expireSnapshots")
              case _ =>
                throw new IllegalArgumentException(
                  s"No snapshot of $ident at or before timestamp $tsMillis")
            }
          }
        new GraftTable(ident, dir, schema, Some(id))
      case None => throw new NoSuchTableException(ident)
    }
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    val dir = tableDir(ident)
    if (!namespaceExists(ident.namespace())) throw new NoSuchNamespaceException(ident.namespace())
    if (TableSchema.load(dir).isDefined) throw new TableAlreadyExistsException(ident)
    val partitionKeys = partitions.map { t =>
      require(t.name() == "identity",
        s"Only identity partition transforms supported, got $t")
      t.references()(0).fieldNames().mkString(".")
    }.toSeq
    val props = properties.asScala.toMap
    val primaryKeys = props.get("primary-key").orElse(props.get("primary_keys"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)
    val options = props -- Seq("primary-key", "primary_keys", "comment",
      TableCatalog.PROP_COMMENT, TableCatalog.PROP_PROVIDER, TableCatalog.PROP_LOCATION,
      TableCatalog.PROP_OWNER, TableCatalog.PROP_EXTERNAL)
    // reference parity (`pypaimon/py4j/util/java_utils.py:86-91`): a
    // NULL-typed column (pyarrow `null`, Spark VOID) is coerced to
    // STRING with a warning instead of rejected — an all-null column in
    // an inferred source schema is almost always a string column
    val coerced = StructType(schema.fields.map { f =>
      if (f.dataType == org.apache.spark.sql.types.NullType) {
        System.err.println(s"WARN: The type of column '${f.name}' is null, " +
          "and it will be converted to string type by default. Please check " +
          "if the original type is string. If not, please manually specify " +
          s"the type of '${f.name}'.")
        f.copy(dataType = org.apache.spark.sql.types.StringType)
      } else f
    })
    val ts = TableSchema(0L, coerced, partitionKeys, primaryKeys, options,
      props.get(TableCatalog.PROP_COMMENT)).validate()
    Files.createDirectories(dir)
    TableSchema.save(dir, ts)
    new GraftTable(ident, dir, ts)
  }

  /** Schema evolution via stable field ids (≙ the reference's
    * `DataField.id` index mapping, `data_file_record_reader.py:104-133`):
    * ADD COLUMN (fresh id, older files null-fill at read), RENAME
    * COLUMN (id kept — old parquet files keep serving the data under
    * their physical name), DROP COLUMN (id retired, never reused, so a
    * later re-ADD of the same name cannot resurrect old values), ALTER
    * COLUMN TYPE for widening casts (byte→short→int→long,
    * float→double; parquet only — old files decode at their stored
    * type and upcast at read, row-wise and columnar), and
    * table-property changes. Narrowing / cross-family type changes are
    * rejected; partition and primary-key columns are immutable (their
    * names and comparators are baked into directory layout / merge
    * semantics).
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tableDir(ident)
    val ts = TableSchema.load(dir).getOrElse(throw new NoSuchTableException(ident))
    // fence baseline, captured BEFORE the first data-aware guard reads
    // the snapshot state: every snapshot beyond it is a racing commit
    // the marker revalidation judges by its schema id. Capturing it
    // after the guards (the first cut did) left a gap — a commit
    // landing between a guard's snapshot read and the baseline read
    // would be inside the baseline and escape revalidation entirely.
    // Armed lazily by the guard branches themselves (each calls
    // armFenceBaseline() before its snapshot read), so only statements
    // that actually change a merge rule — not renames, comments, ADD
    // COLUMNs, or no-op restatements of the stored fold — pay a
    // snapshot-dir listing on a remote data plane.
    var preSaveSnapId = 0L
    var fenceArmed = false
    def armFenceBaseline(): Unit = if (!fenceArmed) {
      fenceArmed = true
      preSaveSnapId = new graft.format.SnapshotManager(dir,
        io = graft.format.FileIO.resolve(ts.ioSpec))
        .latestSnapshotId.getOrElse(0L)
    }
    var fields = ts.fields
    var ids = ts.ids
    var highest = ts.maxFieldId
    var options = ts.options
    var comment = ts.comment
    // merge-rule properties whose change passed their data-aware guard
    // below; the schema save for these is fenced with a marker snapshot
    // (see publishMergeRuleMarker) so a concurrently-committing writer
    // cannot slip old-fold data between check and save
    val fencedProps = scala.collection.mutable.LinkedHashSet.empty[String]
    def structural(name: String): Boolean =
      ts.partitionKeys.contains(name) || ts.primaryKeys.contains(name)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames().length == 1,
          "Nested column additions not supported")
        require(add.isNullable, "Added columns must be nullable")
        // a duplicate name would collapse the field-id map (idMap is
        // name-keyed) and make every later fieldIndex bind ambiguously
        require(!fields.fieldNames.contains(add.fieldNames()(0)),
          s"Column ${add.fieldNames()(0)} already exists")
        fields = StructType(fields.fields :+
          org.apache.spark.sql.types.StructField(
            add.fieldNames()(0), add.dataType(), nullable = true))
        highest += 1
        ids = ids :+ highest
      case rn: TableChange.RenameColumn =>
        require(rn.fieldNames().length == 1, "Nested renames not supported")
        val from = rn.fieldNames()(0)
        require(fields.fieldNames.contains(from), s"Column $from not found")
        require(!structural(from),
          "Cannot rename partition or primary-key columns")
        require(!fields.fieldNames.contains(rn.newName()),
          s"Column ${rn.newName()} already exists")
        fields = StructType(fields.fields.map(f =>
          if (f.name == from) f.copy(name = rn.newName()) else f))
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames().length == 1, "Nested drops not supported")
        val name = del.fieldNames()(0)
        require(fields.fieldNames.contains(name), s"Column $name not found")
        require(!structural(name),
          "Cannot drop partition or primary-key columns")
        require(fields.length > 1, "Cannot drop the last column")
        val at = fields.fieldIndex(name)
        fields = StructType(fields.fields.patch(at, Nil, 1))
        ids = ids.patch(at, Nil, 1)
      case up: TableChange.UpdateColumnType =>
        require(up.fieldNames().length == 1, "Nested type changes not supported")
        val name = up.fieldNames()(0)
        require(fields.fieldNames.contains(name), s"Column $name not found")
        require(!structural(name),
          "Cannot change the type of partition or primary-key columns")
        val at = fields.fieldIndex(name)
        val from = fields.fields(at).dataType
        require(graft.format.ParquetIO.widens(from, up.newDataType()),
          s"Cannot change column $name from ${from.simpleString} to " +
            s"${up.newDataType().simpleString}: only widening casts " +
            "(tinyint->smallint->int->bigint, float->double, and the " +
            "exact cross-family casts tinyint/smallint->float/double, " +
            "int->double) are supported")
        fields = StructType(fields.fields.patch(at,
          Seq(fields.fields(at).copy(dataType = up.newDataType())), 1))
      case set: TableChange.SetProperty =>
        // structural options are baked into the data layout: changing
        // `bucket` would split existing keys across merge groups
        // (overwritten rows resurrect, bucket pruning skips old
        // files); changing `io` or `primary-key` orphans every
        // existing snapshot/manifest/data file. MERGE-SEMANTICS options
        // are equally baked in — flipping merge-engine / sequence.field
        // / ignore-delete / a field's aggregate-function would re-fold
        // every already-committed run under different rules (silent
        // history reinterpretation, e.g. a dedup table re-read as sums)
        require(!GraftCatalog.isStructuralProperty(set.property()) ||
          GraftCatalog.isStructuralNoop(set.property(), set.value(),
            ts.options.get(set.property())),
          s"Table property '${set.property()}' is structural " +
            "(baked into the existing data layout / merge semantics) " +
            "and cannot change")
        GraftCatalog.fieldAggColumn(set.property()).foreach { c =>
          import graft.core.MergeRuleProps.normAgg
          // no-op: re-stating the stored fold, or stating the engine
          // default while unconfigured (config-management pushes) —
          // the SAME normalization the commit/rollback fence compares
          // by (MergeRuleProps.changedBetween), so guard and fence
          // can never disagree on what a no-op is
          val noop = normAgg(ts.options.get(set.property())) ==
            normAgg(Some(set.value()))
          if (!noop) {
            armFenceBaseline()
            // the in-flight name→id view: a same-call ADD or RENAME has
            // already updated fields/ids when the SET is processed
            val fid = fields.fieldNames.zip(ids).toMap.get(c)
            requireFoldChangeSafe(dir, ts, c, set.property(), fid)
            fencedProps += set.property()
          }
        }
        GraftCatalog.fieldSeqGroupColumn(set.property()).foreach { c =>
          import graft.core.MergeRuleProps.{normGroup, parseGroupMembers}
          val newM = parseGroupMembers(set.value())
          val curM = ts.options.get(set.property()).map(parseGroupMembers)
          // member lists are SETS — a re-statement in different order
          // or spacing changes nothing and stays allowed (normGroup:
          // the same comparison the fence uses)
          if (normGroup(ts.options.get(set.property())) !=
              normGroup(Some(set.value()))) {
            val inFlight = fields.fieldNames.zip(ids).toMap
            // every involved column's history is reinterpreted by a
            // group change: the version column, the NEW members, and
            // any OLD member leaving the group (it reverts to the
            // plain last-non-null fold)
            val involved =
              (c +: (newM ++ curM.toSeq.flatten)).distinct
            armFenceBaseline()
            val pairs = involved.map(col => col -> inFlight.get(col))
            requireMergeRuleChangeSafe(dir, ts, pairs, set.property())
            fencedProps += set.property()
          }
        }
        // `COMMENT ON TABLE t IS NULL` arrives as SET comment -> ""
        // in Spark 4.1 (other clients emit removeProperty, handled
        // below): an empty comment IS no comment
        if (set.property() == TableCatalog.PROP_COMMENT)
          comment = Some(set.value()).filter(_.nonEmpty)
        else options += (set.property() -> set.value())
      case rm: TableChange.RemoveProperty =>
        require(!GraftCatalog.isStructuralProperty(rm.property())
            || !ts.options.contains(rm.property()),
          s"Table property '${rm.property()}' is structural and " +
            "cannot be removed")
        // UNSET of a configured fold is a fold CHANGE (back to the
        // engine default) — same re-fold hazard as SET. Symmetric
        // no-op: unsetting a stored value that IS the engine default
        // changes nothing and stays allowed (idempotent config removal)
        GraftCatalog.fieldAggColumn(rm.property()).foreach { c =>
          import graft.core.MergeRuleProps.normAgg
          if (normAgg(ts.options.get(rm.property())) != normAgg(None)) {
            armFenceBaseline()
            val fid = fields.fieldNames.zip(ids).toMap.get(c)
            requireFoldChangeSafe(dir, ts, c, rm.property(), fid)
            fencedProps += rm.property()
          }
        }
        GraftCatalog.fieldSeqGroupColumn(rm.property()).foreach { c =>
          // UNSET dissolves the group: the version column and every
          // member revert to plain folds over their committed history
          ts.options.get(rm.property()).foreach { cur =>
            val inFlight = fields.fieldNames.zip(ids).toMap
            val involved =
              (c +: graft.format.MergeFunction.parseGroupMembers(cur))
                .distinct
            armFenceBaseline()
            val pairs = involved.map(col => col -> inFlight.get(col))
            requireMergeRuleChangeSafe(dir, ts, pairs, rm.property())
            fencedProps += rm.property()
          }
        }
        // `COMMENT ON TABLE t IS NULL` arrives as
        // removeProperty("comment") — the comment lives in its own
        // field, so the options removal below would silently no-op
        if (rm.property() == TableCatalog.PROP_COMMENT) comment = None
        options -= rm.property()
      case other => throw new UnsupportedOperationException(
        s"Unsupported table change: $other")
    }
    val next = TableSchema(ts.id + 1, fields, ts.partitionKeys,
      ts.primaryKeys, options, comment, ids, highest).validate()
    TableSchema.save(dir, next)
    if (fencedProps.nonEmpty)
      publishMergeRuleMarker(dir, ts, next, preSaveSnapId,
        fencedProps.toSet)
    new GraftTable(ident, dir, next)
  }

  /** ALTER-side half of the merge-rule fence (see
    * [[graft.format.MergeRuleFence]] for the full protocol). After the
    * merge-rule-changing schema is saved, publish a `SCHEMA` marker
    * snapshot through the same create-exclusive publish data commits
    * use, re-judging racing commits on every attempt. The marker
    * serializes the ALTER against concurrent writers: a data commit
    * that slipped in between the pre-save guard and the schema save
    * either (a) takes the next snapshot id first, so our publish
    * attempt loses and the revalidation sees it, or (b) publishes
    * after our marker, in which case its own commit-time fence sees
    * the advanced lineage and rejects it. `SCHEMA` snapshots carry the
    * base's manifests verbatim (zero file delta), so changelog/
    * incremental readers — which act on APPEND kinds only — skip them
    * by construction.
    *
    * Aborting NEVER deletes the saved schema file (schema files are
    * immutable and never deleted — an in-flight writer may have loaded
    * it, and deleting would dangle its snapshot's evolution mapping
    * and let a later ALTER reuse the id with different contents).
    * Instead the abort appends a COUNTER-SCHEMA restoring the
    * pre-ALTER rules: the racer's old-rule rows are valid again under
    * the restored rules, and any writer that loaded the retracted
    * schema is fenced by the counter-schema's own lineage diff.
    */
  private def publishMergeRuleMarker(dir: Path, ts: TableSchema,
      next: TableSchema, preSaveSnapId: Long,
      changedProps: Set[String]): Unit = {
    val prop = changedProps.mkString(", ")
    import graft.format.{FileIO, Snapshot, SnapshotManager}
    GraftCatalog.alterFenceTestHook()
    val sm = new SnapshotManager(dir, io = FileIO.resolve(next.ioSpec))
    def marker(base: Option[Snapshot], schemaId: Long): Snapshot = Snapshot(
      id = base.map(_.id + 1).getOrElse(1L),
      schemaId = schemaId,
      commitKind = "SCHEMA",
      timeMillis = System.currentTimeMillis(),
      manifests = base.map(_.manifests).getOrElse(Seq.empty),
      lastSequenceNumber = base.map(_.lastSequenceNumber).getOrElse(0L),
      totalRecordCount = base.map(_.totalRecordCount).getOrElse(0L))
    // Racing commits are judged by the schema they WROTE UNDER, not by
    // the column-history guard (which cannot tell a new-rules writer
    // from an old-rules one): a snapshot beyond the pre-save baseline
    // carrying an OLDER schema id slipped past the commit fence (its
    // lineage check ran before our save), so the ALTER must yield; one
    // carrying OUR schema id (or newer) already writes under the new
    // rules and is no conflict. ROLLBACK snapshots fail the check too,
    // correctly: a restore resurrects committed history the new rules
    // would reinterpret.
    // zero-delta SCHEMA markers carry no data: they are neither
    // violators (nothing to reinterpret) nor retracted-rules writers
    // worth warning about
    def racersBeyondBaseline(): Seq[(Long, Snapshot)] =
      sm.existingSnapshotIds.filter(_ > preSaveSnapId)
        .flatMap(id =>
          try Some(id -> sm.snapshot(id))
          catch { case _: java.nio.file.NoSuchFileException =>
            None // expired between listing and read — not a live racer
          })
        .filter(_._2.commitKind != "SCHEMA")
    def requireNoOldRuleRacers(): Unit = {
      val violators = racersBeyondBaseline().filter(_._2.schemaId < next.id)
      if (violators.nonEmpty) {
        // Counter-schema: restore the PRE-ALTER value of every
        // merge-rule property this statement changed, on top of the
        // CURRENT latest schema — not on top of the stale `ts`: a
        // concurrent DDL may have built on the retracted schema (new
        // columns, higher field ids), and rebuilding from `ts` would
        // silently revert its changes and re-lower maxFieldId under
        // ids it allocated. Non-merge-rule parts of THIS statement are
        // preserved too (they reinterpret nothing). The save retries
        // on same-id DDL collisions like every other contention site.
        var counterId = -1L
        var saved = false
        var a = 0
        while (!saved && a < 100) {
          val cur = TableSchema.load(dir).getOrElse(ts)
          // restore ONLY the properties THIS statement changed — a
          // concurrent DDL may have legitimately changed a different
          // merge-rule property in the meantime
          val restored = changedProps
            .foldLeft(cur.options) { (opts, k) =>
              ts.options.get(k) match {
                case Some(v) => opts + (k -> v)
                case None => opts - k
              }
            }
          val counter = cur.copy(id = cur.id + 1, options = restored)
          counterId = counter.id
          try { TableSchema.save(dir, counter); saved = true }
          catch { case _: IllegalStateException => a += 1 } // id taken
        }
        if (!saved) throw new IllegalStateException(
          s"Cannot change table property '$prop': commit(s) " +
            s"${violators.map(_._1).mkString(", ")} landed under the " +
            "previous merge rules while this ALTER was publishing, AND " +
            "the restoring counter-schema lost 100 consecutive DDL " +
            "races — the retracted rules are still current. Stop " +
            "concurrent DDL and unset the property manually.")
        var landed = false
        a = 0
        while (!landed && a < 100) {
          landed = sm.tryCommitSnapshot(
            marker(sm.latestSnapshot, counterId))
          a += 1
        }
        // re-list AFTER the counter save for the warning: once the
        // counter SCHEMA is persisted, a retracted-schema writer nets
        // against it and rejects, so this listing is the complete set
        // of commits that ever wrote under the retracted rules (the
        // pre-abort listing would miss one landing in between). The
        // completeness claim needs only the counter-SCHEMA save above
        // (every commit attempt re-reads the lineage), but when the
        // marker-publish loop ALSO exhausted its attempts the table is
        // under a commit storm and this single listing may itself race
        // a still-landing retracted-rules writer — present it as
        // possibly incomplete then instead of authoritative.
        // retracted-rules writers only: schemaId >= counterId means the
        // commit loaded the restoring counter schema (or later) and
        // wrote under the RESTORED rules — listing it would tell the
        // operator to remediate a commit that needs nothing
        val newRacers = racersBeyondBaseline()
          .filter(r => r._2.schemaId >= next.id &&
            r._2.schemaId < counterId)
        throw new IllegalStateException(
          s"Cannot change table property '$prop': commit(s) " +
            s"${violators.map(_._1).mkString(", ")} landed under the " +
            "previous merge rules while this ALTER was publishing — " +
            "their rows carry committed history the new rules would " +
            "reinterpret. The change was rolled back by schema " +
            s"$counterId restoring the previous rules." +
            (if (!landed)
              " NOTE: the counter-schema's marker snapshot lost 100 " +
                "consecutive publish races (commit storm); the restored " +
                "rules stand via the schema lineage, but the racer " +
                "listing below may be incomplete." else "") +
            (if (newRacers.nonEmpty)
              s" WARNING: commit(s) ${newRacers.map(_._1).mkString(", ")} " +
                (if (landed) "" else "(possibly among others) ") +
                "already wrote under the retracted rules; compact and " +
                "re-check the affected columns before retrying."
            else if (landed)
              " The racing rows now count as committed history, so " +
                "re-applying the change is subject to the usual guard " +
                "(allowed only on an empty table or a freshly added " +
                "column)."
            else
              " No commit under the retracted rules was observed, but " +
                "under the storm one may still land — re-check before " +
                "retrying the change."))
      }
    }
    var attempt = 0
    while (attempt < 100) {
      requireNoOldRuleRacers()
      if (sm.tryCommitSnapshot(marker(sm.latestSnapshot, next.id))) return
      attempt += 1
    }
    // a 100-round storm: every id was taken by someone else, and the
    // LAST winner postdates the last in-loop check — re-judge before
    // concluding. A clean final check means every racer wrote under
    // the new schema; the lineage alone then fences any still-in-
    // flight old-schema writer (each commit attempt re-reads it), so
    // the schema stands and only the marker is abandoned.
    requireNoOldRuleRacers()
    throw new IllegalStateException(
      s"ALTER fence: gave up publishing the merge-rule marker snapshot " +
        s"for '$prop' after 100 attempts (commit storm); the schema " +
        "change stands — every racing commit wrote under it")
  }

  /** Guard against silent history reinterpretation: changing (or
    * unsetting) `fields.<col>.aggregate-function` re-folds the column's
    * un-compacted committed runs under the NEW function on the next
    * merge/compaction — the result would depend on whether compaction
    * happened to race the ALTER. The change is allowed only while it
    * provably cannot reinterpret anything:
    *   - the table has no committed rows at all, or
    *   - the column was added post-CREATE (ADD COLUMN workflow) and no
    *     commit has landed since the schema that introduced it — every
    *     committed file null-fills the column, and every fold maps
    *     all-null history identically.
    *
    * The historical TOCTOU window (a write committing between this
    * check and the schema save) is CLOSED by the two-sided fence: the
    * ALTER publishes a `SCHEMA` marker snapshot with per-attempt
    * revalidation ([[publishMergeRuleMarker]]) and every commit rejects
    * when the schema lineage gained a merge-rule change after the write
    * began ([[graft.format.MergeRuleFence]]). DROP COLUMN + re-ADD of the same name is
    * conservatively rejected too (the lineage walk finds the retired
    * era's schema), though field-id retirement means the old values
    * could never resurrect.
    */
  private def requireFoldChangeSafe(dir: Path, ts: TableSchema,
      col: String, prop: String, fieldId: Option[Int]): Unit =
    requireMergeRuleChangeSafe(dir, ts, Seq(col -> fieldId), prop)

  /** Multi-column variant: ONE snapshot read and ONE schema-lineage
    * walk guard every involved column (a sequence-group change touches
    * the version column and each member — per-column walks would cost
    * O(columns × schemas) remote reads on an object-store data plane).
    */
  private def requireMergeRuleChangeSafe(dir: Path, ts: TableSchema,
      cols: Seq[(String, Option[Int])], prop: String): Unit =
    mergeRuleGuard(dir, ts.ioSpec, cols, prop)

  /** The guard body, ioSpec-keyed so the marker publisher can re-run it
    * against the post-save table state on every publish attempt.
    */
  private def mergeRuleGuard(dir: Path, ioSpec: String,
      cols: Seq[(String, Option[Int])], prop: String): Unit = {
    val sm = new graft.format.SnapshotManager(dir,
      io = graft.format.FileIO.resolve(ioSpec))
    val latest = sm.latestSnapshot
    if (latest.forall(_.totalRecordCount == 0L)) return // no committed rows
    // load the persisted schema lineage ONCE; 0 = CREATE schema
    lazy val lineage = TableSchema.listIds(dir)
      .flatMap(id => TableSchema.loadById(dir, id).map(id -> _))
    cols.foreach { case (col, fieldId) =>
      // An unknown column (no field id even in the in-flight ALTER
      // view) is rejected by validate() below — nothing to guard here.
      fieldId.foreach { fid =>
        // First schema version that contains the column's FIELD ID.
        // Ids, not names: RENAME COLUMN keeps the id, so a renamed
        // data-bearing column must NOT look like a fresh post-ADD one
        // (its committed values serve under the new name via the id
        // mapping — exactly the history a rule change would
        // reinterpret). Id absent from every persisted schema ⇒ the
        // column is being added in this very ALTER call — brand new,
        // trivially safe.
        lineage.find(_._2.ids.contains(fid)).map(_._1).foreach { intro =>
          val safe = intro > 0L && latest.exists(_.schemaId < intro)
          require(safe,
            s"Cannot change table property '$prop': column '$col' has " +
              "committed history, and its un-compacted runs would be " +
              "re-merged under the new rules on the next " +
              "merge/compaction (silent history reinterpretation). " +
              "Declare the option in CREATE TABLE, or set it " +
              "immediately after ADD COLUMN before any write commits.")
        }
      }
    }
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    TableSchema.load(dir) match {
      case None => false
      case Some(ts) =>
        // non-local data plane: remote keys are prefixed by the table
        // dir, so a later CREATE of the same name would otherwise
        // resurrect the dropped table's snapshots. Purge the WHOLE
        // remote prefix (recursive walk), not just manifest-referenced
        // keys — aborted-write orphans under the prefix would otherwise
        // leak forever, since no vacuum can run on a dropped table.
        if (ts.ioSpec != "local") {
          val io = graft.format.FileIO.resolve(ts.ioSpec)
          io.walk(dir).foreach(e => io.delete(dir.resolve(e.relPath)))
        }
        deleteRecursively(dir)
        true
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val oldSchema = TableSchema.load(tableDir(oldIdent))
      .getOrElse(throw new NoSuchTableException(oldIdent))
    if (TableSchema.load(tableDir(newIdent)).isDefined) throw new TableAlreadyExistsException(newIdent)
    // non-local data plane: remote keys embed the old table-dir prefix,
    // so a local dir move would silently orphan every snapshot and the
    // renamed table would read empty. Object stores cannot rename a key
    // prefix atomically either — refuse rather than lose data.
    if (oldSchema.ioSpec != "local") throw new UnsupportedOperationException(
      s"RENAME is not supported for tables on io=${oldSchema.ioSpec}: " +
        "remote keys are bound to the table path (copy into a new table instead)")
    Files.move(tableDir(oldIdent), tableDir(newIdent))
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      listDir(p)(_.toSeq).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}

object GraftCatalog {
  /** Identifier components double as warehouse DIRECTORY names, so a
    * component holding a path separator or a dot-walk (`..`) would
    * resolve outside the warehouse root — `createNamespace("../evil")`
    * would create (and a later cascade drop would DELETE) a directory
    * the catalog doesn't own. Enforced at the single choke point every
    * path-building verb goes through ([[GraftCatalog.dbDir]] /
    * `tableDir`), so backticked SQL identifiers can't bypass it either.
    */
  private[graft] def requirePathSafeComponent(part: String, what: String): Unit =
    require(part.nonEmpty && !part.contains("/") && !part.contains("\\") &&
      part != "." && part != "..",
      s"Invalid $what '$part': identifier components become warehouse " +
        "directory names and must not be empty, contain path separators, " +
        "or be '.'/'..'")

  /** Options baked into existing data — layout (`bucket`, `io`,
    * `primary-key`) and merge semantics (`merge-engine`,
    * `sequence.field`, `ignore-delete`,
    * `fields.<col>.aggregate-function`) — immutable after CREATE.
    */
  /** `fields.<col>.aggregate-function` is NOT in this set — it is
    * field-local and must stay settable post-CREATE for the ADD COLUMN
    * → configure-its-fold workflow on aggregation tables. It gets its
    * own data-aware guard instead ([[GraftCatalog.requireFoldChangeSafe]]):
    * SET/UNSET is allowed only while the column provably has no
    * committed non-null history to reinterpret.
    */
  def isStructuralProperty(name: String): Boolean =
    Set("bucket", "io", "primary-key", "merge-engine", "sequence.field",
      "ignore-delete").contains(name)

  /** The column a `fields.<col>.aggregate-function` property names, if
    * the property is shaped so.
    */
  def fieldAggColumn(name: String): Option[String] =
    graft.core.MergeRuleProps.aggColumn(name)

  /** Test seam for the ALTER/commit merge-rule fence: runs between the
    * schema save and the marker-snapshot publish, where a concurrent
    * commit is hardest to fence. Production value is a no-op.
    */
  private[graft] var alterFenceTestHook: () => Unit = () => ()

  /** The version column a `fields.<col>.sequence-group` property names,
    * if the property is shaped so. Same data-aware mutability guard as
    * the fold functions: changing a group re-merges every involved
    * column's un-compacted runs under new rules.
    */
  def fieldSeqGroupColumn(name: String): Option[String] =
    graft.core.MergeRuleProps.seqGroupColumn(name)

  /** A SET of a structural property is a semantic no-op — and therefore
    * allowed — when it re-states the stored value, or states the
    * option's DEFAULT while the option is absent (config-management
    * pushes write defaults explicitly). Options with no meaningful
    * default (bucket, io, primary-key, sequence.field) are never
    * no-op-settable when absent.
    */
  def isStructuralNoop(name: String, value: String,
      current: Option[String]): Boolean = current match {
    case Some(v) => v == value
    case None => name match {
      case "merge-engine" => value == "deduplicate"
      case "ignore-delete" => value.equalsIgnoreCase("false")
      case _ => false
    }
  }
}
