package graft.format

import org.apache.spark.sql.types._
import graft.connector.Values
import java.nio.file.Path

/** Full compaction of one (partition, bucket) group: read every live
  * file, merge (PK tables: last-write-wins by sequence, then drop
  * deletes — safe because the WHOLE bucket is rewritten, so no older
  * file can resurrect a key), write one sorted file back. This is the
  * "second snapshot" of the reference's "one commit may generate up to
  * two snapshots (data + compaction)" (`pypaimon/api/table_commit.py:
  * 28-32`), exposed as an explicit maintenance action.
  *
  * Runs one task per group on executors; the driver publishes a single
  * COMPACT snapshot with DELETE(old)+ADD(new) entries.
  */
// Serializable: compactGroups' rewrite closure references rewriteGroup
// from inside the object, capturing the module; singletons deserialize
// back to themselves via readResolve.
object Compactor extends Serializable {

  /** Executor-side rewrite; returns the replacement file meta. */
  def rewriteGroup(
      tableDir: Path,
      fields: StructType,
      partitionKeys: Seq[String],
      trimmedPk: Seq[String],
      isPk: Boolean,
      partition: Seq[String],
      bucket: Int,
      fileNames: Seq[String],
      fileFormat: String = "parquet",
      fieldIds: Map[String, Int] = Map.empty,
      ioSpec: String = "local",
      mergeSpec: MergeFunction.Spec =
        MergeFunction.Spec("deduplicate", false, Map.empty)): DataFileMeta = {

    val io = FileIO.resolve(ioSpec)
    val dataFields = StructType(
      fields.fields.filterNot(f => partitionKeys.contains(f.name)))
    val fileSchema = if (isPk) StructType(
      StructField("_SEQUENCE_NUMBER", LongType, nullable = false) +:
        StructField("_VALUE_KIND", IntegerType, nullable = false) +:
        dataFields.fields) else dataFields

    // STREAMING rewrite: input files are already sorted by (key, seq),
    // so the PK path is the same O(open files)-memory k-way
    // SortMergeReader the read path uses (winners in key order,
    // deletes dropped — safe because the WHOLE bucket is rewritten);
    // the append path concatenates. The previous form materialized
    // every live key's row in a heap-side map plus a sorted Seq —
    // fine at test SF, an executor OOM on the 100 TB bucket this file
    // is designed for. Stats/null-counts/sequence bounds accumulate
    // inline on the single pass.
    val rowIter: Iterator[org.apache.spark.sql.catalyst.InternalRow] =
      if (isPk) {
        val keyIdx = trimmedPk.map(k => fileSchema.fieldIndex(k))
        val keyTypes = keyIdx.map(i => fileSchema(i).dataType)
        val sources = fileNames.map { fn =>
          FormatIO.reader(FormatIO.ofFile(fn), tableDir.resolve(fn),
            fileSchema, fileSchema, fieldIds, io = io)
            .map(r => (fn, r)): Iterator[(String,
              org.apache.spark.sql.catalyst.InternalRow)]
        }
        // keepDeletes on sequence.field tables: the winning tombstone's
        // field value must survive the rewrite, or a later out-of-order
        // stale insert would resurrect the deleted key (commit-order
        // engines can drop deletes — later commits always outrank)
        new SortMergeReader(sources, keyIdx, keyTypes, 0, 1,
          mergeFn = MergeFunction.create(mergeSpec, fileSchema, keyIdx, 0, 1,
            keepDeletes = mergeSpec.seqField.isDefined))
          .map(_._2)
      } else
        fileNames.iterator.flatMap(fn =>
          FormatIO.reader(FormatIO.ofFile(fn), tableDir.resolve(fn),
            fileSchema, fileSchema, fieldIds, io = io))

    val partDir = partitionKeys.zip(partition)
      .map { case (k, v) => s"$k=$v" }.mkString("/")
    val bucketDir = (if (partDir.isEmpty) "" else partDir + "/") + s"bucket-$bucket"
    io.createDirectories(tableDir.resolve(bucketDir))
    val rel = s"$bucketDir/compact-${java.util.UUID.randomUUID()}." +
      FormatIO.extension(fileFormat)
    val w = FormatIO.writer(fileFormat, tableDir.resolve(rel), fileSchema,
      fieldIds, io = io)

    // same stats policy as the writer: pk-column bounds for PK tables,
    // any-primitive-column bounds for append tables
    val statCols: Seq[(String, Int, org.apache.spark.sql.types.DataType)] =
      if (isPk) trimmedPk.map(k =>
        (k, fileSchema.fieldIndex(k), fileSchema(fileSchema.fieldIndex(k)).dataType))
      else fileSchema.fields.toSeq.zipWithIndex.collect {
        case (f, i) if f.dataType != BinaryType => (f.name, i, f.dataType)
      }
    val lo = Array.fill[Any](statCols.length)(null)
    val hi = Array.fill[Any](statCols.length)(null)
    val nulls = new Array[Long](fileSchema.length)
    var n = 0L
    var seqMin = Long.MaxValue
    var seqMax = Long.MinValue
    rowIter.foreach { r =>
      w.write(r)
      n += 1
      if (isPk) {
        val s = r.getLong(0)
        if (s < seqMin) seqMin = s
        if (s > seqMax) seqMax = s
      }
      var i = 0
      while (i < statCols.length) {
        val (_, idx, dt) = statCols(i)
        if (!r.isNullAt(idx)) {
          val v = r.get(idx, dt)
          if (lo(i) == null || Values.compare(dt, v, lo(i)) < 0) lo(i) = v
          if (hi(i) == null || Values.compare(dt, v, hi(i)) > 0) hi(i) = v
        }
        i += 1
      }
      if (!isPk) {
        var j = 0
        while (j < fileSchema.length) {
          if (r.isNullAt(j)) nulls(j) += 1
          j += 1
        }
      }
    }
    w.close()

    val stats = statCols.zipWithIndex.flatMap { case ((name, _, dt), i) =>
      if (lo(i) == null) None
      else {
        val (els, ehs) = (Values.encode(dt, lo(i)), Values.encode(dt, hi(i)))
        if (els.length > 64 || ehs.length > 64) None
        else Some(name -> (els -> ehs))
      }
    }.toMap

    val nullCounts: Map[String, Long] =
      if (isPk) Map.empty
      else fileSchema.fields.toSeq.zipWithIndex.map { case (f, i) =>
        f.name -> nulls(i)
      }.toMap
    DataFileMeta(rel, io.size(tableDir.resolve(rel)), n,
      partition, bucket, if (n > 0 && isPk) seqMin else 0L,
      if (n > 0 && isPk) seqMax else 0L, stats, nullCounts)
  }

  /** Rewrite + publish the given (partition, bucket) groups as one
    * COMPACT snapshot — one task per group when a SparkSession is
    * available (commit paths run on the driver), serial otherwise.
    * Returns the number of groups compacted.
    */
  def compactGroups(spark: Option[org.apache.spark.sql.SparkSession],
      tableDir: Path, schema: graft.core.TableSchema,
      groups: Seq[((Seq[String], Int), Seq[DataFileMeta])]): Int = {
    if (groups.isEmpty) return 0
    // Rewrite with the table's LATEST persisted schema, never the
    // caller's cached handle: a long-lived handle (facade Table, a
    // streaming sink's per-query GraftWrite) compacting after an
    // ALTER TABLE ADD COLUMN would otherwise rewrite whole buckets
    // THROUGH the pre-ADD schema and silently drop every committed
    // value of the new column (caught by LifecycleFuzzSpec's evolve
    // op, seed 7). The reload also stamps the compacted file with the
    // current schema id, so later reads null-fill exactly the columns
    // the rewrite did not carry.
    val schemaNow = graft.core.TableSchema.load(tableDir).getOrElse(schema)
    val dirStr = tableDir.toString
    val fieldsJson = schemaNow.fields.json
    val pks = schemaNow.partitionKeys
    val tpk = schemaNow.trimmedPrimaryKeys
    val isPk = schemaNow.isPrimaryKeyTable
    val fmt = schemaNow.options.getOrElse("file.format", "parquet")
    val fids = schemaNow.idMap
    val ioSpec = schemaNow.ioSpec // string travels into the task closure
    val mspec = schemaNow.mergeSpec // compaction folds with the table's engine
    val work = groups.map { case ((part, bucket), fs) =>
      (part, bucket, fs.map(_.fileName))
    }
    def rewrite(part: Seq[String], bucket: Int, names: Seq[String]): DataFileMeta =
      rewriteGroup(Path.of(dirStr),
        org.apache.spark.sql.types.DataType.fromJson(fieldsJson)
          .asInstanceOf[StructType],
        pks, tpk, isPk, part, bucket, names, fmt, fids, ioSpec, mspec)
    val adds = spark match {
      case Some(s) => s.sparkContext.parallelize(work, work.size)
        .map { case (part, bucket, names) => rewrite(part, bucket, names) }
        .collect().toSeq
      case None => work.map { case (part, bucket, names) =>
        rewrite(part, bucket, names)
      }
    }
    val deleteNames = groups.flatMap(_._2.map(_.fileName)).toSet
    // a group whose merge dropped EVERY key (all tombstones folded
    // away) must commit as a pure DELETE: an empty data file with
    // fabricated 0/0 seq bounds would otherwise be ADDed and opened by
    // every later scan and recompaction of that bucket forever
    val (kept, empty) = adds.partition(_.rowCount > 0)
    val fio = FileIO.resolve(schemaNow.ioSpec)
    empty.foreach(f => fio.delete(tableDir.resolve(f.fileName)))
    commit(new SnapshotManager(tableDir, io = fio),
      schemaNow.id, kept, deleteNames, tableDir)
    groups.size
  }

  /** Commit-triggered compaction ≙ the reference's "one commit may
    * generate up to two snapshots — one for data changes and one for
    * compaction" (`pypaimon/api/table_commit.py:28-32`): after a data
    * commit on a PK table, every (partition, bucket) whose live file
    * count reached `compaction.trigger-file-count` (default 5) is
    * rewritten into one file and published as a second, COMPACT
    * snapshot. `write-only=true` opts a writer out (bulk-ingest
    * pattern); a non-positive trigger disables. Bounded read
    * amplification: a bucket's sorted-run count never exceeds the
    * trigger for long, so merge-on-read stays O(trigger) heap.
    */
  def maybeCompact(tableDir: Path, schema: graft.core.TableSchema): Int = {
    if (!schema.isPrimaryKeyTable) return 0
    val sm = new SnapshotManager(tableDir, io = FileIO.resolve(schema.ioSpec))
    val latest = sm.latestSnapshot.getOrElse(return 0)
    val writeOnly =
      schema.options.get("write-only").exists(_.equalsIgnoreCase("true"))
    // validated at CREATE; a malformed legacy value degrades to the
    // default rather than failing a commit whose snapshot is already
    // published (the data write must never look failed-but-durable)
    val trigger = schema.options.get("compaction.trigger-file-count")
      .flatMap(_.trim.toIntOption).getOrElse(5)
    if (writeOnly || trigger <= 0) {
      // opted-out configurations exist precisely to keep bulk-load
      // commits cheap, so the per-commit manifest fold is exactly the
      // cost they must not pay. They are ALSO where hot buckets
      // accumulate worst — so keep the audit, but rate-limit it: every
      // 16th snapshot, and never again once the table has warned.
      if (!hotBucketWarned.contains(tableDir.toString) && latest.id % 16 == 0)
        warnHotBuckets(tableDir, schema,
          sm.liveFiles(latest).groupBy(f => (f.partition, f.bucket)))
      return 0
    }
    val byBucket = sm.liveFiles(latest)
      .groupBy(f => (f.partition, f.bucket))
    warnHotBuckets(tableDir, schema, byBucket)
    val groups = byBucket.filter(_._2.size >= trigger).toSeq
    compactGroups(org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession),
      tableDir, schema, groups)
  }

  /** Full compaction of every multi-file group — THE entry point
    * shared by the facade handle and the `sys.compact` SQL procedure
    * (one copy of the grouping policy).
    */
  def compactAll(spark: Option[org.apache.spark.sql.SparkSession],
      tableDir: Path, schema: graft.core.TableSchema): Int = {
    val sm = new SnapshotManager(tableDir, io = FileIO.resolve(schema.ioSpec))
    val groups = sm.liveFilesLatest
      .groupBy(f => (f.partition, f.bucket))
      .filter(_._2.size > 1).toSeq
    compactGroups(spark, tableDir, schema, groups)
  }

  /** Straggler guidance: a (partition, bucket) is one merge task, so a
    * hot bucket caps read parallelism and becomes the straggler at
    * scale (ScaleChecks' hot-bucket canary quantifies it; README
    * "Bucket sizing"). Warn — once per table per process — when any
    * bucket's live pre-merge rows exceed `bucket.rows-warning-
    * threshold` (default 64M ≈ tens of seconds of single-task merge;
    * <= 0 disables). Metadata-only: the counts come from the manifest
    * entries the compaction check already folded; tables that opt out
    * of compaction (`write-only`, disabled trigger) audit only every
    * 16th snapshot so bulk-load commits stay free of the fold.
    */
  private val hotBucketWarned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def warnHotBuckets(tableDir: Path, schema: graft.core.TableSchema,
      byBucket: Map[(Seq[String], Int), Seq[DataFileMeta]]): Unit = {
    val warnRows = schema.options.get("bucket.rows-warning-threshold")
      .flatMap(_.trim.toLongOption).getOrElse(64L << 20)
    if (warnRows <= 0) return
    val hot = byBucket.iterator
      .map { case (k, fs) => (k, fs.map(_.rowCount).sum) }
      .filter(_._2 > warnRows).toSeq
    if (hot.nonEmpty && hotBucketWarned.add(tableDir.toString)) {
      val worst = hot.maxBy(_._2)
      System.err.println(s"[graft] WARN: table $tableDir has " +
        s"${hot.size} bucket(s) over $warnRows pre-merge rows (worst: " +
        s"partition=${worst._1._1.mkString("/")} bucket=${worst._1._2} " +
        s"rows=${worst._2}); a bucket is one merge task - raise the " +
        "'bucket' count (see README: Bucket sizing) or compact more often")
    }
  }

  /** Publish a COMPACT snapshot replacing `deleteNames` with `adds`.
    * Aborts (deleting the new files) if a concurrent commit removed any
    * of the inputs.
    */
  def commit(sm: SnapshotManager, schemaId: Long,
      adds: Seq[DataFileMeta], deleteNames: Set[String],
      tableDir: Path, kind: String = "COMPACT"): Boolean = {
    var attempt = 0
    while (attempt < 100) {
      val base = sm.latestSnapshot.getOrElse(
        throw new IllegalStateException("Compaction on empty table"))
      // merge-rule ALTER fence: compaction re-folds committed runs
      // under the schema it LOADED; if a fold/sequence-group change
      // landed since, the output would bake in stale rules. Abort like
      // the inputs-vanished path — a rerun picks up the new schema.
      // Checked AFTER the base read (see FileStoreCommit.commit for
      // why the ordering matters).
      try MergeRuleFence.check(sm.tableDir, schemaId)
      catch { case _: IllegalStateException =>
        adds.foreach(f => sm.io.delete(tableDir.resolve(f.fileName)))
        return false
      }
      val live = sm.liveFiles(base)
      val liveNames = live.map(_.fileName).toSet
      if (!deleteNames.subsetOf(liveNames)) {
        adds.foreach(f => sm.io.delete(tableDir.resolve(f.fileName)))
        return false // inputs vanished under us — give up cleanly
      }
      val entries = live.filter(f => deleteNames.contains(f.fileName))
        .map(f => ManifestEntry("DELETE", f)) ++
        adds.map(f => ManifestEntry("ADD", f))
      val manifest = sm.writeManifest(entries)
      // compaction commits fold the chain too: a table maintained by
      // repeated sys.compact (or partition DELETEs) must not grow its
      // manifest list past the bound data commits respect
      val (manifests, extra) = sm.chainWithFold(Some(base), live, manifest)
      val snap = Snapshot(
        id = base.id + 1,
        schemaId = schemaId,
        commitKind = kind,
        timeMillis = System.currentTimeMillis(),
        manifests = manifests,
        lastSequenceNumber = math.max(base.lastSequenceNumber,
          (adds.map(_.maxSeq) :+ 0L).max),
        totalRecordCount = live.filterNot(f => deleteNames.contains(f.fileName))
          .map(_.rowCount).sum + adds.map(_.rowCount).sum)
      if (sm.tryCommitSnapshot(snap)) return true
      (manifest +: extra).foreach(sm.deleteManifest)
      attempt += 1
    }
    false
  }
}
