package graft.format

/** Two-phase batch commit (≙ `BatchTableCommit.commit`,
  * `pypaimon/api/table_commit.py:24-36`): executors produced data files
  * + [[DataFileMeta]] (the CommitMessage payload); the driver folds them
  * into one new manifest and publishes snapshot N+1 with an
  * optimistic-retry loop on id collision.
  */
object FileStoreCommit {

  sealed trait OverwriteMode
  case object NoOverwrite extends OverwriteMode
  /** Full-table or static-partition overwrite: delete every live file
    * whose partition values match `partitionFilter` (empty map = all —
    * `write_builder.overwrite(None)` semantics,
    * `pypaimon/py4j/tests/test_write_and_read.py:311-383`).
    */
  final case class StaticOverwrite(partitionFilter: Map[String, String])
    extends OverwriteMode
  /** Dynamic: delete only partitions that receive new data
    * (`dynamic-partition-overwrite` option).
    */
  case object DynamicOverwrite extends OverwriteMode

  def commit(
      sm: SnapshotManager,
      schemaId: Long,
      partitionKeys: Seq[String],
      newFiles: Seq[DataFileMeta],
      mode: OverwriteMode): Snapshot = {

    var attempt = 0
    while (attempt < 100) {
      val base = sm.latestSnapshot
      val live = base.map(sm.liveFiles).getOrElse(Seq.empty)

      val deletes: Seq[ManifestEntry] = mode match {
        case NoOverwrite => Seq.empty
        case StaticOverwrite(filter) =>
          val idx = filter.map { case (k, v) => partitionKeys.indexOf(k) -> v }
          live.filter(f => idx.forall { case (i, v) =>
            i >= 0 && f.partition.lift(i).contains(v)
          }).map(f => ManifestEntry("DELETE", f))
        case DynamicOverwrite =>
          val touched = newFiles.map(_.partition).toSet
          live.filter(f => touched.contains(f.partition))
            .map(f => ManifestEntry("DELETE", f))
      }

      val adds = newFiles.map(f => ManifestEntry("ADD", f))
      val manifest = sm.writeManifest(deletes ++ adds)
      val deletedNames = deletes.map(_.file.fileName).toSet
      val newTotal = live.filterNot(f => deletedNames.contains(f.fileName))
        .map(_.rowCount).sum + newFiles.map(_.rowCount).sum
      // Manifest folding: the chain grows by one per commit; past a
      // threshold, collapse history into a single full manifest so read
      // planning stays O(live files), not O(commits).
      val baseManifests = base.map(_.manifests).getOrElse(Seq.empty)
      val manifests =
        if (baseManifests.size >= 50) {
          val full = sm.writeManifest(
            sm.liveFiles(base.get).filterNot(f => deletedNames.contains(f.fileName))
              .map(f => ManifestEntry("ADD", f)))
          Seq(full, manifest)
        } else baseManifests :+ manifest
      val snap = Snapshot(
        id = base.map(_.id + 1).getOrElse(1L),
        schemaId = schemaId,
        commitKind = if (mode == NoOverwrite) "APPEND" else "OVERWRITE",
        timeMillis = System.currentTimeMillis(),
        manifests = manifests,
        lastSequenceNumber = math.max(
          base.map(_.lastSequenceNumber).getOrElse(0L),
          (newFiles.map(_.maxSeq) :+ 0L).max),
        totalRecordCount = newTotal)
      if (sm.tryCommitSnapshot(snap)) return snap
      attempt += 1
    }
    throw new IllegalStateException(
      "Commit conflict: gave up after 100 snapshot publish attempts")
  }

  /** Metadata-only delete of an explicit live-file set (partition-level
    * SQL DELETE). Files already gone from the live set are ignored.
    */
  def commitFileDeletes(sm: SnapshotManager, schemaId: Long,
      deleteNames: Set[String]): Snapshot = {
    var attempt = 0
    while (attempt < 100) {
      val base = sm.latestSnapshot.getOrElse(
        throw new IllegalStateException("DELETE on empty table"))
      val live = sm.liveFiles(base)
      val doomed = live.filter(f => deleteNames.contains(f.fileName))
      val manifest = sm.writeManifest(doomed.map(f => ManifestEntry("DELETE", f)))
      val snap = Snapshot(
        id = base.id + 1,
        schemaId = schemaId,
        commitKind = "OVERWRITE",
        timeMillis = System.currentTimeMillis(),
        manifests = base.manifests :+ manifest,
        lastSequenceNumber = base.lastSequenceNumber,
        totalRecordCount = live.filterNot(f => deleteNames.contains(f.fileName))
          .map(_.rowCount).sum)
      if (sm.tryCommitSnapshot(snap)) return snap
      attempt += 1
    }
    throw new IllegalStateException("DELETE commit conflict")
  }
}
