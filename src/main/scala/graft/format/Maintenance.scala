package graft.format

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Retention maintenance: snapshot expiry and orphan-file vacuum.
  * Both are metadata-driven deletes — the retained snapshots' manifests
  * define reachability; everything else is garbage.
  */
object Maintenance {

  final case class ExpireResult(expiredSnapshots: Int, deletedDataFiles: Int,
      deletedManifests: Int)

  /** Expire all but the last `retainLast` snapshots: removes the old
    * snapshot JSONs, every manifest no retained snapshot references,
    * and every data file unreachable from the retained snapshots'
    * live sets (a file still live anywhere retained survives, so time
    * travel within the retained window keeps working).
    */
  def expireSnapshots(tableDir: Path, retainLast: Int,
      ioSpec: String = "local"): ExpireResult = {
    require(retainLast >= 1, "must retain at least one snapshot")
    val io = FileIO.resolve(ioSpec)
    val sm = new SnapshotManager(tableDir, io = io)
    val latest = sm.latestSnapshotId.getOrElse(return ExpireResult(0, 0, 0))
    val cutoff = latest - retainLast + 1
    if (cutoff <= 1) return ExpireResult(0, 0, 0)

    val retained = (cutoff to latest).map(sm.snapshot)
    val keepManifests = retained.flatMap(_.manifests).toSet
    // reachable data files = union of the retained snapshots' LIVE
    // sets (ADDs folded against DELETEs per snapshot) — files dropped
    // by compaction/overwrite before the cutoff become garbage even
    // though old manifests still mention them
    val reachable = retained.flatMap(s =>
      sm.liveFiles(s).map(_.fileName)).toSet

    // candidate data files: local IO walks the bucket dirs (also
    // sweeps aborted-write orphans); non-local IO enumerates every
    // file any manifest mentions (object stores have no cheap walk;
    // true orphans are vacuum's concern). Collected BEFORE manifests
    // are deleted.
    val candidates: Seq[String] =
      if (ioSpec == "local")
        dataFiles(tableDir).map(p => tableDir.relativize(p).toString)
      else io.list(tableDir.resolve("manifest"))
        .filter(_.startsWith("manifest-"))
        .flatMap(m => sm.readManifest(m).map(_.file.fileName)).distinct

    val snapshotDir = tableDir.resolve("snapshot")
    val manifestDir = tableDir.resolve("manifest")
    var expired = 0
    (1L until cutoff).foreach { id =>
      if (io.delete(snapshotDir.resolve(s"snapshot-$id"))) expired += 1
    }
    var deletedManifests = 0
    io.list(manifestDir).foreach { name =>
      if (name.startsWith("manifest-") && !keepManifests.contains(name)) {
        io.delete(manifestDir.resolve(name)); deletedManifests += 1
      }
    }
    var deletedData = 0
    candidates.foreach { rel =>
      if (!reachable.contains(rel)) {
        if (io.delete(tableDir.resolve(rel))) deletedData += 1
        val p = tableDir.resolve(rel)
        io.delete(p.getParent.resolve("." + p.getFileName + ".crc"))
      }
    }
    ExpireResult(expired, deletedData, deletedManifests)
  }

  /** Delete data files (and Hadoop .crc sidecars) no manifest of any
    * existing snapshot references — aborted-write leftovers. Only files
    * older than `olderThanMillis` are touched, so in-flight writers
    * (whose files precede their commit) are never raced.
    */
  def vacuumOrphans(tableDir: Path, olderThanMillis: Long = 3600 * 1000L,
      ioSpec: String = "local"): Int = {
    // orphan detection needs a recursive listing plus per-file mtimes —
    // semantics FileIO deliberately does not model yet (object stores
    // expose LastModified through their list API; wiring that in is the
    // seam's next step). Refuse loudly rather than silently scanning
    // the wrong filesystem.
    if (ioSpec != "local") throw new UnsupportedOperationException(
      s"vacuum requires local table storage for its mtime walk; got io=$ioSpec")
    val sm = new SnapshotManager(tableDir)
    val referenced = sm.existingSnapshotIds
      .flatMap(id => sm.snapshot(id).manifests)
      .distinct.flatMap(m => sm.readManifest(m).map(_.file.fileName)).toSet
    val cutoff = System.currentTimeMillis() - olderThanMillis
    var deleted = 0
    dataFiles(tableDir).foreach { p =>
      val rel = tableDir.relativize(p).toString
      if (!referenced.contains(rel) &&
        Files.getLastModifiedTime(p).toMillis < cutoff) {
        Files.deleteIfExists(p)
        Files.deleteIfExists(p.getParent.resolve("." + p.getFileName + ".crc"))
        deleted += 1
      }
    }
    // sidecars whose data file is gone
    dataDirs(tableDir).foreach { d =>
      Files.list(d).iterator().asScala.toSeq.foreach { p =>
        val n = p.getFileName.toString
        if (n.startsWith(".") && n.endsWith(".crc") &&
          !Files.exists(d.resolve(n.stripPrefix(".").stripSuffix(".crc"))))
          Files.deleteIfExists(p)
      }
    }
    deleted
  }

  private def dataDirs(tableDir: Path): Seq[Path] =
    Files.walk(tableDir).iterator().asScala
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("bucket-"))
      .toSeq

  private def dataFiles(tableDir: Path): Seq[Path] =
    dataDirs(tableDir).flatMap(d =>
      Files.list(d).iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        Files.isRegularFile(p) && !n.startsWith(".")
      }.toSeq)
}
