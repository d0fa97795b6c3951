package graft.format

import org.json4s._
import org.json4s.jackson.JsonMethods
import java.nio.file.{Files, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** The single atomicity primitive optimistic commit needs: publish an
  * immutable object at `target` iff nothing is there, atomically, and
  * report whether this call won. Backends:
  *
  *  - [[AtomicPublisher.local]] (default): hard-link create-exclusive —
  *    correct on local disk, NFS, and HDFS-like filesystems.
  *  - Object stores: implement with the store's conditional PUT
  *    (S3 `If-None-Match: *`, GCS `x-goog-if-generation-match: 0`,
  *    ABFS `If-None-Match: *`) — same contract, no filesystem rename
  *    assumptions anywhere else in the commit path. This container has
  *    no object-store SDKs, so only the seam + contract tests ship.
  */
trait AtomicPublisher {
  /** True iff `target` did not exist and now holds `content`. */
  def putIfAbsent(target: Path, content: String): Boolean
}

object AtomicPublisher {
  val local: AtomicPublisher = new AtomicPublisher {
    override def putIfAbsent(target: Path, content: String): Boolean = {
      val tmp = Files.createTempFile(target.getParent, ".s", ".tmp")
      Files.writeString(tmp, content)
      try {
        // atomic create-exclusive: fails with FileAlreadyExistsException
        // if the target exists — a rename would silently REPLACE a
        // concurrent committer's snapshot (POSIX rename semantics) and
        // lose its commit; an existence pre-check alone is racy.
        Files.createLink(target, tmp)
        Files.deleteIfExists(tmp)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp); false
      }
    }
  }
}

/** Snapshot + manifest persistence under one table directory:
  *
  * {{{
  * <table>/schema/schema-<i>        table schema versions
  * <table>/snapshot/snapshot-<n>    snapshot JSON (atomic-rename publish)
  * <table>/snapshot/LATEST          current snapshot id hint
  * <table>/manifest/manifest-<uuid> immutable manifest (ADD/DELETE entries)
  * <table>/bucket-<b>/<uuid>.parquet data files
  * }}}
  *
  * Publication is a create-exclusive atomic rename of `snapshot-<n>`
  * (two-phase commit, ≙ `pypaimon/py4j/java_implementation.py:397-407`);
  * on local/HDFS-like filesystems rename is the atomicity primitive, on
  * object stores a conditional PUT would take its place.
  */
final class SnapshotManager(val tableDir: Path,
    publisher: AtomicPublisher = AtomicPublisher.local) {

  private def snapshotDir = tableDir.resolve("snapshot")
  private def manifestDir = tableDir.resolve("manifest")

  def latestSnapshotId: Option[Long] = {
    if (!Files.isDirectory(snapshotDir)) return None
    // LATEST is a hint; the listing is authoritative (hint write races
    // are benign).
    val ids = Files.list(snapshotDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.startsWith("snapshot-"))
      .map(_.stripPrefix("snapshot-").toLong)
      .toSeq
    if (ids.isEmpty) None else Some(ids.max)
  }

  def latestSnapshot: Option[Snapshot] = latestSnapshotId.map(snapshot)

  /** Ids of snapshot files actually on disk (gaps appear after expiry). */
  def existingSnapshotIds: Seq[Long] = {
    if (!Files.isDirectory(snapshotDir)) return Seq.empty
    Files.list(snapshotDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.startsWith("snapshot-"))
      .map(_.stripPrefix("snapshot-").toLong)
      .toSeq.sorted
  }

  def snapshot(id: Long): Snapshot =
    Snapshot.fromJson(Files.readString(snapshotDir.resolve(s"snapshot-$id")))

  def readManifest(name: String): Seq[ManifestEntry] = {
    implicit val fmt: Formats = DefaultFormats
    val v = JsonMethods.parse(Files.readString(manifestDir.resolve(name)))
    (v \ "entries") match {
      case JArray(items) => items.map { e =>
        ManifestEntry((e \ "kind").extract[String],
          DataFileMeta.fromJValue(e \ "file"))
      }
      case _ => Seq.empty
    }
  }

  def writeManifest(entries: Seq[ManifestEntry]): String = {
    import org.json4s.JsonDSL._
    Files.createDirectories(manifestDir)
    val name = s"manifest-${java.util.UUID.randomUUID()}"
    val j: JObject = "entries" -> entries.map(e =>
      ("kind" -> e.kind) ~ ("file" -> e.file.toJValue))
    val tmp = Files.createTempFile(manifestDir, ".m", ".tmp")
    Files.writeString(tmp, JsonMethods.compact(JsonMethods.render(j)))
    Files.move(tmp, manifestDir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
    name
  }

  /** Fold the manifest chain of a snapshot into the live file set. */
  def liveFiles(s: Snapshot): Seq[DataFileMeta] = {
    val entries = s.manifests.flatMap(readManifest)
    val deleted = entries.filterNot(_.isAdd).map(_.file.fileName).toSet
    entries.filter(e => e.isAdd && !deleted.contains(e.file.fileName)).map(_.file)
  }

  def liveFilesLatest: Seq[DataFileMeta] =
    latestSnapshot.map(liveFiles).getOrElse(Seq.empty)

  /** Publish via the [[AtomicPublisher]]; returns false on id collision
    * (caller re-plans against the newer snapshot and retries). The
    * LATEST hint is best-effort (readers treat the listing as
    * authoritative), so its non-atomicity on object stores is benign.
    */
  def tryCommitSnapshot(s: Snapshot): Boolean = {
    Files.createDirectories(snapshotDir)
    val target = snapshotDir.resolve(s"snapshot-${s.id}")
    if (Files.exists(target)) return false // fast path; the publish decides
    if (!publisher.putIfAbsent(target, s.toJson)) return false
    val latestTmp = Files.createTempFile(snapshotDir, ".l", ".tmp")
    Files.writeString(latestTmp, s.id.toString)
    Files.move(latestTmp, snapshotDir.resolve("LATEST"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    true
  }
}
