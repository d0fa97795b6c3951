package graft.format

import java.net.URI
import java.nio.file.Path

/** [[AtomicPublisher]] for S3-compatible object stores: the snapshot
  * PUBLICATION primitive — the pointer swap that makes a commit
  * visible — as a conditional `PUT` with `If-None-Match: *` (the store
  * answers `412 Precondition Failed` when the key already exists — one
  * winner per snapshot id, the same create-exclusive contract the
  * local hard-link publisher provides). Delegates to
  * [[S3FileIO.putIfAbsent]], so there is exactly ONE SigV4
  * conditional-PUT implementation to keep protocol-correct (status
  * handling, retries, session tokens land once); this class survives
  * as the named AtomicPublisher for deployments that wire a publisher
  * into [[SnapshotManager]] without routing the whole data plane
  * through `s3:` io.
  */
final class S3Publisher(
    endpoint: URI,
    region: String,
    bucket: String,
    accessKey: String,
    secretKey: String,
    keyFor: Path => String = p => p.toString.stripPrefix("/"),
    clock: () => java.time.Instant = () => java.time.Instant.now())
  extends AtomicPublisher {

  private val io =
    new S3FileIO(endpoint, region, bucket, accessKey, secretKey, keyFor, clock)

  override def putIfAbsent(target: Path, content: String): Boolean =
    io.putIfAbsent(target, content)
}
