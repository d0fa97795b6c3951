package graft.format

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.JsonDSL._

/** File-level metadata carried through commit messages and manifests —
  * ≙ the reference's split metadata (row_count, file_size, file_paths;
  * `pypaimon/api/split.py:24-35`) plus partition/bucket/sequence info
  * the Java planner keeps internally.
  *
  * `partition` is the ordered list of partition-column string values
  * (partition columns are NOT stored in data files; readers splice them
  * back as constants, ≙ `data_file_record_reader.py:30-135`).
  * `keyStats` holds per-primary-key-column (min, max) string-encoded
  * bounds for split skipping.
  */
final case class DataFileMeta(
    fileName: String,
    fileSize: Long,
    rowCount: Long,
    partition: Seq[String],
    bucket: Int,
    minSeq: Long,
    maxSeq: Long,
    keyStats: Map[String, (String, String)],
    nullCounts: Map[String, Long] = Map.empty) {

  def toJValue: JObject =
    ("fileName" -> fileName) ~ ("fileSize" -> fileSize) ~
      ("rowCount" -> rowCount) ~ ("partition" -> partition) ~
      ("bucket" -> bucket) ~ ("minSeq" -> minSeq) ~ ("maxSeq" -> maxSeq) ~
      ("keyStats" -> keyStats.map { case (k, (lo, hi)) =>
        k -> (("min" -> lo) ~ ("max" -> hi)) }) ~
      ("nullCounts" -> nullCounts)
}

object DataFileMeta {
  def fromJValue(v: JValue): DataFileMeta = {
    implicit val fmt: Formats = DefaultFormats
    DataFileMeta(
      (v \ "fileName").extract[String],
      (v \ "fileSize").extract[Long],
      (v \ "rowCount").extract[Long],
      (v \ "partition").extract[Seq[String]],
      (v \ "bucket").extract[Int],
      (v \ "minSeq").extract[Long],
      (v \ "maxSeq").extract[Long],
      (v \ "keyStats") match {
        case JObject(kvs) => kvs.map { case (k, s) =>
          k -> ((s \ "min").extract[String] -> (s \ "max").extract[String])
        }.toMap
        case _ => Map.empty
      },
      (v \ "nullCounts") match {
        case JObject(kvs) => kvs.map { case (k, n) =>
          k -> n.extract[Long]
        }.toMap
        case _ => Map.empty
      })
  }
}

/** One manifest line: ADD or DELETE of a data file. Manifest files are
  * immutable and shared across snapshots (Paimon-style manifest reuse):
  * each commit writes exactly one new manifest with its entries, and the
  * new snapshot's manifest list = compacted(previous list) + new one.
  */
final case class ManifestEntry(kind: String, file: DataFileMeta) {
  def isAdd: Boolean = kind == "ADD"
}

/** Snapshot ≙ reference commit product (`pypaimon/api/table_commit.py`):
  * points at the schema and an ordered list of manifest files whose
  * folded entries (ADDs minus DELETEs) are the table state.
  */
final case class Snapshot(
    id: Long,
    schemaId: Long,
    commitKind: String, // APPEND | OVERWRITE | COMPACT | ROLLBACK
    timeMillis: Long,
    manifests: Seq[String],
    lastSequenceNumber: Long,
    totalRecordCount: Long,
    // streaming-sink epoch identity ("<queryId>/<epochId>") — lets a
    // replayed micro-batch commit be recognized and skipped after a
    // failure between sink commit and checkpoint write. Absent on
    // batch/compaction snapshots and in pre-existing tables (optional
    // in the JSON round-trip, so old snapshots still parse).
    commitIdentifier: Option[String] = None) {

  def toJson: String = {
    val j: JObject =
      ("id" -> id) ~ ("schemaId" -> schemaId) ~
        ("commitKind" -> commitKind) ~ ("timeMillis" -> timeMillis) ~
        ("manifests" -> manifests) ~
        ("lastSequenceNumber" -> lastSequenceNumber) ~
        ("totalRecordCount" -> totalRecordCount) ~
        ("commitIdentifier" -> commitIdentifier)
    JsonMethods.pretty(JsonMethods.render(j))
  }
}

object Snapshot {
  def fromJson(json: String): Snapshot = {
    implicit val fmt: Formats = DefaultFormats
    val v = JsonMethods.parse(json)
    Snapshot(
      (v \ "id").extract[Long],
      (v \ "schemaId").extract[Long],
      (v \ "commitKind").extract[String],
      (v \ "timeMillis").extract[Long],
      (v \ "manifests").extract[Seq[String]],
      (v \ "lastSequenceNumber").extract[Long],
      (v \ "totalRecordCount").extract[Long],
      (v \ "commitIdentifier").extractOpt[String])
  }
}
