package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** SQL `CALL` maintenance procedures (Spark 4 ProcedureCatalog):
  * compact, expire_snapshots, vacuum, create/delete/list_tag,
  * rollback — the whole ops lifecycle without the Scala facade.
  */
class ProcedureSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var warehouse: java.nio.file.Path = _

  lazy val spark: SparkSession = {
    warehouse = Files.createTempDirectory("graft-proc-wh")
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", "graft.connector.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", warehouse.toString)
      .getOrCreate()
  }

  override def beforeAll(): Unit = {
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.default")
  }

  override def afterAll(): Unit = spark.stop()

  test("CALL sys.compact collapses multi-file buckets") {
    spark.sql("CREATE TABLE graft.default.pc (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1'," +
      "'compaction.trigger-file-count'='0')") // manual compaction only
    spark.sql("INSERT INTO graft.default.pc VALUES (1,'a')")
    spark.sql("INSERT INTO graft.default.pc VALUES (2,'b')")
    spark.sql("INSERT INTO graft.default.pc VALUES (1,'A')")
    val r = spark.sql("CALL graft.sys.compact('default.pc')").collect()
    assert(r(0).getInt(0) == 1, s"expected 1 compacted group: ${r.toSeq}")
    val sm = new graft.format.SnapshotManager(
      warehouse.resolve("default.db/pc"))
    assert(sm.liveFilesLatest.size == 1)
    assert(spark.sql("SELECT v FROM graft.default.pc WHERE k = 1")
      .collect()(0).getString(0) == "A")
  }

  test("CALL sys.create_tag / list_tags / delete_tag / expire_snapshots") {
    spark.sql("CREATE TABLE graft.default.pt (k BIGINT)")
    spark.sql("INSERT INTO graft.default.pt VALUES (1)")
    val t = spark.sql(
      "CALL graft.sys.create_tag('default.pt', 'v1')").collect()
    assert(t(0).getString(0) == "v1" && t(0).getLong(1) == 1L)
    spark.sql("INSERT INTO graft.default.pt VALUES (2)")
    spark.sql("INSERT INTO graft.default.pt VALUES (3)")
    // named arg + explicit snapshot id
    spark.sql("CALL graft.sys.create_tag('default.pt', 'v2', snapshot_id => 2)")
    val tags = spark.sql("CALL graft.sys.list_tags('default.pt')").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(tags == Seq(("v1", 1L), ("v2", 2L)))
    val e = spark.sql(
      "CALL graft.sys.expire_snapshots('default.pt', 1)").collect()
    assert(e(0).getInt(0) == 2, s"expected 2 expired: ${e.toSeq}")
    // both tagged states still read
    assert(spark.sql("SELECT k FROM graft.default.pt VERSION AS OF 'v1'")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(spark.sql(
      "SELECT count(*) FROM graft.default.pt VERSION AS OF 'v2'")
      .collect()(0).getLong(0) == 2L)
    assert(spark.sql("CALL graft.sys.delete_tag('default.pt', 'v2')")
      .collect()(0).getBoolean(0))
    assert(spark.sql("CALL graft.sys.list_tags('default.pt')").count() == 1L)
  }

  test("CALL sys.rollback publishes a revert commit: ids stay monotone, " +
      "history intact, streams never see recycled offsets") {
    spark.sql("CREATE TABLE graft.default.pr (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1')")
    spark.sql("INSERT INTO graft.default.pr VALUES (1,'a'), (2,'b')")
    spark.sql("INSERT INTO graft.default.pr VALUES (1,'A2')")
    spark.sql("INSERT INTO graft.default.pr VALUES (3,'c')")
    val r = spark.sql("CALL graft.sys.rollback('default.pr', 1)").collect()
    assert(r(0).getLong(0) == 3L && r(0).getLong(1) == 1L &&
      r(0).getLong(2) == 4L, r.toSeq.toString)
    // the table reads as of snapshot 1 again
    assert(spark.sql("SELECT k, v FROM graft.default.pr ORDER BY k")
      .collect().map(x => (x.getLong(0), x.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // nothing was deleted: the rolled-away state is still time-travelable
    assert(spark.sql("SELECT v FROM graft.default.pr VERSION AS OF 2 " +
      "WHERE k = 1").collect()(0).getString(0) == "A2")
    // RETRYING the rollback is a no-op (latest is a revert carrying
    // the target's manifests) — no revert stacking
    val retry = spark.sql("CALL graft.sys.rollback('default.pr', 1)").collect()
    assert(retry(0).getLong(2) == 4L, retry.toSeq.toString)
    // new commits continue ABOVE the old head — never recycling an id a
    // streaming checkpoint may hold
    spark.sql("INSERT INTO graft.default.pr VALUES (4,'d')")
    assert(spark.table("graft.default.pr").count() == 3L)
    val sm = new graft.format.SnapshotManager(
      warehouse.resolve("default.db/pr"))
    assert(sm.latestSnapshotId.contains(5L),
      s"chain should continue at 5, got ${sm.existingSnapshotIds}")
    // the revert snapshot is skipped by incremental consumers
    assert(sm.snapshot(4L).commitKind == "ROLLBACK")
    // a nonexistent target gets an actionable message, not a raw
    // NoSuchFileException
    val e = intercept[Exception](spark.sql(
      "CALL graft.sys.rollback('default.pr', 99)").collect())
    assert(e.getMessage.contains("does not exist"), e.getMessage)
    // rollback to current is a no-op
    val noop = spark.sql("CALL graft.sys.rollback('default.pr', 5)").collect()
    assert(noop(0).getLong(2) == 5L)
  }

  test("CALL sys.rollback_to_tag restores an EXPIRED tagged state") {
    spark.sql("CREATE TABLE graft.default.prt (k BIGINT)")
    spark.sql("INSERT INTO graft.default.prt VALUES (1)")
    spark.sql("CALL graft.sys.create_tag('default.prt', 'stable')")
    spark.sql("INSERT INTO graft.default.prt VALUES (2)")
    spark.sql("INSERT INTO graft.default.prt VALUES (3)")
    // expire PAST the tagged snapshot: its JSON is gone, the tag's
    // copy (and its pinned manifests/files) remain — the exact state
    // tags exist to make restorable
    spark.sql("CALL graft.sys.expire_snapshots('default.prt', 1)")
    val sm = new graft.format.SnapshotManager(
      warehouse.resolve("default.db/prt"))
    assert(!sm.existingSnapshotIds.contains(1L))
    val r = spark.sql(
      "CALL graft.sys.rollback_to_tag('default.prt', 'stable')").collect()
    assert(r(0).getLong(1) == 1L && r(0).getLong(2) == 4L, r.toSeq.toString)
    assert(spark.table("graft.default.prt").collect().map(_.getLong(0))
      .toSeq == Seq(1L))
    // the tag is untouched and still resolves
    assert(spark.sql("CALL graft.sys.list_tags('default.prt')").count() == 1L)
    assert(spark.sql(
      "SELECT count(*) FROM graft.default.prt VERSION AS OF 'stable'")
      .collect()(0).getLong(0) == 1L)
    // catalog-qualified 3-part names resolve too
    assert(spark.sql("CALL graft.sys.list_tags('graft.default.prt')")
      .count() == 1L)
  }

  test("expire_snapshots older_than_millis keeps young history beyond " +
      "retain_last") {
    spark.sql("CREATE TABLE graft.default.pe (k BIGINT)")
    (1 to 4).foreach(i =>
      spark.sql(s"INSERT INTO graft.default.pe VALUES ($i)"))
    // age floor of a day: everything is younger, nothing expires even
    // with retain_last = 1
    val kept = spark.sql("CALL graft.sys.expire_snapshots('default.pe', 1, " +
      "older_than_millis => 86400000)").collect()
    assert(kept(0).getInt(0) == 0, kept.toSeq.toString)
    assert(spark.sql("SELECT count(*) FROM graft.default.`pe$snapshots`")
      .collect()(0).getLong(0) == 4L)
    // age floor of zero: the count rule alone applies
    val gone = spark.sql("CALL graft.sys.expire_snapshots('default.pe', 1, " +
      "older_than_millis => 0)").collect()
    assert(gone(0).getInt(0) == 3, gone.toSeq.toString)
    assert(spark.table("graft.default.pe").count() == 4L) // data intact
  }

  test("CALL sys.vacuum deletes aged orphans; errors are actionable") {
    spark.sql("CREATE TABLE graft.default.pv (k BIGINT)")
    spark.sql("INSERT INTO graft.default.pv VALUES (1)")
    val dir = warehouse.resolve("default.db/pv")
    val orphan = dir.resolve("bucket-0/orphan-file.parquet")
    Files.createDirectories(orphan.getParent)
    Files.write(orphan, Array[Byte](1, 2, 3))
    Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 7200000L))
    val r = spark.sql(
      "CALL graft.sys.vacuum('default.pv', older_than_millis => 3600000)")
      .collect()
    assert(r(0).getInt(0) == 1 && !Files.exists(orphan))
    // unknown procedure / bad table arg
    val e1 = intercept[Exception](spark.sql(
      "CALL graft.sys.nope('default.pv')").collect())
    assert(e1.getMessage.contains("nope"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "CALL graft.sys.compact('no_dot')").collect())
    assert(e2.getMessage.contains("no_dot"), e2.getMessage)
  }
}
