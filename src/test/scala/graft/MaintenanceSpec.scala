package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.api._
import graft.format.SnapshotManager
import java.nio.file.Files

/** Time travel, statistics-driven planning, and compaction. */
class MaintenanceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var warehouse: java.nio.file.Path = _

  lazy val spark: SparkSession = {
    warehouse = Files.createTempDirectory("graft-maint-wh")
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

  test("VERSION AS OF reads historical snapshots") {
    spark.sql("CREATE TABLE graft.default.tt (f0 INT)")
    spark.sql("INSERT INTO graft.default.tt VALUES (1)")
    spark.sql("INSERT INTO graft.default.tt VALUES (2)")
    spark.sql("INSERT OVERWRITE graft.default.tt VALUES (9)")
    assert(spark.sql("SELECT * FROM graft.default.tt VERSION AS OF 1")
      .collect().map(_.getInt(0)).toSeq == Seq(1))
    assert(spark.sql("SELECT * FROM graft.default.tt VERSION AS OF 2 ORDER BY f0")
      .collect().map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(spark.table("graft.default.tt")
      .collect().map(_.getInt(0)).toSeq == Seq(9))
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft.default.tt VERSION AS OF 99").collect()
    }
    assert(e.getMessage.contains("does not exist"))
  }

  test("TIMESTAMP AS OF picks the snapshot at that time") {
    // all snapshots were committed before 'now'
    val got = spark.sql(
      "SELECT * FROM graft.default.tt TIMESTAMP AS OF current_timestamp()")
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(9))
  }

  test("scan statistics enable broadcast of a small graft table") {
    spark.sql("CREATE TABLE graft.default.dim (k INT, name STRING)")
    spark.sql("INSERT INTO graft.default.dim VALUES (1,'a'), (2,'b')")
    val plan = spark.sql(
      """SELECT * FROM graft.default.tt t JOIN graft.default.dim d ON t.f0 = d.k""")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("compaction merges small files and preserves the merged view") {
    val catalog = Catalog.create(spark,
      Map("warehouse" -> warehouse.toString, "catalog-name" -> "graft"))
    spark.sql("CREATE TABLE graft.default.cmp (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1')")
    spark.sql("INSERT INTO graft.default.cmp VALUES (1,'a'), (2,'b')")
    spark.sql("INSERT INTO graft.default.cmp VALUES (2,'B'), (3,'c')")
    spark.sql("INSERT INTO graft.default.cmp VALUES (1,'A')")

    val table = catalog.getTable("default.cmp")
    val before = new SnapshotManager(table.tableDir).liveFilesLatest
    assert(before.size >= 3)

    val n = table.compact()
    assert(n == 1)

    val after = new SnapshotManager(table.tableDir).liveFilesLatest
    assert(after.size == 1)
    assert(after.head.fileName.contains("compact-"))
    val snap = new SnapshotManager(table.tableDir).latestSnapshot.get
    assert(snap.commitKind == "COMPACT")

    val got = spark.sql("SELECT k, v FROM graft.default.cmp ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "A"), (2L, "B"), (3L, "c")))

    // compaction is idempotent when nothing to do
    assert(table.compact() == 0)
  }

  test("commit-triggered compaction: Nth small commit publishes a second, COMPACT snapshot") {
    spark.sql("CREATE TABLE graft.default.cmp_auto (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1', " +
      "'compaction.trigger-file-count'='3')")
    spark.sql("INSERT INTO graft.default.cmp_auto VALUES (1,'a')")
    spark.sql("INSERT INTO graft.default.cmp_auto VALUES (2,'b')")
    val smDir = warehouse.resolve("default.db/cmp_auto")
    assert(new SnapshotManager(smDir).latestSnapshot.get.commitKind == "APPEND")
    // third commit reaches the trigger → data snapshot + compact snapshot
    spark.sql("INSERT INTO graft.default.cmp_auto VALUES (1,'A')")
    val sm = new SnapshotManager(smDir)
    assert(sm.latestSnapshot.get.commitKind == "COMPACT",
      "trigger commit must publish a second, COMPACT snapshot")
    assert(sm.existingSnapshotIds.size == 4) // 3 APPEND + 1 COMPACT
    assert(sm.liveFilesLatest.size == 1)
    val got = spark.sql("SELECT k, v FROM graft.default.cmp_auto ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "A"), (2L, "b")))
    // a write-only writer never triggers
    spark.sql("CREATE TABLE graft.default.cmp_wo (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1', " +
      "'compaction.trigger-file-count'='2', 'write-only'='true')")
    (1 to 3).foreach(i =>
      spark.sql(s"INSERT INTO graft.default.cmp_wo VALUES ($i,'x')"))
    assert(new SnapshotManager(warehouse.resolve("default.db/cmp_wo"))
      .existingSnapshotIds.size == 3)
  }

  test("metadata columns expose file / sequence / row kind") {
    val rows = spark.sql(
      "SELECT k, v, _sequence_number, _row_kind, _file FROM graft.default.cmp ORDER BY k")
      .collect()
    assert(rows.forall(r => !r.isNullAt(2) && r.getInt(3) == 0))
    assert(rows.forall(_.getString(4).contains("bucket-")))
    // append tables expose only _file
    val f = spark.sql("SELECT _file FROM graft.default.tt").collect()
    assert(f.forall(_.getString(0).endsWith(".parquet")))
    val e = intercept[Exception] {
      spark.sql("SELECT _sequence_number FROM graft.default.tt").collect()
    }
    assert(e.getMessage.contains("_sequence_number"))
  }

  test("$snapshots and $files system tables") {
    val snaps = spark.sql(
      "SELECT snapshot_id, commit_kind FROM graft.default.`cmp$snapshots` ORDER BY snapshot_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(snaps.length >= 4)
    assert(snaps.take(3).forall(_._2 == "APPEND"))
    assert(snaps.map(_._2).contains("COMPACT"))
    val files = spark.sql(
      "SELECT file_name, bucket, row_count, min_seq, max_seq FROM graft.default.`cmp$files`")
      .collect()
    assert(files.nonEmpty)
    assert(files.forall(_.getLong(2) > 0))
    // projection pruning works on system tables
    assert(spark.sql("SELECT commit_kind FROM graft.default.`cmp$snapshots`")
      .columns.toSeq == Seq("commit_kind"))
  }

  test("$partitions rolls up live files per partition, metadata-only") {
    spark.sql("CREATE TABLE graft.default.mp (pt STRING, v BIGINT) " +
      "PARTITIONED BY (pt)")
    spark.sql("INSERT INTO graft.default.mp " +
      "SELECT CASE WHEN id < 60 THEN 'a' ELSE 'b' END, id " +
      "FROM range(0, 100, 1, 1)")
    spark.sql("INSERT INTO graft.default.mp VALUES ('a', 1000)")
    val got = spark.sql("SELECT partition, record_count, file_count " +
      "FROM graft.default.`mp$partitions` ORDER BY partition")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("pt=a", 61L, 2L), ("pt=b", 40L, 1L)))
  }

  test("expireSnapshots keeps recent time travel, frees old files") {
    val catalog = Catalog.create(spark,
      Map("warehouse" -> warehouse.toString, "catalog-name" -> "graft"))
    spark.sql("CREATE TABLE graft.default.exp (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1')")
    (1 to 6).foreach(i =>
      spark.sql(s"INSERT INTO graft.default.exp VALUES ($i, 'v$i'), (1, 'u$i')"))
    val t = catalog.getTable("default.exp")
    t.compact()
    // retaining 2 would keep the pre-compaction snapshot live (its
    // files stay reachable); retain only the compacted snapshot to
    // free the pre-compact files
    val res = t.expireSnapshots(retainLast = 1)
    assert(res.expiredSnapshots >= 5)
    assert(res.deletedDataFiles >= 1)
    // manifests stay: the retained snapshot's list references the whole
    // chain until folding (at 50 commits) shrinks it
    // current read intact
    assert(spark.table("graft.default.exp").count() == 6)
    // expired snapshot unreadable
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft.default.exp VERSION AS OF 1").collect()
    }
    assert(e.getMessage.nonEmpty)
    // new commits keep working after expiry
    spark.sql("INSERT INTO graft.default.exp VALUES (99, 'post')")
    assert(spark.table("graft.default.exp").count() == 7)

    // $snapshots lists only what survives (ids now have a gap at 1..)
    val ids = spark.sql(
      "SELECT snapshot_id FROM graft.default.`exp$snapshots` ORDER BY 1")
      .collect().map(_.getLong(0))
    assert(ids.nonEmpty && ids.head > 1,
      s"expired ids must be gone from \\$$snapshots, got ${ids.mkString(",")}")

    // a fresh stream that would need the expired history fails with a
    // RETENTION error, not a raw missing-file crash
    import org.apache.spark.sql.streaming.Trigger
    val se = intercept[Exception] {
      val q = spark.readStream.table("graft.default.exp")
        .writeStream.format("memory").queryName("exp_expired_stream")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(se).exists(_.contains("expired")),
      s"expected a retention error, got: ${messages(se).mkString(" | ")}")
  }

  test("TIMESTAMP AS OF after expiry: retention error, recent ts still works") {
    // self-contained: build and expire a dedicated table so the test
    // also passes in isolation. Expiry leaves an id gap at the front;
    // time travel must enumerate only surviving snapshot files — not
    // `1 to latest`, which would crash on the gap.
    val catalog = Catalog.create(spark,
      Map("warehouse" -> warehouse.toString, "catalog-name" -> "graft"))
    spark.sql("CREATE TABLE graft.default.exp_ts (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1')")
    (1 to 3).foreach(i =>
      spark.sql(s"INSERT INTO graft.default.exp_ts VALUES ($i, 'v$i')"))
    val t = catalog.getTable("default.exp_ts")
    t.compact()
    assert(t.expireSnapshots(retainLast = 1).expiredSnapshots >= 2)
    assert(spark.sql(
      "SELECT * FROM graft.default.exp_ts TIMESTAMP AS OF current_timestamp()")
      .count() == 3)
    // a timestamp before the oldest retained snapshot → clear retention
    // error, not a raw NoSuchFileException from a missing snapshot file
    val e = intercept[Exception] {
      spark.sql(
        "SELECT * FROM graft.default.exp_ts TIMESTAMP AS OF '2000-01-01 00:00:00'")
        .collect()
    }
    assert(e.getMessage.contains("expireSnapshots"),
      s"expected a retention error, got: ${e.getMessage}")
  }

  test("vacuum removes orphaned data files") {
    // self-contained: a dedicated table, so the test passes in
    // isolation instead of depending on the expiry test's leftovers
    val catalog = Catalog.create(spark,
      Map("warehouse" -> warehouse.toString, "catalog-name" -> "graft"))
    spark.sql("CREATE TABLE graft.default.vac (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1')")
    (1 to 3).foreach(i =>
      spark.sql(s"INSERT INTO graft.default.vac VALUES ($i, 'v$i')"))
    val t = catalog.getTable("default.vac")
    // plant an orphan next to real data
    val bucketDir = t.tableDir.resolve("bucket-0")
    val orphan = bucketDir.resolve("data-orphan.parquet")
    Files.write(orphan, Array[Byte](1, 2, 3))
    Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 7200_000L))
    val n = t.vacuum(olderThanMillis = 3600_000L)
    assert(n == 1)
    assert(!Files.exists(orphan))
    assert(spark.table("graft.default.vac").count() == 3)
  }

  test("expiry never touches uncommitted staged files (in-flight writer)") {
    val catalog = Catalog.create(spark,
      Map("warehouse" -> warehouse.toString, "catalog-name" -> "graft"))
    spark.sql("CREATE TABLE graft.default.exp_inflight (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1')")
    (1 to 3).foreach(i =>
      spark.sql(s"INSERT INTO graft.default.exp_inflight VALUES ($i, 'v$i')"))
    val t = catalog.getTable("default.exp_inflight")
    // simulate a writer task that finished its file but whose commit
    // has not published yet: the file exists in the bucket dir and no
    // manifest references it. Expiry must leave it alone — deleting it
    // would corrupt the snapshot about to be committed (only the
    // age-gated vacuum may reclaim it if the commit never lands).
    val staged = t.tableDir.resolve("bucket-0")
      .resolve("data-inflight-test.parquet")
    Files.write(staged, Array[Byte](9, 9, 9))
    val res = t.expireSnapshots(retainLast = 1)
    assert(res.expiredSnapshots >= 2)
    assert(Files.exists(staged),
      "expiry deleted an uncommitted staged data file")
    Files.delete(staged)
    assert(spark.table("graft.default.exp_inflight").count() == 3)
  }

  test("a foreign file in the snapshot dir does not brick the table") {
    val catalog = Catalog.create(spark,
      Map("warehouse" -> warehouse.toString, "catalog-name" -> "graft"))
    spark.sql("CREATE TABLE graft.default.exp_bak (k BIGINT)")
    spark.sql("INSERT INTO graft.default.exp_bak VALUES (1), (2)")
    val t = catalog.getTable("default.exp_bak")
    // an operator backup next to a real snapshot must be ignored, not
    // explode every listing with NumberFormatException
    val snapDir = t.tableDir.resolve("snapshot")
    Files.copy(snapDir.resolve("snapshot-1"),
      snapDir.resolve("snapshot-1.bak"))
    assert(spark.table("graft.default.exp_bak").count() == 2)
    spark.sql("INSERT INTO graft.default.exp_bak VALUES (3)")
    assert(spark.table("graft.default.exp_bak").count() == 3)
  }

  test("upserts after compaction still win by sequence number") {
    spark.sql("INSERT INTO graft.default.cmp VALUES (2,'B2')")
    val got = spark.sql("SELECT k, v FROM graft.default.cmp ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "A"), (2L, "B2"), (3L, "c")))
  }

  test("tags: VERSION AS OF '<name>' pins the tagged snapshot and " +
      "survives expiry") {
    spark.sql("CREATE TABLE graft.default.tg (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.default.tg VALUES (1,'v1')")
    val sm = new SnapshotManager(warehouse.resolve("default.db/tg"))
    sm.createTag("corpus-v1") // pins snapshot 1
    (2 to 6).foreach(i =>
      spark.sql(s"INSERT INTO graft.default.tg VALUES ($i,'v$i')"))
    // by-name time travel
    assert(spark.sql(
      "SELECT k FROM graft.default.tg VERSION AS OF 'corpus-v1'")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // t$tags lists it
    val tags = spark.sql("SELECT tag_name, snapshot_id FROM " +
      "graft.default.`tg$tags`").collect()
    assert(tags.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("corpus-v1", 1L)))
    // retention: expire everything but the last 2 snapshots — the
    // tagged state must STILL read exactly, even though snapshot-1's
    // own JSON is gone
    graft.format.Maintenance.expireSnapshots(
      warehouse.resolve("default.db/tg"), retainLast = 2)
    assert(!sm.existingSnapshotIds.contains(1L),
      "snapshot 1's JSON should have expired (the tag carries a copy)")
    assert(spark.sql(
      "SELECT k, v FROM graft.default.tg VERSION AS OF 'corpus-v1'")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "v1")))
    // vacuum must not touch tag-pinned data either
    graft.format.Maintenance.vacuumOrphans(
      warehouse.resolve("default.db/tg"), olderThanMillis = 0L)
    assert(spark.sql(
      "SELECT COUNT(*) FROM graft.default.tg VERSION AS OF 'corpus-v1'")
      .collect()(0).getLong(0) == 1L)
    // current reads unaffected
    assert(spark.table("graft.default.tg").count() == 6L)
    // a RECORDED numeric reference to the tagged snapshot keeps
    // working too (resolved through the tag copy, like the name)
    assert(spark.sql("SELECT k FROM graft.default.tg VERSION AS OF 1")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // widening the retention AFTER a tighter expiry must not trip over
    // the ids the earlier run already removed (gap-safe window)
    val r2 = graft.format.Maintenance.expireSnapshots(
      warehouse.resolve("default.db/tg"), retainLast = 4)
    assert(r2.expiredSnapshots == 0, r2.toString)
  }

  test("tags: name validation, duplicates, delete frees retention") {
    val dir = warehouse.resolve("default.db/tg")
    val sm = new SnapshotManager(dir)
    intercept[IllegalArgumentException](sm.createTag("1234")) // numeric
    intercept[IllegalArgumentException](sm.createTag("-1")) // parses as Long
    intercept[IllegalArgumentException](sm.createTag("bad name"))
    intercept[IllegalArgumentException](sm.createTag("corpus-v1")) // dup
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM graft.default.tg VERSION AS OF 'nope'").collect())
    assert(e.getMessage.contains("nope"), e.getMessage)
    // deleting the tag releases the pin: after expiry the old state is
    // unreachable and the files become vacuumable
    assert(sm.deleteTag("corpus-v1"))
    graft.format.Maintenance.expireSnapshots(dir, retainLast = 2)
    graft.format.Maintenance.vacuumOrphans(dir, olderThanMillis = 0L)
    val e2 = intercept[Exception](spark.sql(
      "SELECT * FROM graft.default.tg VERSION AS OF 'corpus-v1'").collect())
    assert(e2.getMessage.contains("corpus-v1"))
    assert(spark.table("graft.default.tg").count() == 6L)
  }

  test("$options, $schemas and $manifests system tables") {
    spark.sql("CREATE TABLE graft.default.meta3 (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('primary-key'='k', 'bucket'='2', " +
      "'merge-engine'='aggregation', " +
      "'fields.v.aggregate-function'='sum', " +
      "'compaction.trigger-file-count'='3')")
    spark.sql("INSERT INTO graft.default.meta3 VALUES (1, 10), (2, 20)")
    spark.sql("INSERT INTO graft.default.meta3 VALUES (1, 5)")
    spark.sql("ALTER TABLE graft.default.meta3 ADD COLUMN w BIGINT")

    // $options: the stored option map as rows (structural ones too)
    val opts = spark.sql(
      "SELECT key, value FROM graft.default.`meta3$options`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(opts("merge-engine") == "aggregation")
    assert(opts("fields.v.aggregate-function") == "sum")
    assert(opts("bucket") == "2")

    // $schemas: the full lineage — CREATE (id 0) and the ADD (id 1);
    // the added column appears only in the later era's field JSON
    val schemas = spark.sql("SELECT schema_id, fields, primary_keys " +
      "FROM graft.default.`meta3$schemas` ORDER BY schema_id").collect()
    assert(schemas.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(!schemas(0).getString(1).contains("\"w\""))
    assert(schemas(1).getString(1).contains("\"w\""))
    assert(schemas.forall(_.getString(2).contains("\"k\"")))

    // $manifests: two append commits → two manifests, adds only
    val m1 = spark.sql("SELECT num_added_files, num_deleted_files, " +
      "added_row_count FROM graft.default.`meta3$manifests`").collect()
    assert(m1.length == 2, m1.mkString(","))
    assert(m1.map(_.getLong(2)).sum == 3L) // 3 physical rows written
    assert(m1.forall(_.getLong(1) == 0L))
    // trip compaction (per-bucket trigger: key 1's bucket reaches 3
    // files): the COMPACT snapshot's chain carries DELETEs of the
    // folded-away files
    spark.sql("INSERT INTO graft.default.meta3 VALUES (1, 1, NULL)")
    val m2 = spark.sql("SELECT num_deleted_files " +
      "FROM graft.default.`meta3$manifests`").collect()
    assert(m2.map(_.getLong(0)).sum > 0L,
      "post-compaction chain must record deleted files")
    // and the folded table still reads correctly through it all
    assert(spark.sql("SELECT v FROM graft.default.meta3 WHERE k = 1")
      .collect().map(_.getLong(0)).toSeq == Seq(16L))
  }

  test("COMMENT ON TABLE ... IS NULL clears the comment") {
    // Spark emits removeProperty(\"comment\") for a NULL comment; the
    // comment lives in its own schema field, so the options-map removal
    // alone would silently no-op
    spark.sql("CREATE TABLE graft.default.cmt (k BIGINT) COMMENT 'hello'")
    def comment(): Option[String] =
      graft.core.TableSchema.load(warehouse.resolve("default.db/cmt"))
        .get.comment
    assert(comment().contains("hello"))
    spark.sql("COMMENT ON TABLE graft.default.cmt IS 'world'")
    assert(comment().contains("world"))
    spark.sql("COMMENT ON TABLE graft.default.cmt IS NULL")
    assert(comment().isEmpty, "NULL comment must clear the stored comment")
  }

  test("manifest chain folds under compaction-heavy histories too") {
    // trigger-file-count=1 makes EVERY insert publish data + COMPACT
    // snapshots; 30 inserts = 60 commits, past the 50-manifest bound.
    // Folding used to live only in the data-commit path, so a table
    // maintained by compaction grew its chain without limit — O(commits)
    // manifest reads on every plan instead of O(live files).
    spark.sql("CREATE TABLE graft.default.foldc (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('primary-key'='k', 'bucket'='1', " +
      "'compaction.trigger-file-count'='1')")
    (1 to 30).foreach(i =>
      spark.sql(s"INSERT INTO graft.default.foldc VALUES (${i % 7}, $i)"))
    val sm = new SnapshotManager(warehouse.resolve("default.db/foldc"))
    val chain = sm.latestSnapshot.get.manifests
    assert(chain.size <= 51, s"chain must fold: ${chain.size} manifests")
    // reads stay exact through the folded chain (LWW per key: the
    // largest i <= 30 with i % 7 == k wins)
    assert(spark.sql("SELECT k, v FROM graft.default.foldc ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq(0L -> 28L, 1L -> 29L, 2L -> 30L, 3L -> 24L, 4L -> 25L,
        5L -> 26L, 6L -> 27L))
  }

  test("compaction of an all-tombstone bucket commits a pure delete") {
    // delete every key, then force compaction: the merge drops all
    // rows, and the COMPACT snapshot must carry only DELETEs — an
    // empty data file would be opened by every later scan forever
    spark.sql("CREATE TABLE graft.default.alldel (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('primary-key'='k', 'bucket'='1')")
    spark.sql("INSERT INTO graft.default.alldel VALUES (1, 1), (2, 2)")
    spark.sql("DELETE FROM graft.default.alldel WHERE k >= 0")
    assert(spark.table("graft.default.alldel").count() == 0L)
    spark.sql("CALL graft.sys.compact('default.alldel')")
    val sm = new SnapshotManager(warehouse.resolve("default.db/alldel"))
    assert(sm.existingSnapshotIds.map(id => sm.snapshot(id).commitKind)
      .contains("COMPACT"))
    val live = sm.liveFilesLatest
    assert(live.isEmpty, s"all-tombstone compaction left files: " +
      live.map(f => s"${f.fileName}(${f.rowCount})").mkString(", "))
    assert(spark.table("graft.default.alldel").count() == 0L)
    // ...and the table keeps working after (insert into the emptied bucket)
    spark.sql("INSERT INTO graft.default.alldel VALUES (3, 3)")
    assert(spark.table("graft.default.alldel").count() == 1L)
  }

  test("rollback racing expiry: the revert is undone and fails loudly") {
    // simulate expiry reclaiming the target mid-rollback: the target's
    // snapshot JSON vanishes exactly while the revert publishes (expiry
    // deletes snapshot files first). rollbackTo must detect the lost
    // pin post-publish, restore the pre-rollback state, and throw —
    // never leave a latest snapshot whose manifests are being deleted.
    spark.sql("CREATE TABLE graft.default.rb_race (k BIGINT)")
    (1 to 3).foreach(i =>
      spark.sql(s"INSERT INTO graft.default.rb_race VALUES ($i)"))
    val dir = warehouse.resolve("default.db/rb_race")
    val plain = graft.format.FileIO.local
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val io = new graft.format.FileIO {
      def putIfAbsent(p: java.nio.file.Path, c: String): Boolean = {
        if (p.getFileName.toString.startsWith("snapshot-") &&
            fired.compareAndSet(false, true))
          plain.delete(dir.resolve("snapshot").resolve("snapshot-1"))
        plain.putIfAbsent(p, c)
      }
      def readString(p: java.nio.file.Path): String = plain.readString(p)
      def readBytes(p: java.nio.file.Path): Array[Byte] = plain.readBytes(p)
      def writeAtomic(p: java.nio.file.Path, b: Array[Byte]): Unit =
        plain.writeAtomic(p, b)
      def list(d: java.nio.file.Path): Seq[String] = plain.list(d)
      def walk(d: java.nio.file.Path): Seq[graft.format.FileIO.FileEntry] =
        plain.walk(d)
      def exists(p: java.nio.file.Path): Boolean = plain.exists(p)
      def delete(p: java.nio.file.Path): Boolean = plain.delete(p)
      def size(p: java.nio.file.Path): Long = plain.size(p)
      def createDirectories(d: java.nio.file.Path): Unit =
        plain.createDirectories(d)
      def stageForRead(p: java.nio.file.Path): java.nio.file.Path =
        plain.stageForRead(p)
      def unstage(o: java.nio.file.Path, s: java.nio.file.Path): Unit =
        plain.unstage(o, s)
      def publishFile(t: java.nio.file.Path, tg: java.nio.file.Path): Unit =
        plain.publishFile(t, tg)
    }
    val e = intercept[IllegalStateException](
      graft.format.Maintenance.rollbackTo(dir, 1L, io))
    assert(e.getMessage.contains("lost a race"), e.getMessage)
    assert(fired.get)
    // the pre-rollback state is restored and fully readable
    assert(spark.sql("SELECT k FROM graft.default.rb_race ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // the chain carries the revert AND its undo (monotone ids, nothing
    // deleted by the rollback itself)
    val sm = new SnapshotManager(dir)
    assert(sm.latestSnapshotId.contains(5L),
      s"expected revert(4)+undo(5): ${sm.existingSnapshotIds}")
    // a NON-raced rollback to a still-pinned target works normally
    val r = graft.format.Maintenance.rollbackTo(dir, 2L)
    assert(r.targetSnapshotId == 2L)
    assert(spark.sql("SELECT k FROM graft.default.rb_race ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("rollback across a merge-rule change is fenced") {
    // the one path that can resurrect committed history: rows written
    // under the old fold, all deleted (so the fold ALTER legitimately
    // passes its no-committed-history guard), then a rollback to the
    // pre-delete snapshot — the restored rows would silently re-fold
    // under the new rules on the next merge/compaction. The rollback
    // must refuse with the net-rule fence.
    spark.sql("CREATE TABLE graft.default.rb_fence (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('primary-key'='k', 'bucket'='1', " +
      "'merge-engine'='aggregation')")
    spark.sql("INSERT INTO graft.default.rb_fence VALUES (1, 10), (2, 20)")
    val dir = warehouse.resolve("default.db/rb_fence")
    val dataSnap = new SnapshotManager(dir).latestSnapshotId.get
    spark.sql("DELETE FROM graft.default.rb_fence WHERE k IN (1, 2)")
    assert(spark.table("graft.default.rb_fence").count() == 0L)
    // legal: zero committed rows remain
    spark.sql("ALTER TABLE graft.default.rb_fence SET TBLPROPERTIES " +
      "('fields.v.aggregate-function'='sum')")
    val e = intercept[IllegalStateException](
      graft.format.Maintenance.rollbackTo(dir, dataSnap))
    assert(e.getMessage.contains("Cannot roll back"), e.getMessage)
    assert(e.getMessage.contains("merge"), e.getMessage)
    // state unchanged: still empty, still at the marker head
    assert(spark.table("graft.default.rb_fence").count() == 0L)
    // rollback to a snapshot COMMITTED UNDER the new rules stays legal
    spark.sql("INSERT INTO graft.default.rb_fence VALUES (3, 5)")
    val newSnap = new SnapshotManager(dir).latestSnapshotId.get
    spark.sql("INSERT INTO graft.default.rb_fence VALUES (3, 7)")
    val r = graft.format.Maintenance.rollbackTo(dir, newSnap)
    assert(r.targetSnapshotId == newSnap)
    assert(spark.sql("SELECT v FROM graft.default.rb_fence WHERE k = 3")
      .collect()(0).getLong(0) == 5L)
  }

  test("expiry retains each streaming query's newest identity snapshot") {
    // the replay guard (GraftStreamingWrite.lastCommittedEpoch) reads
    // "<queryId>/<epochId>" identities from the snapshot chain; if
    // expiry dropped a down query's newest identity snapshot, its
    // replayed epoch would double-commit on aggregation tables. The
    // newest snapshot per distinct queryId must therefore survive any
    // retainLast; SUPERSEDED identities of the same query expire.
    spark.sql("CREATE TABLE graft.default.exp_q (k BIGINT, v BIGINT)")
    (1 to 3).foreach(i =>
      spark.sql(s"INSERT INTO graft.default.exp_q VALUES ($i, $i)"))
    val dir = warehouse.resolve("default.db/exp_q")
    val sm = new SnapshotManager(dir)
    // forge streaming-identity snapshots on top of the batch chain
    // (same manifests as latest — identity is all expiry looks at)
    val base = sm.latestSnapshot.get // id 3
    def forge(id: Long, ident: String): Unit = assert(sm.tryCommitSnapshot(
      base.copy(id = id, commitIdentifier = Some(ident),
        timeMillis = System.currentTimeMillis())))
    forge(4L, "qA/7")
    forge(5L, "qA/8") // qA's newest
    forge(6L, "qB/3") // qB's newest
    (7 to 8).foreach(i =>
      spark.sql(s"INSERT INTO graft.default.exp_q VALUES ($i, $i)"))
    val res = graft.format.Maintenance.expireSnapshots(dir, retainLast = 1)
    val left = sm.existingSnapshotIds
    assert(left.contains(5L), s"qA's newest identity must survive: $left")
    assert(left.contains(6L), s"qB's newest identity must survive: $left")
    assert(!left.contains(4L), s"superseded qA/7 must expire: $left")
    assert(!left.contains(3L) && !left.contains(1L),
      s"plain batch history must still expire: $left")
    assert(res.expiredSnapshots > 0)
    // the pinned snapshots stay fully READABLE (their manifests and
    // files survived), so the replay guard can also keep time-walking
    assert(sm.snapshot(5L).commitIdentifier.contains("qA/8"))
    assert(sm.liveFiles(sm.snapshot(5L)).nonEmpty)
    assert(spark.table("graft.default.exp_q").count() == 5L)
    // ...but a pin must not anchor a DEAD query's files forever: once
    // the identity snapshot exceeds streaming.identity.retain-millis,
    // the pin lapses and normal retention reclaims it
    spark.sql("ALTER TABLE graft.default.exp_q " +
      "SET TBLPROPERTIES ('streaming.identity.retain-millis'='60000')")
    val old = sm.snapshot(5L)
    assert(sm.existingSnapshotIds.contains(5L))
    // rewrite snapshot-5 with a time beyond the 60s TTL (test-only
    // surgery; identity and manifests unchanged)
    java.nio.file.Files.writeString(
      dir.resolve("snapshot").resolve("snapshot-5"),
      old.copy(timeMillis = old.timeMillis - 120000).toJson)
    graft.format.Maintenance.expireSnapshots(dir, retainLast = 1)
    val left2 = sm.existingSnapshotIds
    assert(!left2.contains(5L),
      s"a TTL-lapsed identity pin must expire: $left2")
    assert(left2.contains(6L), s"a young pin still survives: $left2")
    assert(spark.table("graft.default.exp_q").count() == 5L)
  }

  test("snapshotOrTagged: only not-found falls back to tags; corruption " +
      "propagates") {
    spark.sql("CREATE TABLE graft.default.sot (k BIGINT)")
    spark.sql("INSERT INTO graft.default.sot VALUES (1)")
    spark.sql("INSERT INTO graft.default.sot VALUES (2)")
    val dir = warehouse.resolve("default.db/sot")
    val sm = new SnapshotManager(dir)
    sm.createTag("pin1", Some(1L))
    // corrupt (not remove) snapshot-1: resolution must surface the
    // corruption instead of silently serving the tag copy — masking it
    // would hide real store damage behind an O(tags) detour
    val f = dir.resolve("snapshot").resolve("snapshot-1")
    val original = Files.readString(f)
    Files.writeString(f, "{ this is not a snapshot }")
    val e = intercept[Throwable](sm.snapshotOrTagged(1L))
    assert(!e.isInstanceOf[java.nio.file.NoSuchFileException], e.toString)
    // genuinely MISSING still resolves through the tag copy
    Files.delete(f)
    assert(sm.snapshotOrTagged(1L).id == 1L)
    Files.writeString(f, original) // restore for later suites
  }

  test("expiry re-lists tags before deleting: a tag published mid-run " +
      "keeps its files") {
    spark.sql("CREATE TABLE graft.default.exp_race (k BIGINT, v BIGINT)")
    // snapshot 1's files must be genuinely at risk: the OVERWRITE makes
    // them dead in every later snapshot, so only a tag can save them
    spark.sql("INSERT INTO graft.default.exp_race VALUES (1, 1)")
    spark.sql("INSERT OVERWRITE graft.default.exp_race VALUES (2, 2)")
    (3 to 4).foreach(i =>
      spark.sql(s"INSERT INTO graft.default.exp_race VALUES ($i, $i)"))
    val dir = warehouse.resolve("default.db/exp_race")
    val plain = graft.format.FileIO.local
    // instrumented store: the first MANIFEST read (i.e. after expiry's
    // initial tag listing, while it computes reachability) publishes a
    // tag pinning snapshot 1 — exactly the interleaving the second
    // listing exists for
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val io = new graft.format.FileIO {
      private def hook(p: java.nio.file.Path): Unit =
        if (p.getParent != null &&
            p.getParent.getFileName.toString == "manifest" &&
            fired.compareAndSet(false, true))
          new SnapshotManager(dir).createTag("mid-run", Some(1L))
      def readString(p: java.nio.file.Path): String = {
        hook(p); plain.readString(p)
      }
      def readBytes(p: java.nio.file.Path): Array[Byte] = plain.readBytes(p)
      def writeAtomic(p: java.nio.file.Path, b: Array[Byte]): Unit =
        plain.writeAtomic(p, b)
      def putIfAbsent(p: java.nio.file.Path, c: String): Boolean =
        plain.putIfAbsent(p, c)
      def list(d: java.nio.file.Path): Seq[String] = plain.list(d)
      def walk(d: java.nio.file.Path): Seq[graft.format.FileIO.FileEntry] =
        plain.walk(d)
      def exists(p: java.nio.file.Path): Boolean = plain.exists(p)
      def delete(p: java.nio.file.Path): Boolean = plain.delete(p)
      def size(p: java.nio.file.Path): Long = plain.size(p)
      def createDirectories(d: java.nio.file.Path): Unit =
        plain.createDirectories(d)
      def stageForRead(p: java.nio.file.Path): java.nio.file.Path =
        plain.stageForRead(p)
      def unstage(o: java.nio.file.Path, s: java.nio.file.Path): Unit =
        plain.unstage(o, s)
      def publishFile(t: java.nio.file.Path, tg: java.nio.file.Path): Unit =
        plain.publishFile(t, tg)
    }
    graft.format.Maintenance.expireSnapshots(dir, retainLast = 1, io,
      olderThanMillis = None)
    assert(fired.get, "instrumentation never fired — test wiring broke")
    // the mid-run tag's state must read back exactly: its files were
    // candidates for deletion under the FIRST listing and only the
    // second listing saved them
    assert(spark.sql(
      "SELECT k FROM graft.default.exp_race VERSION AS OF 'mid-run'")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(spark.table("graft.default.exp_race").count() == 3L)
  }

  test("consumer progress is monotonic; a stale heartbeat stops " +
      "pinning retention") {
    spark.sql("CREATE TABLE graft.default.m_cons (f0 INT)")
    (1 to 4).foreach(i =>
      spark.sql(s"INSERT INTO graft.default.m_cons VALUES ($i)"))
    val dir = warehouse.resolve("default.db/m_cons")
    val io = graft.format.FileIO.resolve("local")

    graft.format.Consumers.record(dir, io, "lagger", 3L)
    // a zombie incarnation replaying an old batch cannot rewind the
    // pin (that would silently re-widen what expiry must retain)
    graft.format.Consumers.record(dir, io, "lagger", 1L)
    assert(graft.format.Consumers.get(dir, io, "lagger")
      .get.nextSnapshot == 3L)

    // live consumer at nextSnapshot=3: snapshots >= 2 survive (the
    // floor MINUS ONE — the changelog stream's pre-commit baseline of
    // the first unread snapshot must stay resolvable)
    graft.format.Maintenance.expireSnapshots(dir, 1)
    assert(new SnapshotManager(dir).existingSnapshotIds == Seq(2L, 3L, 4L))

    // heartbeat aged past consumer.retain-millis (default 7d): the pin
    // lapses — an abandoned id must not anchor the chain forever. A
    // CORRUPTED file (Long overflow) is skipped the same way instead
    // of aborting the whole expiry run.
    Files.writeString(dir.resolve("consumers").resolve("lagger"),
      """{"nextSnapshot":3,"ts":1}""")
    Files.writeString(dir.resolve("consumers").resolve("corrupt"),
      """{"nextSnapshot":99999999999999999999,"ts":1}""")
    assert(graft.format.Consumers.list(dir, io).map(_.id) == Seq("lagger"))
    graft.format.Maintenance.expireSnapshots(dir, 1)
    assert(new SnapshotManager(dir).existingSnapshotIds == Seq(4L))

    // ids that cannot become file names are rejected at the door
    intercept[IllegalArgumentException] {
      graft.format.Consumers.record(dir, io, "a/b", 1L)
    }
    intercept[IllegalArgumentException] {
      graft.format.Consumers.validateId(".hidden")
    }
  }

  test("expiry re-lists consumers before deleting: one registered " +
      "mid-run keeps its unread snapshots") {
    spark.sql("CREATE TABLE graft.default.exp_crace (k BIGINT)")
    (1 to 4).foreach(i =>
      spark.sql(s"INSERT INTO graft.default.exp_crace VALUES ($i)"))
    val dir = warehouse.resolve("default.db/exp_crace")
    val plain = graft.format.FileIO.local
    // instrumented store: the first MANIFEST read — after expiry's
    // initial consumer listing, while it computes reachability —
    // registers a consumer at nextSnapshot=3, exactly the stream-
    // starts-during-expiry interleaving the second listing closes
    // (floor 3 retains from 2 — the baseline snapshot included)
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val io = new graft.format.FileIO {
      private def hook(p: java.nio.file.Path): Unit =
        if (p.getParent != null &&
            p.getParent.getFileName.toString == "manifest" &&
            fired.compareAndSet(false, true))
          graft.format.Consumers.record(dir, plain, "mid-run", 3L)
      def readString(p: java.nio.file.Path): String = {
        hook(p); plain.readString(p)
      }
      def readBytes(p: java.nio.file.Path): Array[Byte] = plain.readBytes(p)
      def writeAtomic(p: java.nio.file.Path, b: Array[Byte]): Unit =
        plain.writeAtomic(p, b)
      def putIfAbsent(p: java.nio.file.Path, c: String): Boolean =
        plain.putIfAbsent(p, c)
      def list(d: java.nio.file.Path): Seq[String] = plain.list(d)
      def walk(d: java.nio.file.Path): Seq[graft.format.FileIO.FileEntry] =
        plain.walk(d)
      def exists(p: java.nio.file.Path): Boolean = plain.exists(p)
      def delete(p: java.nio.file.Path): Boolean = plain.delete(p)
      def size(p: java.nio.file.Path): Long = plain.size(p)
      def createDirectories(d: java.nio.file.Path): Unit =
        plain.createDirectories(d)
      def stageForRead(p: java.nio.file.Path): java.nio.file.Path =
        plain.stageForRead(p)
      def unstage(o: java.nio.file.Path, s: java.nio.file.Path): Unit =
        plain.unstage(o, s)
      def publishFile(t: java.nio.file.Path, tg: java.nio.file.Path): Unit =
        plain.publishFile(t, tg)
    }
    graft.format.Maintenance.expireSnapshots(dir, retainLast = 1, io,
      olderThanMillis = None)
    assert(fired.get, "instrumentation never fired — test wiring broke")
    // snapshots 2 and 3 were on the FIRST listing's delete list; only
    // the late consumer floor saved them (1 expires as before)
    assert(new SnapshotManager(dir).existingSnapshotIds == Seq(2L, 3L, 4L))
    // and the rescued range is actually readable end-to-end
    assert(spark.sql(
      "SELECT k FROM graft.default.exp_crace VERSION AS OF 2")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }
}
