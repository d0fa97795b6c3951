package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** End-to-end: a table whose DATA PLANE (snapshots, manifests, data
  * files) lives on a non-local FileIO, driven purely through Spark SQL
  * via the `io` table property. Catalog metadata (schema files) stays
  * with the catalog — the usual metadata/data split when tables live on
  * an object store. The in-memory FileIO stands in for the store; the
  * same spec string machinery resolves `s3:...` to [[S3FileIO]].
  */
class IoWiringSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var warehouse: java.nio.file.Path = _

  lazy val spark: SparkSession = {
    warehouse = Files.createTempDirectory("graft-iow-wh")
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

  /** The table's local dir must hold ONLY catalog metadata (schema/). */
  private def assertDataPlaneRemote(table: String): Unit = {
    val dir = warehouse.resolve("default.db").resolve(table)
    val local = Files.list(dir).iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(local)
      .asScala.map(_.getFileName.toString).toSet
    assert(names == Set("schema"),
      s"only schema/ may be local for $table, found $names")
  }

  test("PK table on memory FileIO: upsert, merge read, DML, time travel") {
    spark.sql("CREATE TABLE graft.default.io_pk (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k', 'bucket'='2', 'io'='memory:iow1')")
    spark.sql("INSERT INTO graft.default.io_pk VALUES (1,'a'), (2,'b'), (3,'c')")
    spark.sql("INSERT INTO graft.default.io_pk VALUES (2,'B'), (4,'d')")

    // merge-on-read across two remote commits
    val got = spark.sql("SELECT * FROM graft.default.io_pk ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d")))

    // time travel against remote snapshots
    assert(spark.sql("SELECT * FROM graft.default.io_pk VERSION AS OF 1")
      .count() == 3)
    // system table reads remote snapshot chain
    assert(spark.sql("SELECT count(*) FROM graft.default.`io_pk$snapshots`")
      .collect()(0).getLong(0) == 2L)

    // row-level DML: copy-on-write DELETE through the remote store
    spark.sql("DELETE FROM graft.default.io_pk WHERE k = 3")
    assert(spark.table("graft.default.io_pk").count() == 3)

    assertDataPlaneRemote("io_pk")
  }

  test("partitioned append table on memory FileIO: insert, prune, expire") {
    spark.sql("CREATE TABLE graft.default.io_app (pt STRING, v BIGINT) " +
      "PARTITIONED BY (pt) TBLPROPERTIES ('io'='memory:iow1')")
    spark.sql("INSERT INTO graft.default.io_app VALUES ('a', 1), ('b', 2)")
    spark.sql("INSERT INTO graft.default.io_app VALUES ('a', 3)")
    assert(spark.sql(
      "SELECT sum(v) FROM graft.default.io_app WHERE pt = 'a'")
      .collect()(0).getLong(0) == 4L)

    // maintenance: expiry walks the remote manifests, not the local disk
    val cat = graft.api.Catalog.create(spark,
      Map("warehouse" -> warehouse.toString, "catalog-name" -> "graft"))
    val t = cat.getTable("default.io_app")
    val res = t.expireSnapshots(retainLast = 1)
    assert(res.expiredSnapshots == 1)
    assert(spark.table("graft.default.io_app").count() == 3) // state intact

    // vacuum walks the REMOTE store (FileIO.walk carries LastModified):
    // plant an aborted-write orphan next to live data and reclaim it
    val fio = graft.format.FileIO.resolve("memory:iow1")
    val orphan = t.tableDir.resolve("pt=a/bucket-0/data-orphan.parquet")
    fio.writeAtomic(orphan, Array[Byte](1, 2, 3))
    assert(t.vacuum(olderThanMillis = -1000L) == 1)
    assert(!fio.exists(orphan))
    assert(spark.table("graft.default.io_app").count() == 3) // live data intact

    assertDataPlaneRemote("io_app")
  }

  test("DROP purges remote keys; re-CREATE starts empty; RENAME refuses") {
    spark.sql("CREATE TABLE graft.default.io_drop (id BIGINT) " +
      "TBLPROPERTIES ('io'='memory:iow1')")
    spark.sql("INSERT INTO graft.default.io_drop VALUES (1), (2), (3)")
    assert(spark.table("graft.default.io_drop").count() == 3)
    // rename would orphan every remote key (they embed the table path)
    val re = intercept[Exception](
      spark.sql("ALTER TABLE graft.default.io_drop RENAME TO default.io_drop2"))
    assert(re.getMessage.contains("RENAME is not supported"), re.getMessage)
    spark.sql("DROP TABLE graft.default.io_drop")
    // same name, same store: must NOT resurrect the dropped snapshots
    spark.sql("CREATE TABLE graft.default.io_drop (id BIGINT) " +
      "TBLPROPERTIES ('io'='memory:iow1')")
    assert(spark.table("graft.default.io_drop").count() == 0)
    spark.sql("INSERT INTO graft.default.io_drop VALUES (9)")
    assert(spark.table("graft.default.io_drop").count() == 1)
  }

  test("DROP NAMESPACE CASCADE purges remote tables too") {
    spark.sql("CREATE NAMESPACE graft.nsio")
    spark.sql("CREATE TABLE graft.nsio.t1 (id BIGINT) " +
      "TBLPROPERTIES ('io'='memory:iow_ns')")
    spark.sql("INSERT INTO graft.nsio.t1 VALUES (1), (2)")
    spark.sql("DROP NAMESPACE graft.nsio CASCADE")
    // a recreate of the same namespace + table name must start empty:
    // cascade must have routed through dropTable's remote purge, not
    // just deleted the local metadata dir
    spark.sql("CREATE NAMESPACE graft.nsio")
    spark.sql("CREATE TABLE graft.nsio.t1 (id BIGINT) " +
      "TBLPROPERTIES ('io'='memory:iow_ns')")
    assert(spark.table("graft.nsio.t1").count() == 0)
    spark.sql("DROP NAMESPACE graft.nsio CASCADE")
  }

  test("append scan on memory FileIO keeps the vectorized columnar path") {
    spark.sql("CREATE TABLE graft.default.io_col (id BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('io'='memory:iow1')")
    spark.sql("INSERT INTO graft.default.io_col " +
      "SELECT id, id * 1.5 FROM range(1000)")
    val df = spark.sql("SELECT id, v FROM graft.default.io_col WHERE id >= 10")
    // the remote data plane must NOT demote the scan to the staged row
    // reader: the graftio:// adapter keeps ColumnarBatch decoding
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"expected vectorized columnar scan on memory io, got:\n$plan")
    assert(df.count() == 990)
    assert(df.agg(org.apache.spark.sql.functions.sum("id"))
      .collect()(0).getLong(0) == (10L until 1000L).sum)
    assertDataPlaneRemote("io_col")
  }

  test("$changelog system table replays remote commits") {
    spark.sql("CREATE TABLE graft.default.io_cl (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k', 'bucket'='1', 'io'='memory:iow1')")
    spark.sql("INSERT INTO graft.default.io_cl VALUES (1,'a'), (2,'b'), (3,'c')")
    spark.sql("INSERT INTO graft.default.io_cl VALUES (2,'B'), (4,'d')")
    // the input changelog replay: 3 + 2 rows across the two commits
    assert(spark.sql(
      "SELECT count(*) FROM graft.default.`io_cl$changelog`")
      .collect()(0).getLong(0) == 5L)
    assertDataPlaneRemote("io_cl")
  }

  test("compaction rewrites a memory-backed PK table through the seam") {
    spark.sql("CREATE TABLE graft.default.io_cmp (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k', 'bucket'='1', 'io'='memory:iow1')")
    (1 to 4).foreach(i =>
      spark.sql(s"INSERT INTO graft.default.io_cmp VALUES ($i, 'v$i'), " +
        s"(${i + 10}, 'w$i')"))
    val cat = graft.api.Catalog.create(spark,
      Map("warehouse" -> warehouse.toString, "catalog-name" -> "graft"))
    val t = cat.getTable("default.io_cmp")
    t.compact()
    // merged view unchanged, rewrite published remotely
    assert(spark.table("graft.default.io_cmp").count() == 8)
    assert(spark.sql("SELECT v FROM graft.default.io_cmp WHERE k = 3")
      .collect()(0).getString(0) == "v3")
    assertDataPlaneRemote("io_cmp")
  }

  test("schema evolution on memory FileIO keeps columnar reads correct") {
    // footer-driven evolution (null-fill for pre-ADD files, widened
    // stored types) must hold when footers are read through graftio
    spark.sql("CREATE TABLE graft.default.io_evo (id BIGINT, v INT) " +
      "TBLPROPERTIES ('io'='memory:iow1')")
    spark.sql("INSERT INTO graft.default.io_evo VALUES (1, 10), (2, 20)")
    spark.sql("ALTER TABLE graft.default.io_evo ADD COLUMN s STRING")
    spark.sql("ALTER TABLE graft.default.io_evo ALTER COLUMN v TYPE BIGINT")
    spark.sql("INSERT INTO graft.default.io_evo VALUES (3, 30, 'x')")
    val got = spark.sql("SELECT id, v, s FROM graft.default.io_evo ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
    assert(got.toSeq ==
      Seq((1L, 10L, None), (2L, 20L, None), (3L, 30L, Some("x"))))
    val plan = spark.sql("SELECT id, v FROM graft.default.io_evo")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"evolved remote read must stay columnar:\n$plan")
    assertDataPlaneRemote("io_evo")
  }

  test("columnar remote scan survives partition values needing URI escaping") {
    // partition values land in data-file key paths; the graftio URI
    // construction must escape them (space, '#', '%') and the FS must
    // decode back to the exact store key
    spark.sql("CREATE TABLE graft.default.io_esc (pt STRING, v BIGINT) " +
      "PARTITIONED BY (pt) TBLPROPERTIES ('io'='memory:iow1')")
    spark.sql(
      "INSERT INTO graft.default.io_esc VALUES ('a b#c%d', 1), ('plain', 2)")
    assert(spark.sql("SELECT sum(v) FROM graft.default.io_esc")
      .collect()(0).getLong(0) == 3L)
    assert(spark.sql(
      "SELECT v FROM graft.default.io_esc WHERE pt = 'a b#c%d'")
      .collect()(0).getLong(0) == 1L)
  }

  test("streaming reads drain a memory-backed table") {
    spark.sql("CREATE TABLE graft.default.io_str (id BIGINT) " +
      "TBLPROPERTIES ('io'='memory:iow1')")
    spark.sql("INSERT INTO graft.default.io_str VALUES (1), (2)")
    val q = spark.readStream.option("consumer-id", "iopipe")
      .table("graft.default.io_str")
      .writeStream.format("memory").queryName("io_str_sink")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.sql("SELECT count(*) FROM io_str_sink")
      .collect()(0).getLong(0) == 2L)
    // the consumer file took the seam too: progress is on the store
    // (next unconsumed = 2), nothing but schema/ lands locally, and
    // the $consumers system table reads it back through the ioSpec
    val dir = warehouse.resolve("default.db").resolve("io_str")
    assert(graft.format.Consumers
      .get(dir, graft.format.FileIO.resolve("memory:iow1"), "iopipe")
      .exists(_.nextSnapshot == 2L))
    assert(spark.sql("SELECT next_snapshot_id FROM " +
      "graft.default.`io_str$consumers`").collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    assertDataPlaneRemote("io_str")
  }

  test("streaming WRITE lands on the remote data plane; epochs dedup") {
    spark.sql("CREATE TABLE graft.default.io_swsrc (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('io'='memory:iow1')")
    spark.sql("CREATE TABLE graft.default.io_swdst (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('primary-key'='k', 'bucket'='2', 'io'='memory:iow1')")
    spark.sql("INSERT INTO graft.default.io_swsrc VALUES (1, 10), (2, 20)")
    val ck = java.nio.file.Files.createTempDirectory("iow-swck").toString
    def drain(): Unit = {
      val q = spark.readStream.table("graft.default.io_swsrc")
        .writeStream.option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable("graft.default.io_swdst")
      q.awaitTermination()
    }
    drain()
    spark.sql("INSERT INTO graft.default.io_swsrc VALUES (1, 11)")
    drain() // checkpoint resume over the remote plane
    assert(spark.sql("SELECT k, v FROM graft.default.io_swdst ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 11L), (2L, 20L)))
    assertDataPlaneRemote("io_swdst")
    // the epoch identity is readable through the remote snapshot chain
    val sm = new graft.format.SnapshotManager(
      warehouse.resolve("default.db/io_swdst"),
      io = graft.format.FileIO.resolve("memory:iow1"))
    assert(sm.existingSnapshotIds.map(sm.snapshot)
      .flatMap(_.commitIdentifier).nonEmpty)
  }

  test("merge-rule ALTER fence rides the FileIO seam (marker remote, " +
      "schema local)") {
    // the fence's two halves touch different planes: the SCHEMA marker
    // snapshot must publish through the table's FileIO (remote), while
    // the lineage the commit fence reads stays in the local schema/ dir
    spark.sql("CREATE TABLE graft.default.iow_fence (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('primary-key'='k', 'bucket'='1', " +
      "'merge-engine'='aggregation', 'io'='memory:iow1')")
    spark.sql("ALTER TABLE graft.default.iow_fence SET TBLPROPERTIES " +
      "('fields.v.aggregate-function'='sum')")
    val dir = warehouse.resolve("default.db/iow_fence")
    val io = graft.format.FileIO.resolve("memory:iow1")
    val sm = new graft.format.SnapshotManager(dir, io = io)
    assert(sm.latestSnapshot.exists(s =>
      s.commitKind == "SCHEMA" && s.schemaId == 1L))
    assertDataPlaneRemote("iow_fence") // the marker did NOT land locally
    // a stale writer (schema 0) is fenced on the remote table too
    val e = intercept[IllegalStateException] {
      graft.format.FileStoreCommit.commit(sm, schemaId = 0L,
        partitionKeys = Seq.empty,
        newFiles = Seq(graft.format.DataFileMeta("bucket-0/x.parquet",
          10L, 1L, Seq.empty, 0, 0L, 0L, Map.empty)),
        mode = graft.format.FileStoreCommit.NoOverwrite)
    }
    assert(e.getMessage.contains("Commit fenced"))
    // a current-schema write proceeds normally through the seam
    spark.sql("INSERT INTO graft.default.iow_fence VALUES (1, 5), (1, 7)")
    val got = spark.sql(
      "SELECT v FROM graft.default.iow_fence WHERE k = 1")
      .collect()(0).getLong(0)
    assert(got == 12L, s"sum fold through the seam: $got")
  }

  test("tags pin remote snapshots through the seam") {
    spark.sql("CREATE TABLE graft.default.io_tag (k BIGINT) " +
      "TBLPROPERTIES ('io'='memory:iow1')")
    spark.sql("INSERT INTO graft.default.io_tag VALUES (1)")
    val dir = warehouse.resolve("default.db/io_tag")
    val sm = new graft.format.SnapshotManager(dir,
      io = graft.format.FileIO.resolve("memory:iow1"))
    sm.createTag("v1")
    spark.sql("INSERT INTO graft.default.io_tag VALUES (2), (3)")
    spark.sql("INSERT INTO graft.default.io_tag VALUES (4)")
    graft.format.Maintenance.expireSnapshots(dir, retainLast = 1,
      ioSpec = "memory:iow1")
    // tag file + pinned data live on the store, not the local fs
    assert(!java.nio.file.Files.exists(dir.resolve("tag")),
      "tag metadata must live on the remote plane")
    assert(spark.sql(
      "SELECT k FROM graft.default.io_tag VERSION AS OF 'v1'")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(spark.table("graft.default.io_tag").count() == 4L)
  }
}
