package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** `file.format` option parity (parquet default, orc, avro —
  * `test_preicates.py:36-37`): round-trips, PK merge, predicates, and
  * compaction across all three codecs, through Spark SQL.
  */
class FormatSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var warehouse: java.nio.file.Path = _

  lazy val spark: SparkSession = {
    warehouse = Files.createTempDirectory("graft-fmt-wh")
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

  Seq("orc", "avro").foreach { fmt =>
    test(s"$fmt: append round-trip with all primitive types") {
      spark.sql(s"CREATE TABLE graft.default.t_$fmt " +
        "(i TINYINT, s SMALLINT, n INT, l BIGINT, f FLOAT, d DOUBLE, " +
        "b BOOLEAN, str STRING, dt DATE, ts TIMESTAMP, bin BINARY) " +
        s"TBLPROPERTIES ('file.format'='$fmt')")
      spark.sql(s"INSERT INTO graft.default.t_$fmt VALUES " +
        "(CAST(1 AS TINYINT), CAST(10 AS SMALLINT), 100, 1000, " +
        "CAST(1.5 AS FLOAT), 2.5, true, 'hello', DATE'2024-03-01', " +
        "TIMESTAMP'2024-03-01 12:34:56.789123', CAST('xy' AS BINARY)), " +
        "(NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL)")
      val rows = spark.sql(
        s"SELECT * FROM graft.default.t_$fmt ORDER BY n NULLS LAST").collect()
      assert(rows.length == 2)
      val r = rows(0)
      assert(r.getByte(0) == 1 && r.getShort(1) == 10 && r.getInt(2) == 100)
      assert(r.getLong(3) == 1000L && r.getFloat(4) == 1.5f && r.getDouble(5) == 2.5)
      assert(r.getBoolean(6) && r.getString(7) == "hello")
      assert(r.getDate(8).toString == "2024-03-01")
      assert(r.getTimestamp(9).toString == "2024-03-01 12:34:56.789123")
      assert(new String(r.getAs[Array[Byte]](10)) == "xy")
      assert((0 until 11).forall(rows(1).isNullAt))
    }

    test(s"$fmt: PK merge-on-read and predicates") {
      spark.sql(s"CREATE TABLE graft.default.pk_$fmt (k BIGINT, v STRING) " +
        s"TBLPROPERTIES ('primary-key'='k','bucket'='2','file.format'='$fmt')")
      spark.sql(s"INSERT INTO graft.default.pk_$fmt VALUES (1,'a'), (2,'b'), (3,'c')")
      spark.sql(s"INSERT INTO graft.default.pk_$fmt VALUES (2,'B'), (4,'d')")
      val got = spark.sql(
        s"SELECT k, v FROM graft.default.pk_$fmt WHERE k <= 3 ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.toSeq == Seq((1L, "a"), (2L, "B"), (3L, "c")))
    }
  }

  test("orc: compaction rewrites in the table's format") {
    import graft.api._
    val catalog = Catalog.create(spark,
      Map("warehouse" -> warehouse.toString, "catalog-name" -> "graft"))
    val t = catalog.getTable("default.pk_orc")
    assert(t.compact() >= 1)
    val files = new graft.format.SnapshotManager(t.tableDir).liveFilesLatest
    assert(files.forall(_.fileName.endsWith(".orc")))
    val got = spark.sql("SELECT k, v FROM graft.default.pk_orc ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d")))
  }

  test("unknown file.format rejected at create") {
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft.default.badfmt (x INT) " +
        "TBLPROPERTIES ('file.format'='csv')")
    }
    assert(e.getMessage.contains("Unsupported file.format"))
  }

  test("sort-engine=loser-tree merges a PK table identically via SQL") {
    spark.sql("CREATE TABLE graft.default.pk_lt (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k', 'bucket'='1', " +
      "'sort-engine'='loser-tree')")
    spark.sql("INSERT INTO graft.default.pk_lt VALUES (1,'a'), (2,'b'), (3,'c')")
    spark.sql("INSERT INTO graft.default.pk_lt VALUES (2,'B'), (4,'d')")
    val got = spark.sql("SELECT * FROM graft.default.pk_lt ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d")))
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft.default.pk_bad (k BIGINT) " +
        "TBLPROPERTIES ('primary-key'='k', 'bucket'='1', " +
        "'sort-engine'='bogo-sort')")
    }
    assert(e.getMessage.contains("sort-engine"))
  }

  test("table IO end-to-end through a non-local FileIO (object-store seam)") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    import graft.format._
    val io = FileIO.inMemory()
    // an abstract key prefix: no directory with this name may ever
    // appear on the local filesystem
    val dir = java.nio.file.Paths.get("/graft-mem-seam/tbl")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))

    // data file via the staged writer (local temp -> publish to store)
    val dataName = "bucket-0/f1.parquet"
    val w = FormatIO.writer("parquet", dir.resolve(dataName), schema, io = io)
    (1L to 5L).foreach(i => w.write(
      new GenericInternalRow(Array[Any](i, UTF8String.fromString(s"v$i")))))
    assert(w.close() == 5L)
    assert(io.exists(dir.resolve(dataName)))

    // manifest + snapshot commit through the seam-backed SnapshotManager
    val sm = new SnapshotManager(dir, io = io)
    val meta = DataFileMeta(dataName, io.size(dir.resolve(dataName)), 5L,
      Seq.empty, 0, 0L, 4L, Map.empty)
    val mf = sm.writeManifest(Seq(ManifestEntry("ADD", meta)))
    val snap = Snapshot(1L, 0L, "APPEND", timeMillis = 1L,
      manifests = Seq(mf), lastSequenceNumber = 4L, totalRecordCount = 5L)
    assert(sm.tryCommitSnapshot(snap))
    // id collision loses at the store's conditional put, not by rename
    assert(!sm.tryCommitSnapshot(snap.copy(timeMillis = 2L)))
    assert(sm.latestSnapshotId.contains(1L))
    assert(sm.liveFilesLatest.map(_.fileName) == Seq(dataName))

    // read back via the staged reader
    val r = FormatIO.reader("parquet", dir.resolve(dataName),
      schema, schema, io = io)
    val rows = r.map(row =>
      (row.getLong(0), row.getUTF8String(1).toString)).toList
    r.close()
    assert(rows == (1L to 5L).map(i => (i, s"v$i")).toList)

    // the table never touched the local filesystem
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get("/graft-mem-seam")))
  }
}
