package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files
import graft.core.RowKind
import graft.api.{Catalog, Schema}

/** The merge-engine family end-to-end through SQL and the facade:
  * `deduplicate` (default; + `ignore-delete`, ≙ the reference's
  * `DeduplicateMergeFunction(ignore_delete)`), `first-row`,
  * `partial-update`, `aggregation` with per-field
  * `fields.<col>.aggregate-function`. Each engine is checked through
  * the read path AND through commit-triggered compaction (the folded
  * partial must keep folding with later appends), plus the CREATE-time
  * validation and the DML routing contract.
  */
class MergeEngineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var warehouse: java.nio.file.Path = _

  lazy val spark: SparkSession = {
    warehouse = Files.createTempDirectory("graft-me-wh")
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

  private def rows(sql: String): Seq[Seq[Any]] =
    spark.sql(sql).collect().toSeq.map(_.toSeq)

  test("first-row: earliest insert wins across commits and compaction") {
    spark.sql("CREATE TABLE graft.default.me_first (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k', 'bucket'='2', " +
      "'merge-engine'='first-row', 'compaction.trigger-file-count'='3')")
    spark.sql("INSERT INTO graft.default.me_first VALUES (1,'a1'), (2,'b1')")
    spark.sql("INSERT INTO graft.default.me_first VALUES (1,'a2'), (3,'c1')")
    assert(rows("SELECT k, v FROM graft.default.me_first ORDER BY k") ==
      Seq(Seq(1L, "a1"), Seq(2L, "b1"), Seq(3L, "c1")))
    // force the compaction trigger; the kept row must stay the FIRST
    spark.sql("INSERT INTO graft.default.me_first VALUES (1,'a3'), (4,'d1')")
    spark.sql("INSERT INTO graft.default.me_first VALUES (1,'a4')")
    assert(rows("SELECT v FROM graft.default.me_first WHERE k = 1") ==
      Seq(Seq("a1")))
    // and post-compaction appends still lose to the compacted first row
    spark.sql("INSERT INTO graft.default.me_first VALUES (1,'a5')")
    assert(rows("SELECT v FROM graft.default.me_first WHERE k = 1") ==
      Seq(Seq("a1")))
  }

  test("partial-update: per-field last non-null across commits") {
    spark.sql("CREATE TABLE graft.default.me_pu " +
      "(k BIGINT, a STRING, b STRING, c BIGINT) " +
      "TBLPROPERTIES ('primary-key'='k', 'bucket'='2', " +
      "'merge-engine'='partial-update')")
    spark.sql("INSERT INTO graft.default.me_pu VALUES " +
      "(1, 'a1', NULL, 10), (2, NULL, 'b2', NULL)")
    spark.sql("INSERT INTO graft.default.me_pu VALUES " +
      "(1, NULL, 'b1', NULL), (2, 'a2', NULL, 20)")
    assert(rows("SELECT k, a, b, c FROM graft.default.me_pu ORDER BY k") ==
      Seq(Seq(1L, "a1", "b1", 10L), Seq(2L, "a2", "b2", 20L)))
    // a later non-null overwrites; a later null does NOT
    spark.sql("INSERT INTO graft.default.me_pu VALUES (1, 'a9', NULL, NULL)")
    assert(rows("SELECT a, b, c FROM graft.default.me_pu WHERE k = 1") ==
      Seq(Seq("a9", "b1", 10L)))
  }

  test("sequence-groups: each group absorbs out-of-order partial updates " +
      "independently; ungrouped fields stay plain last-non-null") {
    spark.sql("CREATE TABLE graft.default.me_sg " +
      "(k BIGINT, g1 BIGINT, a STRING, b STRING, g2 BIGINT, c STRING, " +
      "d STRING) TBLPROPERTIES ('primary-key'='k', 'bucket'='1', " +
      "'merge-engine'='partial-update', " +
      "'fields.g1.sequence-group'='a,b', " +
      "'fields.g2.sequence-group'='c')")
    def q(sel: String, where: String = "") = rows(
      s"SELECT $sel FROM graft.default.me_sg $where ORDER BY k")
    spark.sql("INSERT INTO graft.default.me_sg VALUES " +
      "(1, 10, 'a10', 'b10', 100, 'c100', NULL)")
    // g1 STALE (5 < 10): a/b untouched despite non-null 'aSTALE';
    // g2 advances (200 > 100): c updates; ungrouped d: non-null wins
    spark.sql("INSERT INTO graft.default.me_sg VALUES " +
      "(1, 5, 'aSTALE', 'bSTALE', 200, 'c200', 'd2')")
    assert(q("k, g1, a, b, g2, c, d") ==
      Seq(Seq(1L, 10L, "a10", "b10", 200L, "c200", "d2")))
    // g1 EQUAL (10 = 10): a later entry with an equal version wins
    // (LWW ties), but its NULL member never erases (partial within the
    // group); g2 NULL: c untouched even though the incoming c is set
    spark.sql("INSERT INTO graft.default.me_sg VALUES " +
      "(1, 10, 'a10x', NULL, NULL, 'cIGNORED', NULL)")
    assert(q("k, g1, a, b, g2, c, d") ==
      Seq(Seq(1L, 10L, "a10x", "b10", 200L, "c200", "d2")))
  }

  test("sequence-groups: compaction folds the partial losslessly and a " +
      "post-compaction stale update still loses") {
    spark.sql("CREATE TABLE graft.default.me_sgc " +
      "(k BIGINT, g BIGINT, a STRING, d STRING) " +
      "TBLPROPERTIES ('primary-key'='k', 'bucket'='1', " +
      "'merge-engine'='partial-update', 'fields.g.sequence-group'='a')")
    spark.sql("INSERT INTO graft.default.me_sgc VALUES (1, 20, 'a20', 'd1')")
    spark.sql("INSERT INTO graft.default.me_sgc VALUES (1, 10, 'a10', 'd2')")
    val t = facade.getTable("default.me_sgc")
    assert(t.compact() == 1)
    // the folded row carries g=20: a LATER stale update must still lose
    spark.sql("INSERT INTO graft.default.me_sgc VALUES (1, 15, 'a15', NULL)")
    assert(rows("SELECT k, g, a, d FROM graft.default.me_sgc") ==
      Seq(Seq(1L, 20L, "a20", "d2")))
    // and an advancing one wins
    spark.sql("INSERT INTO graft.default.me_sgc VALUES (1, 25, 'a25', NULL)")
    assert(rows("SELECT k, g, a, d FROM graft.default.me_sgc") ==
      Seq(Seq(1L, 25L, "a25", "d2")))
  }

  test("sequence-groups: projection that prunes the version column still " +
      "merges by it") {
    spark.sql("CREATE TABLE graft.default.me_sgp " +
      "(k BIGINT, g BIGINT, a STRING) " +
      "TBLPROPERTIES ('primary-key'='k', 'bucket'='1', " +
      "'merge-engine'='partial-update', 'fields.g.sequence-group'='a')")
    spark.sql("INSERT INTO graft.default.me_sgp VALUES (1, 10, 'win')")
    spark.sql("INSERT INTO graft.default.me_sgp VALUES (1, 5, 'stale')")
    // reading ONLY a must still see the g-argmax winner: the scan
    // retains g below the merge although the projection prunes it
    assert(rows("SELECT a FROM graft.default.me_sgp") == Seq(Seq("win")))
  }

  test("sequence-groups: a versionless update never touches the group — " +
      "even as the first entry of a run — so merges are order-independent") {
    def mk(name: String): String = {
      spark.sql(s"CREATE TABLE graft.default.$name " +
        "(k BIGINT, g BIGINT, a STRING, d STRING) " +
        "TBLPROPERTIES ('primary-key'='k', 'bucket'='1', " +
        "'merge-engine'='partial-update', 'fields.g.sequence-group'='a')")
      s"graft.default.$name"
    }
    // same two logical updates in BOTH commit orders: the versionless
    // row's member must never apply (not even via the first-entry
    // accumulator copy), so both histories converge
    val t1 = mk("me_sg_ord1")
    spark.sql(s"INSERT INTO $t1 VALUES (1, NULL, 'vless', 'd1')")
    spark.sql(s"INSERT INTO $t1 VALUES (1, 5, NULL, NULL)")
    val t2 = mk("me_sg_ord2")
    spark.sql(s"INSERT INTO $t2 VALUES (1, 5, NULL, NULL)")
    spark.sql(s"INSERT INTO $t2 VALUES (1, NULL, 'vless', 'd1')")
    val expected = Seq(Seq(1L, 5L, null, "d1"))
    assert(rows(s"SELECT k, g, a, d FROM $t1") == expected)
    assert(rows(s"SELECT k, g, a, d FROM $t2") == expected)
    // two versionless updates: the group stays empty entirely, while
    // the ungrouped column folds last-non-null as usual
    val t3 = mk("me_sg_ord3")
    spark.sql(s"INSERT INTO $t3 VALUES (1, NULL, 'x', 'd1')")
    spark.sql(s"INSERT INTO $t3 VALUES (1, NULL, 'y', 'd2')")
    assert(rows(s"SELECT k, g, a, d FROM $t3") ==
      Seq(Seq(1L, null, null, "d2")))
  }

  test("sequence-groups: CREATE validation and ALTER mutability guard") {
    def fails(sql: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(e.getMessage.contains(frag), s"got: ${e.getMessage}")
    }
    fails("CREATE TABLE graft.default.sg_bad1 (k BIGINT, g BIGINT, a STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1'," +
      "'fields.g.sequence-group'='a')", "only supported with " +
      "merge-engine 'partial-update'")
    fails("CREATE TABLE graft.default.sg_bad2 (k BIGINT, g BIGINT, a STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1'," +
      "'merge-engine'='partial-update','fields.g.sequence-group'='nope')",
      "is not in field list")
    fails("CREATE TABLE graft.default.sg_bad3 " +
      "(k BIGINT, g BIGINT, h BIGINT, a STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1'," +
      "'merge-engine'='partial-update'," +
      "'fields.g.sequence-group'='a','fields.h.sequence-group'='a')",
      "must be disjoint")
    fails("CREATE TABLE graft.default.sg_bad4 (k BIGINT, g STRING, a STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1'," +
      "'merge-engine'='partial-update','fields.g.sequence-group'='a')",
      "unsupported type")
    // ALTER: free while empty; frozen once any involved column has
    // committed history (same data-aware guard as aggregate-function)
    spark.sql("CREATE TABLE graft.default.sg_alter " +
      "(k BIGINT, g BIGINT, a STRING, b STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1'," +
      "'merge-engine'='partial-update','fields.g.sequence-group'='a')")
    spark.sql("ALTER TABLE graft.default.sg_alter SET TBLPROPERTIES " +
      "('fields.g.sequence-group'='a,b')") // empty table: allowed
    spark.sql("INSERT INTO graft.default.sg_alter VALUES (1, 1, 'x', 'y')")
    fails("ALTER TABLE graft.default.sg_alter SET TBLPROPERTIES " +
      "('fields.g.sequence-group'='a')", "committed history")
    fails("ALTER TABLE graft.default.sg_alter UNSET TBLPROPERTIES " +
      "('fields.g.sequence-group')", "committed history")
    // re-stating the stored value is a no-op and stays allowed — the
    // member list is a SET, so order/spacing differences are no-ops too
    spark.sql("ALTER TABLE graft.default.sg_alter SET TBLPROPERTIES " +
      "('fields.g.sequence-group'='a,b')")
    spark.sql("ALTER TABLE graft.default.sg_alter SET TBLPROPERTIES " +
      "('fields.g.sequence-group'='b, a')")
  }

  private lazy val facade: Catalog = Catalog.create(spark,
    Map("warehouse" -> warehouse.toString, "catalog-name" -> "gme"))

  test("partial-update: RowKind delete removes the accumulated row") {
    val catalog = facade
    catalog.createTable("default.me_pud", Schema(
      StructType(Seq(StructField("k", LongType), StructField("v", StringType))),
      primaryKeys = Seq("k"),
      options = Map("bucket" -> "1", "merge-engine" -> "partial-update")))
    import spark.implicits._
    val t = catalog.getTable("default.me_pud")
    val wb1 = t.newBatchWriteBuilder(); val w1 = wb1.newWrite()
    w1.write(Seq((1L, "x"), (2L, "y")).toDF("k", "v"))
    wb1.newCommit().commit(w1.prepareCommit())
    val wb2 = t.newBatchWriteBuilder(); val w2 = wb2.newWrite()
    w2.write(Seq((1L, "x")).toDF("k", "v")
      .withColumn(RowKind.ColumnName, lit(RowKind.Delete).cast("byte")))
    wb2.newCommit().commit(w2.prepareCommit())
    assert(t.newReadBuilder().newRead().toDF().collect().map(_.getLong(0))
      .toSeq == Seq(2L))
    // an add AFTER the delete rebuilds from scratch
    val wb3 = t.newBatchWriteBuilder(); val w3 = wb3.newWrite()
    w3.write(Seq((1L, "z")).toDF("k", "v"))
    wb3.newCommit().commit(w3.prepareCommit())
    assert(t.newReadBuilder().newRead().toDF().orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "z"), (2L, "y")))
  }

  test("aggregation: per-field sum/min/max/last fold across commits " +
      "and compaction keeps folding with later appends") {
    spark.sql("CREATE TABLE graft.default.me_agg " +
      "(k BIGINT, total BIGINT, lo BIGINT, hi BIGINT, note STRING) " +
      "TBLPROPERTIES ('primary-key'='k', 'bucket'='2', " +
      "'merge-engine'='aggregation', " +
      "'fields.total.aggregate-function'='sum', " +
      "'fields.lo.aggregate-function'='min', " +
      "'fields.hi.aggregate-function'='max', " +
      "'compaction.trigger-file-count'='3')")
    spark.sql("INSERT INTO graft.default.me_agg VALUES " +
      "(1, 10, 5, 5, 'first'), (2, 100, 50, 50, 'x')")
    spark.sql("INSERT INTO graft.default.me_agg VALUES " +
      "(1, 7, 3, 9, 'second')")
    // sum folds, min/max extremize, unconfigured note = last non-null
    assert(rows("SELECT total, lo, hi, note FROM graft.default.me_agg " +
      "WHERE k = 1") == Seq(Seq(17L, 3L, 9L, "second")))
    // cross the compaction trigger, then keep aggregating on top
    spark.sql("INSERT INTO graft.default.me_agg VALUES (1, 1, 4, 4, NULL)")
    spark.sql("INSERT INTO graft.default.me_agg VALUES (1, 2, 8, 20, 'post')")
    assert(rows("SELECT total, lo, hi, note FROM graft.default.me_agg " +
      "WHERE k = 1") == Seq(Seq(20L, 3L, 20L, "post")))
    assert(rows("SELECT total FROM graft.default.me_agg WHERE k = 2") ==
      Seq(Seq(100L)))
    // the compaction really happened (COMPACT snapshot exists)
    val sm = new graft.format.SnapshotManager(
      warehouse.resolve("default.db/me_agg"))
    assert(sm.existingSnapshotIds.map(sm.snapshot)
      .exists(_.commitKind == "COMPACT"))
  }

  test("aggregation: product and listagg fold across commits and " +
      "survive compaction re-folds") {
    spark.sql("CREATE TABLE graft.default.me_agg2 " +
      "(k BIGINT, factor BIGINT, tags STRING) " +
      "TBLPROPERTIES ('primary-key'='k', 'bucket'='1', " +
      "'merge-engine'='aggregation', " +
      "'fields.factor.aggregate-function'='product', " +
      "'fields.tags.aggregate-function'='listagg', " +
      "'compaction.trigger-file-count'='3')")
    spark.sql("INSERT INTO graft.default.me_agg2 VALUES " +
      "(1, 2, 'web'), (2, 10, 'pdf')")
    spark.sql("INSERT INTO graft.default.me_agg2 VALUES (1, 3, 'books')")
    assert(rows("SELECT factor, tags FROM graft.default.me_agg2 " +
      "WHERE k = 1") == Seq(Seq(6L, "web,books")))
    // cross the compaction trigger (folded partial must keep folding),
    // null contributions are skipped, never rendered
    spark.sql("INSERT INTO graft.default.me_agg2 VALUES (1, NULL, NULL)")
    spark.sql("INSERT INTO graft.default.me_agg2 VALUES (1, 5, 'cc')")
    assert(rows("SELECT factor, tags FROM graft.default.me_agg2 " +
      "WHERE k = 1") == Seq(Seq(30L, "web,books,cc")))
    assert(rows("SELECT factor, tags FROM graft.default.me_agg2 " +
      "WHERE k = 2") == Seq(Seq(10L, "pdf")))
    val sm = new graft.format.SnapshotManager(
      warehouse.resolve("default.db/me_agg2"))
    assert(sm.existingSnapshotIds.map(sm.snapshot)
      .exists(_.commitKind == "COMPACT"))
    // CREATE-time type checks for the new folds
    def failing(ddl: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(ddl))
      def chain(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.toString).toSeq
      assert(chain(e).exists(_.contains(needle)),
        s"expected '$needle' in:\n${chain(e).mkString("\n")}")
      spark.sql("DROP TABLE IF EXISTS graft.default.me_agg2bad")
    }
    failing("CREATE TABLE graft.default.me_agg2bad " +
      "(k BIGINT, v STRING) TBLPROPERTIES ('primary-key'='k', " +
      "'bucket'='1', 'merge-engine'='aggregation', " +
      "'fields.v.aggregate-function'='product')", "does not support column")
    failing("CREATE TABLE graft.default.me_agg2bad " +
      "(k BIGINT, v BIGINT) TBLPROPERTIES ('primary-key'='k', " +
      "'bucket'='1', 'merge-engine'='aggregation', " +
      "'fields.v.aggregate-function'='listagg')", "does not support column")
  }

  test("deduplicate + ignore-delete: RowKind deletes are ignored at merge " +
      "(reference DeduplicateMergeFunction(ignore_delete=True))") {
    val catalog = facade
    catalog.createTable("default.me_igdel", Schema(
      StructType(Seq(StructField("k", LongType), StructField("v", StringType))),
      primaryKeys = Seq("k"),
      options = Map("bucket" -> "1", "ignore-delete" -> "true")))
    import spark.implicits._
    val t = catalog.getTable("default.me_igdel")
    val wb1 = t.newBatchWriteBuilder(); val w1 = wb1.newWrite()
    w1.write(Seq((1L, "keep"), (2L, "also")).toDF("k", "v"))
    wb1.newCommit().commit(w1.prepareCommit())
    val wb2 = t.newBatchWriteBuilder(); val w2 = wb2.newWrite()
    w2.write(Seq((1L, "keep")).toDF("k", "v")
      .withColumn(RowKind.ColumnName, lit(RowKind.Delete).cast("byte")))
    wb2.newCommit().commit(w2.prepareCommit())
    // the -D row is ignored; the insert survives
    assert(t.newReadBuilder().newRead().toDF().count() == 2)
    // a later upsert still wins
    val wb3 = t.newBatchWriteBuilder(); val w3 = wb3.newWrite()
    w3.write(Seq((1L, "updated")).toDF("k", "v"))
    wb3.newCommit().commit(w3.prepareCommit())
    assert(t.newReadBuilder().newRead().toDF()
      .filter(col("k") === 1).collect()(0).getString(1) == "updated")
  }

  test("SQL DML on non-default engines routes copy-on-write, engine-exact") {
    // partial-update: UPDATE ... SET b = NULL must STICK (the COW
    // rewrite materializes merged rows first) — the exact case a
    // naive -D/+U merge-on-read pair would get wrong
    spark.sql("UPDATE graft.default.me_pu SET b = NULL WHERE k = 1")
    assert(rows("SELECT a, b, c FROM graft.default.me_pu WHERE k = 1") ==
      Seq(Seq("a9", null, 10L)))
    // first-row: DELETE removes the row even though merge ignores -D
    spark.sql("DELETE FROM graft.default.me_first WHERE k = 2")
    assert(rows("SELECT k FROM graft.default.me_first ORDER BY k") ==
      Seq(Seq(1L), Seq(3L), Seq(4L)))
    // and the first-row contract still holds after the rewrite
    spark.sql("INSERT INTO graft.default.me_first VALUES (1,'a6')")
    assert(rows("SELECT v FROM graft.default.me_first WHERE k = 1") ==
      Seq(Seq("a1")))
  }

  test("sequence.field: out-of-order commits resolve by the data column") {
    spark.sql("CREATE TABLE graft.default.me_sf " +
      "(k BIGINT, ver BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k', 'bucket'='2', " +
      "'sequence.field'='ver')")
    // newest version arrives FIRST; stale versions follow
    spark.sql("INSERT INTO graft.default.me_sf VALUES (1, 30, 'new'), (2, 5, 'b')")
    spark.sql("INSERT INTO graft.default.me_sf VALUES (1, 10, 'stale'), (3, 1, 'c')")
    assert(rows("SELECT k, ver, v FROM graft.default.me_sf ORDER BY k") ==
      Seq(Seq(1L, 30L, "new"), Seq(2L, 5L, "b"), Seq(3L, 1L, "c")))
    // equal versions: later commit wins (matches plain LWW)
    spark.sql("INSERT INTO graft.default.me_sf VALUES (2, 5, 'b2')")
    assert(rows("SELECT v FROM graft.default.me_sf WHERE k = 2") ==
      Seq(Seq("b2")))
    // a late DELETE carrying an OLD version cannot retract the newer row
    val catalog = facade
    import spark.implicits._
    val t = catalog.getTable("default.me_sf")
    val wb = t.newBatchWriteBuilder(); val w = wb.newWrite()
    w.write(Seq((1L, 10L, "stale")).toDF("k", "ver", "v")
      .withColumn(RowKind.ColumnName, lit(RowKind.Delete).cast("byte")))
    wb.newCommit().commit(w.prepareCommit())
    assert(rows("SELECT v FROM graft.default.me_sf WHERE k = 1") ==
      Seq(Seq("new")))
    // ...but a delete at the CURRENT version does retract
    val wb2 = t.newBatchWriteBuilder(); val w2 = wb2.newWrite()
    w2.write(Seq((1L, 30L, "new")).toDF("k", "ver", "v")
      .withColumn(RowKind.ColumnName, lit(RowKind.Delete).cast("byte")))
    wb2.newCommit().commit(w2.prepareCommit())
    assert(rows("SELECT k FROM graft.default.me_sf ORDER BY k") ==
      Seq(Seq(2L), Seq(3L)))
  }

  test("sequence.field: compaction keeps the tombstone — a stale insert " +
      "cannot resurrect a deleted key") {
    spark.sql("CREATE TABLE graft.default.me_sfc (k BIGINT, ver BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k', 'bucket'='1', " +
      "'sequence.field'='ver')")
    spark.sql("INSERT INTO graft.default.me_sfc VALUES (1, 30, 'live')")
    // delete at the CURRENT version
    val catalog = facade
    import spark.implicits._
    val t = catalog.getTable("default.me_sfc")
    val wb = t.newBatchWriteBuilder(); val w = wb.newWrite()
    w.write(Seq((1L, 30L, "live")).toDF("k", "ver", "v")
      .withColumn(RowKind.ColumnName, lit(RowKind.Delete).cast("byte")))
    wb.newCommit().commit(w.prepareCommit())
    assert(spark.table("graft.default.me_sfc").count() == 0L)
    // full compaction rewrites the bucket; without tombstone retention
    // the ver=30 delete would vanish here
    t.compact()
    // a LATE, STALE insert (ver=10 < 30) must still lose
    spark.sql("INSERT INTO graft.default.me_sfc VALUES (1, 10, 'stale')")
    assert(spark.table("graft.default.me_sfc").count() == 0L,
      "compaction dropped the sequence.field tombstone; stale insert resurrected")
    // ...while a genuinely newer version wins
    spark.sql("INSERT INTO graft.default.me_sfc VALUES (1, 40, 'reborn')")
    assert(rows("SELECT v FROM graft.default.me_sfc WHERE k = 1") ==
      Seq(Seq("reborn")))
  }

  test("sequence.field: projection that drops the field still merges by it") {
    // the scan must RETAIN ver below the merge even though the query
    // never asks for it
    assert(rows("SELECT v FROM graft.default.me_sf WHERE k = 2") ==
      Seq(Seq("b2")))
    val sm = new graft.format.SnapshotManager(
      warehouse.resolve("default.db/me_sf"))
    assert(sm.latestSnapshot.nonEmpty) // table really lives on disk
  }

  test("sequence.field validation and DML routing") {
    def failing(ddl: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(ddl))
      def chain(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.toString).toSeq
      assert(chain(e).exists(_.contains(needle)),
        s"expected '$needle' in:\n${chain(e).mkString("\n")}")
      spark.sql("DROP TABLE IF EXISTS graft.default.me_bad")
    }
    failing("CREATE TABLE graft.default.me_bad (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1'," +
      "'sequence.field'='v')", "unsupported type")
    failing("CREATE TABLE graft.default.me_bad (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1'," +
      "'sequence.field'='k')", "key or partition")
    failing("CREATE TABLE graft.default.me_bad (k BIGINT, ver BIGINT) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1'," +
      "'merge-engine'='first-row','sequence.field'='ver')",
      "only supported with merge-engine")
    // UPDATE routes copy-on-write (a MoR -D would carry a NULL version
    // and silently lose); the result must reflect the update
    spark.sql("UPDATE graft.default.me_sf SET v = 'upd' WHERE k = 3")
    assert(rows("SELECT v FROM graft.default.me_sf WHERE k = 3") ==
      Seq(Seq("upd")))
  }

  test("CREATE-time validation of the merge-engine option family") {
    def failing(ddl: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(ddl))
      def chain(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.toString).toSeq
      assert(chain(e).exists(_.contains(needle)),
        s"expected '$needle' in:\n${chain(e).mkString("\n")}")
      spark.sql("DROP TABLE IF EXISTS graft.default.me_bad")
    }
    failing("CREATE TABLE graft.default.me_bad (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1'," +
      "'merge-engine'='lsm-tree')", "Unsupported merge-engine")
    failing("CREATE TABLE graft.default.me_bad (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('merge-engine'='aggregation')",
      "requires a primary-key table")
    failing("CREATE TABLE graft.default.me_bad (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1'," +
      "'merge-engine'='aggregation'," +
      "'fields.v.aggregate-function'='sum')", "does not support column")
    failing("CREATE TABLE graft.default.me_bad (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1'," +
      "'merge-engine'='aggregation'," +
      "'fields.k.aggregate-function'='sum')", "never aggregated")
    failing("CREATE TABLE graft.default.me_bad (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1'," +
      "'fields.v.aggregate-function'='sum')",
      "requires merge-engine 'aggregation'")
    failing("CREATE TABLE graft.default.me_bad (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1'," +
      "'merge-engine'='aggregation'," +
      "'fields.v.aggregate-function'='median')",
      "Unsupported aggregate-function")
  }

  test("schema evolution composes with engines: added columns fold " +
      "from null-fill across pre-ADD files") {
    spark.sql("CREATE TABLE graft.default.me_evo (k BIGINT, total BIGINT) " +
      "TBLPROPERTIES ('primary-key'='k', 'bucket'='1', " +
      "'merge-engine'='aggregation', " +
      "'fields.total.aggregate-function'='sum')")
    spark.sql("INSERT INTO graft.default.me_evo VALUES (1, 10), (2, 20)")
    spark.sql("ALTER TABLE graft.default.me_evo ADD COLUMN hi BIGINT")
    spark.sql("ALTER TABLE graft.default.me_evo " +
      "SET TBLPROPERTIES ('fields.hi.aggregate-function'='max')")
    spark.sql("INSERT INTO graft.default.me_evo VALUES (1, 5, 7), (3, 30, 3)")
    spark.sql("INSERT INTO graft.default.me_evo VALUES (1, 1, 2)")
    // pre-ADD rows contribute null to hi (ignored by max); sums still
    // fold across the era boundary
    assert(rows("SELECT k, total, hi FROM graft.default.me_evo ORDER BY k") ==
      Seq(Seq(1L, 16L, 7L), Seq(2L, 20L, null), Seq(3L, 30L, 3L)))
    // but once commits have landed SINCE the ADD, the added column has
    // real (non-null) history too — a later fold change is the same
    // re-fold hazard as on a CREATE column, and is rejected
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE graft.default.me_evo " +
        "SET TBLPROPERTIES ('fields.hi.aggregate-function'='min')"))
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(_.toString.contains("re-merged under the new rules")))
  }

  test("fold configuration stays free while the table has no rows") {
    // the guard is data-aware, not a blanket freeze: an empty table's
    // folds can be reconfigured at will (nothing exists to reinterpret)
    spark.sql("CREATE TABLE graft.default.me_cfg (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('primary-key'='k', 'bucket'='1', " +
      "'merge-engine'='aggregation', " +
      "'fields.v.aggregate-function'='sum')")
    spark.sql("ALTER TABLE graft.default.me_cfg " +
      "SET TBLPROPERTIES ('fields.v.aggregate-function'='max')")
    spark.sql("ALTER TABLE graft.default.me_cfg " +
      "UNSET TBLPROPERTIES ('fields.v.aggregate-function')")
    spark.sql("ALTER TABLE graft.default.me_cfg " +
      "SET TBLPROPERTIES ('fields.v.aggregate-function'='min')")
    spark.sql("INSERT INTO graft.default.me_cfg VALUES (1, 5), (1, 9)")
    assert(rows("SELECT v FROM graft.default.me_cfg") == Seq(Seq(5L)))
    // first row committed → the door closes
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE graft.default.me_cfg " +
        "SET TBLPROPERTIES ('fields.v.aggregate-function'='max')"))
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(_.toString.contains("re-merged under the new rules")))
  }

  test("property: evolved aggregation folds ≡ SQL model across random " +
      "commit/ADD/compaction interleavings") {
    // The risky composition is END-TO-END: pre-ADD files null-fill the
    // added column through the field-id mapping, the fold consumes that
    // null-fill (sum/max skip nulls), commit-triggered compaction
    // REWRITES old files under the NEW schema mid-history, and later
    // appends keep folding on top. Randomized but seeded: each trial
    // draws batches, inserts an ADD COLUMN + post-ADD fold config
    // (the guard's allowed window) at a random commit boundary, and
    // compares the table against a Spark-SQL fold model of the same
    // batches. (Reader-level null-fill ≡ None is already covered by
    // PropertySpec's fold models — Gen.option generates exactly the
    // null-filled shape — so this pins the full stack instead.)
    val rnd = new scala.util.Random(20250814L)
    for (trial <- 0 until 3) {
      val tbl = s"graft.default.me_prop_$trial"
      val trigger = 2 + rnd.nextInt(3) // compaction fires mid-history
      spark.sql(s"CREATE TABLE $tbl (k BIGINT, total BIGINT) " +
        "TBLPROPERTIES ('primary-key'='k', 'bucket'='2', " +
        "'merge-engine'='aggregation', " +
        "'fields.total.aggregate-function'='sum', " +
        s"'compaction.trigger-file-count'='$trigger')")
      def batch(nCols: Int): Seq[(Long, Option[Long], Option[Long])] =
        (0 until 2 + rnd.nextInt(4)).map { _ =>
          (rnd.nextInt(5).toLong,
            if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(100).toLong),
            if (nCols < 3 || rnd.nextInt(5) == 0) None
            else Some(rnd.nextInt(100).toLong))
        }
      def lit(v: Option[Long]): String = v.map(_.toString).getOrElse("NULL")
      val preBatches = (0 until 1 + rnd.nextInt(3)).map(_ => batch(2))
      preBatches.foreach { b =>
        spark.sql(s"INSERT INTO $tbl VALUES " +
          b.map(r => s"(${r._1}, ${lit(r._2)})").mkString(", "))
      }
      spark.sql(s"ALTER TABLE $tbl ADD COLUMN hi BIGINT")
      spark.sql(s"ALTER TABLE $tbl " +
        "SET TBLPROPERTIES ('fields.hi.aggregate-function'='max')")
      val postBatches = (1 until 2 + rnd.nextInt(3)).map(_ => batch(3))
      postBatches.foreach { b =>
        spark.sql(s"INSERT INTO $tbl VALUES " +
          b.map(r => s"(${r._1}, ${lit(r._2)}, ${lit(r._3)})").mkString(", "))
      }
      // model: per key, total = SQL sum over ALL batches (nulls
      // skipped; all-null → null), hi = max over post-ADD batches
      val all = preBatches.flatten.map(r => (r._1, r._2, None: Option[Long])) ++
        postBatches.flatten
      val model = all.groupBy(_._1).map { case (k, rs) =>
        val sums = rs.flatMap(_._2)
        val his = rs.flatMap(_._3)
        (k, if (sums.isEmpty) null else Long.box(sums.sum),
          if (his.isEmpty) null else Long.box(his.max))
      }.toSeq.sortBy(_._1)
      val got = rows(s"SELECT k, total, hi FROM $tbl ORDER BY k")
        .map(r => (r(0).asInstanceOf[Long], r(1), r(2)))
      assert(got == model,
        s"trial $trial (trigger=$trigger):\ngot:   $got\nmodel: $model")
      spark.sql(s"DROP TABLE $tbl")
    }
  }

  test("property: evolved partial-update ≡ last-non-null model with " +
      "pre-ADD null-fill") {
    // same stack for partial-update: the added column's LastNonNull
    // fold must treat pre-ADD history as absent (null-fill), never
    // resurrect it through compaction, and keep folding afterwards
    val rnd = new scala.util.Random(46151L)
    for (trial <- 0 until 3) {
      val tbl = s"graft.default.me_pup_$trial"
      val trigger = 2 + rnd.nextInt(3)
      spark.sql(s"CREATE TABLE $tbl (k BIGINT, a BIGINT) " +
        "TBLPROPERTIES ('primary-key'='k', 'bucket'='2', " +
        "'merge-engine'='partial-update', " +
        s"'compaction.trigger-file-count'='$trigger')")
      // keys are UNIQUE within a batch: two same-key rows in one commit
      // reach the writer in shuffle order, so "later VALUES row wins"
      // would be nondeterministic — across commits the sequence number
      // orders them, which is what the model folds over
      def batch(nCols: Int): Seq[(Long, Option[Long], Option[Long])] =
        rnd.shuffle((0L until 5L).toList).take(2 + rnd.nextInt(3)).map { k =>
          (k,
            if (rnd.nextInt(3) == 0) None else Some(rnd.nextInt(100).toLong),
            if (nCols < 3 || rnd.nextInt(3) == 0) None
            else Some(rnd.nextInt(100).toLong))
        }
      def lit(v: Option[Long]): String = v.map(_.toString).getOrElse("NULL")
      val preBatches = (0 until 1 + rnd.nextInt(3)).map(_ => batch(2))
      preBatches.foreach { b =>
        spark.sql(s"INSERT INTO $tbl VALUES " +
          b.map(r => s"(${r._1}, ${lit(r._2)})").mkString(", "))
      }
      spark.sql(s"ALTER TABLE $tbl ADD COLUMN b BIGINT")
      val postBatches = (1 until 2 + rnd.nextInt(3)).map(_ => batch(3))
      postBatches.foreach { b =>
        spark.sql(s"INSERT INTO $tbl VALUES " +
          b.map(r => s"(${r._1}, ${lit(r._2)}, ${lit(r._3)})").mkString(", "))
      }
      // model: last non-null per field in batch-row order (batches are
      // sequenced per commit; within a batch later VALUES rows win)
      val all = preBatches.flatten.map(r => (r._1, r._2, None: Option[Long])) ++
        postBatches.flatten
      val model = all.groupBy(_._1).map { case (k, rs) =>
        (k, rs.flatMap(_._2).lastOption.map(Long.box).orNull,
          rs.flatMap(_._3).lastOption.map(Long.box).orNull)
      }.toSeq.sortBy(_._1)
      val got = rows(s"SELECT k, a, b FROM $tbl ORDER BY k")
        .map(r => (r(0).asInstanceOf[Long], r(1), r(2)))
      assert(got == model,
        s"trial $trial (trigger=$trigger):\ngot:   $got\nmodel: $model")
      spark.sql(s"DROP TABLE $tbl")
    }
  }

  test("merge-semantics options are immutable after CREATE") {
    // flipping merge-engine / sequence.field / ignore-delete / a
    // field's aggregate-function would re-fold every already-committed
    // run under different rules — silent history reinterpretation
    def rejected(sql: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      def chain(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.toString).toSeq
      assert(chain(e).exists(_.contains("structural")),
        s"expected structural rejection for: $sql\n${chain(e).mkString("\n")}")
    }
    rejected("ALTER TABLE graft.default.me_agg " +
      "SET TBLPROPERTIES ('merge-engine'='deduplicate')")
    rejected("ALTER TABLE graft.default.me_agg " +
      "UNSET TBLPROPERTIES ('merge-engine')")
    rejected("ALTER TABLE graft.default.me_sf " +
      "SET TBLPROPERTIES ('sequence.field'='k')")
    // `fields.<col>.aggregate-function` has a DATA-AWARE guard instead
    // of blanket immutability: with committed history present, changing
    // the configured fold, unsetting it, or configuring a fold on a
    // CREATE-schema column are all re-fold hazards → rejected; the
    // error must name the reinterpretation, not "structural"
    def refoldRejected(sql: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      def chain(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.toString).toSeq
      assert(chain(e).exists(_.contains("re-merged under the new rules")),
        s"expected re-fold rejection for: $sql\n${chain(e).mkString("\n")}")
    }
    refoldRejected("ALTER TABLE graft.default.me_agg " +
      "SET TBLPROPERTIES ('fields.total.aggregate-function'='max')")
    refoldRejected("ALTER TABLE graft.default.me_agg " +
      "UNSET TBLPROPERTIES ('fields.total.aggregate-function')")
    refoldRejected("ALTER TABLE graft.default.me_agg " +
      "SET TBLPROPERTIES ('fields.note.aggregate-function'='first_value')")
    // ...and the post-compaction state cannot have been re-folded: the
    // sum is still the sum (the guard exists exactly so this number
    // can never silently depend on ALTER-vs-compaction timing)
    assert(rows("SELECT total FROM graft.default.me_agg WHERE k = 1") ==
      Seq(Seq(20L)))
    // no-ops stay allowed with data present: re-stating the stored
    // fold, or stating the engine default on an unconfigured column
    spark.sql("ALTER TABLE graft.default.me_agg " +
      "SET TBLPROPERTIES ('fields.total.aggregate-function'='sum')")
    spark.sql("ALTER TABLE graft.default.me_agg " +
      "SET TBLPROPERTIES ('fields.note.aggregate-function'='last_non_null_value')")
    // ...and UNSET is symmetric: removing a stored value that IS the
    // engine default changes no fold (idempotent config removal)
    spark.sql("ALTER TABLE graft.default.me_agg " +
      "UNSET TBLPROPERTIES ('fields.note.aggregate-function')")
    // RENAME must not launder history past the guard: the fold walk
    // tracks FIELD IDS, and a renamed data-bearing column carries its
    // committed values under the new name
    spark.sql("ALTER TABLE graft.default.me_agg RENAME COLUMN note TO memo")
    refoldRejected("ALTER TABLE graft.default.me_agg " +
      "SET TBLPROPERTIES ('fields.memo.aggregate-function'='first_value')")
    spark.sql("ALTER TABLE graft.default.me_agg RENAME COLUMN memo TO note")
    // re-stating the SAME value is fine (idempotent config pushes),
    // as is writing the DEFAULT where the option was never stored,
    // and non-structural options still change
    spark.sql("ALTER TABLE graft.default.me_agg " +
      "SET TBLPROPERTIES ('merge-engine'='aggregation')")
    spark.sql("ALTER TABLE graft.default.me_sf " +
      "SET TBLPROPERTIES ('merge-engine'='deduplicate')") // absent → default
    spark.sql("ALTER TABLE graft.default.me_agg " +
      "SET TBLPROPERTIES ('sort-engine'='loser-tree')")
    assert(rows("SELECT total FROM graft.default.me_agg WHERE k = 1") ==
      Seq(Seq(20L)))
  }

  test("retraction streaming is rejected for non-deduplicate engines") {
    val q = spark.readStream.option("retractions", "true")
      .table("graft.default.`me_agg$changelog`")
      .writeStream.format("noop").start()
    try {
      val e = intercept[Exception](q.processAllAvailable())
      def chain(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.toString).toSeq
      assert(chain(e).exists(_.contains("merge-engine")), chain(e).mkString("\n"))
    } finally q.stop()
    // the PLAIN table stream is rejected too: its raw-upsert/dedup-
    // downstream contract misstates every non-deduplicate fold (the
    // engine-agnostic path is the raw $changelog view)
    val q2 = spark.readStream.table("graft.default.me_agg")
      .writeStream.format("noop").start()
    try {
      val e2 = intercept[Exception](q2.processAllAvailable())
      def chain2(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.toString).toSeq
      assert(chain2(e2).exists(_.contains("deduplicate merge semantics")),
        chain2(e2).mkString("\n"))
    } finally q2.stop()
    // ...and the raw $changelog stream of the same table is ALLOWED
    val q3 = spark.readStream.table("graft.default.`me_agg$changelog`")
      .writeStream.format("noop").start()
    try q3.processAllAvailable() finally q3.stop()
  }

  test("projection-pruned reads still merge correctly (field-local folds)") {
    // read ONLY the sum column: the run folds over the pruned schema
    assert(rows("SELECT total FROM graft.default.me_agg WHERE k = 1") ==
      Seq(Seq(20L)))
    // and only a non-aggregated column
    assert(rows("SELECT note FROM graft.default.me_agg WHERE k = 1") ==
      Seq(Seq("post")))
  }
}
