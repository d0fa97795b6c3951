package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Row-level DML through SQL: DELETE with non-partition predicates,
  * UPDATE, MERGE INTO. Append tables use copy-on-write (affected files
  * recomputed); PK tables use merge-on-read RowKind appends — a 1-row
  * UPDATE commits O(1) rows, asserted below.
  */
class RowLevelSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var warehouse: java.nio.file.Path = _

  lazy val spark: SparkSession = {
    warehouse = Files.createTempDirectory("graft-rl-wh")
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

  test("row-level DELETE on append table with value predicate") {
    spark.sql("CREATE TABLE graft.default.rl_app (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.default.rl_app VALUES (1,'keep'), (2,'drop'), (3,'keep')")
    spark.sql("INSERT INTO graft.default.rl_app VALUES (4,'drop'), (5,'keep')")
    spark.sql("DELETE FROM graft.default.rl_app WHERE v = 'drop'")
    val got = spark.sql("SELECT k FROM graft.default.rl_app ORDER BY k")
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1L, 3L, 5L))
  }

  test("NOT IN with NULL deletes nothing (3VL on the metadata path)") {
    // `p NOT IN (1, NULL)` is NULL (not TRUE) for every p != 1 — the
    // partition-metadata DELETE path must not treat In's no-match as
    // FALSE and flip it under Not (that would drop every other
    // partition's files). Also pins the read side: the same predicate
    // as a filter returns zero rows.
    spark.sql("CREATE TABLE graft.default.rl_nin (p BIGINT, v BIGINT) " +
      "PARTITIONED BY (p)")
    spark.sql("INSERT INTO graft.default.rl_nin VALUES (1, 10), (2, 20), (3, 30)")
    assert(spark.sql("SELECT COUNT(*) FROM graft.default.rl_nin " +
      "WHERE p NOT IN (1, NULL)").collect()(0).getLong(0) == 0L)
    spark.sql("DELETE FROM graft.default.rl_nin WHERE p NOT IN (1, NULL)")
    assert(spark.table("graft.default.rl_nin").count() == 3L,
      "NOT IN (…, NULL) must delete nothing")
    // sanity: without the NULL the delete behaves normally
    spark.sql("DELETE FROM graft.default.rl_nin WHERE p NOT IN (1)")
    assert(spark.sql("SELECT p FROM graft.default.rl_nin").collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("row-level DELETE only rewrites affected files") {
    // the 2-file layout above: file1 had {1,2,3}, file2 {4,5}; both
    // contained a 'drop' so both rewritten; now delete from one only
    val before = new graft.format.SnapshotManager(
      warehouse.resolve("default.db/rl_app")).liveFilesLatest.map(_.fileName).toSet
    spark.sql("INSERT INTO graft.default.rl_app VALUES (10,'x'), (11,'y')")
    spark.sql("DELETE FROM graft.default.rl_app WHERE k = 10")
    val after = new graft.format.SnapshotManager(
      warehouse.resolve("default.db/rl_app")).liveFilesLatest.map(_.fileName).toSet
    // the pre-existing files survive untouched
    assert(before.subsetOf(after))
    assert(spark.sql("SELECT k FROM graft.default.rl_app ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L, 5L, 11L))
  }

  test("UPDATE on PK table wins the merge (merge-on-read RowKind appends)") {
    spark.sql("CREATE TABLE graft.default.rl_pk (k BIGINT, v STRING, x DOUBLE) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='2')")
    spark.sql("INSERT INTO graft.default.rl_pk VALUES (1,'a',1.0), (2,'b',2.0), (3,'c',3.0)")
    spark.sql("INSERT INTO graft.default.rl_pk VALUES (2,'B',2.5)")
    spark.sql("UPDATE graft.default.rl_pk SET x = x * 10 WHERE v = 'B'")
    val got = spark.sql("SELECT k, v, x FROM graft.default.rl_pk ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, "a", 1.0), (2L, "B", 25.0), (3L, "c", 3.0)))
    // upsert after the update still wins by sequence
    spark.sql("INSERT INTO graft.default.rl_pk VALUES (2,'B2',0.0)")
    assert(spark.sql("SELECT v FROM graft.default.rl_pk WHERE k = 2")
      .collect()(0).getString(0) == "B2")
  }

  test("MERGE INTO upserts and deletes through the same machinery") {
    import spark.implicits._
    Seq((1L, "merged", 100.0), (4L, "new", 4.0), (3L, "del", 0.0))
      .toDF("k", "v", "x").createOrReplaceTempView("src")
    spark.sql("""MERGE INTO graft.default.rl_pk t USING src s ON t.k = s.k
      WHEN MATCHED AND s.v = 'del' THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.v, x = s.x
      WHEN NOT MATCHED THEN INSERT (k, v, x) VALUES (s.k, s.v, s.x)""")
    val got = spark.sql("SELECT k, v FROM graft.default.rl_pk ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "merged"), (2L, "B2"), (4L, "new")))
  }

  test("MERGE with NOT MATCHED BY SOURCE actions") {
    import spark.implicits._
    spark.sql("CREATE TABLE graft.default.rl_nmbs (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1')")
    spark.sql("INSERT INTO graft.default.rl_nmbs VALUES " +
      "(1,'a'), (2,'b'), (3,'c')")
    Seq((2L, "B"), (4L, "d")).toDF("k", "v").createOrReplaceTempView("nmbs_src")
    // target rows absent from the source are deleted; matched update;
    // unmatched source inserts
    spark.sql("""MERGE INTO graft.default.rl_nmbs t USING nmbs_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
      WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    val got = spark.sql("SELECT k, v FROM graft.default.rl_nmbs ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((2L, "B"), (4L, "d")), got.toSeq)
  }

  test("PK table: 1-row UPDATE commits O(1) rows, not a bucket rewrite") {
    spark.sql("CREATE TABLE graft.default.rl_mor (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1'," +
      "'compaction.trigger-file-count'='100')")
    spark.sql("INSERT INTO graft.default.rl_mor " +
      "SELECT id, concat('v', id) FROM range(0, 10000)")
    val sm = new graft.format.SnapshotManager(
      warehouse.resolve("default.db/rl_mor"))
    val before = sm.liveFilesLatest
    spark.sql("UPDATE graft.default.rl_mor SET v = 'updated' WHERE k = 42")
    val after = sm.liveFilesLatest
    // merge-on-read: the 10k-row base files survive untouched...
    assert(before.map(_.fileName).toSet.subsetOf(after.map(_.fileName).toSet),
      "base files were rewritten — copy-on-write leaked back in")
    // ...and the delta is exactly one -D + one +I row
    val delta = after.filterNot(f => before.exists(_.fileName == f.fileName))
    assert(delta.map(_.rowCount).sum == 2,
      s"expected 2 delta rows, got ${delta.map(_.rowCount).sum}")
    assert(spark.sql("SELECT v FROM graft.default.rl_mor WHERE k = 42")
      .collect()(0).getString(0) == "updated")
    assert(spark.sql("SELECT count(*) FROM graft.default.rl_mor")
      .collect()(0).getLong(0) == 10000L)
  }

  test("PK table: DELETE appends -D rows; primary-key updates rejected") {
    val sm = new graft.format.SnapshotManager(
      warehouse.resolve("default.db/rl_mor"))
    val before = sm.liveFilesLatest.map(_.fileName).toSet
    spark.sql("DELETE FROM graft.default.rl_mor WHERE k >= 9000")
    assert(before.subsetOf(sm.liveFilesLatest.map(_.fileName).toSet))
    assert(spark.sql("SELECT count(*) FROM graft.default.rl_mor")
      .collect()(0).getLong(0) == 9000L)
    // key-changing update: rejected like the reference (one source
    // row's -D and another's +I could collide on a key across tasks,
    // where sequence order is arbitrary — immutable keys remove the
    // hazard instead of papering over it)
    val e = intercept[Exception] {
      spark.sql("UPDATE graft.default.rl_mor SET k = k + 1 WHERE k < 10")
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.toString).toSeq
    assert(chain(e).exists(_.contains("primary key")), chain(e).mkString("\n"))
    // the failed statement must not have committed anything
    assert(spark.sql("SELECT count(*) FROM graft.default.rl_mor")
      .collect()(0).getLong(0) == 9000L)
    // non-key updates still flow, -U/+U pair visible to the changelog
    spark.sql("UPDATE graft.default.rl_mor SET v = 'u7' WHERE k = 7")
    assert(spark.sql("SELECT v FROM graft.default.rl_mor WHERE k = 7")
      .collect()(0).getString(0) == "u7")
  }

  test("PK table with BINARY key: writes, merge reads, and UPDATE all work") {
    // binary keys flow through every key path: bucket routing
    // (encodeField hex), write-side sort + merge read (unsigned
    // lexicographic compare, ≙ the reference comparator's binary
    // branch), and the DML key-immutability check that previously
    // threw 'compare BinaryType' on EVERY update
    spark.sql("CREATE TABLE graft.default.rl_bin (k BINARY, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k', 'bucket'='4')")
    spark.sql("INSERT INTO graft.default.rl_bin " +
      "SELECT CAST(concat('key-', id) AS BINARY), concat('v', id) " +
      "FROM range(0, 50)")
    // upsert half the keys in a second commit: merge must dedup
    spark.sql("INSERT INTO graft.default.rl_bin " +
      "SELECT CAST(concat('key-', id) AS BINARY), concat('u', id) " +
      "FROM range(0, 25)")
    assert(spark.sql("SELECT count(*) FROM graft.default.rl_bin")
      .collect()(0).getLong(0) == 50L)
    assert(spark.sql("SELECT v FROM graft.default.rl_bin " +
      "WHERE k = CAST('key-7' AS BINARY)").collect()(0).getString(0) == "u7")
    // non-key UPDATE: the immutability check compares binary keys
    spark.sql("UPDATE graft.default.rl_bin SET v = 'updated' " +
      "WHERE k = CAST('key-3' AS BINARY)")
    assert(spark.sql("SELECT v FROM graft.default.rl_bin " +
      "WHERE k = CAST('key-3' AS BINARY)").collect()(0).getString(0) == "updated")
    // DELETE by binary key
    spark.sql("DELETE FROM graft.default.rl_bin " +
      "WHERE k = CAST('key-9' AS BINARY)")
    assert(spark.sql("SELECT count(*) FROM graft.default.rl_bin")
      .collect()(0).getLong(0) == 49L)
  }

  test("PK table: null primary key is rejected loudly at write") {
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graft.default.rl_mor " +
        "SELECT CAST(NULL AS BIGINT), 'x'")
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.toString).toSeq
    assert(chain(e).exists(m => m.contains("NULL") || m.contains("null")),
      chain(e).mkString("\n"))
  }

  test("randomized DML series matches a driver-side model (fuzz)") {
    // 30 random INSERT/UPDATE/DELETE statements against a PK table
    // with mid-series compaction (trigger=3), checked after EVERY op
    // against a plain Map model — the merge-on-read delta path, the
    // LWW merge, and compaction interleaving must agree with SQL
    // semantics at every step
    spark.sql("CREATE TABLE graft.default.rl_fuzz (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='2'," +
      "'compaction.trigger-file-count'='3')")
    val rnd = new scala.util.Random(20260814L)
    val model = scala.collection.mutable.Map.empty[Long, Long]
    // facade handle on the SAME table: RowKind writes and SQL DML must
    // interleave on one sequence history
    val fcat = graft.api.Catalog.create(spark,
      Map("warehouse" -> warehouse.toString, "catalog-name" -> "gfuzz"))
    val ftable = fcat.getTable("default.rl_fuzz")
    for (step <- 1 to 30) {
      rnd.nextInt(4) match {
        case 0 => // upsert a batch of distinct keys
          val keys = rnd.shuffle((0L until 40L).toList).take(1 + rnd.nextInt(6))
          val vals = keys.map(k => k -> rnd.nextLong(1000000L))
          spark.sql("INSERT INTO graft.default.rl_fuzz VALUES " +
            vals.map { case (k, v) => s"($k,$v)" }.mkString(","))
          vals.foreach { case (k, v) => model(k) = v }
        case 1 => // arithmetic update of a residue class
          val m = 2 + rnd.nextInt(5); val r = rnd.nextInt(m)
          spark.sql("UPDATE graft.default.rl_fuzz " +
            s"SET v = v * 3 + 1 WHERE k % $m = $r")
          model.keys.filter(_ % m == r).toSeq
            .foreach(k => model(k) = model(k) * 3 + 1)
        case 2 => // row-level delete of a residue class
          val m = 2 + rnd.nextInt(5); val r = rnd.nextInt(m)
          spark.sql(s"DELETE FROM graft.default.rl_fuzz WHERE k % $m = $r")
          model.keys.filter(_ % m == r).toSeq.foreach(model.remove)
        case 3 => // facade RowKind delete batch (reference write path)
          import spark.implicits._
          import org.apache.spark.sql.functions.{lit, col}
          val keys = rnd.shuffle((0L until 40L).toList).take(1 + rnd.nextInt(4))
          val wb = ftable.newBatchWriteBuilder()
          val w = wb.newWrite()
          w.write(keys.map(k => (k, 0L)).toDF("k", "v")
            .withColumn(graft.core.RowKind.ColumnName,
              lit(graft.core.RowKind.Delete).cast("byte")))
          wb.newCommit().commit(w.prepareCommit())
          keys.foreach(model.remove)
      }
      val got = spark.sql("SELECT k, v FROM graft.default.rl_fuzz")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == model.toMap, s"diverged at step $step:\n" +
        s"extra: ${(got.keySet -- model.keySet).toSeq.sorted}\n" +
        s"missing: ${(model.keySet -- got.keySet).toSeq.sorted}\n" +
        s"wrong: ${got.keySet.intersect(model.keySet)
          .filter(k => got(k) != model(k)).toSeq.sorted}")
    }
    assert(model.nonEmpty, "fuzz series ended empty — weak run")
  }

  test("partitioned PK table (partition in key): DML routes merge-on-read") {
    spark.sql("CREATE TABLE graft.default.rl_ppk (pt INT, k BIGINT, v STRING) " +
      "PARTITIONED BY (pt) " +
      "TBLPROPERTIES ('primary-key'='pt,k','bucket'='1')")
    spark.sql("INSERT INTO graft.default.rl_ppk VALUES " +
      "(1,1,'a'), (1,2,'b'), (2,1,'c')")
    val sm = new graft.format.SnapshotManager(
      warehouse.resolve("default.db/rl_ppk"))
    val before = sm.liveFilesLatest.map(_.fileName).toSet
    spark.sql("UPDATE graft.default.rl_ppk SET v = 'A' WHERE pt = 1 AND k = 1")
    spark.sql("DELETE FROM graft.default.rl_ppk WHERE v = 'b'")
    // merge-on-read: base files survive, deltas land in the right
    // partition directories
    val after = sm.liveFilesLatest
    assert(before.subsetOf(after.map(_.fileName).toSet),
      "partitioned PK DML fell back to a rewrite")
    val delta = after.filterNot(f => before.contains(f.fileName))
    assert(delta.forall(_.fileName.startsWith("pt=1/")),
      s"delta files landed outside the touched partition: " +
        delta.map(_.fileName))
    val got = spark.sql(
      "SELECT pt, k, v FROM graft.default.rl_ppk ORDER BY pt, k")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq((1, 1L, "A"), (2, 1L, "c")), got.toSeq)
  }

  test("partitioned PK table (partition outside key): COW fallback still works") {
    spark.sql("CREATE TABLE graft.default.rl_ppk2 (pt INT, k BIGINT, v STRING) " +
      "PARTITIONED BY (pt) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1')")
    spark.sql("INSERT INTO graft.default.rl_ppk2 VALUES " +
      "(1,1,'a'), (1,2,'b'), (2,3,'c')")
    spark.sql("UPDATE graft.default.rl_ppk2 SET v = 'B' WHERE k = 2")
    spark.sql("DELETE FROM graft.default.rl_ppk2 WHERE v = 'c'")
    val got = spark.sql(
      "SELECT pt, k, v FROM graft.default.rl_ppk2 ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq((1, 1L, "a"), (1, 2L, "B")), got.toSeq)
  }

  test("partitioned table: partition DELETE stays metadata-only, row DELETE rewrites") {
    spark.sql("CREATE TABLE graft.default.rl_part (pt INT, v STRING) PARTITIONED BY (pt)")
    spark.sql("INSERT INTO graft.default.rl_part VALUES (1,'a'), (1,'b'), (2,'c')")
    spark.sql("DELETE FROM graft.default.rl_part WHERE v = 'a'") // row-level
    spark.sql("DELETE FROM graft.default.rl_part WHERE pt = 2") // metadata
    val got = spark.sql("SELECT pt, v FROM graft.default.rl_part ORDER BY pt, v")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq == Seq((1, "b")))
  }
}
