package graft.tools

import org.apache.spark.sql.SparkSession

/** Live walkthrough of row-level DML: merge-on-read RowKind appends on
  * PK tables (a 1-row UPDATE commits O(1) rows), copy-on-write on
  * append tables.
  * {{{ sbt "runMain graft.tools.DmlDemo" }}}
  */
object DmlDemo {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft-dml-demo")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", "graft.connector.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", wh.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    spark.sql("CREATE NAMESPACE graft.demo")
    spark.sql("CREATE TABLE graft.demo.acct (k BIGINT, owner STRING, bal DOUBLE) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='2')")
    spark.sql("INSERT INTO graft.demo.acct VALUES " +
      "(1,'ann',10.0), (2,'bob',20.0), (3,'cid',30.0), (4,'dee',40.0)")

    println("== UPDATE with value predicate (merge-on-read: appends -U/+U)")
    val filesBefore = new graft.format.SnapshotManager(
      wh.resolve("demo.db/acct")).liveFilesLatest.map(_.fileName).toSet
    spark.sql("UPDATE graft.demo.acct SET bal = bal + 5 WHERE owner IN ('ann','cid')")
    val after = new graft.format.SnapshotManager(
      wh.resolve("demo.db/acct")).liveFilesLatest
    val delta = after.filterNot(f => filesBefore.contains(f.fileName))
    println(s"  base files untouched: ${filesBefore.forall(n => after.exists(_.fileName == n))}; " +
      s"delta rows committed: ${delta.map(_.rowCount).sum} (2 updates -> 2x -U/+U)")
    spark.sql("SELECT * FROM graft.demo.acct ORDER BY k").show()

    println("== DELETE with value predicate")
    spark.sql("DELETE FROM graft.demo.acct WHERE bal > 35")
    spark.sql("SELECT * FROM graft.demo.acct ORDER BY k").show()

    println("== MERGE INTO (update + delete + insert in one statement)")
    Seq((2L, "BOB", 99.0), (3L, "", -1.0), (9L, "zoe", 9.0))
      .toDF("k", "owner", "bal").createOrReplaceTempView("src")
    spark.sql("""MERGE INTO graft.demo.acct t USING src s ON t.k = s.k
      WHEN MATCHED AND s.bal < 0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET owner = s.owner, bal = s.bal
      WHEN NOT MATCHED THEN INSERT *""")
    spark.sql("SELECT * FROM graft.demo.acct ORDER BY k").show()

    println("== snapshot history shows the rewrites")
    spark.sql("SELECT snapshot_id, commit_kind, total_record_count " +
      "FROM graft.demo.`acct$snapshots` ORDER BY snapshot_id").show()

    println("== conflicting commits from the same base: later commit wins")
    val cat = graft.api.Catalog.create(spark, Map("warehouse" -> wh.toString,
      "catalog-name" -> "graft"))
    spark.sql("CREATE TABLE graft.demo.race (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1')")
    val th = cat.getTable("demo.race")
    val wbA = th.newBatchWriteBuilder(); val wA = wbA.newWrite()
    val wbB = th.newBatchWriteBuilder(); val wB = wbB.newWrite()
    wA.write(Seq((7L, "A")).toDF("k", "v"))
    wB.write(Seq((7L, "B")).toDF("k", "v"))
    val mA = wA.prepareCommit(); val mB = wB.prepareCommit()
    println(s"  both writers from base: A seqs=[${mA.map(_.minSeq).min}..] " +
      s"B seqs=[${mB.map(_.minSeq).min}..] (overlap)")
    wbA.newCommit().commit(mA)
    wbB.newCommit().commit(mB)
    spark.sql("SELECT k, v, _sequence_number FROM graft.demo.race").show()

    println("== probe: UPDATE on a time-travel read")
    try spark.sql("UPDATE graft.demo.acct VERSION AS OF 1 SET bal = 0").collect()
    catch { case e: Exception => println("  rejected: " + e.getMessage.linesIterator.next()) }

    spark.stop()
  }
}
