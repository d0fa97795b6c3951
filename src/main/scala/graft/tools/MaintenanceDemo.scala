package graft.tools

import org.apache.spark.sql.SparkSession
import graft.api.Catalog

/** Live walkthrough: time travel, stats-driven broadcast, compaction.
  * {{{ sbt "runMain graft.tools.MaintenanceDemo" }}}
  */
object MaintenanceDemo {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft-maint-demo")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", "graft.connector.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", wh.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.sql("CREATE NAMESPACE graft.demo")
    spark.sql("CREATE TABLE graft.demo.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('primary-key'='k','bucket'='1')")
    spark.sql("INSERT INTO graft.demo.t VALUES (1,'a'), (2,'b')")
    spark.sql("INSERT INTO graft.demo.t VALUES (2,'B'), (3,'c')")
    spark.sql("INSERT INTO graft.demo.t VALUES (1,'A')")

    println("== current merged view")
    spark.sql("SELECT * FROM graft.demo.t ORDER BY k").show()
    println("== VERSION AS OF 1")
    spark.sql("SELECT * FROM graft.demo.t VERSION AS OF 1 ORDER BY k").show()
    println("== VERSION AS OF 2")
    spark.sql("SELECT * FROM graft.demo.t VERSION AS OF 2 ORDER BY k").show()
    println("== probe: VERSION AS OF 99")
    try spark.sql("SELECT * FROM graft.demo.t VERSION AS OF 99").collect()
    catch { case e: Exception =>
      println("  rejected: " + e.getMessage.linesIterator.next()) }

    println("== join plan (stats should pick BroadcastHashJoin)")
    spark.sql("CREATE TABLE graft.demo.facts (k BIGINT, x DOUBLE)")
    spark.sql("INSERT INTO graft.demo.facts VALUES (1, 1.5), (2, 2.5), (3, 3.5)")
    val plan = spark.sql(
      "SELECT * FROM graft.demo.facts f JOIN graft.demo.t d ON f.k = d.k")
      .queryExecution.executedPlan.toString
    println("  " + plan.linesIterator.filter(l =>
      l.contains("Join") || l.contains("BatchScan")).mkString("\n  "))

    println("== compaction: files before/after")
    val cat = Catalog.create(spark, Map("warehouse" -> wh.toString,
      "catalog-name" -> "graft"))
    val t = cat.getTable("demo.t")
    val sm = new graft.format.SnapshotManager(t.tableDir)
    println(s"  before: ${sm.liveFilesLatest.size} files")
    val n = t.compact()
    println(s"  compacted $n group(s); after: ${sm.liveFilesLatest.size} files; " +
      s"snapshot kind=${sm.latestSnapshot.get.commitKind}")
    spark.sql("SELECT * FROM graft.demo.t ORDER BY k").show()

    println("== upsert after compaction still wins")
    spark.sql("INSERT INTO graft.demo.t VALUES (3,'C3')")
    spark.sql("SELECT * FROM graft.demo.t ORDER BY k").show()

    println("== metadata columns: merge provenance per row")
    spark.sql("SELECT k, v, _sequence_number, _row_kind, " +
      "substring_index(_file, '/', -1) AS file FROM graft.demo.t ORDER BY k")
      .show(truncate = false)
    println("== snapshot expiry + vacuum")
    val smT = new graft.format.SnapshotManager(t.tableDir)
    println(s"  before expiry: snapshots=${smT.existingSnapshotIds.mkString(",")}")
    val res = t.expireSnapshots(retainLast = 1)
    println(s"  expired=${res.expiredSnapshots} dataFilesFreed=${res.deletedDataFiles} manifestsFreed=${res.deletedManifests}")
    println(s"  after: snapshots=${smT.existingSnapshotIds.mkString(",")}")
    spark.sql("SELECT * FROM graft.demo.t ORDER BY k").show()
    println("  probe: time travel to an expired snapshot")
    try spark.sql("SELECT * FROM graft.demo.t VERSION AS OF 1").collect()
    catch { case e: Exception => println("   rejected: " + e.getMessage.linesIterator.next()) }
    val orphan = t.tableDir.resolve("bucket-0/data-orphan.parquet")
    java.nio.file.Files.write(orphan, Array[Byte](1,2,3))
    java.nio.file.Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 7200000L))
    println(s"  vacuum removed ${t.vacuum(olderThanMillis = 3600000L)} orphan(s); orphan exists=${java.nio.file.Files.exists(orphan)}")

    println("== metadata system tables: $options / $schemas / $manifests")
    spark.sql("SELECT * FROM graft.demo.`t$options`").show(truncate = false)
    spark.sql("ALTER TABLE graft.demo.t ADD COLUMN note STRING")
    spark.sql("SELECT schema_id, fields FROM graft.demo.`t$schemas`")
      .show(truncate = false)
    spark.sql("SELECT * FROM graft.demo.`t$manifests`").show(truncate = false)

    println("== probe: _sequence_number on an append table")
    try spark.sql("SELECT _sequence_number FROM graft.demo.facts").collect()
    catch { case e: Exception =>
      println("  rejected: " + e.getMessage.linesIterator.next()) }

    println("== tags: freeze a corpus version, expire around it")
    val tf = cat.getTable("demo.facts")
    tf.createTag("corpus-v1")
    spark.sql("INSERT INTO graft.demo.facts VALUES (4, 4.5), (5, 5.5)")
    spark.sql("INSERT INTO graft.demo.facts VALUES (6, 6.5)")
    println(s"  tags: ${tf.listTags().mkString(", ")}")
    spark.sql("SELECT * FROM graft.demo.`facts$tags`").show()
    val exp = tf.expireSnapshots(retainLast = 1)
    println(s"  expired ${exp.expiredSnapshots} snapshot(s); tagged read " +
      "still exact:")
    spark.sql("SELECT * FROM graft.demo.facts VERSION AS OF 'corpus-v1' " +
      "ORDER BY k").show()

    println("== SQL CALL procedures: rollback to the tag (revert commit)")
    spark.sql("CALL graft.sys.rollback_to_tag('demo.facts', 'corpus-v1')").show()
    spark.sql("SELECT * FROM graft.demo.facts ORDER BY k").show()
    spark.sql("CALL graft.sys.list_tags('demo.facts')").show()

    spark.stop()
  }
}
